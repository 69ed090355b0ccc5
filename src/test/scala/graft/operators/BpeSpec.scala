package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** BPE training ([[Bpe]]): the classic hand-computable example, the
  * train/apply parity that catches rank-order bugs, determinism, and the
  * corpus-scale piece-count path. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("the classic low/lower/newest vocabulary merges by hand") {
    // Sennrich et al.'s running example shape: frequencies force the
    // merge order deterministically
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = Bpe.trainFromVocab(vocab, numMerges = 4)
    // pair counts round 1: (e,s)=9 and (s,t)=9 and (t,</w>)=9 tie;
    // lexicographic tie-break picks (e,s); then (es,t)=9, (est,</w>)=9,
    // then (l,o)=7
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o")), s"got $merges")
    assert(Bpe.segment("newest", merges) == Vector("n", "e", "w", "est</w>"))
    assert(Bpe.segment("lowest", merges) == Vector("lo", "w", "est</w>"))
    assert(Bpe.segment("low", merges) == Vector("lo", "w", "</w>"))
  }

  test("apply reproduces training's own final segmentation (rank parity)") {
    val vocab = docs.select(org.apache.spark.sql.functions.explode(
        graft.functions.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toSeq
    val merges = Bpe.trainFromVocab(vocab, numMerges = 40)
    assert(merges.nonEmpty)
    // re-run the trainer but capture final segmentations by replaying its
    // merges through segment(): for EVERY vocab word, greedy-by-rank
    // application must land on the same pieces the training loop ended
    // with — equivalently, re-training on the already-segmented forms
    // makes no new merges inside any word's pieces
    vocab.foreach { case (w, _) =>
      val pieces = Bpe.segment(w, merges)
      assert(pieces.mkString == w + Bpe.EndOfWord,
        s"segmentation of '$w' lost characters: $pieces")
      // every piece must be buildable from the merge table (closure):
      // a piece is either a single initial symbol or the concatenation
      // produced by some merge
      val producible = merges.map { case (a, b) => a + b }.toSet
      pieces.foreach { p =>
        assert(p.codePointCount(0, p.length) == 1 || p == Bpe.EndOfWord ||
          producible(p), s"piece '$p' of '$w' not producible")
      }
    }
  }

  test("training is deterministic and monotone in merge count") {
    val vocab = Seq(("aab", 4L), ("aac", 3L), ("abab", 2L), ("bc", 7L))
    val m1 = Bpe.trainFromVocab(vocab, 6)
    val m2 = Bpe.trainFromVocab(vocab, 6)
    assert(m1 == m2)
    val m3 = Bpe.trainFromVocab(vocab, 3)
    assert(m1.take(3) == m3, "a shorter training is a prefix")
    // more merges never increase any word's piece count
    vocab.foreach { case (w, _) =>
      assert(Bpe.segment(w, m1).length <= Bpe.segment(w, m3).length)
    }
  }

  test("early stop: no pair at minPairCount leaves the table short") {
    val vocab = Seq(("ab", 1L), ("cd", 1L))
    assert(Bpe.trainFromVocab(vocab, 10, minPairCount = 2L).isEmpty)
  }

  test("train: the maxVocab cap binds deterministically and is invisible " +
      "when it does not bind") {
    // cap above the true vocab size → identical merges to the uncapped
    // legacy behavior (vocab order is irrelevant to trainFromVocab)
    val m1 = Bpe.train(docs, "text", numMerges = 12)
    val m2 = Bpe.train(docs, "text", numMerges = 12, maxVocab = Int.MaxValue)
    assert(m1 == m2)
    // a binding cap trains on exactly the top-M by (freq desc, word asc)
    val vocab = docs.select(org.apache.spark.sql.functions.explode(
        graft.functions.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toSeq
    val top = vocab.sortBy { case (w, f) => (-f, w) }.take(50)
    val capped = Bpe.train(docs, "text", numMerges = 12, maxVocab = 50)
    assert(capped == Bpe.trainFromVocab(top, numMerges = 12))
    // the minFreq floor drops the noise tail before the collect
    val floored = Bpe.train(docs, "text", numMerges = 12, minFreq = 3L)
    assert(floored ==
      Bpe.trainFromVocab(vocab.filter(_._2 >= 3L), numMerges = 12))
  }

  test("pieceCounts is lazy: no job runs and nothing collects at call time") {
    // the legacy implementation collected every DISTINCT corpus word to
    // the driver EAGERLY, inside the call — a driver bottleneck at scale.
    // Pin the fix: building the plan runs zero Spark jobs; all work (and
    // all segmentation) happens in executors at action time.
    val merges = Bpe.train(docs, "text", numMerges = 10)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val plan = Bpe.pieceCounts(docs, "doc_id", "text", merges)
      // the listener bus is async; the legacy collect() would have
      // BLOCKED on its job, so its start event is long since posted —
      // a short settle window is enough to catch any job
      Thread.sleep(500)
      assert(jobs.get() == 0,
        s"pieceCounts ran ${jobs.get()} job(s) before any action")
      assert(plan.columns.toSeq == Seq("doc_id", "n_words", "n_pieces"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("pieceCounts drops NULL-text documents, matching the explode form") {
    val merges = Seq(("a", "b"))
    val d = Seq((1L, "ab ab"), (3L, "xy")).toDF("doc_id", "text")
      .unionByName(Seq((2L, Option.empty[String])).toDF("doc_id", "text"))
    val out = Bpe.pieceCounts(d, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect()
      .map { case (k, v, p) => k -> ((v, p)) }.toMap
    assert(!out.contains(2L), "null-text doc must be absent")
    assert(out(1L) == ((2L, 4L))) // "ab" -> [ab, </w>] twice
    assert(out(3L) == ((1L, 3L))) // [x, y, </w>]
  }

  test("pieceCounts: corpus-scale counts agree with per-word segmentation") {
    val merges = Bpe.train(docs, "text", numMerges = 30)
    val out = Bpe.pieceCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect()
      .map { case (id, w, p) => id -> ((w, p)) }.toMap
    // brute force twin over collected text
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    rows.foreach { case (id, text) =>
      val ws = graft.functions.TextAnalysis.jvmTokens(text)
      val want = (ws.length.toLong,
        ws.map(w => Bpe.segment(w, merges).length.toLong).sum)
      assert(out(id) == want, s"doc $id: ${out(id)} != $want")
    }
    // merges actually compress: pieces < chars+1 per word on average
    val (_, totalPieces) = out.values.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val naive = rows.map(_._2).map(t =>
      graft.functions.TextAnalysis.jvmTokens(t)
        .map(w => w.codePointCount(0, w.length).toLong + 1L).sum).sum
    assert(totalPieces < naive, "training produced no compression")
  }
}
