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
