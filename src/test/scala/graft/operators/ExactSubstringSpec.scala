package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exact-substring tier vs a brute-force twin.
  *
  * q72 hash-checks the window-expressible columns against DuckDB; here the
  * automaton-only `max_rep_span` (longest token span occurring >= 2 times
  * anywhere in the shard, any length) is pinned against an O(n^2·L)
  * enumerate-all-substrings twin, and the window flags against a
  * hash-free windowed twin — on corpora constructed to have straddling
  * duplicates the chunk tier (q62) provably misses.
  */
class ExactSubstringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)], minTokens: Int = 3) =
    ExactSubstring.stats(rows.toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", minTokens)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap

  /** Brute-force twin: longest span (as token seq) occurring >= 2 times
    * across all docs of one shard, counting multiplicity within a doc. */
  private def bruteMaxRep(docs: Seq[Array[String]]): Map[Int, Long] = {
    val occ = scala.collection.mutable.Map.empty[Seq[String], Long]
    for (toks <- docs; i <- toks.indices; j <- i until toks.length)
      occ(toks.slice(i, j + 1).toSeq) = occ.getOrElse(toks.slice(i, j + 1).toSeq, 0L) + 1
    docs.indices.map { d =>
      val toks = docs(d)
      val best = (for {
        i <- toks.indices; j <- i until toks.length
        s = toks.slice(i, j + 1).toSeq if occ(s) >= 2
      } yield s.length.toLong)
      d -> (if (best.isEmpty) 0L else best.max)
    }.toMap
  }

  /** Brute-force windowed twin: per doc, flags + gaps-and-islands runs. */
  private def bruteWindows(docs: Seq[Array[String]], L: Int)
      : Map[Int, (Long, Long, Long, Long)] = {
    val winCount = scala.collection.mutable.Map.empty[Seq[String], Long]
    for (toks <- docs; i <- 0 to toks.length - L)
      winCount(toks.slice(i, i + L).toSeq) =
        winCount.getOrElse(toks.slice(i, i + L).toSeq, 0L) + 1
    docs.indices.map { d =>
      val toks = docs(d)
      val flagged = (0 to toks.length - L)
        .filter(i => winCount(toks.slice(i, i + L).toSeq) >= 2)
      var runs = List.empty[(Int, Int)]
      flagged.foreach { p =>
        runs match {
          case (f, l) :: rest if p - l <= L => runs = (f, p) :: rest
          case _                            => runs = (p, p) :: runs
        }
      }
      val spans = runs.map { case (f, l) => (l - f + L).toLong }
      d -> (flagged.size.toLong, runs.size.toLong, spans.sum,
        if (spans.isEmpty) 0L else spans.max)
    }.toMap
  }

  test("max_rep_span matches the all-substrings brute force; windows match the windowed twin") {
    val texts = Seq(
      "a b c d e f g h i j a b c d e f",     // prefix repeats within doc
      "x y z a b c d e q r s t u v w",       // shares "a b c d e" cross-doc
      "p q r p q r p q r p q r",             // heavy periodic repetition
      "one two three four five six seven",   // no repeats with others
      "a b"                                  // shorter than the window
    )
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s0") }
    val out = run(rows, minTokens = 3)
    val docs = texts.map(graft.functions.TextAnalysis.jvmTokens).toIndexedSeq
    val rep = bruteMaxRep(docs)
    val win = bruteWindows(docs, 3)
    docs.indices.foreach { d =>
      val (nTok, nWin, nDupWin, nRuns, dupTok, maxRun, maxRep) = out(d.toLong)
      assert(nTok == docs(d).length.toLong, s"doc $d n_tokens")
      assert(nWin == math.max(0, docs(d).length - 2).toLong, s"doc $d n_win")
      assert(maxRep == rep(d), s"doc $d max_rep_span")
      if (docs(d).length >= 3) {
        val (bDup, bRuns, bTok, bMax) = win(d)
        assert(nDupWin == bDup, s"doc $d n_dup_win")
        assert(nRuns == bRuns, s"doc $d n_runs")
        assert(dupTok == bTok, s"doc $d dup_tokens")
        assert(maxRun == bMax, s"doc $d max_dup_run")
      } else assert((nDupWin, nRuns, dupTok, maxRun) == ((0L, 0L, 0L, 0L)))
    }
  }

  test("randomized parity vs both twins, multi-shard") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    def randTokens(n: Int) = Array.fill(n)(vocab(rnd.nextInt(vocab.size)))
    // small vocab + length ~20 forces plenty of incidental repeats, the
    // adversarial regime for the trimmed-pointer walk
    val perShard = Seq("s0", "s1").map { sh =>
      sh -> (0 until 8).map(_ => randTokens(12 + rnd.nextInt(12)))
    }
    val rows = perShard.flatMap { case (sh, ds) =>
      ds.zipWithIndex.map { case (toks, i) =>
        ((if (sh == "s0") 0 else 100) + i.toLong, toks.mkString(" "), sh)
      }
    }
    val out = run(rows, minTokens = 4)
    perShard.foreach { case (sh, ds) =>
      val base = if (sh == "s0") 0L else 100L
      val rep = bruteMaxRep(ds)
      val win = bruteWindows(ds, 4)
      ds.indices.foreach { d =>
        val (_, _, nDupWin, nRuns, dupTok, maxRun, maxRep) = out(base + d)
        assert(maxRep == rep(d), s"$sh doc $d max_rep_span")
        val (bDup, bRuns, bTok, bMax) = win(d)
        assert((nDupWin, nRuns, dupTok, maxRun) == ((bDup, bRuns, bTok, bMax)),
          s"$sh doc $d window stats")
      }
    }
  }

  test("shard confinement: identical docs in different shards don't flag") {
    val t = "u v w x y z u v w x y z"
    val out = run(Seq((1L, t, "s0"), (2L, t, "s1"),
      (3L, "k l m n o p q r s t", "s0")), minTokens = 6)
    // each doc still self-repeats ("u v w x y z" twice within the doc) but
    // doc 3 must see nothing from the other shard's content
    assert(out(1L)._7 == 6L) // max_rep_span from within-doc repeat only
    assert(out(2L)._7 == 6L)
    assert(out(3L)._3 == 0L && out(3L)._7 == 0L)
  }

  test("catches a straddling duplicate the chunk tier misses") {
    // a 6-token copy placed at different offsets so no fixed-width-6
    // chunk boundary aligns in both docs -> Dedup.spanDupStats sees 0
    val copy = "c1 c2 c3 c4 c5 c6"
    val a = s"f1 f2 f3 $copy f4 f5 f6"      // copy at offset 3
    val b = s"g1 $copy g2 g3 g4 g5 g6 g7"   // copy at offset 1
    val df = Seq((1L, a, "s0"), (2L, b, "s0")).toDF("doc_id", "text", "source")
    // spanDupStats inner-joins docs to their duplicated chunks, so a total
    // miss is an EMPTY result — no fixed-width-6 chunk aligns in both docs
    val chunk = Dedup.spanDupStats(df, "doc_id", "text", span = 6).collect()
    assert(chunk.isEmpty, s"chunk tier should miss: ${chunk.mkString(",")}")
    val out = run(Seq((1L, a, "s0"), (2L, b, "s0")), minTokens = 6)
    assert(out(1L)._3 == 1L && out(2L)._3 == 1L) // one flagged window each
    assert(out(1L)._7 == 6L && out(2L)._7 == 6L)
  }

  test("globalStats matches the shard tier on a one-shard corpus (minus max_rep_span)") {
    val rows = Seq(
      (1L, "a b c d e f g h i j a b c d e f", "s0"),
      (2L, "x y z a b c d e q r s t u v w", "s0"),
      (3L, "p q r p q r p q r p q r", "s0"),
      (4L, "one two three four five six seven", "s0"))
    val df = rows.toDF("doc_id", "text", "source")
    val shard = ExactSubstring.stats(df, "doc_id", "text", "source",
      minTokens = 3).drop("max_rep_span").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val global = ExactSubstring.globalStats(df, "doc_id", "text",
      minTokens = 3).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(global == shard)
  }

  test("globalStats catches cross-shard duplication the shard tier cannot") {
    val copy = "k1 k2 k3 k4 k5 k6"
    val rows = Seq(
      (1L, s"a1 a2 $copy a3 a4", "s0"),
      (2L, s"b1 $copy b2 b3 b4", "s1"), // same span, OTHER shard
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8", "s0"))
    val df = rows.toDF("doc_id", "text", "source")
    val shard = ExactSubstring.stats(df, "doc_id", "text", "source",
      minTokens = 6).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(shard.values.forall(_ == 0L), s"shard tier should miss: $shard")
    val global = ExactSubstring.globalStats(df, "doc_id", "text",
      minTokens = 6).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(5)))).toMap
    assert(global(1L) == ((1L, 6L))) // one flagged window, six dup tokens
    assert(global(2L) == ((1L, 6L)))
    assert(global(3L) == ((0L, 0L)))
  }

  test("single exchange: one shuffle on the shard key, nothing else") {
    val df = Seq((1L, "a b c d e", "s0"), (2L, "a b c d e", "s1"))
      .toDF("doc_id", "text", "source")
    val out = ExactSubstring.stats(df, "doc_id", "text", "source")
    out.collect() // finalize the AQE plan before reading its shape
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(graft.PlanChecks.shuffleExchanges(plan) == 1,
      s"expected exactly one exchange:\n$plan")
  }
}
