package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Benchmark-decontamination semantics on a hand-built corpus: threshold on
  * DISTINCT shared shingles, broadcast and shuffle paths identical, clean()
  * drops exactly the flagged ids. */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // eval doc shingles: {"alpha beta gamma", "beta gamma delta"}
  private lazy val eval =
    Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
  // train 1 shares both eval shingles; train 2 shares one; train 3 none
  private lazy val train = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma zzz"),
    (3L, "nothing in common here")).toDF("doc_id", "text")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("flags by distinct shared-shingle threshold") {
    val two = asMap(Decontaminate.flagged(train, eval, "doc_id", "text",
      minShared = 2))
    assert(two == Map(1L -> ((1L, 2L))))
    val one = asMap(Decontaminate.flagged(train, eval, "doc_id", "text",
      minShared = 1))
    assert(one == Map(1L -> ((1L, 2L)), 2L -> ((1L, 1L))))
  }

  test("shuffle fallback matches the broadcast plan") {
    val bc = asMap(Decontaminate.flagged(train, eval, "doc_id", "text",
      minShared = 1))
    val sh = asMap(Decontaminate.flagged(train, eval, "doc_id", "text",
      minShared = 1, broadcastEval = false))
    assert(sh == bc)
  }

  test("salted shuffle path matches the broadcast plan under duplication") {
    // an events-style eval corpus: the same text repeated many times makes
    // its grams hot; the salted path must still produce identical flags
    val dupEval = (100L to 139L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val bc = asMap(Decontaminate.flagged(train, dupEval, "doc_id", "text",
      minShared = 1))
    for (r <- Seq(1, 8); hotMin <- Seq(1L, 8L, 1000L);
         bloom <- Seq(false, true)) {
      val salted = asMap(Decontaminate.flaggedSalted(train, dupEval,
        "doc_id", "text", minShared = 1, saltR = r, hotMin = hotMin,
        bloomGate = bloom))
      assert(salted == bc, s"r=$r hotMin=$hotMin bloom=$bloom")
    }
    // n_eval_hits counts every duplicated eval doc separately
    assert(bc(1L)._1 == 40L)
  }

  test("bloom-gated path matches the broadcast plan at any fpp") {
    // the gate only changes what reaches the exchange; the exact join must
    // scrub every false positive, so even an absurd fpp (sketch admits
    // almost everything) and a tight one produce identical flags. NOTE:
    // flagged() joins raw gram strings while flaggedBloom joins 62-bit
    // WidePolyHash longs — identical output here pins that the hash-key
    // trade doesn't alter pairing on real text (collisions are the
    // documented 2^-62 residual risk)
    val bc = asMap(Decontaminate.flagged(train, eval, "doc_id", "text",
      minShared = 1))
    for (fpp <- Seq(0.5, 0.01, 0.0001)) {
      val bl = asMap(Decontaminate.flaggedBloom(train, eval, "doc_id", "text",
        minShared = 1, fpp = fpp))
      assert(bl == bc, s"fpp=$fpp")
    }
  }

  test("undersized expectedGrams triggers the exact-sizing rebuild, output unchanged") {
    // eval with well over 64 distinct grams so expectedGrams = 1 (floored
    // to 64) undersizes the fused sketch and forces the rebuild job; the
    // output must be identical to the broadcast string-keyed plan
    val bigEval = Seq((100L, (0 until 120).map(i => s"ev$i").mkString(" ")),
      (101L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bc = asMap(Decontaminate.flagged(train, bigEval, "doc_id", "text",
      minShared = 1))
    val bl = asMap(Decontaminate.flaggedBloom(train, bigEval, "doc_id", "text",
      minShared = 1, fpp = 0.01, expectedGrams = 1L))
    assert(bl == bc)
  }

  test("checkpointGramsWithSketch fuses materialize+count+sketch into ONE job") {
    val grams = graft.operators.Dedup.shingles(
      (1L to 50L).map(i => (i, s"w${i} x${i} y${i} z${i} q${i}")).toDF("doc_id", "text"),
      "doc_id", "text")
      .select(col("id").as("eval_id"),
        graft.functions.TextAnalysis.wideStrHash(col("g")).as("g"))
    var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    val (ck, n, bloom) =
      try {
        val r = Decontaminate.checkpointGramsWithSketch(grams, "g",
          expectedGrams = 1L << 20, fpp = 0.01)
        org.apache.spark.GraftTestBus.flush(spark.sparkContext)
        r
      } finally spark.sparkContext.removeSparkListener(l)
    // the old shape paid three sequential jobs (eager checkpoint, count,
    // stat.bloomFilter); the fused aggregate must pay exactly one
    assert(jobs == 1, s"expected 1 fused job, saw $jobs")
    // count is exact (3 distinct grams per 5-token doc, 50 docs)
    assert(n == 150L)
    // sketch admits every gram it folded
    val misses = ck.collect().count(r => !bloom.mightContainLong(r.getLong(1)))
    assert(misses == 0)
    // and the checkpointed frame re-reads blocks, not lineage: same rows
    assert(ck.count() == 150L)
  }

  test("bloom gate runs map-side: no exchange anywhere below the gate filter") {
    val df = Decontaminate.flaggedBloom(train, eval, "doc_id", "text",
      minShared = 1)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("might_contain"), plan)
    // formatted explain = tree section + per-operator details; operator ids
    // link them. Find the Filter detail carrying the gate, locate its tree
    // line, and assert its SUBTREE (following lines with deeper indent —
    // everything executed before the gate) contains no Exchange: the gate
    // must see raw scan output, never shuffled rows.
    val gateId = plan.linesIterator
      .find(l => l.trim.matches("""\(\d+\) (\*\s*)?Filter.*""") &&
        // detail header line; the condition follows on subsequent lines, so
        // scan the whole detail block below the header
        plan.substring(plan.indexOf(l)).split("""\n\(\d+\)""").head
          .contains("might_contain"))
      .map(_.trim.replaceAll("""^\((\d+)\).*""", "$1"))
    assert(gateId.nonEmpty, s"no Filter detail carries the gate:\n$plan")
    val tree = plan.split("\n\n").head.linesIterator.toSeq
    val treeIdx = tree.indexWhere(_.matches(s""".*Filter \\(${gateId.get}\\)\\s*"""))
    assert(treeIdx >= 0, s"gate Filter (${gateId.get}) not in tree:\n$plan")
    def indentOf(l: String) = l.indexWhere(c => c.isLetter || c == '*')
    val gateIndent = indentOf(tree(treeIdx))
    val subtree = tree.drop(treeIdx + 1).takeWhile(indentOf(_) > gateIndent)
    assert(subtree.nonEmpty && !subtree.exists(_.contains("Exchange")),
      s"exchange below the bloom gate:\n${subtree.mkString("\n")}\n\n$plan")
  }

  test("scrubSpans masks exactly the contaminated token runs") {
    // eval span "q1 q2 q3 q4" (4 tokens); minTokens = 4 so only that exact
    // window can flag. Train doc 1 embeds it mid-text; doc 2 is clean;
    // doc 3 IS an eval doc verbatim (fully scrubbed); doc 4 embeds two
    // overlapping eval windows that must merge into one run.
    val ev = Seq((100L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text")
    val tr = Seq(
      (1L, "a b q1 q2 q3 q4 c d"),
      (2L, "clean words only here"),
      (3L, "q1 q2 q3 q4 q5"),
      (4L, "x q1 q2 q3 q4 q5 y")).toDF("doc_id", "text")
    val out = Decontaminate.scrubSpans(tr, ev, "doc_id", "text", minTokens = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) == (("a b c d", 8L, 4L, 1L)))
    assert(out(2L) == (("clean words only here", 4L, 0L, 0L)))
    assert(out(3L) == (("", 5L, 5L, 1L)))
    // doc 4: windows at p=2 ("q1..q4") and p=3 ("q2..q5") merge -> one
    // run covering tokens 2..6, keeping "x" and "y"
    assert(out(4L) == (("x y", 7L, 5L, 1L)))
  }

  test("scrubSpans randomized parity vs an independent brute force") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("t0", "t1", "t2", "t3", "t4")
    def doc(n: Int) = Array.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val L = 3
    // small vocab + short windows force plenty of incidental matches
    val evDocs = (0 until 4).map(i => (100L + i, doc(8 + rnd.nextInt(8))))
    val trDocs = (0 until 12).map(i => (i.toLong, doc(6 + rnd.nextInt(14))))
    // independent brute force: eval window set, flag train windows, merge
    // islands (gap <= L), remove covered 1-based positions, single-space join
    val evWins = evDocs.flatMap { case (_, w) =>
      (0 to w.length - L).map(i => w.slice(i, i + L).toSeq)
    }.toSet
    val expect = trDocs.map { case (id, w) =>
      val flagged = (1 to w.length - L + 1)
        .filter(p => evWins.contains(w.slice(p - 1, p - 1 + L).toSeq))
      var runs = List.empty[(Int, Int)]
      flagged.foreach { p =>
        runs match {
          case (f, l) :: rest if p - l <= L => runs = (f, p) :: rest
          case _                            => runs = (p, p) :: runs
        }
      }
      val covered = runs.flatMap { case (f, l) => f to (l + L - 1) }.toSet
      val kept = w.zipWithIndex.collect {
        case (t, i) if !covered.contains(i + 1) => t }
      id -> ((kept.mkString(" "), w.length.toLong,
        (w.length - kept.length).toLong, runs.length.toLong))
    }.toMap
    val out = Decontaminate.scrubSpans(
      trDocs.map { case (id, w) => (id, w.mkString(" ")) }.toDF("doc_id", "text"),
      evDocs.map { case (id, w) => (id, w.mkString(" ")) }.toDF("doc_id", "text"),
      "doc_id", "text", minTokens = L)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out == expect)
    // the generator must have actually exercised scrubbing
    assert(expect.values.exists(_._3 > 0L), "no doc was scrubbed — generator too weak")
  }

  test("scrubSpans shuffle-runs fallback matches the broadcast path") {
    val ev = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val tr = Seq(
      (1L, "x alpha beta gamma delta y"),
      (2L, "no overlap at all here")).toDF("doc_id", "text")
    def run(bc: Boolean) =
      Decontaminate.scrubSpans(tr, ev, "doc_id", "text", minTokens = 4,
        broadcastRuns = bc).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run(true) == run(false))
    assert(run(true)(1L) == "x y")
  }

  test("overlapFraction: exact per-doc gram fractions, zero-hit docs kept") {
    // eval shingles: {"alpha beta gamma", "beta gamma delta"}
    // train 1: 4 grams, 2 hits -> 500 milli; train 2: 2 grams, 1 hit ->
    // 500 milli; train 3: 2 grams, 0 hits -> must still appear with 0;
    // train 4 (2 tokens): no shingles -> no row
    val tr = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma zzz"),
      (3L, "nothing in common here"),
      (4L, "too short")).toDF("doc_id", "text")
    val out = Decontaminate.overlapFraction(tr, eval, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(1L) == ((4L, 2L, 500L, 0.5)))
    assert(out(2L) == ((2L, 1L, 500L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0L, 0.0)))
    assert(!out.contains(4L))
    // duplicate grams within one doc count once (distinct-gram contract)
    val rep = Seq((9L, "alpha beta gamma alpha beta gamma")).toDF("doc_id", "text")
    val repOut = Decontaminate.overlapFraction(rep, eval, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    // 3 distinct grams of the repeated text ("alpha beta gamma",
    // "beta gamma alpha", "gamma alpha beta"), 1 shared with the eval set
    assert(repOut == ((3L, 1L)))
  }

  test("overlapFraction shuffle fallback matches the broadcast plan") {
    val bc = Decontaminate.overlapFraction(train, eval, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sh = Decontaminate.overlapFraction(train, eval, "doc_id", "text",
      broadcastEval = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sh == bc && bc.nonEmpty)
  }

  test("clean() drops exactly the flagged documents") {
    val kept = Decontaminate.clean(train, eval, "doc_id", "text",
      minShared = 2).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    // repeated shingles in one doc do not inflate the DISTINCT overlap
    val rep = Seq((9L, "alpha beta gamma alpha beta gamma")).toDF("doc_id", "text")
    val flaggedRep = asMap(Decontaminate.flagged(rep, eval, "doc_id", "text",
      minShared = 1))
    // shingle set of doc 9 = {alpha beta gamma, beta gamma alpha,
    // gamma alpha beta} → exactly ONE distinct shared shingle
    assert(flaggedRep == Map(9L -> ((1L, 1L))))
  }
}
