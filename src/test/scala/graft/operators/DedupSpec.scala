package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup family on constructed corpora with known duplicate structure. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base.replace("today", "tomorrow") // high 3-gram overlap
  private val distinct = "completely different words compose this other sentence here now ok"

  private val docs = Seq(
    (1L, base, "s0"), (2L, "The  quick brown fox jumps over the lazy dog again and again today!", "s0"),
    (3L, nearDup, "s0"), (4L, distinct, "s0"), (5L, distinct + " extra", "s1")
  ).toDF("doc_id", "text", "source")

  test("exactGroups folds case/punct/whitespace variants") {
    val out = Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L) // docs 1+2 normalize equal
    assert(out(3L) == 1L)
  }

  test("exactGroupsHashed: identical output to string grouping on the " +
    "real corpus; the verify pass reports zero collisions") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaString = canon(Dedup.exactGroups(corpus, "doc_id", "text"))
    val viaHash = canon(Dedup.exactGroupsHashed(corpus, "doc_id", "text"))
    assert(viaHash == viaString)
    assert(Dedup.verifyHashGroups(corpus, "text") == 0L)
    // and on the constructed dup fixture too (case/punct variants fold)
    assert(canon(Dedup.exactGroupsHashed(docs, "doc_id", "text")) ==
      canon(Dedup.exactGroups(docs, "doc_id", "text")))
  }

  test("ngramJaccardPairs finds near-dups, respects blocking") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      blockCols = Seq("source"), thresholdMilli = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.contains((4L, 5L))) // near-identical but blocked apart (different source)
  }

  test("minhashPairs recovers high-jaccard pairs via LSH banding") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", thresholdMilli = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical shingle sets always share bands
  }

  test("simhashPairs finds hamming-0 rewrites, respects blocking") {
    val d = Seq(
      (1L, "alpha beta gamma alpha delta epsilon", "s0"),
      (2L, "beta alpha alpha gamma epsilon delta", "s0"), // same multiset -> hamming 0
      (3L, "zeta eta theta iota kappa lambda", "s0"),
      (4L, "alpha beta gamma alpha delta epsilon", "s1")  // dup of 1, other block
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.simhashPairs(d, "doc_id", "text",
      maxHamming = 0, blockCols = Seq("source"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 4L)) // blocked apart
  }

  test("minhashPairs job floor: two materializations + collect, reused scan") {
    // the operator's latency floor is its SEQUENTIAL job count (each job
    // multiplies under host load): candidate checkpoint, verify-shingle
    // checkpoint, final collect — the signature scan must NOT spend a
    // separate materialization job (it fuses into the band join, whose two
    // identical shuffle sides share ONE exchange via ReuseExchange)
    var jobs = 0
    val jl = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    val plans = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.execution.SparkPlan]
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.synchronized { plans += qe.executedPlan }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.sparkContext.addSparkListener(jl)
    spark.listenerManager.register(ql)
    try {
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text", thresholdMilli = 500)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)))
      org.apache.spark.GraftTestBus.flush(spark.sparkContext)
      // the exact sequential floor is the ACTION count: candidate
      // checkpoint, verify-shingle checkpoint, collect. The old shape spent
      // a 4th action materializing the signature scan. (Job count is AQE's
      // per-stage scheduling detail — a loose ceiling only.)
      assert(plans.synchronized(plans.length) == 3,
        s"sequential action floor regressed: ${plans.length} actions")
      assert(jobs <= 12, s"job count blew up: $jobs jobs")
      // the band self-join (inside the candidate checkpoint) must reuse one
      // exchange for its two identical scan→sig→posexplode sides
      // (the sig projection itself constant-folds into the LocalTableScan
      // on this in-memory corpus, so match the band posexplode instead)
      val bandJoin = plans.synchronized {
        plans.find(p => p.toString.contains("ShuffledHashJoin") &&
          p.toString.contains("posexplode"))
      }
      assert(bandJoin.isDefined, "band-join materialization plan not captured")
      assert(bandJoin.get.toString.contains("ReusedExchange"),
        s"band join recomputes the signature scan:\n${bandJoin.get}")
    } finally {
      spark.sparkContext.removeSparkListener(jl)
      spark.listenerManager.unregister(ql)
    }
  }

  test("simhash: identical token multisets equal; disjoint texts differ") {
    val d = Seq((1L, "alpha beta gamma alpha"), (2L, "beta alpha alpha gamma"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("spanDupStats: chunk-level duplicate fractions with known structure") {
    // span=2 chunks. doc 1: [a b][c d][e f]; doc 2 repeats [a b][c d] then
    // diverges; doc 3 shares nothing; doc 4 has 5 tokens → 2 chunks, one
    // ([a b]) shared. Chunks shared by >= 2 docs: "a b", "c d".
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y"),
      (3L, "p q r s t u"),
      (4L, "a b z w k")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDupStats(d, "doc_id", "text", span = 2, minDocs = 2,
      flagMilli = 600)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    // (n_chunks, n_dup_chunks, dup_milli, flagged)
    assert(out(1L) == ((3L, 2L, 666L, 1L)))
    assert(out(2L) == ((3L, 2L, 666L, 1L)))
    assert(out(4L) == ((2L, 1L, 500L, 0L)))
    assert(!out.contains(3L), "doc 3 shares no chunk")
  }

  test("scrubDupSpans: cross-doc chunks removed, tails and unique text " +
    "kept, untouched docs pass through verbatim") {
    // span=2: docs 1/2 share chunks [a b][c d]; doc 4 shares [a b] and has
    // a 1-word tail "k"; doc 3 shares nothing; doc 5 repeats [m n] twice
    // WITHIN itself only (cross-doc rule: kept).
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y"),
      (3L, "p q r s t u"),
      (4L, "a b z w k"),
      (5L, "m n m n")
    ).toDF("doc_id", "text")
    val out = Dedup.scrubDupSpans(d, "doc_id", "text", span = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("e f", 2L)))
    assert(out(2L) == (("x y", 2L)))
    assert(out(3L) == (("p q r s t u", 0L)), "untouched doc passes verbatim")
    assert(out(4L) == (("z w k", 1L)), "sub-span tail survives")
    assert(out(5L) == (("m n m n", 0L)), "within-doc repeats are not boilerplate")
    assert(out.size == 5, "one row per input document")
  }

  test("scrubDupSpans: untouched docs keep newlines/indentation BYTE-identical; " +
    "only docs losing a chunk are token-rebuilt") {
    val structured = "def f(x):\n    return x\n\n# comment"
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y"),
      (3L, structured),                 // nothing removed: must survive verbatim
      (4L, "a b \n  c d   kept\ttail")  // loses [a b][c d]: token-rebuilt
    ).toDF("doc_id", "text")
    val out = Dedup.scrubDupSpans(d, "doc_id", "text", span = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(3L) == ((structured, 0L)),
      "doc with no removals must pass through byte-identical, whitespace included")
    assert(out(4L) == (("kept tail", 2L)),
      "doc losing chunks is rebuilt from surviving tokens")
  }

  test("scrubDupSpans: fully-boilerplate doc collapses to its tail; " +
    "removal is consistent with spanDupStats' dup set") {
    val d = Seq(
      (1L, "a b c d"),
      (2L, "a b c d tail"),
      (3L, "other words here now")
    ).toDF("doc_id", "text")
    val out = Dedup.scrubDupSpans(d, "doc_id", "text", span = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("", 2L)), "everything removed -> empty string")
    assert(out(2L) == (("tail", 2L)))
    assert(out(3L) == (("other words here now", 0L)))
    // the docs spanDupStats reports are exactly the docs scrub rewrites
    val statIds = Dedup.spanDupStats(d, "doc_id", "text", span = 2, minDocs = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.filter(_._2._2 > 0).keySet == statIds)
  }

  test("spanDupStats: docs shorter than one span never chunk; within-doc " +
    "repetition alone is not a duplicate") {
    val d = Seq(
      (1L, "a b a b a b"), // repeats internally, appears in ONE doc only
      (2L, "x y"),
      (3L, "too short")    // 2 tokens < span 4
    ).toDF("doc_id", "text")
    val out = Dedup.spanDupStats(d, "doc_id", "text", span = 4, minDocs = 2)
    assert(out.count() == 0)
  }

  test("spanDupStats plan: text stays in-scan, (id, hash) pairs shuffle") {
    val out = Dedup.spanDupStats(docs, "doc_id", "text", span = 2)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeLines = p.linesIterator
      .filter(_.trim.matches("""\(\d+\) Exchange.*""")).mkString("\n")
    assert(!exchangeLines.contains("text"),
      s"corpus text crosses an exchange:\n$exchangeLines")
    // dup-set agg + probe share the exploded relation: one exchange on hv
    // (reused), one on id for the final agg
    assert(graft.PlanChecks.shuffleExchanges(p) <= 3,
      s"unexpected extra shuffle:\n$p")
  }

  test("scrubDupSpans plan: document text never crosses an exchange — " +
    "detection shuffles are coordinates-only, verdicts come back as arrays") {
    val out = Dedup.scrubDupSpans(docs, "doc_id", "text", span = 2)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeLines = p.linesIterator
      .filter(_.trim.matches("""\(\d+\) Exchange.*""")).mkString("\n")
    assert(!exchangeLines.contains("text") && !exchangeLines.contains("_t"),
      s"corpus text crosses an exchange:\n$exchangeLines")
    // chunk-hash agg, dup probe, verdict agg, verdict join — bounded
    assert(graft.PlanChecks.shuffleExchanges(p) <= 5,
      s"unexpected extra shuffle:\n$p")
  }
  test("keepCanonical: one survivor per cluster by quality, singletons kept") {
    // clusters {1,2,7} (via 1-2, 2-7) and {4,5}; 3 and 9 unclustered
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 5L), (4L, 8L), (5L, 8L),
      (7L, 30L), (9L, 1L)).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 7L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.keepCanonical(docs, "doc_id", "n_chars", pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L, false),
      (2L, 1L, true),  // quality 30 ties with 7, lower id wins
      (3L, 3L, true),  // singleton: own component, kept
      (4L, 4L, true),  // quality tie in {4,5}: lower id wins
      (5L, 4L, false),
      (7L, 1L, false),
      (9L, 9L, true)), s"got $out")
  }

  test("keepCanonical: every document appears exactly once") {
    val d = docs.withColumn("n_chars",
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
    val pairs = Dedup.minhashPairs(d, "doc_id", "text", thresholdMilli = 500)
    val out = Dedup.keepCanonical(d, "doc_id", "n_chars", pairs)
    val n = d.count()
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
    // exactly one kept row per component
    val bad = out.filter("kept").groupBy("component")
      .count().filter("count != 1").count()
    assert(bad == 0)
  }
}
