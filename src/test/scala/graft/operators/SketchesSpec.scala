package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Sketch-tier accuracy contracts pinned against exact computation on the
  * real test corpus — the evidence a no-oracle query surface rides on. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("HLL++ distinct estimates stay within 3 rsd of exact, per group") {
    val rsd = 0.05
    val approx = Sketches.groupStats(docs, "source", "text", "n_chars", rsd)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = docs.groupBy("source").agg(countDistinct("text").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, ex) =>
      val err = math.abs(approx(g).toDouble - ex) / ex
      assert(err <= 3 * rsd, s"group $g: approx ${approx(g)} vs exact $ex")
    }
  }

  test("approx median lands inside the exact inter-quartile neighborhood") {
    val out = Sketches.groupStats(docs, "source", "text", "n_chars")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val bounds = docs.groupBy("source")
      .agg(expr("percentile(n_chars, 0.25)").as("lo"),
        expr("percentile(n_chars, 0.75)").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    bounds.foreach { case (g, (lo, hi)) =>
      assert(out(g) >= lo && out(g) <= hi,
        s"group $g: approx median ${out(g)} outside [$lo, $hi]")
    }
  }

  test("q69 exacts reconcile the q68 sketches: distinct within 3 rsd, " +
      "median straddled by the low-median order statistic") {
    // q69_sketch_exact is the oracle-checked scaffolding twin of the
    // no-oracle q68_sketch_stats — this cross-reference pins that the two
    // queries describe the SAME statistics of the same grouping
    val rsd = 0.05
    val exact = graft.queries.TextQ.q69.fn(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val approx = graft.queries.TextQ.q68.fn(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (g, (nRows, exDistinct, exMedianLow)) =>
      val (aRows, aDistinct, aMedian) = approx(g)
      assert(aRows == nRows, s"group $g: row counts must agree exactly")
      val err = math.abs(aDistinct.toDouble - exDistinct) / exDistinct
      assert(err <= 3 * rsd, s"group $g: HLL $aDistinct vs exact $exDistinct")
      // the low median is the ⌈n/2⌉-th order statistic; GK's 0.5 quantile
      // at this accuracy must land within the adjacent-rank neighborhood
      // — bounded here by the exact quartiles like the q68-only test
      val (lo, hi) = docs.filter(col("source") === g)
        .agg(expr("percentile(n_chars, 0.25)"), expr("percentile(n_chars, 0.75)"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
      assert(aMedian >= lo && aMedian <= hi && exMedianLow >= lo && exMedianLow <= hi,
        s"group $g: medians ($aMedian approx, $exMedianLow exact) outside [$lo, $hi]")
    }
  }

  test("count-min estimates never undercount and respect the eps bound") {
    val eps = 0.001
    val total = docs.count()
    val cands = Seq("src0", "src7", "src19", "absent-source")
    val est = Sketches.heavyHitterEstimates(docs, "source", cands, eps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cands.foreach { c =>
      val ex = exact.getOrElse(c, 0L)
      assert(est(c) >= ex, s"$c: CMS undercounted (${est(c)} < $ex)")
      // the documented bound, exactly: est <= true + eps*N (seed is
      // fixed, so this is deterministic — no slack multiplier)
      assert(est(c) <= ex + (eps * total).ceil.toLong,
        s"$c: CMS estimate ${est(c)} breaks the eps bound over $ex")
    }
    assert(est("absent-source") <= (eps * total).ceil.toLong)
  }

  test("empty candidate lists and non-string item columns fail loud") {
    intercept[IllegalArgumentException] {
      Sketches.heavyHitterEstimates(docs, "source", Seq.empty)
    }
    // a Long column would hash natively while the string candidates hash
    // as UTF-8 — silent undercount; must be rejected at call time
    val e = intercept[IllegalArgumentException] {
      Sketches.heavyHitterEstimates(docs, "doc_id", Seq("42"))
    }
    assert(e.getMessage.contains("STRING"))
  }

  test("exactQuantiles: type-1 lower quantiles on a hand distribution — " +
    "ties, boundary ranks, null exclusion, and the guards") {
    import spark.implicits._
    // values 1,2,2,3,10 (n=5): ranks ceil(pct*5/100) -> p20 rank 1 = 1,
    // p40 rank 2 = 2, p60 rank 3 = 2 (the tie), p80 rank 4 = 3,
    // p100 rank 5 = 10; p1 rank 1 = 1
    val vals = Seq[java.lang.Long](1L, 2L, 2L, 3L, 10L, null)
      .toDF("v")
    val out = Sketches.exactQuantiles(vals, "v",
      Seq(1, 20, 40, 60, 80, 100))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 1L, 20 -> 1L, 40 -> 2L, 60 -> 2L, 80 -> 3L,
      100 -> 10L))
    // exact boundary: pct*n/100 integral — p40 of n=5 is rank 2 exactly,
    // NOT rank 3 (>= in multiplication form, never strict)
    intercept[IllegalArgumentException] {
      Sketches.exactQuantiles(vals, "v", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sketches.exactQuantiles(vals, "v", Seq(0))
    }
    intercept[IllegalArgumentException] {
      Sketches.exactQuantiles(vals, "v", Seq(101))
    }
    intercept[IllegalArgumentException] {
      Sketches.exactQuantiles(vals, "v", Seq(50, 50))
    }
  }

  test("exactGroupQuantiles: each group's rows equal the global operator " +
    "run on that group's subset") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 2L), ("a", 9L),
      ("b", 5L), ("b", 7L),
      ("c", 4L)
    ).toDF("g", "v")
    val pcts = Seq(25, 50, 75, 100)
    val grouped = Sketches.exactGroupQuantiles(df, "g", "v", pcts)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    for (g <- Seq("a", "b", "c")) {
      val solo = Sketches.exactQuantiles(
        df.filter(org.apache.spark.sql.functions.col("g") === g), "v", pcts)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(pcts.forall(p => grouped((g, p)) == solo(p)),
        s"group $g diverged: ${pcts.map(p => (p, grouped((g, p)), solo(p)))}")
    }
    assert(grouped.size == 12)
  }
}
