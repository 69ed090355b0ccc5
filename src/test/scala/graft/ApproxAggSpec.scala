package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates (SURVEY.md §2.4 "standard Spark agg family"): HLL
  * distinct counting and approximate quantiles vs exact values on real
  * testdata. Sketch internals differ per engine, so these are
  * tolerance-tested here rather than DuckDB-hash-oracled. */
class ApproxAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.lineitem(spark, dir)
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx")).head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("approx quantiles bracket the exact median") {
    val li = Tables.lineitem(spark, dir)
    val Array(q25, q50, q75) =
      li.stat.approxQuantile("l_extendedprice", Array(0.25, 0.5, 0.75), 0.01)
    assert(q25 < q50 && q50 < q75)
    val exactMedian = li.select(expr("percentile(l_extendedprice, 0.5)"))
      .head.getDouble(0)
    assert(math.abs(q50 - exactMedian) / exactMedian < 0.05)
  }
}
