package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must be run-to-run deterministic — the driver's
  * hash-compare depends on it, and double-sum reordering or undeclared sort
  * ties would surface as flaky oracle mismatches. Two executions of each
  * plan must produce identical row sequences. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name is run-to-run deterministic") {
      val a = fn(spark, dir).collect().map(_.toString).toSeq
      val b = fn(spark, dir).collect().map(_.toString).toSeq
      assert(a == b, s"$name differs between runs")
    }
  }

  test("q52 week index floors (matches DuckDB // on pre-epoch dates)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // 2023-12-29 is day -3: DuckDB (-3) // 7 = -1 (floor); Spark `div`
    // would truncate to 0 — the query must use floor on both sides
    val w = Seq("2023-12-29", "2024-01-01", "2024-01-08").toDF("d")
      .select(expr("floor(datediff(CAST(d AS DATE), DATE '2024-01-01') / 7)"))
      .collect().map(_.getLong(0)).toSeq
    assert(w == Seq(-1L, 0L, 1L))
  }
}
