package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: every registered query runs at sf0.001; entry
  * returns rows; every oracle key has a matching query. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 with a non-empty schema") {
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
