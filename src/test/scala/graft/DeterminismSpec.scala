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
}
