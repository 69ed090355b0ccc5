package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Sessionize

/** Cross-validation: Spark's built-in session_window and the window-based
  * Sessionize operator must agree on session counts per user. */
class SessionWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("session_window session counts equal Sessionize's on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val viaBuiltin = EventJobs.sessionCounts(ev, "30 minutes")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaWindow = Sessionize.assign(
      ev.select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec")),
      "user_id", col("sec"), col("event_id"), gapSeconds = 1800L)
      .groupBy("user_id").agg((max(col("session_id")) + 1).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBuiltin == viaWindow)
  }
}
