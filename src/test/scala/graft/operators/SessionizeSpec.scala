package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gap > threshold starts a new session per key") {
    val ev = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L), (1L, 2000L, 3L), (1L, 2100L, 4L),
      (2L, 0L, 5L)
    ).toDF("user_id", "sec", "event_id")
    val out = Sessionize.assign(ev, "user_id", col("sec"), col("event_id"), gapSeconds = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("session_id")))
    val u1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(u1 == Seq(0L, 0L, 1L, 1L))
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq(0L))
  }
}
