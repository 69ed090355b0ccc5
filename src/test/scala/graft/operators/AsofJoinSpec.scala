package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backward as-of picks latest right row with ts <= left ts, per key") {
    val trades = Seq(
      (1L, 100L, 10L), (1L, 200L, 11L), (1L, 50L, 12L),
      (2L, 100L, 13L)
    ).toDF("key", "ts", "trade_id")
    val quotes = Seq(
      (1L, 90L, 1L, 900L), (1L, 100L, 2L, 1000L), (1L, 150L, 3L, 1500L),
      (2L, 999L, 4L, 9990L)
    ).toDF("key", "ts", "quote_id", "px")
    val out = AsofJoin.backward(trades, quotes, "key", "ts", "trade_id",
      "quote_id", Seq("quote_id", "px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(out(10L) == ((Some(2L), Some(1000L)))) // ts=100: quote at 100 (<=)
    assert(out(11L) == ((Some(3L), Some(1500L)))) // ts=200: quote at 150
    assert(out(12L) == ((None, None)))            // ts=50: nothing prior
    assert(out(13L) == ((None, None)))            // key 2: quote is in the future
  }

  test("tie at equal ts: right row at same ts is visible; multiple rights → last by tiebreak") {
    val left = Seq((1L, 100L, 1L)).toDF("key", "ts", "lid")
    val right = Seq((1L, 100L, 5L), (1L, 100L, 7L)).toDF("key", "ts", "rid")
    val out = AsofJoin.backward(left, right, "key", "ts", "lid", "rid",
      Seq("rid")).collect()
    assert(out.head.getAs[Long]("asof_rid") == 7L)
  }
}
