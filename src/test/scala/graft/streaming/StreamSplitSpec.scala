package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming leakage-safe split: detected pairs share a split (batch-
  * local chains included), later twins inherit the ORIGINAL
  * representative across batches, shipped splits never flip, replays
  * reproduce assignments bit-for-bit, and nothing is ever dropped. */
class StreamSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again today"
  private def dfOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "rep", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("batch-local chain shares one split; cross-batch twin inherits the " +
    "original rep; replay and shipped assignments are stable") {
    val dir = Files.createTempDirectory("graft-ssplit").toString
    val split = new StreamSplit(spark, dir, valMilli = 100, compactEvery = 2)
    split.init()
    // batch 1: a chain 1~2 (word swap) and 2~3, plus an unrelated doc 9
    val b1 = dfOf(
      1L -> base,
      2L -> base.replace("today", "tomorrow"),
      3L -> base.replace("today", "tomorrow").replace("quick", "swift"),
      9L -> "completely different words compose this other sentence here")
    val o1 = collect(split.assign(b1, "doc_id", "text", 0L))
    assert(o1.size == 4, "a row was dropped")
    assert(o1(1L) == o1(2L) && o1(2L) == o1(3L),
      s"batch-local chain split apart: $o1")
    assert(o1(1L)._1 == 1L, "chain rep should be the min id")
    assert(o1(9L)._1 == 9L, "unrelated doc must be its own cluster")

    // batch 2: a twin of doc 2 (id 20) — must inherit rep 1, not 2
    val b2 = dfOf(20L -> base.replace("today", "tomorrow"))
    val o2 = collect(split.assign(b2, "doc_id", "text", 1L))
    assert(o2(20L)._1 == 1L,
      s"cross-batch twin did not inherit the original rep: ${o2(20L)}")
    assert(o2(20L)._2 == o1(1L)._2, "cross-batch twin straddles the split")

    // replay batch 2: identical assignment, store not re-appended
    val o2r = collect(split.assign(b2, "doc_id", "text", 1L))
    assert(o2r == o2, "replayed batch diverged")

    // batch 3 re-presents doc 1's text under a new id after compaction
    // pressure: still rep 1 — shipped splits never flip
    val b3 = dfOf(30L -> base)
    val o3 = collect(split.assign(b3, "doc_id", "text", 2L))
    assert(o3(30L)._1 == 1L && o3(30L)._2 == o1(1L)._2)
  }

  test("signatureless short docs pass through as their own singletons") {
    val dir = Files.createTempDirectory("graft-ssplit2").toString
    val split = new StreamSplit(spark, dir)
    split.init()
    val out = collect(split.assign(dfOf(5L -> "hi", 6L -> "yo"),
      "doc_id", "text", 0L))
    assert(out(5L)._1 == 5L && out(6L)._1 == 6L)
  }
}
