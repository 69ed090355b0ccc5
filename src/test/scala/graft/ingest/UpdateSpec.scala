package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.ItemStore

/** E1 catch-up and E4 re-crawl pipelines end-to-end over scripted fetchers. */
class UpdateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def item(id: Long, score: Long = 1, time: Long = 100): String =
    s"""{"id":$id,"type":"story","by":"u$id","time":$time,"score":$score}"""

  test("catchUp loops bound discovery + fetch + merge until caught up") {
    val store = new ItemStore(spark,
      Files.createTempDirectory("graft-up").toString)
    val f = new FakeFetcher((1L to 9L).map(i => i -> item(i)).toMap, maxId = 9)
    val rounds = Update.catchUp(spark, store, f, parallelism = 2,
      now = () => 500L, batchLimit = 4L)
    assert(rounds == 3) // 1-4, 5-8, 9
    assert(store.current().count() == 9)
    assert(store.latestId().contains(9L))
    // already caught up: zero rounds
    assert(Update.catchUp(spark, store, f, 2, () => 501L) == 0)
  }

  test("catchUp advances past fully-tombstoned ranges (no livelock)") {
    val store = new ItemStore(spark,
      Files.createTempDirectory("graft-up2").toString)
    // ids 1-5 deleted upstream; real items at 6-7. A cursor derived from
    // store.latestId() would refetch 1-4 forever with batchLimit=4.
    val f = new FakeFetcher(Map(6L -> item(6), 7L -> item(7)), maxId = 7)
    val rounds = Update.catchUp(spark, store, f, parallelism = 2,
      now = () => 500L, batchLimit = 4L)
    assert(rounds == 2) // 1-4 (all tombstones), 5-7
    assert(store.current().count() == 2)
    assert(store.latestId().contains(7L))
  }

  test("recrawl refetches volatile rows and merges revisions") {
    val store = new ItemStore(spark,
      Files.createTempDirectory("graft-rc").toString)
    store.init()
    val f1 = new FakeFetcher(Map(1L -> item(1, score = 5),
      2L -> item(2, score = 5, time = 1L)), maxId = 2)
    Update.catchUp(spark, store, f1, 2, () => 200L)
    // upstream revision: both scores now 50. Both rows are inside the 1-day
    // age window (ages 100s and 199s at retrieved=200), but with
    // now = 14d+50 the maturity cutoff (time < now-14d = 50) admits only
    // id2 (time=1), not id1 (time=100) — so exactly one row re-crawls.
    val f2 = new FakeFetcher(Map(1L -> item(1, score = 50),
      2L -> item(2, score = 50, time = 1L)), maxId = 2)
    val n = Update.recrawl(spark, store, f2, days = 1, onlyMature = true,
      parallelism = 2, now = () => 14L * 86400L + 50L)
    assert(n == 1)
    val scores = store.current().collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("score")).toMap
    assert(scores == Map(1L -> 5L, 2L -> 50L))
  }
}
