package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S1-S5 + T3/T4/T5: fetch normalization, tombstones, livestream state
  * machine with the gap-skip heuristic. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def item(id: Long, by: String = "alice", time: Long = 1000L,
                   extra: String = ""): String =
    s"""{"id": $id, "type": "comment", "by": "$by", "time": $time$extra}"""

  test("bulk fetch normalizes json: by→author, flags coerced, retrieved stamped") {
    val f = new FakeFetcher(Map(
      1L -> item(1, extra = ""","deleted": true, "parent": 7"""),
      2L -> item(2)), maxId = 2)
    val out = BulkFetch.fetchItems(spark, f, 1, 2, parallelism = 2, retrievedAt = 5000L)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).getAs[Boolean]("deleted"))
    assert(!out(2L).getAs[Boolean]("deleted")) // missing flag → false
    assert(out(1L).getAs[Long]("parent") == 7L)
    assert(out(2L).getAs[String]("author") == "alice")
    assert(out(2L).getAs[Long]("retrieved") == 5000L)
  }

  test("tombstones dropped: null body and missing-time items never surface") {
    val f = new FakeFetcher(Map(
      1L -> item(1),
      2L -> """{"id": 2, "type": "story"}""" // no time → never existed (hnarchive.py:125-130)
    ), maxId = 3) // 3 → null body
    val out = BulkFetch.fetchItems(spark, f, 1, 3, 2, 0L).collect()
    assert(out.map(_.getAs[Long]("id")).toSet == Set(1L))
  }

  /** Fetcher whose published window grows; records probe count. */
  private class ScriptedFetcher(exists: Set[Long], latest: Long) extends Fetcher {
    var probes = 0
    def fetch(id: Long): Option[String] =
      if (exists(id)) Some(item(id)) else None
    def latestId(): Long = { probes += 1; latest }
  }

  test("livestream advances through hits and resets backoff") {
    val f = new ScriptedFetcher(Set(10L, 11L, 12L), latest = 12L)
    var slept = Vector.empty[Long]
    val ls = new Livestream(f, 10L, ms => slept :+= ms)
    assert(ls.nextBatch(3).map(_._1) == Seq(10L, 11L, 12L))
    assert(slept.isEmpty)
    assert(f.probes == 0)
  }

  test("gap-skip: 5th consecutive miss probes latest; far-future skips without sleep") {
    // id 10 deleted; latest is 100 (> 10+50) → after 5 misses (4 sleeps) skip to 11
    val f = new ScriptedFetcher(Set(11L), latest = 100L)
    var slept = Vector.empty[Long]
    val ls = new Livestream(f, 10L, ms => slept :+= ms)
    val got = ls.next()
    assert(ls.currentId == 12L)
    assert(f.probes == 1)
    assert(slept.size == 4) // misses 1-4 slept; miss 5 probed and skipped
    // linear backoff m=2 b=5: 5,7,9,11 seconds
    assert(slept == Vector(5000L, 7000L, 9000L, 11000L))
  }

  test("gap-skip margin: latest within 50 ids keeps waiting instead of skipping") {
    val f = new ScriptedFetcher(Set.empty, latest = 30L) {
      var calls = 0
      override def fetch(id: Long): Option[String] = {
        calls += 1
        if (calls > 7) Some(item(id)) else None // publish after 7 polls
      }
    }
    var slept = Vector.empty[Long]
    val ls = new Livestream(f, 10L, ms => slept :+= ms)
    ls.next()
    assert(ls.currentId == 11L) // waited for 10, never skipped
    assert(f.probes >= 1)       // probed at miss 5, but 30 <= 10+50 → no skip
    assert(slept.size == 7)
  }
}
