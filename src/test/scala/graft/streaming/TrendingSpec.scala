package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.ItemsSource

/** E2E: live item feed → normalize → watermark-finalized windowed counts →
  * per-window top-k → delta-log trend store. The trending-analytics loop
  * over the streaming source. */
class TrendingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 10-minute (600 s) tumbling windows. Window [600, 1200): u1 posts 3×,
  // u2 2×, u3 1×. Window [1200, 1800): u2 posts 2×, u1 1×. Item 9 is the
  // far-future post that pushes the watermark past both.
  private val feed = Map(
    1L -> (610L, "u1"), 2L -> (700L, "u1"), 3L -> (800L, "u1"),
    4L -> (650L, "u2"), 5L -> (900L, "u2"), 6L -> (1100L, "u3"),
    7L -> (1250L, "u2"), 8L -> (1300L, "u2"), 10L -> (1350L, "u1"),
    9L -> (1000000L, "u9"))

  test("finalized windows land as ranked top-k rows, exactly once") {
    val fetcher = new graft.ingest.Fetcher {
      @volatile var max = 8L
      def fetch(id: Long): Option[String] = feed.get(id).collect {
        case (t, by) if id <= max =>
          s"""{"id":$id,"type":"comment","by":"$by","time":$t}"""
      }
      def latestId(): Long = max
    }
    ItemsSource.registerFake("trending1", fetcher)
    val storeRoot = Files.createTempDirectory("graft-trend-store").toString
    val q = Trending.start(spark, "fake:trending1", startId = 0L,
      storeRoot = storeRoot,
      checkpointDir = Files.createTempDirectory("graft-trend-ckpt").toString,
      keyCol = "author", windowDur = "10 minutes", k = 2)
    try {
      q.processAllAvailable()
      fetcher.max = 10L // deliver the rest + the watermark pusher
      q.processAllAvailable()
      val got = Trending.store(spark, storeRoot).read().collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getLong(4)))
        .toSet
      // window 600: u1 x3 beats u2 x2 (u3 x1 cut by k=2)
      // window 1200: u2 x2 beats u1 x1; id 10 arrived before the
      // watermark passed, so it counts
      assert(got == Set(
        (600L, 1L, "u1", 3L), (600L, 2L, "u2", 2L),
        (1200L, 1L, "u2", 2L), (1200L, 2L, "u1", 1L)), got)
      // ranks are dense and bounded by k within every window
      got.groupBy(_._1).foreach { case (ws, rows) =>
        assert(rows.map(_._2).toSeq.sorted == (1L to rows.size).toSeq,
          s"window $ws ranks not dense")
        assert(rows.size <= 2)
      }
    } finally q.stop()
  }

  test("k and compactEvery validate at call time") {
    intercept[IllegalArgumentException] {
      Trending.start(spark, "fake:whatever", 0L, "/tmp/x", "/tmp/y", k = 0)
    }
    intercept[IllegalArgumentException] {
      Trending.start(spark, "fake:whatever", 0L, "/tmp/x", "/tmp/y",
        compactEvery = 0)
    }
  }
}
