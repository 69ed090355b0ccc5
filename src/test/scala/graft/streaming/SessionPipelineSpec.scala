package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.ItemsSource

/** E2E: live item feed → normalize → per-author session windows → delta-log
  * session store. Closes the loop between the streaming source (S5/T1) and
  * the event operators (§2.8) — finalized sessions land in the store as
  * epoch-keyed deltas, replays are no-ops. */
class SessionPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // (time, author) per id: u1 posts a 2-item burst then a later singleton,
  // u2 one singleton, id 4 is a tombstone, id 6 is the far-future item that
  // pushes the watermark past everything earlier
  private val feed = Map(
    1L -> (1000L, "u1"), 2L -> (1600L, "u1"), 3L -> (1200L, "u2"),
    5L -> (10000L, "u1"), 6L -> (1000000L, "u3"))

  test("item stream sessions land in the delta store exactly once") {
    val fetcher = new graft.ingest.Fetcher {
      @volatile var max = 5L
      def fetch(id: Long): Option[String] = feed.get(id).collect {
        case (t, by) if id <= max =>
          s"""{"id":$id,"type":"comment","by":"$by","time":$t}"""
      }
      def latestId(): Long = max
    }
    ItemsSource.registerFake("sessions1", fetcher)
    val storeRoot = Files.createTempDirectory("graft-sess-store").toString
    val q = SessionPipeline.start(spark, "fake:sessions1", startId = 0L,
      storeRoot = storeRoot,
      checkpointDir = Files.createTempDirectory("graft-sess-ckpt").toString,
      gap = "30 minutes", retrieved = 42L)
    try {
      q.processAllAvailable()
      // watermark still at 0 after the first batch: nothing finalized yet
      // (append mode holds sessions until the watermark passes their close)
      fetcher.max = 6L // far-future item advances the watermark
      q.processAllAvailable()
      val got = SessionPipeline.store(spark, storeRoot).read().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // gap 30 min: u1's 1000+1600 fuse (end = 1600 + 1800), 10000 is its
      // own session; u3's session stays open (watermark hasn't passed it)
      assert(got == Set(
        ("u1", 1000L, 3400L, 2L),
        ("u1", 10000L, 11800L, 1L),
        ("u2", 1200L, 3000L, 1L)), got)
    } finally q.stop()
  }

  test("epoch-keyed delta appends are replay no-ops") {
    import spark.implicits._
    val snaps = SessionPipeline.store(spark,
      Files.createTempDirectory("graft-sess-replay").toString)
    val rows = Seq(("u9", 1L, 2L, 3L))
      .toDF("author", "session_start", "session_end", "n_items")
    snaps.appendDelta(rows, Some("epoch-7"))
    snaps.appendDelta(rows, Some("epoch-7")) // replayed epoch: no-op
    assert(snaps.read().count() == 1)
    assert(snaps.deltaCount == 1)
  }

  test("replayed epoch stays a no-op after compaction folds its delta") {
    // crash between sink write and engine checkpoint, with a compaction in
    // between: the consumed-tokens ledger must keep the replay out even
    // though the manifest no longer lists the delta
    import spark.implicits._
    val root = Files.createTempDirectory("graft-sess-compact-replay").toString
    val snaps = SessionPipeline.store(spark, root)
    val rows = Seq(("u9", 1L, 2L, 3L))
      .toDF("author", "session_start", "session_end", "n_items")
    snaps.appendDelta(rows, Some("epoch-7"))
    snaps.replace(snaps.read()) // compaction erases delta-epoch-7 from the manifest
    assert(snaps.deltaCount == 0)
    snaps.appendDelta(rows, Some("epoch-7")) // replay after compaction
    assert(snaps.read().count() == 1,
      "compacted epoch replayed as a duplicate")
    // a REOPENED store (fresh Snapshots over the same root) must honor the
    // ledger too — restart-then-replay is the realistic crash shape
    val reopened = SessionPipeline.store(spark, root)
    reopened.appendDelta(rows, Some("epoch-7"))
    assert(reopened.read().count() == 1)
    // and a genuinely new epoch still lands
    reopened.appendDelta(
      Seq(("u10", 5L, 6L, 1L)).toDF("author", "session_start", "session_end", "n_items"),
      Some("epoch-8"))
    assert(reopened.read().count() == 2)
    // purely numeric tokens would be indistinguishable from auto-named
    // deltas in the consumed ledger — rejected loud, not silently weaker
    val e = intercept[IllegalArgumentException] {
      reopened.appendDelta(rows, Some("12345"))
    }
    assert(e.getMessage.contains("reserved"))
  }
}
