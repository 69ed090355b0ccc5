package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.Item
import graft.store.ItemStore

/** The livestream as a real Structured Streaming source: offset tracking,
  * catch-up, new-data triggers, and the full stream→normalize→merge loop. */
class ItemsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def item(id: Long): String =
    s"""{"id":$id,"type":"comment","by":"u$id","time":${id * 10}}"""

  test("micro-batch stream reads (start, latest] and follows new publications") {
    val grow = new graft.ingest.Fetcher {
      @volatile var max = 5L
      def fetch(id: Long): Option[String] =
        if (id <= max && id != 3L) Some(item(id)) else None // 3 deleted
      def latestId(): Long = max
    }
    ItemsSource.registerFake("stream1", grow)
    val store = new ItemStore(spark,
      Files.createTempDirectory("graft-ms-store").toString)
    store.init()

    val q = spark.readStream.format("graft.sources.ItemsStream")
      .option("start", "0").option("partitions", "2")
      .option("fetcher", "fake:stream1")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        store.merge(Item.normalize(batch, lit(42L)))
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ms-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(store.current().count() == 4) // 1,2,4,5 — 3 tombstoned
      assert(store.latestId().contains(5L))
      grow.max = 8L // three more published upstream
      q.processAllAvailable()
      assert(store.current().count() == 7)
      assert(store.latestId().contains(8L))
    } finally q.stop()
  }

  test("maxIdsPerTrigger rate-limits batches without losing ids") {
    val src = new graft.ingest.Fetcher {
      def fetch(id: Long): Option[String] = if (id <= 10L) Some(item(id)) else None
      def latestId(): Long = 10L
    }
    ItemsSource.registerFake("stream2", src)
    val batchSizes = scala.collection.mutable.Buffer.empty[Long]
    val seen = scala.collection.mutable.Set.empty[Long]
    val q = spark.readStream.format("graft.sources.ItemsStream")
      .option("start", "0").option("partitions", "2")
      .option("fetcher", "fake:stream2")
      .option("maxIdsPerTrigger", "3")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = batch.select("id").collect().map(_.getLong(0))
        batchSizes.synchronized { batchSizes += ids.length.toLong; seen ++= ids }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ms-ckpt2").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(seen == (1L to 10L).toSet)      // complete, nothing dropped
      assert(batchSizes.forall(_ <= 3L))      // every batch within the cap
      assert(batchSizes.count(_ > 0) >= 4)    // 10 ids / 3 per trigger
    } finally q.stop()
  }
}
