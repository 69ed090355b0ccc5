package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.Item
import graft.store.ItemStore

/** T6 exactly-once-ish: a Structured Streaming query feeding the idempotent
  * upsert via foreachBatch — the micro-batch epoch is the commit unit
  * (SURVEY.md S8), and replaying a batch cannot corrupt the store. */
class StreamingMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch merge applies micro-batches atomically and idempotently") {
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    val storeDir = Files.createTempDirectory("graft-stream-store").toString
    val store = new ItemStore(spark, storeDir)
    store.init()

    // first file: items 1-3
    Seq(
      (1L, """{"id":1,"type":"story","by":"a","time":10,"score":1}"""),
      (2L, """{"id":2,"type":"comment","by":"b","time":20}"""),
      (3L, null.asInstanceOf[String])) // tombstone
      .toDF("id", "body").write.mode("append").parquet(srcDir)

    val raw = spark.readStream
      .schema("id LONG, body STRING")
      .parquet(srcDir)
    val q = raw.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        store.merge(Item.normalize(batch, lit(111L)))
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stream-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(store.current().count() == 2) // tombstone dropped
      // second file: revision of 1 (null author keeps old; score overwrites via
      // coalesce? score is a coalesce column -> present value overwrites)
      Seq((1L, """{"id":1,"type":"story","time":10,"score":7}"""))
        .toDF("id", "body").write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val r1 = store.current().filter(col("id") === 1L).head
      assert(r1.getAs[String]("author") == "a")  // kept
      assert(r1.getAs[Long]("score") == 7L)      // updated
      assert(r1.getAs[Long]("retrieved") == 111L)
      // replay the same payload (simulated retry) -> no change
      Seq((1L, """{"id":1,"type":"story","time":10,"score":7}"""))
        .toDF("id", "body").write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(store.current().count() == 2)
      assert(store.current().filter(col("id") === 1L).head.getAs[Long]("score") == 7L)
    } finally q.stop()
  }
}
