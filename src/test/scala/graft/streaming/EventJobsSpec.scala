package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Structured Streaming: the same plan runs batch and streaming; a file
  * source + memory sink drives one availableNow pass over real testdata. */
class EventJobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hourlyRollup streaming equals batch on the same input") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val batch = EventJobs.hourlyRollup(events)
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap

    // stream the same rows from a parquet copy with a defined schema
    val dir = Files.createTempDirectory("graft-stream-in").toString
    events.write.mode("overwrite").parquet(dir)
    val sdf = spark.readStream.schema(events.schema).parquet(dir)
    assert(sdf.isStreaming)
    val q = EventJobs.hourlyRollup(sdf)
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("rollup_test")
        .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
