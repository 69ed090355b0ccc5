package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keeps first occurrence per key across micro-batches") {
    val dir = Files.createTempDirectory("graft-dedup-src").toString
    Seq((1L, "a1"), (2L, "b1"), (1L, "a2")).toDF("id", "v")
      .write.mode("append").parquet(dir)

    val src = spark.readStream.schema("id LONG, v STRING").parquet(dir)
      .as[(Long, String)]
    val q = StreamDedup.firstPerKey(src)(_._1)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_test")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dedup-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      // second batch: duplicate of 1, new key 3
      Seq((1L, "a3"), (3L, "c1")).toDF("id", "v")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val rows = spark.table("dedup_test").as[(Long, String)].collect().toMap
      assert(rows.keySet == Set(1L, 2L, 3L))
      assert(rows(1L).startsWith("a")) // exactly one of the id-1 values
    } finally q.stop()
  }
}
