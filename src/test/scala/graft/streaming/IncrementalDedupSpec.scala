package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** LSH dedup under continuous ingestion: batches filtered against the
  * persistent band-bucket index. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"

  test("cross-batch near-dups drop; novel docs keep; chains collapse") {
    val dd = new IncrementalDedup(spark,
      Files.createTempDirectory("graft-inc-dedup").toString)
    dd.init()

    val b1 = Seq(
      (1L, base),
      (2L, base), // identical to 1 within the batch -> dropped (min id wins)
      (3L, "completely different words compose this other sentence here now ok")
    ).toDF("doc_id", "text")
    val kept1 = dd.filterAndClaim(b1, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == Set(1L, 3L))

    val b2 = Seq(
      (4L, base),                       // near-dup of batch-1 doc 1 -> dropped
      (5L, "entirely novel content that matches nothing seen before at all yes")
    ).toDF("doc_id", "text")
    val kept2 = dd.filterAndClaim(b2, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(5L))

    // transitivity: doc 2 was dropped in batch 1, but its buckets were
    // claimed — a dup of doc 2 still drops
    val b3 = Seq((6L, base)).toDF("doc_id", "text")
    assert(dd.filterAndClaim(b3, "doc_id", "text").count() == 0)
  }

  test("replaying a batch (foreachBatch retry) keeps the same rows") {
    val dd = new IncrementalDedup(spark,
      Files.createTempDirectory("graft-inc-dedup-replay").toString)
    dd.init()
    val b = Seq(
      (1L, base),
      (2L, base), // intra-batch dup of 1
      (3L, "completely different words compose this other sentence here now ok")
    ).toDF("doc_id", "text")
    val first = dd.filterAndClaim(b, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val replay = dd.filterAndClaim(b, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(first == Set(1L, 3L))
    assert(replay == first) // idempotent: own claims don't count as dups
  }

  test("docs with no shingles (< 3 tokens) pass through") {
    val dd = new IncrementalDedup(spark,
      Files.createTempDirectory("graft-inc-dedup2").toString)
    dd.init()
    val kept = dd.filterAndClaim(
      Seq((1L, "two words"), (2L, "two words")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(kept.count() == 2)
  }

  test("drives from a real streaming query via foreachBatch") {
    val srcDir = Files.createTempDirectory("graft-inc-src").toString
    Seq((1L, base)).toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    val dd = new IncrementalDedup(spark,
      Files.createTempDirectory("graft-inc-dedup3").toString)
    dd.init()
    val sink = scala.collection.mutable.Set.empty[Long]
    val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(srcDir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val kept = dd.filterAndClaim(b, "doc_id", "text")
          .select("doc_id").collect().map(_.getLong(0))
        sink.synchronized { sink ++= kept }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-inc-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      Seq((2L, base), (3L, "fresh unseen sentence with many distinct tokens inside it"))
        .toDF("doc_id", "text").write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(sink.toSet == Set(1L, 3L)) // 2 is a cross-batch near-dup of 1
    } finally q.stop()
  }
}
