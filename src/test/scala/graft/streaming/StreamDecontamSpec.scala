package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Decontaminate

/** Streaming decontamination ([[StreamDecontam]]): micro-batched output
  * must equal the batch operator over the union, the eval side must fold
  * to a checkpoint (no eval re-derivation per batch), and empty batches
  * must be harmless. */
class StreamDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private def evalDocs = docs.filter(col("doc_id") % 11 === 0)
    .select("doc_id", "text")
  private def trainDocs = docs.filter(col("doc_id") % 11 =!= 0)
    .select("doc_id", "text")

  /** Drive `transform` through a real parquet-file stream in two appends,
    * collecting every emitted row. */
  private def streamed(transform: DataFrame => DataFrame,
                       out: DataFrame => Array[org.apache.spark.sql.Row])
      : Seq[org.apache.spark.sql.Row] = {
    val dir = Files.createTempDirectory("graft-sdc-src").toString
    val rows = trainDocs.orderBy("doc_id").collect()
    val (first, second) = rows.splitAt(rows.length / 2)
    def write(part: Array[org.apache.spark.sql.Row]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(part.toIndexedSeq), trainDocs.schema)
        .write.mode("append").parquet(dir)
    write(first)
    val collected = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val q = spark.readStream.schema(trainDocs.schema).parquet(dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        collected.synchronized { collected ++= out(transform(batch)) }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdc-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      write(second)
      q.processAllAvailable()
    } finally q.stop()
    collected.toSeq
  }

  test("cleaner over micro-batches equals batch clean over the union") {
    val clean = StreamDecontam.cleaner(evalDocs, "doc_id", "text",
      minShared = 2)
    val got = streamed(clean, _.select("doc_id").collect())
      .map(_.getLong(0)).sorted
    val want = Decontaminate.clean(trainDocs, evalDocs, "doc_id", "text",
        minShared = 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    assert(got.size < trainDocs.count(), "some document must be dropped")
  }

  test("scrubber over micro-batches equals batch scrubSpans over the union") {
    val scrub = StreamDecontam.scrubber(evalDocs, "doc_id", "text",
      minTokens = 8)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val cols = Seq("doc_id", "text", "n_tokens", "removed_tokens", "n_spans")
    val got = streamed(scrub, _.select(cols.map(col): _*).collect())
      .map(key).sortBy(_._1)
    val want = Decontaminate.scrubSpans(trainDocs, evalDocs, "doc_id", "text",
        minTokens = 8)
      .select(cols.map(col): _*).collect().map(key).sortBy(_._1).toSeq
    assert(got == want)
    assert(got.exists(_._5 > 0), "some document must actually be scrubbed")
  }

  test("the per-batch plan reads the eval side from the checkpoint, not " +
    "the eval lineage") {
    val clean = StreamDecontam.cleaner(evalDocs, "doc_id", "text", 2)
    val plan = clean(trainDocs.limit(5)).queryExecution.optimizedPlan.toString
    // the eval side must appear as a materialized RDD scan
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      s"eval checkpoint not in plan:\n$plan")
    // and the eval LINEAGE must not replay: bind a cleaner whose eval side
    // has its own parquet path, and prove that path never shows up in the
    // per-batch plan
    val evalDir = Files.createTempDirectory("graft-sdc-eval").toString
    evalDocs.write.mode("overwrite").parquet(evalDir)
    val cleanDisk = StreamDecontam.cleaner(
      spark.read.parquet(evalDir), "doc_id", "text", 2)
    val diskPlan = cleanDisk(trainDocs.limit(5))
      .queryExecution.optimizedPlan.toString
    assert(!diskPlan.contains(evalDir),
      s"eval parquet lineage replayed per batch:\n$diskPlan")
  }

  test("an empty micro-batch is harmless") {
    val clean = StreamDecontam.cleaner(evalDocs, "doc_id", "text", 2)
    assert(clean(trainDocs.filter(col("doc_id") < 0)).count() == 0)
  }
}
