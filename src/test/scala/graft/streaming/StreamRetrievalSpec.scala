package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Retrieval

/** Streaming BM25 index maintenance ([[StreamRetrieval.indexMaintainer]]):
  * a real micro-batched stream of appends must leave the standing index
  * answering exactly like the batch operator over the full corpus, with
  * replays — including one racing a crashed compaction — folding to
  * no-ops on the store's token ledger. */
class StreamRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private def queries = docs.filter(col("doc_id") % 89 === 0)
    .select("doc_id", "text")
  private def corpus = docs.filter(col("doc_id") % 89 =!= 0)
    .select("doc_id", "text")

  private def indexed(dir: String) =
    Retrieval.bm25TopKIndexed(spark, dir, queries, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def want(c: DataFrame) =
    Retrieval.bm25TopK(c, queries, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def manifestDirs(root: String): Seq[String] =
    new String(Files.readAllBytes(
      java.nio.file.Paths.get(root, "current"))).trim
      .split("\n").toSeq.map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#"))

  private def copyDir(src: java.nio.file.Path,
                      dst: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(src).iterator().asScala.toSeq.foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  test("streamed appends + periodic compaction equal the batch operator " +
    "over the union") {
    val dir = Files.createTempDirectory("graft-bm25-stream").toString
    val ids = corpus.select("doc_id").as[Long].collect().sorted
    val (seedCut, streamCut) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val seed = corpus.filter(col("doc_id") <= seedCut)
    val streamRows = corpus.filter(col("doc_id") > seedCut)
      .orderBy("doc_id").collect()
    Retrieval.bm25WriteIndex(seed, "doc_id", "text", dir, buckets = 16)

    // a REAL micro-batched stream: two parquet appends, compactEvery = 1
    // so the fold cadence fires inside foreachBatch, not just at the end
    val srcDir = Files.createTempDirectory("graft-bm25-src").toString
    val schema = corpus.schema
    def write(part: Array[org.apache.spark.sql.Row]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(part.toIndexedSeq), schema)
        .write.mode("append").parquet(srcDir)
    val (first, second) = streamRows.partition(
      _.getLong(0) <= streamCut)
    write(first)
    val maintain = StreamRetrieval.indexMaintainer(spark, dir,
      "doc_id", "text", compactEvery = 1)
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch(maintain)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-bm25-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      write(second)
      q.processAllAvailable()
    } finally q.stop()

    assert(indexed(dir) == want(corpus),
      "streamed index diverged from the batch operator over the union")
    // compactEvery = 1 means every append folded: one manifest entry each
    Seq("postings", "df", "meta").foreach { sub =>
      assert(manifestDirs(s"$dir/$sub").length == 1,
        s"$sub deltas survived the per-batch compaction cadence")
    }
  }

  test("maintainer replay after a crash mid-compaction is a no-op") {
    val dir = Files.createTempDirectory("graft-bm25-stream-crash").toString
    val ids = corpus.select("doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val seed = corpus.filter(col("doc_id") <= cut)
    val batch = corpus.filter(col("doc_id") > cut)
    Retrieval.bm25WriteIndex(seed, "doc_id", "text", dir, buckets = 16)

    // compactEvery = 2: the first append leaves its delta outstanding
    val maintain = StreamRetrieval.indexMaintainer(spark, dir,
      "doc_id", "text", compactEvery = 2)
    maintain(batch, 7L)
    val expect = want(corpus)
    assert(indexed(dir) == expect)

    // simulate a compaction KILLED between writing its folded snapshot
    // and the manifest commit, plus one between commit and delta GC:
    // an uncommitted snapshot copy and a ghost delta on disk
    val proot = java.nio.file.Paths.get(dir, "postings")
    copyDir(proot.resolve(manifestDirs(s"$dir/postings").head),
      proot.resolve("snap-00crashed"))
    copyDir(proot.resolve(manifestDirs(s"$dir/postings").last),
      proot.resolve("delta-00ghost"))
    assert(indexed(dir) == expect, "crash leftovers leaked into reads")

    // the stream restarts and foreachBatch REPLAYS batch 7: the token
    // ledger must make the re-append a no-op (no second delta, same
    // answer), and the replay must not mis-trigger compaction cadence
    val deltasBefore = manifestDirs(s"$dir/postings").length
    maintain(batch, 7L)
    assert(manifestDirs(s"$dir/postings").length == deltasBefore,
      "replayed batch appended a second delta")
    assert(indexed(dir) == expect, "replayed batch double-counted")

    // an EMPTY replayed batch (routine under foreachBatch) is harmless
    maintain(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema), 8L)
    assert(indexed(dir) == expect)

    // the second real batch hits the cadence: compaction folds everything
    // AND sweeps the planted crash leftovers via init()
    maintain(Seq((999999L, "wholly new streamed document")).toDF("doc_id", "text"), 9L)
    assert(manifestDirs(s"$dir/postings").length == 1,
      "cadence compaction did not fold the delta log")
    assert(!Files.exists(proot.resolve("snap-00crashed")) &&
      !Files.exists(proot.resolve("delta-00ghost")),
      "compaction's init() must sweep crash leftovers")
  }
}
