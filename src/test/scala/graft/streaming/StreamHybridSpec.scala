package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.{Retrieval, Similarity, VectorIndex}

/** Hybrid retrieval over STREAMING-MAINTAINED standing indexes: the BM25
  * inverted index and the IVF vector index each bootstrap from a first
  * batch, absorb a second through their maintainers (forcing a
  * compaction), and the fused hybrid query over both stores must equal
  * the direct operator over the full corpus — search stays correct
  * under ingestion, including mid-stream compaction. Exhaustive IVF
  * probes (nprobe ≥ cells) make the semantic leg exact, so the equality
  * is bitwise, not approximate. */
class StreamHybridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("standing hybrid == direct hybrid after append + compaction") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val corpus = docs.filter(col("doc_id") % 89 =!= 0)
    val queries = docs.filter(col("doc_id") % 89 === 0)
    val embCorpus = emb.filter(col("doc_id") % 89 =!= 0)
    val embQueries = emb.filter(col("doc_id") % 89 === 0)

    val direct = Retrieval.hybridRrfTopK(corpus, queries, embCorpus,
      embQueries, "doc_id", "text", "embedding", kEach = 10, rrfK = 60, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    // bootstrap both standing indexes from the first half, stream in the
    // second half; compactEvery = 1 forces a compaction on the append
    val half = corpus.count() / 2
    val (c1, c2) = (corpus.filter(col("doc_id") < half),
      corpus.filter(col("doc_id") >= half))
    val (e1, e2) = (embCorpus.filter(col("doc_id") < half),
      embCorpus.filter(col("doc_id") >= half))
    val bmDir = Files.createTempDirectory("graft-shyb-bm").toString
    val vDir = Files.createTempDirectory("graft-shyb-v").toString
    Retrieval.bm25WriteIndex(c1, "doc_id", "text", bmDir)
    // IVF quantizer must be calibrated on the full id space it will
    // serve; freeze the FULL corpus's stride centroids at bootstrap
    VectorIndex.writeIndexWith(e1, "doc_id", "embedding", vDir,
      Similarity.centroidsOf(
        Similarity.withNorm(embCorpus, "embedding"), "doc_id", 137))
    StreamRetrieval.indexMaintainer(spark, bmDir, "doc_id", "text",
      compactEvery = 1)(c2, 1L)
    StreamVectorIndex.indexMaintainer(spark, vDir, "doc_id", "embedding",
      compactEvery = 1)(e2, 1L)

    val lex = Retrieval.bm25TopKIndexed(spark, bmDir, queries,
      "doc_id", "text", k = 10)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val qvecs = embQueries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
    val semRows = qvecs.toSeq.flatMap { case (qid, qv) =>
      VectorIndex.topKIndexed(spark, vDir, qv, k = 10, nprobe = 10000)
        .select("id").collect().map(_.getLong(0))
        .zipWithIndex.map { case (id, i) => (qid, id, (i + 1).toLong) }
    }
    val sem = semRows.toDF("query_id", "doc_id", "rank")

    val fused = Retrieval.rrfFuse(lex, sem, "query_id", "doc_id",
      rrfK = 60, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(fused == direct,
      s"standing hybrid diverged after append+compaction:\n$fused\nvs\n$direct")
    assert(direct.nonEmpty)
  }
}
