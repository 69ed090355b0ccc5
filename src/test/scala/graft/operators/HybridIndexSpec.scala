package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The hybrid-retrieval scale claim, executed: [[Retrieval.rrfFuse]] is
  * agnostic to how its legs were produced, so swapping both legs for
  * their MATERIALIZED indexes (the 100 TB shape — bm25 term-bucket
  * index + LSH bucket-partitioned vector index) reproduces the direct
  * operator exactly when the probes are exhaustive (LSH radius 8 ≡
  * brute force, its own spec-pinned contract). */
class HybridIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("indexed hybrid == direct hybrid at exhaustive probes") {
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

    // materialize both indexes
    val bmDir = Files.createTempDirectory("graft-hyb-bm").toString
    val lshDir = Files.createTempDirectory("graft-hyb-lsh").toString
    Retrieval.bm25WriteIndex(corpus, "doc_id", "text", bmDir)
    Similarity.lshWriteIndex(embCorpus, "doc_id", "embedding", lshDir)

    val lex = Retrieval.bm25TopKIndexed(spark, bmDir, queries,
      "doc_id", "text", k = 10)
      .select(col("query_id"), col("doc_id"), col("rank"))
    // semantic leg from the index, one exhaustive probe per query
    val qvecs = embQueries.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toSeq).toMap
    val semRows = qvecs.toSeq.flatMap { case (qid, qv) =>
      Similarity.annTopKIndexed(spark, lshDir, "doc_id", "embedding",
          qv, k = 10, radius = 8)
        .select("doc_id").collect().map(_.getLong(0))
        .zipWithIndex.map { case (id, i) => (qid, id, (i + 1).toLong) }
    }
    val sem = semRows.toDF("query_id", "doc_id", "rank")

    val fused = Retrieval.rrfFuse(lex, sem, "query_id", "doc_id",
      rrfK = 60, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(fused == direct,
      s"indexed hybrid diverged from direct:\n$fused\nvs\n$direct")
    assert(direct.nonEmpty)
  }
}
