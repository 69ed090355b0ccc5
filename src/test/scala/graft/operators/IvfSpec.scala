package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** IVF ANN sanity: probed search returns a subset of the brute-force
  * ranking, in order, with reasonable recall on real embeddings. */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ivfTopK results are correctly ranked and overlap brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, k = 10,
      centroidEvery = 50, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ivf.nonEmpty)
    // scores of returned ids must equal the brute-force scores (exact rerank)
    ivf.foreach { case (id, s) =>
      if (brute.contains(id)) assert(brute(id) == s, s"score mismatch for $id") }
    // ranking within the result is descending
    assert(ivf.map(_._2).toSeq == ivf.map(_._2).sortBy(-_).toSeq)
  }

  test("empty centroid subsample fails loud instead of returning empty") {
    import spark.implicits._
    // ids 1..40 with centroidEvery=1000: no id % 1000 == 0 — a sparse id
    // space must not silently produce an empty index/result
    val sparse = (1L to 40L).map(i =>
      (i, Array.fill(4)(i.toFloat))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(sparse, "vec_id", "embedding", 1L, k = 5,
        centroidEvery = 1000)
    }
    assert(e.getMessage.contains("centroid"))
    val tmp = java.nio.file.Files.createTempDirectory("ivf-empty").toString
    intercept[IllegalArgumentException] {
      Similarity.ivfWriteIndex(sparse, "vec_id", "embedding", tmp,
        centroidEvery = 1000)
    }
  }
}
