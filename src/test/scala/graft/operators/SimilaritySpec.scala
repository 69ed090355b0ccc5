package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cosine top-k, k-NN join and LSH ANN on vectors with known geometry. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 0 aligned with 1, orthogonal to 2, opposite to 3; 4 diagonal
  private val vecs = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(2f, 0f, 0f, 0f)),
    (2L, Seq(0f, 1f, 0f, 0f)),
    (3L, Seq(-1f, 0f, 0f, 0f)),
    (4L, Seq(1f, 1f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("cosineTopK ranks by cosine with id tie-break") {
    val out = Similarity.cosineTopK(vecs, "vec_id", "embedding", 0L, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq == Seq(1L, 4L, 2L, 3L))
    assert(out.head._2 == 1.0)
    assert(out.last._2 == -1.0)
  }

  test("knnJoin returns per-query ranked neighbors") {
    val out = Similarity.knnJoin(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
    assert(out.sortBy(_._2).map(_._3).toSeq == Seq(1L, 4L))
  }

  test("annTopK candidates share the query bucket; identical direction always matches") {
    val out = Similarity.annTopK(vecs, "vec_id", "embedding", 0L, 4)
      .collect().map(_.getLong(0)).toSet
    assert(out.contains(1L)) // same direction ⇒ same hyperplane signs ⇒ same bucket
    assert(!out.contains(3L)) // opposite direction ⇒ all signs flip ⇒ different bucket
  }

  test("plan: the LSH bucket fold evaluates ONCE per corpus row — no " +
    "hyperplane_bucket inside a Filter condition") {
    // the bucket equi-join / probe isin used to infer isnotnull(bucket)
    // and substitute the 8-plane fold below the projection (2x per
    // row); the pinned alias keeps the filter on the attribute
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    for (df <- Seq(
      Similarity.annTopK(emb, "vec_id", "embedding", queryId = 0L, k = 5),
      Similarity.annTopKMultiProbe(emb, "vec_id", "embedding",
        queryId = 0L, k = 5, radius = 1),
      Similarity.annTopKMultiProbeBatch(emb,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5))) {
      val bad = df.queryExecution.optimizedPlan.toString.linesIterator
        .filter(l => l.trim.stripPrefix("+- ").stripPrefix(":- ")
          .startsWith("Filter ") && l.contains("hyperplane_bucket"))
        .toSeq
      assert(bad.isEmpty, s"bucket fold duplicated into a filter:\n$bad")
    }
  }

  test("multi-probe LSH: radius 0 is single-probe, radius 8 is brute force") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // radius 0 probes exactly the query bucket — bitwise annTopK
    val r0 = Similarity.annTopKMultiProbe(emb, "vec_id", "embedding", 0L, 5,
      radius = 0).collect().map(_.toSeq).toSeq
    val single = Similarity.annTopK(emb, "vec_id", "embedding", 0L, 5)
      .collect().map(_.toSeq).toSeq
    assert(r0 == single)
    // radius 8 probes all 256 buckets — the exact cosine top-k
    val r8 = Similarity.annTopKMultiProbe(emb, "vec_id", "embedding", 0L, 5,
      radius = 8).collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(r8 == brute)
    // radius 1 candidates are a superset of radius 0's — recall can only rise
    val r1 = Similarity.annTopKMultiProbe(emb, "vec_id", "embedding", 0L, 5,
      radius = 1).collect().map(_.getLong(0)).toSet
    assert(r1.size >= r0.size)
  }

  test("hardNegatives: no same-label row ever ranks; equals knnJoin over " +
    "the pre-filtered corpus") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val out = Similarity.hardNegatives(emb, queries, "vec_id", "embedding",
      "label", k = 5)
      .select("qid", "rank", "vec_id", "cos_r").collect()
    assert(out.nonEmpty)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    out.foreach { r =>
      assert(labels(r.getLong(0)) != labels(r.getLong(2)),
        s"same-label negative ${r.getLong(2)} for query ${r.getLong(0)}")
    }
    // parity: per query, mining == knnJoin over the corpus with that
    // query's label removed (the per-query filter composed differently)
    val qids = queries.select("vec_id").collect().map(_.getLong(0))
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = qids.flatMap { qid =>
      Similarity.knnJoin(emb.filter(col("label") =!= labels(qid)),
          queries.filter(col("vec_id") === qid), "vec_id", "embedding", 5)
        .select("qid", "rank", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(got == want)
  }
}
