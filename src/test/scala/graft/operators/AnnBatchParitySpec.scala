package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The batch ANN operators are EXACT twins of their single-query
  * operators: same probe enumeration, same rounded-cosine ranking, same
  * (score, id) tie-break — pinned here path by path on the real fixture,
  * so [[AnnRecall]]'s batched audit measures the same numbers the
  * per-query loop measured (round-9 sidecar continuity), and a
  * deployment can serve a query TABLE from one plan with single-query
  * semantics. */
class AnnBatchParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def emb = Tables.embeddings(spark, dir)
  private val qids = Seq(40L, 100L, 200L, 300L, 400L, 499L)
  private def queries = emb.filter(col("vec_id").isin(qids: _*))

  /** (qid -> ordered ids) from a batch result. */
  private def batchMap(res: DataFrame): Map[Long, Seq[Long]] =
    res.select(col("qid").cast("long"), col("vec_id"), col("rank"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }

  /** (qid -> ordered ids) from running the single-query op per qid. */
  private def loopMap(run: Long => DataFrame): Map[Long, Seq[Long]] =
    qids.map(q =>
      q -> run(q).select("vec_id").collect().map(_.getLong(0)).toSeq).toMap

  private def assertParity(name: String, batch: Map[Long, Seq[Long]],
                           loop: Map[Long, Seq[Long]]): Unit =
    qids.foreach { q =>
      assert(batch.getOrElse(q, Nil) == loop.getOrElse(q, Nil),
        s"$name: batch/per-query divergence at qid=$q: " +
          s"batch=${batch.getOrElse(q, Nil)} loop=${loop.getOrElse(q, Nil)}")
    }

  test("multi-probe LSH batch == per-query, radius 0/1/2 (ordered)") {
    for (r <- 0 to 2) {
      val b = batchMap(Similarity.annTopKMultiProbeBatch(
        emb, queries, "vec_id", "embedding", k = 10, radius = r))
      val l = loopMap(q => Similarity.annTopKMultiProbe(
        emb, "vec_id", "embedding", q, k = 10, radius = r))
      assertParity(s"lsh_mp$r", b, l)
    }
  }

  test("IVF batch == per-query at the oracle knobs AND a full probe") {
    for (np <- Seq(2, 4)) {
      val b = batchMap(Similarity.ivfTopKBatch(
        emb, queries, "vec_id", "embedding", k = 10,
        centroidEvery = 137, nprobe = np))
      val l = loopMap(q => Similarity.ivfTopK(
        emb, "vec_id", "embedding", q, k = 10,
        centroidEvery = 137, nprobe = np))
      assertParity(s"ivf(nprobe=$np)", b, l)
    }
  }

  test("IVF batch == per-query on a TRAINED centroid table") {
    val kIvf = emb.filter(col("vec_id") % 137 === 0).count().toInt
    val cents = Similarity.trainedCentroids(emb, "vec_id", "embedding", kIvf)
      .localCheckpoint(true)
    val b = batchMap(Similarity.ivfTopKCentsBatch(
      emb, queries, "vec_id", "embedding", cents, k = 10, nprobe = 2))
    val l = loopMap(q => Similarity.ivfTopKCents(
      emb, "vec_id", "embedding", cents, q, k = 10, nprobe = 2))
    assertParity("ivf_trained", b, l)
  }

  test("two-level IVF batch == per-query") {
    val b = batchMap(Similarity.ivfTopKTwoLevelBatch(
      emb, queries, "vec_id", "embedding", k = 10,
      every1 = 50, every2 = 37, nprobe1 = 3, nprobe2 = 2))
    val l = loopMap(q => Similarity.ivfTopKTwoLevel(
      emb, "vec_id", "embedding", q, k = 10,
      every1 = 50, every2 = 37, nprobe1 = 3, nprobe2 = 2))
    assertParity("two_level", b, l)
  }

  test("PQ-ADC batch == per-query; rerank batch == per-query") {
    val (pk, psub, pflat) = Quantize.pqCodebook(
      emb, "vec_id", "embedding", m = 4, every = 25)
    val b = batchMap(Quantize.pqAdcTopKBatchWith(
      emb, queries, "vec_id", "embedding", kNN = 10, m = 4,
      k = pk, subDim = psub, flat = pflat))
    val l = loopMap(q => Quantize.pqAdcTopKWith(
      emb, "vec_id", "embedding", q, kNN = 10, m = 4,
      k = pk, subDim = psub, flat = pflat))
    assertParity("pq_adc", b, l)
    val br = batchMap(Quantize.pqAdcRerankTopKBatchWith(
      emb, queries, "vec_id", "embedding", kNN = 10, cand = 50, m = 4,
      k = pk, subDim = psub, flat = pflat))
    val lr = loopMap(q => Quantize.pqAdcRerankTopKWith(
      emb, "vec_id", "embedding", q, kNN = 10, cand = 50, m = 4,
      k = pk, subDim = psub, flat = pflat))
    assertParity("pq_adc_rerank", br, lr)
  }

  test("batch plans scan the corpus once: no per-query jobs, corpus side " +
    "never shuffles for candidate generation") {
    val res = Similarity.ivfTopKBatch(emb, queries, "vec_id", "embedding",
      k = 10, centroidEvery = 137, nprobe = 2)
    val p = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // candidates reach the window through broadcast joins; the only
    // shuffle is the qid-partitioned top-k window (+AQE bookkeeping)
    assert(graft.PlanChecks.shuffleExchanges(p) <= 2,
      s"batch IVF shuffles the corpus:\n$p")
    assert(p.contains("BroadcastExchange"), "probe side should broadcast")
  }
}
