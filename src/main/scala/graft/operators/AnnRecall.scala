package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@k audit for the approximate ANN paths — the tuning number a
  * deployment actually watches. The repo ships four approximate
  * similarity paths (q32 hyperplane-LSH bucket, q40 IVF, q71 two-level
  * IVF, q84 PQ-ADC); each trades recall for scan volume through its
  * knobs (nprobe, codebook sizes, m). This harness measures every path's
  * recall@k against the BRUTE cosine truth (q30's semantics) over a
  * sampled query set, so nprobe/codebook changes are tuned against a
  * measured number, not a hunch — at 100 TB you run it over a few
  * hundred sampled queries before rolling an index parameter change.
  *
  * Scale shape: the corpus is checkpointed once (one scan feeds every
  * probe); ground truth for ALL queries computes in ONE broadcast
  * [[Similarity.knnJoin]] (corpus never shuffles); each approximate path
  * then runs per query — bounded driver loop over the SAMPLE, each
  * iteration a probe-pruned query, never a corpus sweep. Emitted as a
  * bench sidecar (`ann_recall`) beside the per-query seconds.
  */
object AnnRecall {

  /** One path's aggregate over the query sample. `possible` is the truth
    * set's size (k per query when the corpus has at least k neighbors);
    * `recall` = hits / possible. */
  case class PathRecall(path: String, queries: Int, k: Int,
                        hits: Long, possible: Long, recall: Double)

  /** Audits the four approximate paths at `k` over `queryIds`. Knob
    * defaults mirror the oracle queries' (q32/q40/q71/q84) so the audited
    * configuration IS the benched one. With `includeTrained`, the
    * Lloyd's-trained IVF centroids and PQ codebook (same sizes as their
    * stride twins, so the comparison isolates codebook QUALITY) run as
    * two extra paths — the measured answer to "is training worth it at
    * these knobs". */
  def audit(df: DataFrame, idCol: String, vecCol: String,
            queryIds: Seq[Long], k: Int,
            centroidEvery: Int = 137, nprobe: Int = 2,
            every1: Int = 50, every2: Int = 37,
            nprobe1: Int = 3, nprobe2: Int = 2,
            pqM: Int = 4, pqEvery: Int = 25,
            includeTrained: Boolean = false): Seq[PathRecall] = {
    require(queryIds.nonEmpty, "empty query sample")
    require(k >= 1, "k must be >= 1")
    val corpus = df.localCheckpoint(true) // one scan feeds every probe
    val queries = corpus.filter(col(idCol).isin(queryIds: _*))
    val truth: Map[Long, Set[Long]] =
      Similarity.knnJoin(corpus, queries, idCol, vecCol, k)
        .select(col("qid"), col(idCol))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    def measure(path: String, run: Long => DataFrame): PathRecall = {
      var hits = 0L
      var possible = 0L
      queryIds.foreach { qid =>
        val t = truth.getOrElse(qid, Set.empty)
        possible += t.size
        val got = run(qid).select(col(idCol)).collect()
          .map(_.getLong(0)).toSet
        hits += got.intersect(t).size
      }
      PathRecall(path, queryIds.size, k, hits, possible,
        if (possible == 0) 0d else hits.toDouble / possible)
    }
    val strideTier = Seq(
      measure("lsh", qid =>
        Similarity.annTopK(corpus, idCol, vecCol, qid, k)),
      measure("lsh_mp1", qid =>
        Similarity.annTopKMultiProbe(corpus, idCol, vecCol, qid, k, radius = 1)),
      measure("lsh_mp2", qid =>
        Similarity.annTopKMultiProbe(corpus, idCol, vecCol, qid, k, radius = 2)),
      measure("ivf", qid =>
        Similarity.ivfTopK(corpus, idCol, vecCol, qid, k, centroidEvery, nprobe)),
      measure("two_level", qid =>
        Similarity.ivfTopKTwoLevel(corpus, idCol, vecCol, qid, k,
          every1, every2, nprobe1, nprobe2)),
      measure("pq_adc", qid =>
        Quantize.pqAdcTopK(corpus, idCol, vecCol, qid, k, pqM, pqEvery)),
      measure("pq_adc_rerank", qid =>
        Quantize.pqAdcRerankTopK(corpus, idCol, vecCol, qid, k,
          cand = 5 * k, m = pqM, every = pqEvery)))
    if (!includeTrained) strideTier
    else {
      // trained twins at the SAME codebook sizes as the stride tiers
      val kIvf = corpus.filter(col(idCol) % centroidEvery === 0).count().toInt
      val kPq = corpus.filter(col(idCol) % pqEvery === 0).count().toInt
      val cents = Similarity.trainedCentroids(corpus, idCol, vecCol, kIvf)
        .localCheckpoint(true)
      val (pk, psub, pflat) =
        Quantize.pqCodebookTrained(corpus, idCol, vecCol, pqM, kPq)
      // distributed whole-corpus training at the same stride (so codebook
      // size matches the stride and sample-trained tiers exactly)
      val dcents = Quantize.kmeansTrain(corpus, idCol, vecCol,
        every = centroidEvery, iters = 10).localCheckpoint(true)
      strideTier ++ Seq(
        measure("ivf_trained", qid =>
          Similarity.ivfTopKCents(corpus, idCol, vecCol, cents, qid, k, nprobe)),
        measure("ivf_dtrained", qid =>
          Similarity.ivfTopKCents(corpus, idCol, vecCol, dcents, qid, k, nprobe)),
        measure("pq_adc_trained", qid =>
          Quantize.pqAdcTopKWith(corpus, idCol, vecCol, qid, k, pqM, pk, psub, pflat)),
        measure("pq_adc_trained_rerank", qid =>
          Quantize.pqAdcRerankTopKWith(corpus, idCol, vecCol, qid, k,
            cand = 5 * k, m = pqM, k = pk, subDim = psub, flat = pflat)))
    }
  }
}
