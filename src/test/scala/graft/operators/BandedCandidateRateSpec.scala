package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Candidate-volume pins for the banded signature tiers (the round-8
  * scale finding): with 64-bit signatures banded 4×16, a RANDOM corpus
  * must admit ~4·C(n,2)·2⁻¹⁶ candidate pairs — a ~256× cut from the old
  * 4×8-bit banding's ~4·C(n,2)·2⁻⁸ ≈ n²/128, which was a quadratic
  * wall-clock term at corpus scale. Each tier is run with its verify
  * threshold wide open, so the (deterministic) output count IS the
  * distinct candidate count. */
class BandedCandidateRateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 2000
  // pairs admitted by >=1 of 4 independent 16-bit bands, then the
  // loose factor covers banding non-uniformities; the old 8-bit tier
  // admits ~256x this expectation, far past the ceiling either way
  private val expected = 4.0 * N * (N - 1) / 2 * math.pow(2, -16)

  test("hyperplaneSigPairs: random vectors admit ~4·C(n,2)/2^16 candidates") {
    val rng = new scala.util.Random(7)
    val corpus = Seq.tabulate(N)(i =>
      (i.toLong, Array.fill(32)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    // minCos = -1 admits every verified candidate: the count below is the
    // band join's distinct candidate volume, nothing filtered
    val got = Similarity.hyperplaneSigPairs(corpus, "vec_id", "embedding",
      minCos = -1.0).count()
    assert(got <= expected * 8,
      s"candidate volume $got is past 8x the 16-bit-band expectation " +
        s"$expected — banding regressed toward the old quadratic regime")
    assert(got > 0, "no candidates at all — banding is vacuously narrow")
  }

  test("simhashPairs: random documents admit ~4·C(n,2)/2^16 candidates") {
    val rng = new scala.util.Random(11)
    def tok() = Seq.fill(6)(('a' + rng.nextInt(26)).toChar).mkString
    val docs = Seq.tabulate(N)(i =>
      (i.toLong, Seq.fill(30)(tok()).mkString(" ")))
      .toDF("doc_id", "text")
    // maxHamming = 64 admits every candidate pair
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 64).count()
    assert(got <= expected * 8,
      s"candidate volume $got is past 8x the 16-bit-band expectation " +
        s"$expected — banding regressed toward the old quadratic regime")
    assert(got > 0, "no candidates at all — banding is vacuously narrow")
  }

  test("minhashPairs pileup: 10^4 copies of one page emit m-1 star " +
    "edges, not the C(m,2) bucket clique") {
    val m = 10000
    val page = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa"
    val docs = ((0 until m).map(i => (i.toLong, page)) :+
      ((500000L, "zulu yankee xray whiskey victor uniform tango sierra " +
        "romeo quebec papa oscar november mike lima kilo")))
      .toDF("doc_id", "text").repartition(16)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      thresholdMilli = 500).localCheckpoint(true)
    // identical texts: every star edge verifies at jaccard 1.0; the
    // distinct page never pairs
    assert(pairs.count() == m - 1,
      s"want ${m - 1} verified star edges, got ${pairs.count()}")
    import org.apache.spark.sql.functions.col
    assert(pairs.filter(col("id_a") =!= 0L).isEmpty,
      "every edge must route through the min-id representative")
    assert(pairs.filter(col("jaccard") < 1.0).isEmpty)
  }

  test("hyperplaneSigPairs pileup: 10^4 identical embeddings emit m-1 " +
    "star edges through the representative") {
    val m = 10000
    val rng = new scala.util.Random(3)
    val v = Array.fill(32)(rng.nextGaussian().toFloat)
    val other = Array.fill(32)(rng.nextGaussian().toFloat)
    val corpus = ((0 until m).map(i => (i.toLong, v)) :+
      ((500000L, other))).toDF("vec_id", "embedding").repartition(16)
    val pairs = Similarity.hyperplaneSigPairs(corpus, "vec_id",
      "embedding", minCos = 0.99).localCheckpoint(true)
    import org.apache.spark.sql.functions.col
    assert(pairs.count() == m - 1,
      s"want ${m - 1} verified star edges, got ${pairs.count()}")
    assert(pairs.filter(col("id_a") =!= 0L).isEmpty,
      "every edge must route through the min-id representative")
  }
}
