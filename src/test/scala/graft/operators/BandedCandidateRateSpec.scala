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
}
