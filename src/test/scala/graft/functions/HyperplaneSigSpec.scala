package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Similarity

/** The 32-plane SRP signature ([[HyperplaneSig]]) and its banded-pairs
  * consumer: low-byte compatibility with the 8-plane bucket, the
  * pigeonhole candidate-exactness contract, and malformed-row semantics. */
class HyperplaneSigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Similarity.withNorm(
    Tables.embeddings(spark, "/root/testdata/sf0.001"), "embedding")

  test("signature low byte IS the 8-plane HyperplaneBucket, bitwise") {
    HyperplaneSig.ensureRegistered(spark)
    HyperplaneBucket.ensureRegistered(spark)
    val diff = base.select(
      (HyperplaneSig(col("vecd")) % 256).as("lo"),
      HyperplaneBucket(col("vecd")).as("bucket"))
      .filter(col("lo") =!= col("bucket"))
    assert(diff.count() == 0)
  }

  test("matches the composed 32-fold portable form on a corpus sample") {
    HyperplaneSig.ensureRegistered(spark)
    // 32 interpreted HOF folds are slow — a 40-row sample is plenty to
    // pin the arithmetic (every plane constant participates in each row)
    val sample = base.limit(40)
    // portable signature: per plane, the index-ordered fold of
    // plane(i) * v(i), then the bit test
    def planeDot(j: Int) = aggregate(
      sequence(lit(1), size(col("vecd"))).cast("array<int>"),
      lit(0.0),
      (acc, i) => acc +
        (((lit(TextAnalysis.HplaneA(j)) * i.cast("long") + lit(TextAnalysis.HplaneB(j)))
          % TextAnalysis.P).cast("double") / TextAnalysis.P.toDouble - 0.5) *
          element_at(col("vecd"), i))
    val portableSig = (0 until 32).map(j =>
      when(planeDot(j) > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val diff = sample.select(HyperplaneSig(col("vecd")).as("a"),
      portableSig.as("b")).filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("banded pairs: candidates are EXACT within signature-Hamming 3") {
    // recompute signatures, enumerate every pair with Hamming <= 3 and
    // cosine >= threshold: ALL of them must be in the operator's output
    // (pigeonhole: 3 flipped bits cannot touch all 4 bands)
    val minCos = 0.3
    val rows = base.select(col("vec_id"), col("vecd"), col("norm"))
      .withColumn("hsig", HyperplaneSig(col("vecd")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2),
        r.getLong(3)))
    val out = Similarity.hyperplaneSigPairs(
      Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "vec_id", "embedding", minCos)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    var withinRadius = 0
    for {
      i <- rows.indices
      j <- (i + 1) until rows.length
      (ida, va, na, sa) = rows(i)
      (idb, vb, nb, sb) = rows(j)
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } {
      var dot = 0.0
      var p = 0
      while (p < va.length) { dot += va(p) * vb(p); p += 1 }
      val cos = BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (cos >= minCos) {
        withinRadius += 1
        val pair = if (ida < idb) (ida, idb) else (idb, ida)
        assert(out.contains(pair),
          s"pair $pair within Hamming 3 (cos $cos) missing from candidates")
      }
    }
    assert(withinRadius > 0, "fixture produced no within-radius pair — vacuous")
  }

  test("null elements and empty vectors yield signature 0") {
    HyperplaneSig.ensureRegistered(spark)
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), None, Some(2.0))),
      (2L, Seq.empty[Option[Double]])
    ).toDF("id", "vecd")
    val got = df.select(col("id"), HyperplaneSig(col("vecd")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }
}
