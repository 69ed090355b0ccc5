package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Unigram

/** The retrain decision ([[Retrain.plan]]): rule table on planted
  * frames, and the maintenance loop END TO END — a drifted slice
  * ships unknown symbols, the verdict says warm, the warm start
  * covers them, the re-planned verdict clears. */
class RetrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("verdict rules: cold dominates warm; warm on unks; none when " +
    "covered and compressing; absent unk telemetry reads 0") {
    val fert = Seq(
      ("en", 2100L), // covered, compressing
      ("zz", 2400L), // unks but fertility fine -> warm
      ("yy", 5200L), // fertility past ceiling, no unks -> cold
      ("xx", 5400L), // both fire -> cold dominates
      ("ww", 3000L)) // EXACTLY at the ceiling -> cold (>= boundary)
      .toDF("grp", "pieces_per_word_milli")
    val unks = Seq(("zz", 40L), ("xx", 7L)).toDF("grp", "n_unk")
    val got = Retrain.plan(fert, Some(unks),
        maxPiecesPerWordMilli = 3000L)
      .select("grp", "action", "n_unk")
      .as[(String, String, Long)].collect()
      .map { case (g, a, u) => g -> ((a, u)) }.toMap
    val byGrp = Retrain.plan(fert, Some(unks), 3000L)
      .select("grp", "action").as[(String, String)].collect().toMap
    assert(byGrp == Map("en" -> "none", "zz" -> "warm", "yy" -> "cold",
      "xx" -> "cold", "ww" -> "cold"), s"$byGrp")
    // no unk telemetry: fertility-only verdicts
    val solo = Retrain.plan(fert, None, 3000L)
      .select("grp", "action").as[(String, String)].collect().toMap
    assert(solo == Map("en" -> "none", "zz" -> "none", "yy" -> "cold",
      "xx" -> "cold", "ww" -> "cold"), s"$solo")
    intercept[IllegalArgumentException](Retrain.plan(fert, None, 0L))
    assert(got("en")._2 == 0L) // absent group reads 0, not NULL
  }

  test("the maintenance loop end to end: a drifted slice ships unknown " +
    "symbols -> warm verdict -> warmStart covers them -> verdict clears") {
    val knobs = Unigram.Knobs(maxPieceSyms = 3, minSeedCount = 2L,
      seedSize = 100, emRounds = 1, vocabTarget = 10, postEmRounds = 1)
    val base = Seq((1L, "low lower lowest", "en"),
      (2L, "newest widest lowest", "en"))
      .toDF("doc_id", "text", "lang")
    val model = Unigram.train(base, "text", knobs)

    // the drifted batch: an en slice like before, plus a zz slice
    // whose words carry a symbol outside the training alphabet
    val drifted = Seq((3L, "low newest lowest", "en"),
      (4L, "zünd zündet zünd", "zz"), (5L, "zünd lowest", "zz"))
      .toDF("doc_id", "text", "lang")
    def telemetry(m: Unigram.Model) = {
      val enc = Unigram.encode(drifted, "doc_id", "text", m)
      drifted.join(enc.select("doc_id", "n_unk"), Seq("doc_id"))
        .groupBy(col("lang").as("grp"))
        .agg(sum("n_unk").as("n_unk"))
    }
    val fertDir = java.nio.file.Files
      .createTempDirectory("graft-retrain").toString
    val fert = new graft.streaming.StreamFertility(spark, fertDir)
    fert.init()
    fert.observe(drifted, "doc_id", "text", "lang",
      Unigram.pieceCounts(drifted, "doc_id", "text", model), 0L)
    val verdicts = Retrain.plan(fert.report(), Some(telemetry(model)),
        maxPiecesPerWordMilli = 100000L)
      .select("grp", "action").as[(String, String)].collect().toMap
    assert(verdicts == Map("en" -> "none", "zz" -> "warm"), s"$verdicts")

    // the proportional response: warm start admits the new singles...
    val warm = Unigram.warmStart(drifted, "text", model, knobs,
      warmRounds = 1)
    // ...so the re-encoded slice is covered (no unknown pieces) and
    // the re-planned verdict clears
    val after = Retrain.plan(fert.report(), Some(telemetry(warm)),
        maxPiecesPerWordMilli = 100000L)
      .select("grp", "action").as[(String, String)].collect().toMap
    assert(after == Map("en" -> "none", "zz" -> "none"), s"$after")
    assert(telemetry(warm).agg(sum("n_unk")).head().getLong(0) == 0L)
  }
}
