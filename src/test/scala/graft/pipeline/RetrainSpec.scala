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

  test("execute runs the verdicts end to end: none untouched, warm " +
    "grows the drifted multi, receipts clear, the re-planned verdict " +
    "is none, and the card restamps under the artifacts now in force") {
    val knobs = Unigram.Knobs(maxPieceSyms = 3, minSeedCount = 2L,
      seedSize = 100, emRounds = 1, vocabTarget = 10, postEmRounds = 1)
    val base = Seq((1L, "low lower lowest", "en"),
      (2L, "newest widest lowest", "en"))
      .toDF("doc_id", "text", "lang")
    val model = Unigram.train(base, "text", knobs)

    val corpus = Seq((3L, "low newest lowest", "en"),
      (4L, "zünd zündet zünd", "zz"), (5L, "zünd zünden lowest", "zz"))
      .toDF("doc_id", "text", "lang")
    def unkOf(grp: String, m: Unigram.Model): Long =
      Unigram.encode(corpus.filter(col("lang") === grp), "doc_id",
          "text", m)
        .agg(coalesce(sum("n_unk"), lit(0L))).head().getLong(0)
    val fertDir = java.nio.file.Files
      .createTempDirectory("graft-retrain2").toString
    val fert = new graft.streaming.StreamFertility(spark, fertDir)
    fert.init()
    fert.observe(corpus, "doc_id", "text", "lang",
      Unigram.pieceCounts(corpus, "doc_id", "text", model), 0L)
    val tel = Seq(("en", unkOf("en", model)), ("zz", unkOf("zz", model)))
      .toDF("grp", "n_unk")
    val plan1 = Retrain.plan(fert.report(), Some(tel),
      maxPiecesPerWordMilli = 100000L)
    assert(plan1.select("grp", "action").as[(String, String)]
      .collect().toMap == Map("en" -> "none", "zz" -> "warm"))

    // EXECUTE: en untouched (same model OBJECT, no re-measure), zz
    // retrained warm with a cleared receipt and a grown composed piece
    val executed = Retrain.execute(plan1, corpus, "doc_id", "text",
      "lang", model, knobs)
    val byGrp = executed.map(e => e.grp -> e).toMap
    assert(byGrp("en").action == "none" && (byGrp("en").model eq model)
      && byGrp("en").nDocs == -1L && byGrp("en").nUnkAfter == -1L)
    val zz = byGrp("zz")
    assert(zz.action == "warm" && zz.nDocs == 2L && zz.nUnkAfter == 0L,
      s"$zz")
    assert(zz.model.pieces.exists(p =>
      Unigram.symLen(p) > 1 && p.contains("ü")),
      s"warm+ grew no composed piece: ${zz.model.pieces}")
    // denomination moved for the retrained group, stayed for none —
    // shards stamped with the retired hash now fail loud at load
    assert(byGrp("en").modelHash == Unigram.modelHash(model))
    assert(zz.modelHash != Unigram.modelHash(model))
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft-retrain-shard").toString
    graft.store.Denomination.stamp(shardDir, "unigram",
      Unigram.modelHash(model))
    val retired = intercept[IllegalArgumentException] {
      graft.store.Denomination.require(shardDir, "unigram", zz.modelHash)
    }
    assert(retired.getMessage.contains("retrained"))
    // growOnWarm=false drops to the plain warm start: covered (unk 0)
    // but no new multi
    val plain = Retrain.execute(plan1, corpus, "doc_id", "text", "lang",
      model, knobs, growOnWarm = false).map(e => e.grp -> e).toMap
    assert(plain("zz").nUnkAfter == 0L && !plain("zz").model.pieces
      .exists(p => Unigram.symLen(p) > 1 && p.contains("ü")))

    // the loop closes: telemetry under the executed artifacts reads 0
    // and the re-planned verdict is none for every group
    val tel2 = Seq(("en", unkOf("en", byGrp("en").model)),
      ("zz", unkOf("zz", zz.model))).toDF("grp", "n_unk")
    assert(tel2.agg(sum("n_unk")).head().getLong(0) == 0L)
    assert(Retrain.plan(fert.report(), Some(tel2), 100000L)
      .select("grp", "action").as[(String, String)].collect().toMap
      == Map("en" -> "none", "zz" -> "none"))

    // the card restamps under the artifacts NOW in force: totals over
    // the whole corpus per group, drift telemetry cleared, shape
    // totalled over the two DISTINCT artifacts (en shares prev, zz
    // froze its own)
    val card0 = DataCard.Card(3L, 0L, 0L, Map.empty, Map.empty,
      0L, 0L, 0L, 0L, 0L, 0L)
    val card = Retrain.restampTokenizer(card0, corpus, "doc_id", "text",
      "lang", executed)
    val t = card.tokenizer.get
    assert(t.nUnkPieces == 0L && t.nBpeTokens > 0L)
    assert(t.vocabSize ==
      model.vocab().size.toLong + zz.model.vocab().size.toLong, s"$t")

    // a COLD verdict runs the full retrain over the slice
    val cold = Retrain.execute(Seq(("zz", "cold")).toDF("grp", "action"),
      corpus, "doc_id", "text", "lang", model, knobs)
    assert(cold.head.action == "cold" && cold.head.nUnkAfter == 0L &&
      cold.head.model.pieces.exists(p =>
        Unigram.symLen(p) > 1 && p.contains("ü")))

    // fail-louds: a verdict over a slice that no longer exists is a
    // STALE PLAN; duplicate groups; unknown actions; an empty plan; a
    // restamp that cannot name a slice's tokenizer
    val stale = intercept[IllegalArgumentException](Retrain.execute(
      Seq(("qq", "warm")).toDF("grp", "action"), corpus, "doc_id",
      "text", "lang", model, knobs))
    assert(stale.getMessage.contains("qq"), stale.getMessage)
    val dup = intercept[IllegalArgumentException](Retrain.execute(
      Seq(("zz", "warm"), ("zz", "cold")).toDF("grp", "action"), corpus,
      "doc_id", "text", "lang", model, knobs))
    assert(dup.getMessage.contains("more than once"), dup.getMessage)
    val unk = intercept[IllegalArgumentException](Retrain.execute(
      Seq(("zz", "purple")).toDF("grp", "action"), corpus, "doc_id",
      "text", "lang", model, knobs))
    assert(unk.getMessage.contains("unknown retrain action"))
    intercept[IllegalArgumentException](Retrain.execute(
      Seq.empty[(String, String)].toDF("grp", "action"), corpus,
      "doc_id", "text", "lang", model, knobs))
    val uncov = intercept[IllegalArgumentException](
      Retrain.restampTokenizer(card0, corpus, "doc_id", "text", "lang",
        executed.filter(_.grp == "en")))
    assert(uncov.getMessage.contains("zz"), uncov.getMessage)
  }
}
