package graft.streaming

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Mixing

/** Frozen-book streaming DSIR ([[StreamDsir]]): exact parity with the
  * batch scorer over the seed corpus, weight STABILITY (the same
  * document scores identically in any batch, any order — the frozen
  * contract), and statelessness (replays bit-identical by purity). */
class StreamDsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private def target = docs.filter(col("lang") === "en")

  private def wmap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("scoring the seed corpus through the binder equals the batch " +
    "operator exactly") {
    val score = StreamDsir.scorer(docs, target, "doc_id", "text")
    val streamed = wmap(score(docs))
    val batch = wmap(Mixing.dsirWeights(docs, "doc_id", "text",
      target, "text"))
    assert(streamed == batch, "frozen-book scorer diverged from batch DSIR")
  }

  test("frozen contract: a document's weight is identical in any batch, " +
    "any arrival order, any company") {
    val score = StreamDsir.scorer(docs, target, "doc_id", "text")
    val whole = wmap(score(docs))
    // slice the corpus three ways and score the slices independently
    val slices = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    val together = slices.map(s => wmap(score(s))).reduce(_ ++ _)
    assert(together == whole,
      "a document's weight changed with its batch company — books not frozen")
    // reversed arrival (descending slices) changes nothing either
    val reversed = slices.reverse.map(s => wmap(score(s))).reduce(_ ++ _)
    assert(reversed == whole, "arrival order leaked into frozen-book weights")
  }

  test("frozen-rate sampler: a batch equal to the seed keeps EXACTLY the " +
    "batch operator's set; slices keep the same rows as the whole; " +
    "replay is identity") {
    val sample = StreamDsir.sampler(docs, target, "doc_id", "text",
      budgetPerSeed = 15L)
    def kept(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val whole = kept(sample(docs))
    val batch = kept(Mixing.dsirRateMix(docs, "doc_id", "text", target,
      "text", budget = 15L))
    assert(whole == batch,
      "frozen-rate sampler diverged from the batch sampler on the seed")
    assert(whole.nonEmpty)
    // slicing invariance: the same rows survive regardless of batching
    val slices = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    val together = slices.map(s => kept(sample(s))).reduce(_ ++ _)
    assert(together == whole,
      "a document's sampling decision changed with its batch company")
    // replay: pure filter, identical rows
    assert(kept(sample(docs)) == whole)
  }
}
