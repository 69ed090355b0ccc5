package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Bpe, Unigram}

/** Streaming fertility ([[StreamFertility]]): the cumulative report
  * after N batches equals the batch operator over the union bit for
  * bit (BPE and unigram counts both), replays fold nothing twice,
  * retraction yields the survivors' report, over-retraction fails
  * loud. */
class StreamFertilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDocs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "lang", "text")

  private val b1 = mkDocs(
    (1L, "en", "the quick brown fox jumps over the lazy dog"),
    (2L, "en", "pack my box with five dozen liquor jugs"),
    (3L, "zz", "世界 算法 世界 分词"))
  private val b2 = mkDocs(
    (4L, "en", "the five boxing wizards jump quickly today"),
    (5L, "zz", "算法 分词 统一 世界"))

  private def sorted(df: DataFrame) =
    df.orderBy("lang")
      .select("lang", "n_docs", "n_words", "n_pieces", "n_chars",
        "pieces_per_kchar", "pieces_per_word_milli")
      .collect().toSeq

  test("N batches equal the batch fertility over the union (BPE " +
    "counts); replay folds nothing; retraction leaves the survivors") {
    val union = b1.unionAll(b2)
    val merges = Bpe.train(union, "text", numMerges = 20)
    def counts(batch: DataFrame) =
      Bpe.pieceCounts(batch, "doc_id", "text", merges)
    val f = new StreamFertility(spark,
      Files.createTempDirectory("graft-sfert").toString, compactEvery = 2)
    f.init()
    f.observe(b1, "doc_id", "text", "lang", counts(b1), 0L)
    f.observe(b2, "doc_id", "text", "lang", counts(b2), 1L)
    val want = sorted(Bpe.fertility(union, "doc_id", "text", "lang",
      merges))
    assert(sorted(f.report().withColumnRenamed("grp", "lang")) == want)
    // crash-replay of batch 1: nothing folds twice
    f.observe(b1, "doc_id", "text", "lang", counts(b1), 0L)
    assert(sorted(f.report().withColumnRenamed("grp", "lang")) == want)
    // the deletion event: docs 3 and 4 retracted -> survivors' report
    val dead = union.filter(col("doc_id").isin(3L, 4L))
    f.retract(dead, "doc_id", "text", "lang", counts(dead), "r7")
    val survivors = union.filter(!col("doc_id").isin(3L, 4L))
    assert(sorted(f.report().withColumnRenamed("grp", "lang"))
      == sorted(Bpe.fertility(survivors, "doc_id", "text", "lang", merges)))
    // replayed retraction folds nothing twice
    f.retract(dead, "doc_id", "text", "lang", counts(dead), "r7")
    assert(sorted(f.report().withColumnRenamed("grp", "lang"))
      == sorted(Bpe.fertility(survivors, "doc_id", "text", "lang", merges)))
  }

  test("unigram counts flow through the same seam; over-retraction " +
    "fails loud") {
    val model = Unigram.trainFromVocab(
      Seq(("the", 9L), ("quick", 4L), ("世界", 5L), ("算法", 3L)),
      Unigram.Knobs(maxPieceSyms = 3, minSeedCount = 2L, seedSize = 50,
        emRounds = 1, vocabTarget = 8, postEmRounds = 1))
    def counts(batch: DataFrame) =
      Unigram.pieceCounts(batch, "doc_id", "text", model)
    val f = new StreamFertility(spark,
      Files.createTempDirectory("graft-sfert2").toString)
    f.init()
    f.observe(b1, "doc_id", "text", "lang", counts(b1), 0L)
    assert(sorted(f.report().withColumnRenamed("grp", "lang"))
      == sorted(Unigram.fertility(b1, "doc_id", "text", "lang", model)))
    // retract MORE than observed for zz -> loud at the next report
    val phantom = mkDocs((99L, "zz", "世界 世界 世界 算法 算法 分词 统一"))
    f.retract(phantom, "doc_id", "text", "lang", counts(phantom), "r9")
    val e = intercept[IllegalArgumentException](f.report())
    assert(e.getMessage.contains("negative total"))
  }
}
