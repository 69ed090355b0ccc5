package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Binary-column plumbing: schema, determinism, batch shape. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("featurize emits fixed schema and deterministic features") {
    // fabricate media payloads from document text bytes
    val media = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(20)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("media"))
    val out1 = Multimodal.featurize(media, "media", "media_id", dim = 8)
    assert(out1.schema.fieldNames.toSeq == Seq("media_id", "n_bytes", "features"))
    val rows1 = out1.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getSeq[Float](2))).toMap
    val rows2 = Multimodal.featurize(media, "media", "media_id", dim = 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Float](2))).toMap
    assert(rows1 == rows2) // deterministic
    assert(rows1.values.forall(_._2.length == 8))
    assert(rows1.values.forall(_._1 > 0))
  }

  test("sampleFrames explodes n evenly spaced frame stubs per media row") {
    val media = spark.range(3).select(col("id").as("media_id"))
    val out = Multimodal.sampleFrames(media, "media_id", n = 4).collect()
    assert(out.length == 12)
    val offsets = out.filter(_.getLong(0) == 0L).map(_.getDouble(2)).sorted.toSeq
    assert(offsets == Seq(0.0, 0.25, 0.5, 0.75))
  }
}
