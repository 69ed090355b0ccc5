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

  test("ImageHeader parses PNG/GIF/BMP/JPEG dimensions from raw bytes") {
    // minimal hand-built headers
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R',             // IHDR chunk header
      0, 0, 2, 0,                                  // width 512
      0, 0, 1, 0,                                  // height 256
      8, 6, 0, 0, 0                                // depth 8, rgba
    ).map(_.toByte)
    assert(ImageHeader.parse(png).contains(ImageHeader.ImageMeta("png", 512, 256, 32)))

    val gif = ("GIF89a".getBytes("ASCII") ++ Array[Int](
      0x40, 0x01, // width 320 LE
      0xc8, 0x00, // height 200 LE
      0x70, 0, 0  // packed: color resolution 8
    ).map(_.toByte))
    assert(ImageHeader.parse(gif).contains(ImageHeader.ImageMeta("gif", 320, 200, 8)))

    val bmp = ("BM".getBytes("ASCII") ++ Array.fill(12)(0.toByte) ++ Array[Int](
      40, 0, 0, 0,        // BITMAPINFOHEADER size
      0x80, 0, 0, 0,      // width 128
      0xb0, 0xff, 0xff, 0xff, // height -80 (top-down) -> 80
      1, 0, 24, 0         // planes, bitcount 24
    ).map(_.toByte))
    assert(ImageHeader.parse(bmp).contains(ImageHeader.ImageMeta("bmp", 128, 80, 24)))

    val jpeg = Array[Int](
      0xff, 0xd8,                   // SOI
      0xff, 0xe0, 0x00, 0x04, 0, 0, // APP0 segment, len 4
      0xff, 0xc0, 0x00, 0x11,       // SOF0, len 17
      8,                            // precision
      0x00, 0xf0,                   // height 240
      0x01, 0x40,                   // width 320
      3                             // 3 components
    ).map(_.toByte)
    assert(ImageHeader.parse(jpeg).contains(ImageHeader.ImageMeta("jpeg", 320, 240, 24)))

    // WAV with a junk chunk before fmt (walker must skip it)
    val wav = ("RIFF".getBytes("ASCII") ++ Array[Int](0, 0, 0, 0).map(_.toByte) ++
      "WAVE".getBytes("ASCII") ++
      "junk".getBytes("ASCII") ++ Array[Int](2, 0, 0, 0, 9, 9).map(_.toByte) ++
      "fmt ".getBytes("ASCII") ++ Array[Int](16, 0, 0, 0).map(_.toByte) ++ Array[Int](
        1, 0,             // PCM
        2, 0,             // 2 channels
        0x44, 0xac, 0, 0, // 44100 Hz
        0, 0, 0, 0,       // byte rate (unused)
        4, 0,             // block align (unused)
        16, 0             // 16 bits/sample
      ).map(_.toByte))
    assert(ImageHeader.parse(wav).contains(ImageHeader.ImageMeta("wav", 44100, 2, 16)))

    assert(ImageHeader.parse("not an image at all".getBytes).isEmpty)
    assert(ImageHeader.parse(Array.empty[Byte]).isEmpty)
    assert(ImageHeader.parse(null).isEmpty)
  }

  test("inspectImages emits per-row metadata, nulls for unrecognized bytes") {
    import spark.implicits._
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0, 64, 0, 0, 0, 32, 8, 2, 0, 0, 0).map(_.toByte)
    val media = Seq((1L, png), (2L, "garbage-bytes-here!!".getBytes))
      .toDF("media_id", "media")
    val out = Multimodal.inspectImages(media, "media", "media_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(2) == "png")
    assert(out(1L).getInt(3) == 64 && out(1L).getInt(4) == 32 && out(1L).getInt(5) == 24)
    assert(out(2L).isNullAt(2) && out(2L).isNullAt(3))
    assert(out(2L).getInt(1) == 20)
  }

  test("resize emits fixed dims and deterministic payloads") {
    import spark.implicits._
    val media = Seq((1L, "some moderately long payload standing in for pixels".getBytes),
      (2L, Array.empty[Byte])).toDF("media_id", "media")
    val out = Multimodal.resize(media, "media", "media_id", outW = 4, outH = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Array[Byte]](1).length == 12)
    assert(out(1L).getInt(2) == 4 && out(1L).getInt(3) == 3)
    assert(out(2L).getAs[Array[Byte]](1).length == 12) // empty payload still shapes
    val again = Multimodal.resize(media, "media", "media_id", 4, 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(again(1L) == out(1L).getAs[Array[Byte]](1).toSeq) // deterministic
  }

  test("sampleFrames explodes n evenly spaced frame stubs per media row") {
    val media = spark.range(3).select(col("id").as("media_id"))
    val out = Multimodal.sampleFrames(media, "media_id", n = 4).collect()
    assert(out.length == 12)
    val offsets = out.filter(_.getLong(0) == 0L).map(_.getDouble(2)).sorted.toSeq
    assert(offsets == Seq(0.0, 0.25, 0.5, 0.75))
  }
}
