package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives a deterministic fake feature vector
  * from the bytes. Everything around it — schema, partition-batched
  * execution, output shape — is the real scale path: at 100 TB you
  * repartition so each task holds a codec-friendly batch, decode inside
  * `mapPartitions` (one codec init per task, not per row), and emit fixed
  * metadata + feature columns.
  */
object Multimodal {

  /** Canonical media schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** STUB — stands in for a real image decode (e.g. JPEG → RGB planes).
    * Deterministic: a rolling byte hash seeds `dim` pseudo-features. A real
    * deployment swaps only this function; the Spark plumbing is unchanged. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    bytes.foreach { b => h = h * 31 + (b & 0xff) }
    Array.tabulate(dim) { i =>
      val v = h * (i + 1) + 0x9e3779b97f4a7c15L * i
      ((v >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  /** Decode + featurize via per-partition batches (the `mapInPandas`
    * analog): one decoder init per partition, rows processed as an
    * iterator, output schema fixed up-front. */
  def featurize(df: DataFrame, bytesCol: String, idCol: String,
                dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val rdd = df.select(col(idCol), col(bytesCol)).rdd.mapPartitions { rows =>
      // decoder/codec init would happen HERE, once per task
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), bytes.length, decodeStub(bytes, dim).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Header inspection: REAL (non-stub) metadata extraction — container
    * format, dimensions and bit depth parsed from the leading bytes by
    * [[ImageHeader]], per-partition like [[featurize]]. Unrecognized
    * payloads yield nulls rather than dropping rows (a 100 TB crawl always
    * contains garbage; filtering is the caller's policy decision). */
  def inspectImages(df: DataFrame, bytesCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("bit_depth", IntegerType)))
    val rdd = df.select(col(idCol), col(bytesCol)).rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        ImageHeader.parse(bytes) match {
          case Some(m) => Row(r.getLong(0), bytes.length, m.format, m.width, m.height, m.bitDepth)
          case None    => Row(r.getLong(0), if (bytes == null) 0 else bytes.length,
                              null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB — stands in for a real pixel resize. Deterministic: samples
    * `outW*outH` bytes from the payload on a fixed stride. A real
    * deployment swaps only this function. */
  def resizeStub(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val n = outW * outH
    val out = new Array[Byte](n)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < n) {
        out(i) = bytes((i.toLong * bytes.length / n).toInt)
        i += 1
      }
    }
    out
  }

  /** Resize pipeline shape: per-partition batched transform emitting the
    * resized payload plus its new dimensions — downstream schema is fixed
    * up-front like [[featurize]], so the stub swap is codec-only. */
  def resize(df: DataFrame, bytesCol: String, idCol: String,
             outW: Int, outH: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val rdd = df.select(col(idCol), col(bytesCol)).rdd.mapPartitions { rows =>
      // codec init once per task, as in featurize
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), resizeStub(bytes, outW, outH), outW, outH)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling shape: explode a media row into n evenly-spaced frame
    * stubs (id, frame_no, offset_ratio) — the plumbing for video pipelines. */
  def sampleFrames(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("media_id"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_no"))
      .withColumn("offset_ratio", col("frame_no").cast("double") / n)
}
