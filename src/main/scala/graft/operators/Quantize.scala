package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for vector-store pipelines: symmetric per-vector
  * int8 scalar quantization — the storage-shrink step (4 bytes → 1 byte
  * per dimension) that a 100 TB embedding corpus applies before indexing,
  * with the reconstruction-error audit that decides whether the recall
  * loss is acceptable.
  *
  * Arithmetic discipline (same as [[Similarity]]): every step is an
  * elementwise double expression with an exact DuckDB twin — quantized
  * code q_i = floor(x_i * 127 / scale + 0.5) (explicit half-up floor, NOT
  * engine `round`, whose tie-breaking differs across engines), scale =
  * max |x_i|. All-zero vectors get scale 0 and all-zero codes.
  */
object Quantize {

  private def vecd(c: Column): Column = transform(c, _.cast("double"))

  /** Adds `scale` (double) and `qcode` (array<int>, values in [-127, 127])
    * columns derived from `vecCol`. */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val v = vecd(col(vecCol))
    val scale = array_max(transform(v, x => abs(x)))
    df.withColumn("scale", scale)
      .withColumn("qcode",
        when(col("scale") === 0d,
          transform(v, _ => lit(0).cast("int")))
          .otherwise(transform(v,
            x => floor(x * 127d / col("scale") + 0.5d).cast("int"))))
  }

  /** Reconstruction audit: per vector, the max and mean absolute error of
    * dequantize(quantize(x)) against x. */
  def int8Audit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = int8(df, vecCol)
    val v = vecd(col(vecCol))
    val err = when(col("scale") === 0d, transform(v, x => abs(x)))
      .otherwise(zip_with(v, col("qcode"),
        (x, c) => abs(x - c.cast("double") * col("scale") / 127d)))
    q.select(col(idCol), col("scale"),
      array_max(err).as("max_err"),
      (aggregate(err, lit(0.0), (a, x) => a + x) / size(err)).as("mean_err"))
  }
}
