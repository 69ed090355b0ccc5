package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the piece of the
  * 100 TB story that lives in the FILES, not the plan: min/max footer
  * statistics only skip data when values are clustered, and a linear
  * sort clusters exactly one dimension. Z-ordering (Morton interleave)
  * spreads locality across two dimensions, so range predicates on
  * EITHER column touch a bounded fraction of files.
  *
  * Everything is built from Spark primitives in the shape a cluster
  * needs: one bounded min/max aggregate to calibrate the value→bucket
  * scaling, an in-scan codegen'd interleave expression (pure bit
  * arithmetic — no UDF), `repartitionByRange` on the z-value (sampled
  * range boundaries → equal-size files without a global sort), and
  * `sortWithinPartitions` so row groups inside each file are clustered
  * too. The layout cost is one shuffle of the written data — the same
  * price as any clustered write.
  *
  * Equi-width bucketing (min/max scaling) is deliberate: it is
  * deterministic and needs one cheap aggregate. Heavily skewed columns
  * want equi-depth buckets (approxQuantile boundaries) — same interleave
  * downstream; the calibration aggregate is the only thing that changes.
  *
  * Skip-ability is a property of the FILES, so [[fileStats]] measures it
  * directly (per-file min/max of each dimension — exactly what a parquet
  * reader's footer pruning consults), and LayoutSpec pins the contract:
  * a range predicate on either z-ordered dimension overlaps a bounded
  * fraction of files, where the single-dim-sorted baseline degrades to
  * touching every file on the second dimension.
  */
object Layout {

  /** Morton-interleave two bucket ids (each in [0, 2^bits)) into one
    * z-value: bit i of `a` lands at bit 2i, bit i of `b` at 2i+1.
    * Pure long arithmetic — codegen keeps it in-scan. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** N-dimensional Morton interleave: bit i of dimension j lands at bit
    * i·N + j. The locality budget is SHARED: with F files, each of the
    * N dims gets roughly the pruning a single-dim layout with F^(1/N)
    * files would give — two or three dims is the practical sweet spot;
    * past that, partition on the extra columns instead (SCALE.md). */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "need at least 2 dimensions")
    require(bits >= 1 && n * bits <= 63,
      s"$n dims x $bits bits exceeds the 63-bit z budget")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ + _)
  }

  /** Equi-width bucket of `c` into [0, 2^bits) given the column's
    * [lo, hi] range (constant column when hi == lo). */
  private def bucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = (1L << bits) - 1L
    if (hi <= lo) lit(0L)
    else least(lit(n), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * n).cast("long")))
  }

  /** Write `df` z-ordered on (colA, colB) into `nFiles` range partitions
    * under `outDir`. One calibration aggregate + one range shuffle. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    outDir: String, nFiles: Int, bits: Int = 16): Unit =
    writeZOrderedN(df, Seq(colA, colB), outDir, nFiles, bits)

  /** [[writeZOrdered]] over N dimensions (see [[zValueN]] for the shared
    * locality budget). */
  def writeZOrderedN(df: DataFrame, colNames: Seq[String], outDir: String,
                     nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles >= 1, "nFiles must be >= 1")
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    // fail loud (repo policy) instead of an opaque NPE: min/max come back
    // NULL when the input is empty or a dimension is all-null
    colNames.zipWithIndex.foreach { case (c, j) =>
      require(!r.isNullAt(2 * j) && !r.isNullAt(2 * j + 1),
        s"z-order calibration found no values for dimension '$c' " +
          "(empty input or all-null column) — nothing to lay out")
    }
    val z = zValueN(colNames.zipWithIndex.map { case (c, j) =>
      bucket(col(c), r.getDouble(2 * j), r.getDouble(2 * j + 1), bits)
    }, bits)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** EQUI-DEPTH calibration for skewed dimensions: bucket boundaries are
    * approxQuantile cuts (driver-bounded: 2^bits − 1 doubles), so every
    * bucket holds ~equal row mass wherever the values pile up — the
    * equi-width scaler collapses a heavy-tailed dimension into a handful
    * of buckets and the interleave loses that dimension's locality.
    * Bucket lookup is a fold over the broadcast boundary array (count of
    * boundaries ≤ value — 2^bits comparisons per row, which is why
    * `bits` defaults to 8 here, 256 buckets: plenty for file-level
    * pruning, cheap per row). The interleave itself is [[zValue]],
    * unchanged. */
  def writeZOrderedByQuantile(df: DataFrame, colA: String, colB: String,
                              outDir: String, nFiles: Int,
                              bits: Int = 8): Unit = {
    require(nFiles >= 1, "nFiles must be >= 1")
    require(bits >= 1 && bits <= 12, "quantile mode: bits must be in [1, 12]")
    val nCuts = (1 << bits) - 1
    val probs = (1 to nCuts).map(_.toDouble / (1 << bits)).toArray
    val d = df.withColumn("_a", col(colA).cast("double"))
      .withColumn("_b", col(colB).cast("double"))
    val Array(aCuts, bCuts) =
      d.stat.approxQuantile(Array("_a", "_b"), probs, 0.001)
    def qBucket(c: Column, cuts: Array[Double]): Column =
      aggregate(typedlit(cuts.toIndexedSeq), lit(0L),
        (acc, b) => acc + when(c >= b, 1L).otherwise(0L))
    val z = zValue(qBucket(col("_a"), aCuts), qBucket(col("_b"), bCuts), bits)
    d.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z", "_a", "_b")
      .write.mode("overwrite").parquet(outDir)
  }

  /** POINT-LOOKUP layout: write with parquet BLOOM FILTERS on the given
    * columns — the complement of z-order's range pruning. Min/max
    * footer stats cannot serve equality probes on a high-cardinality
    * column unless the file is sorted by it, and a file can only be
    * sorted by one thing; a per-row-group bloom filter answers
    * "definitely absent" for ANY column at ~10 bits/distinct-value, so
    * a point lookup opens only the row groups whose filter admits the
    * key (at 100 TB: a needle query touches a handful of row groups
    * instead of every file the partition pruner kept). `ndv` sizes the
    * filter (expected distinct values per row group); false positives
    * cost a wasted row-group read, never a wrong answer. Composes with
    * [[writeZOrderedN]]'s clustering — pass the z-written frame through
    * with bloom columns for the NON-z point-lookup keys. */
  def writeWithBloom(df: DataFrame, bloomCols: Seq[String], outDir: String,
                     ndv: Long = 100000L): Unit = {
    require(bloomCols.nonEmpty, "need at least one bloom column")
    require(ndv >= 1, "ndv must be >= 1")
    val w = bloomCols.foldLeft(df.write.mode("overwrite")) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(outDir)
  }

  /** Single-dimension sorted baseline: the layout a plain
    * `ORDER BY colA` write produces. */
  def writeSorted(df: DataFrame, colA: String, outDir: String,
                  nFiles: Int): Unit = {
    require(nFiles >= 1, "nFiles must be >= 1")
    df.repartitionByRange(nFiles, col(colA))
      .sortWithinPartitions(colA)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file min/max of each given column — the footer statistics a
    * pruning reader consults. Output: (file, <c>_min, <c>_max ...). */
  def fileStats(spark: SparkSession, dir: String,
                cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The fraction of files whose [min, max] interval on `c` overlaps
    * [lo, hi] — what fraction of the table a footer-pruning scan with
    * that predicate must actually read. */
  def overlapFraction(stats: DataFrame, c: String, lo: Double,
                      hi: Double): Double = {
    val total = stats.count()
    val hit = stats.filter(
      col(s"${c}_max").cast("double") >= lo &&
        col(s"${c}_min").cast("double") <= hi).count()
    if (total == 0) 0d else hit.toDouble / total
  }
}
