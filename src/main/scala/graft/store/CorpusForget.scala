package graft.store

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deletion for the MATERIALIZED CORPUS itself — the cascade's last
  * leg: claims retract, indexes delete, packs mask, but the curated
  * parquet dataset a deployment actually serves still CONTAINS the
  * deleted documents' rows. Rewriting the whole dataset per takedown is
  * the O(corpus) answer; this is the O(touched files) one:
  *
  * 1. FIND the touched files with one id-column scan of the dataset —
  *    `filter(id IN list) → distinct(_metadata.file_path)`. The parquet
  *    reader's own footer statistics prune row groups wholesale, and
  *    only the id column's pages are decoded, so the scan reads a tiny
  *    fraction of the dataset's bytes; under an id-clustered layout
  *    ([[graft.operators.Layout.zorderWrite]] or a range-partitioned
  *    write), a takedown list touches FEW files by construction.
  * 2. REWRITE only those files, each next to the original (hive
  *    partition directories are preserved for free — the replacement
  *    lands in the same partition dir; partition columns live in the
  *    directory name, not the file, so a single-file rewrite keeps
  *    them). A file whose every row died is simply deleted.
  *
  * Crash discipline (a plain parquet dir has no manifest to
  * pointer-swap, so full atomicity is not available — the store-backed
  * legs have it, this leg HEALS): the replacement is written to its
  * final DETERMINISTIC name (`<base>.forget.parquet`) before the
  * original is deleted, so a crash leaves either (old only: nothing
  * happened), (old + new: the duplicate window) or (new only: done).
  * Every call heals first — any `X.forget.parquet` whose `X` still
  * exists deletes `X` — making the operation idempotent under retry;
  * readers in the crash window may see the touched file's rows doubled
  * until the retry (documented; serve from the Snapshots-backed stores
  * when that window is unacceptable). A second forget of an
  * already-forgotten file stacks (`.forget.forget.`) — harmless and
  * equally healable.
  *
  * Returns (filesTouched, rowsRemoved). Bounded loud at
  * [[ClaimRetraction.MaxRetractIds]] ids per batch, the cascade-wide
  * ceiling. */
object CorpusForget {

  final case class Report(filesTouched: Long, rowsRemoved: Long)

  import ParquetSurgery.{dataFiles, healPending}

  /** Ids among `ids` still present in the dataset — the corpus leg of
    * [[graft.pipeline.Forget.verify]]: one pruned id-column scan. */
  def held(spark: SparkSession, dir: String, idCol: String,
           ids: Seq[Long]): Long =
    if (ids.isEmpty) 0L
    else {
      healPending(dir)
      if (dataFiles(dir).isEmpty) 0L // fully-forgotten corpus
      else ClaimRetraction.among(spark.read.parquet(dir), col(idCol), ids)
        .select(idCol).distinct().count()
    }

  /** Delete `ids` from the parquet dataset at `dir`, rewriting only the
    * files that contain them. */
  def forget(spark: SparkSession, dir: String, idCol: String,
             ids: Seq[Long]): Report = {
    require(ids.size <= ClaimRetraction.MaxRetractIds,
      s"${ids.size} deletion ids exceed the " +
        s"${ClaimRetraction.MaxRetractIds} batch ceiling — rewrite the " +
        "dataset instead")
    require(Files.exists(Paths.get(dir)),
      s"no parquet dataset at $dir — nothing to forget from")
    if (ids.isEmpty) Report(0L, 0L)
    else {
      healPending(dir)
      if (dataFiles(dir).isEmpty) Report(0L, 0L) // fully forgotten
      else {
        val touched = ClaimRetraction
          .among(spark.read.parquet(dir), col(idCol), ids)
          .select(col("_metadata.file_path").as("f"))
          .groupBy("f").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        // bounded parallel per-file rewrite — each file's heal-first
        // atomic sequence is its own; see ParquetSurgery.inParallel
        ParquetSurgery.inParallel(touched.toSeq) { case (uri, _) =>
          val p = Paths.get(java.net.URI.create(uri))
          ParquetSurgery.replaceFile(spark, p, ClaimRetraction
            .excluding(spark.read.parquet(p.toString), col(idCol), ids))
        }
        Report(touched.length.toLong, touched.map(_._2).sum)
      }
    }
  }
}
