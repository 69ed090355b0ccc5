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

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally s.close()
    }

  private def healPending(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      // collect BEFORE deleting — a walk must not mutate under itself
      val (pending, staleTmp) = {
        val s = Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          val all = s.iterator().asScala.toList
          (all.filter(_.getFileName.toString.endsWith(".forget.parquet")),
            all.filter(p => Files.isDirectory(p) &&
              p.getFileName.toString.startsWith(StagePrefix)))
        } finally s.close()
      }
      pending.foreach { p =>
        val orig = p.getParent.resolve(p.getFileName.toString
          .stripSuffix(".forget.parquet") + ".parquet")
        Files.deleteIfExists(orig); ()
      }
      // a crash mid-stage leaves a dot-prefixed staging dir (invisible
      // to Spark readers — Hadoop listing skips '.'-named paths);
      // sweep it so retries start clean
      staleTmp.foreach(deleteRecursively)
    }
  }

  /** Staging dirs live INSIDE the partition dir (same filesystem →
    * `ATOMIC_MOVE` is a rename, so the deterministic `.forget.parquet`
    * name only ever appears fully written) and are dot-prefixed so
    * Spark's listing never sees them. */
  private val StagePrefix = ".graft-forget-stage-"

  /** Data files of the dataset (hidden '_'/'.' paths excluded — the
    * same filter Spark's own listing applies). Empty after a takedown
    * that killed every row: readers must report 0, not throw on schema
    * inference over a bare `_SUCCESS`. */
  private def dataFiles(dir: String): Seq[Path] = {
    val s = Files.walk(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".") &&
          !p.iterator().asScala.exists(seg => {
            val sn = seg.getFileName.toString
            sn.startsWith(StagePrefix)
          })
      }.toList
    } finally s.close()
  }

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
        touched.foreach { case (uri, _) =>
          val p = Paths.get(java.net.URI.create(uri))
          val survivors = ClaimRetraction
            .excluding(spark.read.parquet(p.toString), col(idCol), ids)
            .localCheckpoint(true)
          if (survivors.head(1).nonEmpty) {
            // stage NEXT TO the target (same filesystem) so the final
            // rename is ATOMIC_MOVE — a crash mid-write leaves only the
            // dot-hidden staging dir, never a truncated .forget.parquet
            // for healPending to trust over the intact original
            val tmp = Files.createTempDirectory(p.getParent, StagePrefix)
            survivors.coalesce(1).write
              .mode("overwrite").parquet(tmp.toString)
            val one = {
              val s = Files.list(tmp)
              try {
                import scala.jdk.CollectionConverters._
                s.iterator().asScala
                  .filter(_.getFileName.toString.endsWith(".parquet"))
                  .toSeq
              } finally s.close()
            }
            require(one.size == 1, s"expected one part file, got $one")
            val target: Path = p.getParent.resolve(
              p.getFileName.toString.stripSuffix(".parquet")
                + ".forget.parquet")
            Files.move(one.head, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            deleteRecursively(tmp)
          }
          // deterministic-name replacement is in place (or the file died
          // whole) — dropping the original completes this file
          Files.deleteIfExists(p); ()
        }
        Report(touched.length.toLong, touched.map(_._2).sum)
      }
    }
  }
}
