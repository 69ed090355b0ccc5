package graft.store

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The O(touched files) FILE SURGEON shared by the plain-parquet
  * deletion legs ([[CorpusForget]] for corpus rows, [[PackForget]] for
  * pack-stream masking): replace single part files of a live parquet
  * dataset without rewriting the dataset and without a manifest to
  * pointer-swap.
  *
  * Crash discipline (heal-first, deterministic names): a replacement is
  * STAGED in a dot-prefixed directory NEXT TO the target (same
  * filesystem, invisible to Spark's listing — Hadoop skips '.'-named
  * paths), then renamed to its final deterministic name
  * (`<base>.forget.parquet`) with `ATOMIC_MOVE` — the name only ever
  * appears fully written — and only then is the original deleted. A
  * crash leaves (old only), (old + new: the documented
  * duplicate-window) or (new only); [[healPending]] resolves the
  * middle state by dropping the stale original, and sweeps any staging
  * residue, making every operation idempotent under retry. */
private[store] object ParquetSurgery {

  val StagePrefix = ".graft-forget-stage-"

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally s.close()
    }

  /** Drop originals whose deterministic replacement exists; sweep stale
    * staging dirs. Run before every read or mutation. */
  def healPending(dir: String): Unit = {
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
      staleTmp.foreach(deleteRecursively)
    }
  }

  /** Data files of the dataset (hidden '_'/'.' paths excluded — the
    * same filter Spark's own listing applies). Empty after a takedown
    * that killed every row: readers must report 0, not throw on schema
    * inference over a bare `_SUCCESS`. */
  def dataFiles(dir: String): Seq[Path] = {
    val s = Files.walk(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".") &&
          !p.iterator().asScala.exists(
            _.getFileName.toString.startsWith(StagePrefix))
      }.toList
    } finally s.close()
  }

  /** Replace one part file with `replacement`'s rows (one staged part,
    * atomic rename, drop original). An EMPTY replacement just deletes
    * the original — the file died whole. */
  def replaceFile(spark: SparkSession, original: Path,
                  replacement: DataFrame): Unit = {
    val rows = replacement.localCheckpoint(true)
    if (rows.head(1).nonEmpty) {
      val tmp = Files.createTempDirectory(original.getParent, StagePrefix)
      rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val one = {
        val s = Files.list(tmp)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        } finally s.close()
      }
      require(one.size == 1, s"expected one part file, got $one")
      val target: Path = original.getParent.resolve(
        original.getFileName.toString.stripSuffix(".parquet")
          + ".forget.parquet")
      Files.move(one.head, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      deleteRecursively(tmp)
    }
    // deterministic-name replacement is in place (or the file died
    // whole) — dropping the original completes this file
    Files.deleteIfExists(original); ()
  }
}
