package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The parquet snapshot-store mechanic shared by [[ItemStore]] and
  * [[graft.streaming.IncrementalDedup]]: versioned snapshot directories
  * under a root, a `current` manifest file swapped atomically after each
  * write, and GC of superseded directories once the swap is durable.
  * Readers resolve through the manifest, so they never observe a
  * half-written snapshot, and a crash between write and swap leaves the
  * previous version intact — the batch analog of the reference's
  * transactional commit (`/root/reference/hnarchive.py:199-201,255-262`).
  *
  * Two write shapes:
  *  - [[replace]] — full-snapshot rewrite; right whenever the new content
  *    is already O(store) (e.g. a merge that rewrote every row).
  *  - [[appendDelta]] — adds one O(batch) parquet directory and commits it
  *    as a new manifest line; [[read]] is the union of the base snapshot
  *    and all deltas. This is what makes a per-micro-batch writer scale:
  *    the store grows by what the batch added, never rewritten per batch.
  *    Callers compact on their own cadence via `replace(read())` when
  *    [[deltaCount]] grows — amortized O(store / compactEvery) per batch.
  *
  * The manifest is newline-separated directory names: first line the base
  * snapshot, following lines deltas in commit order (a bare single line is
  * exactly the old pointer format, so pre-delta stores read unchanged).
  */
final class Snapshots(spark: SparkSession, root: String, schema: StructType) {

  private val rootPath: Path = Paths.get(root)
  private val pointer: Path = rootPath.resolve("current")

  /** Create an empty snapshot iff absent (idempotent bootstrap — S6). */
  def init(): Unit = {
    Files.createDirectories(rootPath)
    if (!Files.exists(pointer)) {
      val snap = rootPath.resolve("snap-0").toString
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(snap)
      commitManifest(Seq("snap-0"))
    }
  }

  def read(): DataFrame = {
    val dirs = manifest.map(d => rootPath.resolve(d).toString)
    spark.read.schema(schema).parquet(dirs: _*)
  }

  /** Number of delta directories since the last base snapshot — the
    * caller's compaction trigger. */
  def deltaCount: Int = manifest.size - 1

  /** Write `df` as one new delta directory and commit it to the manifest.
    * I/O is O(df), independent of the store size. */
  def appendDelta(df: DataFrame): Unit = {
    val old = manifest
    val delta = s"delta-${System.nanoTime()}"
    df.write.mode("overwrite").parquet(rootPath.resolve(delta).toString)
    commitManifest(old :+ delta)
  }

  /** Write `df` as the next base snapshot, swap the manifest, GC every
    * superseded directory (old base and deltas). `replace(read())` is the
    * delta-log compaction. */
  def replace(df: DataFrame): Unit = {
    val previous = manifest
    val snap = s"snap-${System.nanoTime()}"
    df.write.mode("overwrite").parquet(rootPath.resolve(snap).toString)
    commitManifest(Seq(snap))
    previous.foreach(d => deleteRecursively(rootPath.resolve(d)))
  }

  private def manifest: Seq[String] =
    new String(Files.readAllBytes(pointer)).trim
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)

  private def commitManifest(dirs: Seq[String]): Unit = {
    val tmp = rootPath.resolve("current.tmp")
    Files.write(tmp, dirs.mkString("\n").getBytes)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
}
