package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The parquet snapshot-store mechanic shared by [[ItemStore]] and
  * [[graft.streaming.IncrementalDedup]]: versioned snapshot directories
  * under a root, a `current` pointer file swapped atomically after each
  * write, and GC of the superseded snapshot once the swap is durable.
  * Readers resolve through the pointer, so they never observe a
  * half-written snapshot, and a crash between write and swap leaves the
  * previous version intact — the batch analog of the reference's
  * transactional commit (`/root/reference/hnarchive.py:199-201,255-262`).
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
      commitPointer("snap-0")
    }
  }

  def read(): DataFrame =
    spark.read.schema(schema).parquet(
      rootPath.resolve(currentName).toString)

  /** Write `df` as the next snapshot, swap the pointer, GC the old one. */
  def replace(df: DataFrame): Unit = {
    val previous = currentName
    val snap = s"snap-${System.nanoTime()}"
    df.write.mode("overwrite").parquet(rootPath.resolve(snap).toString)
    commitPointer(snap)
    deleteRecursively(rootPath.resolve(previous))
  }

  private def currentName: String =
    new String(Files.readAllBytes(pointer)).trim

  private def commitPointer(snap: String): Unit = {
    val tmp = rootPath.resolve("current.tmp")
    Files.write(tmp, snap.getBytes)
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
