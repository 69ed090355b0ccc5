package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.store.ParquetSurgery

/** THE TAKEDOWN LEDGER — a persisted, append-only audit trail of
  * deletion events: one parquet file per cascade, carrying the event's
  * replay token, batch size, and every leg's receipt. [[Forget.cascade]]
  * returns its receipts in memory; a compliance deployment must be able
  * to answer "which takedowns ran, when in sequence, and what did each
  * remove" long after the driver that ran them is gone — this is that
  * record.
  *
  * Reference: voussoir/hnarchive logs deletions to stdout as it
  * overwrites rows (hnarchive.py:210-245); a distributed pipeline needs
  * the receipts as DATA, queryable next to the stores they describe.
  *
  * Write discipline (the engine's store rules): each event lands as ONE
  * file under a DETERMINISTIC name (`event-<id>.parquet`) staged
  * dot-invisible and published with `ATOMIC_MOVE` — the name either
  * exists whole or not at all. The name IS the replay token: recording
  * the same event id again is a no-op returning false (first write
  * wins — a crash-retried cascade re-runs its idempotent legs and may
  * legitimately read 0s the second time; the ledger keeps whichever
  * complete record was published first and never forks). Fails loud on
  * an empty receipt list — an event that removed nothing anywhere still
  * carries its enabled legs' 0-rows; NO legs means the cascade never
  * ran.
  *
  * Scale shape: one tiny file per deletion event, read back as one
  * parquet scan; event counts are takedown-bounded (thousands, not
  * corpus-sized). The ledger directory itself is append-only and is NOT
  * a deletion target: receipts carry only per-leg counts and the event
  * id, never document ids or content — there is nothing in it a
  * takedown could be asked to remove. */
object ForgetLedger {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("n_ids", LongType, nullable = false),
    StructField("component", StringType, nullable = false),
    StructField("removed", LongType, nullable = false)))

  private def eventFile(dir: String, eventId: Long) =
    Paths.get(dir, s"event-$eventId.parquet")

  /** True iff `eventId` is already recorded. */
  def has(dir: String, eventId: Long): Boolean =
    Files.exists(eventFile(dir, eventId))

  /** Publish one cascade's receipts under its event id. Returns true if
    * this call published, false if the event was already recorded (the
    * idempotent replay path). */
  def record(spark: SparkSession, dir: String, eventId: Long,
             nIds: Long, receipts: Seq[Forget.Receipt]): Boolean = {
    require(receipts.nonEmpty,
      s"event $eventId carries no receipts — a cascade with no enabled " +
        "legs never ran; nothing to record")
    require(nIds > 0, s"event $eventId records $nIds deleted ids")
    val target = eventFile(dir, eventId)
    if (Files.exists(target)) false
    else {
      Files.createDirectories(target.getParent)
      val tmp = Files.createTempDirectory(target.getParent,
        ParquetSurgery.StagePrefix)
      import spark.implicits._
      receipts.map(r => (eventId, nIds, r.component, r.removed))
        .toDF("event_id", "n_ids", "component", "removed")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val one = {
        val s = Files.list(tmp)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        } finally s.close()
      }
      require(one.size == 1, s"expected one staged part, got $one")
      // the publish point: the deterministic name appears whole or not
      // at all; a concurrent duplicate publisher loses the move and the
      // first record stands (REPLACE_EXISTING deliberately absent)
      val won =
        try {
          Files.move(one.head, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      ParquetSurgery.deleteRecursively(tmp)
      won
    }
  }

  /** Every recorded event's receipts — empty-but-typed when no event
    * has been recorded yet (readers must see the schema, not an
    * inference error over a bare directory). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val root = Paths.get(dir)
    val files =
      if (!Files.exists(root)) Seq.empty
      else ParquetSurgery.dataFiles(dir)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files.map(_.toString): _*)
  }
}
