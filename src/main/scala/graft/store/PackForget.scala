package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** IN-PLACE right-to-be-forgotten over a MATERIALIZED pack-stream
  * parquet dataset — the composition round 14 left to the caller:
  * [[Packing.forgetPacks]] computes the shape-stable mask (deleted
  * members' token spans → pad, identity → −1) but RETURNS rows; this
  * performs the O(touched files) write-back against the dataset a
  * trainer actually reads, with [[ParquetSurgery]]'s heal-first atomic
  * file replacement — the [[CorpusForget]] discipline applied to the
  * cascade's one previously hand-rolled leg
  * ([[graft.pipeline.Forget.cascade]] wires it as `packs`).
  *
  * Discovery is one column-pruned scan: only `doc_ids` (plus file-path
  * metadata) is decoded to find the files containing deleted members —
  * token arrays are read only for the touched files' rewrite. Masking
  * is per-file [[Packing.forgetPacks]]: untouched packs in a touched
  * file pass through BYTE-EQUAL (column-wise; the rewritten file's
  * rows are `pack_id`-ordered — the order [[Packing.packTokenStreams]]
  * artifacts are written in), so sample boundaries, offsets and pack
  * ids never shift. `padId` must not collide with a real vocabulary id
  * or the separator (vocab size + 1 by convention).
  *
  * Bounded loud at [[ClaimRetraction.MaxRetractIds]] ids per batch;
  * idempotent under retry (masking masked rows is a no-op; the heal
  * discipline covers the file window). Touched files rewrite on a
  * bounded driver-side pool ([[ParquetSurgery.inParallel]], up to
  * [[ParquetSurgery.SurgeryParallelism]] concurrent single-file jobs)
  * — a scattered takedown over many pack files pays ~touched/8 job
  * latencies instead of serializing one by one, while each file keeps
  * its own atomic heal-first stage-rename-delete sequence. */
object PackForget {

  final case class Report(filesTouched: Long, membersMasked: Long,
                          tokensMasked: Long)

  import ParquetSurgery.{dataFiles, healPending}

  /** Schema check against ONE part file's footer (every part of a
    * [[graft.operators.Packing.packTokenStreams]] write shares the
    * schema) — not a whole-dir read, which would pay a second listing
    * before the discovery scan. */
  private def requirePackSchema(spark: SparkSession, dir: String,
                                sample: java.nio.file.Path): Unit = {
    val cols = spark.read.parquet(sample.toString).columns.toSet
    Seq("pack_id", "token_ids", "n_tokens", "doc_offsets", "doc_ids")
      .foreach(c => require(cols.contains(c),
        s"pack dataset at $dir lacks column '$c' — write it with " +
          "packTokenStreams(docIdCol = Some(...))"))
  }

  /** Deleted ids still ATTRIBUTED in the dataset's member lists (a
    * masked member's `doc_ids` entry is −1, so a completed forget
    * reads 0) — the pack leg of [[graft.pipeline.Forget.verify]]. One
    * column-pruned scan of `doc_ids`. */
  def held(spark: SparkSession, dir: String, ids: Seq[Long]): Long =
    if (ids.isEmpty) 0L
    else {
      healPending(dir)
      if (dataFiles(dir).isEmpty) 0L
      else ClaimRetraction.among(
        spark.read.parquet(dir)
          .select(explode(col("doc_ids")).as("_pf_doc")),
        col("_pf_doc"), ids)
        .select("_pf_doc").distinct().count()
    }

  /** Mask every deleted member's footprint in place, rewriting only
    * the files that contain one. */
  def forget(spark: SparkSession, dir: String, ids: Seq[Long],
             padId: Long): Report = {
    require(ids.size <= ClaimRetraction.MaxRetractIds,
      s"${ids.size} deletion ids exceed the " +
        s"${ClaimRetraction.MaxRetractIds} batch ceiling — rewrite the " +
        "dataset instead")
    require(Files.exists(Paths.get(dir)),
      s"no pack dataset at $dir — nothing to forget from")
    if (ids.isEmpty) Report(0L, 0L, 0L)
    else {
      healPending(dir)
      val files = dataFiles(dir)
      if (files.isEmpty) Report(0L, 0L, 0L)
      else {
        requirePackSchema(spark, dir, files.head)
        import spark.implicits._
        val deadDf = ids.toDF("_pf_dead")
        // column-pruned discovery: only doc_ids pages decode here
        val touched = ClaimRetraction.among(
          spark.read.parquet(dir)
            .select(col("_metadata.file_path").as("f"),
              explode(col("doc_ids")).as("_pf_doc")),
          col("_pf_doc"), ids)
          .select("f").distinct()
          .collect().map(_.getString(0))
        val sums = ParquetSurgery.inParallel(touched.toSeq) { uri =>
          val p = Paths.get(java.net.URI.create(uri))
          val packCols = spark.read.parquet(p.toString).columns
          val masked = Packing.forgetPacks(
            spark.read.parquet(p.toString), deadDf, "_pf_dead", padId)
            .localCheckpoint(true)
          val s = masked
            .agg(coalesce(sum("n_forgotten"), lit(0L)),
              coalesce(sum("n_masked_tokens"), lit(0L))).head()
          ParquetSurgery.replaceFile(spark, p,
            masked.select(packCols.map(col).toSeq: _*)
              .orderBy("pack_id"))
          (s.getLong(0), s.getLong(1))
        }
        Report(touched.length.toLong, sums.map(_._1).sum, sums.map(_._2).sum)
      }
    }
  }
}
