package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{GraphAnn, GraphShards, Similarity}

/** The SHARDED graph tier under continuous ingestion — corpus-scale
  * streaming ANN maintenance: each micro-batch's vectors assign to
  * their IVF cells in-scan, and ONLY the touched cells' graphs absorb
  * them (the per-cell incremental NSW insert, run in EXECUTORS via the
  * same cogroup shape the batch tier serves with). Where
  * [[StreamGraphIndex]] maintains one driver-bounded graph,
  * this tier maintains cells × maxPerShard — the index that outgrows
  * the driver ceiling keeps growing here.
  *
  * Versioning is a MANIFEST chain (the snapshot-pointer pattern of the
  * table formats): shard data for batch `b` lands under
  * `graphs-b<id>/cell=N/`, and a version is a manifest FILE mapping
  * every cell to the directory of the batch that last rewrote it —
  * untouched cells keep pointing at their old files, so per-batch
  * write volume is O(touched shards + batch), never O(index). The
  * `current` marker swaps to the manifest name with an ATOMIC_MOVE;
  * crash/replay semantics are [[StreamGraphIndex]]'s: contents fully
  * written before the swap, orphans overwritten by the replay, a
  * fully-replayed batch inserts nothing and leaves the marker alone.
  *
  * Serving reads the manifest, ranks cells against the centroid
  * sidecar, and walks ONLY the probed cells' shard files — the
  * batch tier's plan against a pruned union of manifest paths. */
object StreamGraphShards {

  private def markerPath(dir: String) = Paths.get(dir, "current")

  /** Bootstrap: build every cell's graph (executors), write the
    * centroid sidecar and the initial manifest. */
  def bootstrap(spark: SparkSession, dir: String, corpus: DataFrame,
                idCol: String, vecCol: String, cents: DataFrame,
                m: Int = 16, efConstruction: Int = 64,
                maxPerShard: Int = GraphShards.MaxShardVectors): Unit = {
    GraphShards.buildShardedIndex(corpus, idCol, vecCol, cents,
      s"$dir/boot", m, efConstruction, maxPerShard)
    // adopt the build's layout: graphs live under boot/graphs/cell=N
    val cells = new java.io.File(s"$dir/boot/graphs").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.getName.stripPrefix("cell=").toLong)
    commitManifest(dir, "manifest-boot",
      cells.map(c => c -> s"boot/graphs/cell=$c").toMap)
  }

  /** cell → relative shard path of the version named by `current`. */
  private[streaming] def readManifest(dir: String): Map[Long, String] = {
    val p = markerPath(dir)
    require(Files.exists(p), s"no sharded index at $dir — bootstrap first")
    val mf = new String(Files.readAllBytes(p)).trim
    new String(Files.readAllBytes(Paths.get(dir, mf))).linesIterator
      .filter(_.nonEmpty).map { line =>
        val Array(c, path) = line.split("\t", 2)
        c.toLong -> path
      }.toMap
  }

  private def commitManifest(dir: String, name: String,
                             entries: Map[Long, String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val body = entries.toSeq.sortBy(_._1)
      .map { case (c, p) => s"$c\t$p" }.mkString("\n")
    Files.write(Paths.get(dir, name), body.getBytes)
    val tmp = Paths.get(dir, "current.tmp")
    Files.write(tmp, name.getBytes)
    Files.move(tmp, markerPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Pruned union of the given cells' shard rows (cell, ord, id, vec,
    * nbr_ids) under the CURRENT manifest — cells with no shard yet
    * (empty so far) simply contribute nothing. */
  private def loadShardRows(spark: SparkSession, dir: String,
                            manifest: Map[Long, String],
                            cells: Seq[Long]): DataFrame = {
    val frames = cells.flatMap { c =>
      manifest.get(c).map { rel =>
        spark.read.parquet(s"$dir/$rel")
          .select(lit(c).as("cell"), col("ord"), col("id"), col("vec"),
            col("nbr_ids"))
      }
    }
    frames.reduceOption(_.unionByName(_)).getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long, Long, Seq[Double], Seq[Long])]
        .toDF("cell", "ord", "id", "vec", "nbr_ids")
    }
  }

  /** The `foreachBatch` binder: assign the micro-batch to cells, grow
    * ONLY the touched cells' graphs (executors — one task per cell,
    * the exact incremental-insert rule), write the changed shards under
    * `graphs-b<id>`, and commit a manifest that repoints just those
    * cells. Fully-replayed or empty batches leave the marker alone. */
  def maintainer(spark: SparkSession, dir: String, idCol: String,
                 vecCol: String, m: Int = 16, efConstruction: Int = 64,
                 maxPerShard: Int = GraphShards.MaxShardVectors)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => if (!batch.isEmpty) {
      import spark.implicits._
      val manifest = readManifest(dir)
      val cents = spark.read.parquet(s"$dir/boot/centroids")
      val assigned = Similarity.assignCells(
        Similarity.withNorm(batch, vecCol), idCol, cents)
        .filter(col("cell").isNotNull)
        .select(col("cell").cast("long"), col(idCol).cast("long").as("id"),
          col("vecd"))
        .localCheckpoint(true)
      val touched = assigned.select("cell").distinct()
        .collect().map(_.getLong(0)).toSeq
      // content-addressed newness: cells whose batch rows are ALL
      // already present insert nothing and must not be rewritten
      val existing = loadShardRows(spark, dir, manifest, touched)
        .select(col("cell"), col("id"))
      val changed = assigned
        .join(existing, Seq("cell", "id"), "left_anti")
        .select("cell").distinct().collect().map(_.getLong(0)).toSet
      if (changed.nonEmpty) {
        val changedSeq = changed.toSeq.sorted
        val shardRows = loadShardRows(spark, dir, manifest, changedSeq)
          .select(col("cell").cast("long"), col("ord").cast("long"),
            col("id").cast("long"), col("vec"), col("nbr_ids"))
          .as[(Long, Long, Long, Seq[Double], Seq[Long])]
          .groupByKey(_._1)
        val batchRows = assigned
          .filter(col("cell").isin(changedSeq: _*))
          .as[(Long, Long, Seq[Double])]
          .groupByKey(_._1)
        val grown = shardRows.cogroup(batchRows) { (cell, sIt, bIt) =>
          val news = bIt.map { case (_, id, v) => (id, v) }.toArray
          val old = sIt.toArray
          if (news.isEmpty && old.isEmpty) Iterator.empty
          else {
            val g0 =
              if (old.isEmpty) null
              else GraphShards.graphOfShardRows(old.sortBy(_._2))
            val existIds: Set[Long] =
              if (g0 == null) Set.empty else g0.ids.toSet
            // new-only, per-id dedup (lexicographically-least vector —
            // insertVectors' rule), ascending id
            val fresh = news.filter(t => !existIds.contains(t._1))
              .groupBy(_._1).view
              .mapValues(vs => vs.map(_._2).min(Ordering.Implicits
                .seqOrdering[Seq, Double])).toArray
              .sortBy(_._1)
            val n0 = if (g0 == null) 0 else g0.size
            require(n0 + fresh.length <= maxPerShard,
              s"cell $cell would grow to ${n0 + fresh.length} vectors: " +
                s"past the per-shard graph ceiling $maxPerShard — " +
                "refine the quantizer or raise maxPerShard")
            val g2 =
              if (g0 == null)
                GraphAnn.buildGraphFromRows(fresh.toIndexedSeq, m,
                  efConstruction)
              else GraphAnn.insertVectorsLocal(g0, fresh.toIndexedSeq, m,
                efConstruction)
            g2.ids.indices.iterator.map { i =>
              (cell, i.toLong, g2.ids(i),
                g2.vecs.slice(i * g2.dim, (i + 1) * g2.dim).toSeq,
                g2.nbrs(i).map(g2.ids(_)).toSeq)
            }
          }
        }.toDF("cell", "ord", "id", "vec", "nbr_ids")
        grown.write.mode("overwrite").partitionBy("cell")
          .parquet(s"$dir/graphs-b$batchId")
        val updated = manifest ++
          changedSeq.map(c => c -> s"graphs-b$batchId/cell=$c")
        commitManifest(dir, s"manifest-b$batchId", updated)
      }
    }

  /** BATCH search against the CURRENT manifest: rank cells, walk only
    * the probed cells' shard files. Output (qid, idCol, cos_r, rank) —
    * the batch family's schema. */
  def topKBatch(queries: DataFrame, idCol: String, vecCol: String,
                dir: String, k: Int, nprobe: Int = 2, ef: Int = 64,
                excludeSelf: Boolean = true): DataFrame = {
    require(k >= 1 && ef >= k, "need ef >= k >= 1")
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$dir/boot/centroids")
    val probed = GraphShards.bruteProbe(queries, idCol, vecCol, cents,
      nprobe)
    serveProbed(probed, idCol, dir, k, ef, excludeSelf)
  }

  /** [[topKBatch]] with the centroid ranking served by a GRAPH over the
    * centroid table ([[GraphShards.shardedTopKBatchGraphProbe]]'s
    * composition for the streaming tier) — same staleness guards, same
    * saturating-efProbe equality with the brute probe. */
  def topKBatchGraphProbe(queries: DataFrame, idCol: String,
                          vecCol: String, dir: String,
                          cg: GraphAnn.Graph, k: Int, nprobe: Int = 2,
                          ef: Int = 64, efProbe: Int = 64,
                          excludeSelf: Boolean = true): DataFrame = {
    require(k >= 1 && ef >= k, "need ef >= k >= 1")
    require(nprobe >= 1 && efProbe >= nprobe, "need efProbe >= nprobe >= 1")
    val spark = queries.sparkSession
    val centIds = spark.read.parquet(s"$dir/boot/centroids")
      .select(col("cent_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val orphan = cg.ids.find(!centIds.contains(_))
    require(orphan.isEmpty,
      s"centroid graph is stale: graph node ${orphan.get} is not a " +
        "cent_id of this index's centroid sidecar — rebuild the graph")
    val gset = cg.ids.toSet
    val unserved = centIds.find(!gset.contains(_))
    require(unserved.isEmpty,
      s"centroid graph is incomplete: cent_id ${unserved.get} has no " +
        "graph node, so its cell is unprobeable — insertVectors the new " +
        "centroids into the graph before probing")
    val probedCells = GraphAnn.graphTopKBatch(queries, idCol, vecCol, cg,
      k = nprobe, ef = efProbe, excludeSelf = false)
      .select(col("qid"), col(idCol).as("cell"))
    val q = Similarity.withNorm(queries, vecCol)
      .select(col(idCol).cast("long").as("qid"), col("vecd").as("qvec"))
    val probed = probedCells.join(broadcast(q), Seq("qid"))
      .select(col("cell"), col("qid"), col("qvec"))
      .localCheckpoint(true)
    serveProbed(probed, idCol, dir, k, ef, excludeSelf)
  }

  /** Candidate stage with the measured walk cost attached — the
    * streamed tier's [[GraphShards.shardedCandidates]]: one row per
    * beam hit (qid, id, cos_r, cell, visits), `visits` constant across
    * a (qid, cell) walk's rows. [[graft.operators.AnnRecall]] reads
    * the cost axis of the STREAMED-GROWN index from here, so the
    * sidecar's `graph_stream_sharded` row measures the same two axes
    * as its batch-built twin. */
  def candidates(queries: DataFrame, idCol: String, vecCol: String,
                 dir: String, nprobe: Int, ef: Int,
                 excludeSelf: Boolean = true): DataFrame = {
    require(nprobe >= 1 && ef >= 1, "need nprobe >= 1 and ef >= 1")
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$dir/boot/centroids")
    val probed = GraphShards.bruteProbe(queries, idCol, vecCol, cents,
      nprobe)
    val manifest = readManifest(dir)
    val cells = probed.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    GraphShards.walkShards(probed, idCol,
      loadShardRows(spark, dir, manifest, cells), ef, excludeSelf)
  }

  private def serveProbed(probed: DataFrame, idCol: String, dir: String,
                          k: Int, ef: Int,
                          excludeSelf: Boolean): DataFrame = {
    val spark = probed.sparkSession
    val manifest = readManifest(dir)
    val cells = probed.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val cand = GraphShards.walkShards(probed, idCol,
      loadShardRows(spark, dir, manifest, cells), ef, excludeSelf)
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_r").desc, col(idCol).asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("cos_r"), col("rank"))
  }

  /** VACUUM: delete version roots (`graphs-b*`) no cell of the CURRENT
    * manifest references, plus superseded manifest files — the storage
    * GC the manifest chain needs (every repointed cell strands its old
    * shard file; a root whose every cell is superseded is dead weight).
    * Partially-referenced roots are kept whole (their live cells still
    * serve). Never touches `boot/` (centroid sidecar lives there), the
    * current manifest, or the marker; safe to run any time between
    * commits — readers resolve only through the manifest, so deleting
    * unreferenced roots cannot disturb a search (spec-pinned). Returns
    * the deleted root names. */
  def vacuum(dir: String): Seq[String] = {
    val p = markerPath(dir)
    require(Files.exists(p), s"no sharded index at $dir — bootstrap first")
    val currentManifest = new String(Files.readAllBytes(p)).trim
    val manifest = readManifest(dir)
    val liveRoots = manifest.values.map(_.split("/")(0)).toSet
    val root = new java.io.File(dir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val deadDirs = root.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graphs-b") &&
        !liveRoots.contains(f.getName))
      .map { f => rm(f); f.getName }.toSeq
    root.listFiles()
      .filter(f => f.isFile && f.getName.startsWith("manifest-") &&
        f.getName != currentManifest)
      .foreach(_.delete())
    deadDirs.sorted
  }
}
