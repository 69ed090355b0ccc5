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

  /** Manifest header line naming the LIVE centroid sidecar — the
    * quantizer is versioned WITH the shard map in the one atomically
    * swapped file, so a [[splitCell]] can never leave serving reading
    * new cells against an old quantizer (or vice versa). Manifests
    * without the header (pre-split indexes) read as `boot/centroids`. */
  private val CentroidsKey = "#centroids"

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
      cells.map(c => c -> s"boot/graphs/cell=$c").toMap, "boot/centroids")
  }

  /** cell → relative shard path of the version named by `current`. */
  private[streaming] def readManifest(dir: String): Map[Long, String] = {
    val p = markerPath(dir)
    require(Files.exists(p), s"no sharded index at $dir — bootstrap first")
    val mf = new String(Files.readAllBytes(p)).trim
    new String(Files.readAllBytes(Paths.get(dir, mf))).linesIterator
      .filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val Array(c, path) = line.split("\t", 2)
        c.toLong -> path
      }.toMap
  }

  /** Relative path of the centroid sidecar the CURRENT manifest serves
    * with — `boot/centroids` until a [[splitCell]] commits a revision. */
  private[streaming] def readCentroidsRel(dir: String): String = {
    val p = markerPath(dir)
    require(Files.exists(p), s"no sharded index at $dir — bootstrap first")
    val mf = new String(Files.readAllBytes(p)).trim
    new String(Files.readAllBytes(Paths.get(dir, mf))).linesIterator
      .find(_.startsWith(CentroidsKey + "\t"))
      .map(_.split("\t", 2)(1))
      .getOrElse("boot/centroids")
  }

  private def currentCentroids(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/${readCentroidsRel(dir)}")

  private def commitManifest(dir: String, name: String,
                             entries: Map[Long, String],
                             centroidsRel: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val body = (s"$CentroidsKey\t$centroidsRel" +:
      entries.toSeq.sortBy(_._1).map { case (c, p) => s"$c\t$p" })
      .mkString("\n")
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

  /** The grow step shared by the maintainer and [[splitCell]]: cogroup
    * existing shard rows with fresh (cell, id, vecd) rows and emit the
    * grown graphs — per cell, new-only with per-id dedup
    * (lexicographically-least vector, insertVectors' rule), ascending-id
    * incremental insert, LOUD per-shard ceiling. */
  private def growCells(spark: SparkSession, existingRows: DataFrame,
                        freshRows: DataFrame, m: Int, efConstruction: Int,
                        maxPerShard: Int): DataFrame = {
    import spark.implicits._
    val shardRows = existingRows
      .select(col("cell").cast("long"), col("ord").cast("long"),
        col("id").cast("long"), col("vec"), col("nbr_ids"))
      .as[(Long, Long, Long, Seq[Double], Seq[Long])]
      .groupByKey(_._1)
    val batchRows = freshRows
      .select(col("cell").cast("long"), col("id").cast("long"), col("vecd"))
      .as[(Long, Long, Seq[Double])]
      .groupByKey(_._1)
    shardRows.cogroup(batchRows) { (cell, sIt, bIt) =>
      val news = bIt.map { case (_, id, v) => (id, v) }.toArray
      val old = sIt.toArray
      if (news.isEmpty && old.isEmpty) Iterator.empty
      else {
        val g0 =
          if (old.isEmpty) null
          else GraphShards.graphOfShardRows(old.sortBy(_._2))
        val existIds: Set[Long] =
          if (g0 == null) Set.empty else g0.ids.toSet
        val fresh = news.filter(t => !existIds.contains(t._1))
          .groupBy(_._1).view
          .mapValues(vs => vs.map(_._2).min(Ordering.Implicits
            .seqOrdering[Seq, Double])).toArray
          .sortBy(_._1)
        val n0 = if (g0 == null) 0 else g0.size
        require(n0 + fresh.length <= maxPerShard,
          s"cell $cell would grow to ${n0 + fresh.length} vectors: " +
            s"past the per-shard graph ceiling $maxPerShard — " +
            "refine the quantizer, raise maxPerShard, or splitCell")
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
  }

  /** The `foreachBatch` binder: assign the micro-batch to cells (against
    * the manifest's CURRENT quantizer), grow ONLY the touched cells'
    * graphs (executors — one task per cell, the exact incremental-insert
    * rule), write the changed shards under `graphs-b<id>`, and commit a
    * manifest that repoints just those cells. Fully-replayed or empty
    * batches leave the marker alone.
    *
    * `autoSplit = true` turns the per-shard ceiling from a loud stop
    * into ONLINE MAINTENANCE: any cell the batch would push past
    * `maxPerShard` is [[splitCell]]-dissolved FIRST (deterministic
    * member-seeded sub-cells, global reassignment), then the batch
    * re-assigns against the revised quantizer and the grow step runs as
    * usual. Bounded at 16 split rounds per batch (a cell of
    * indistinguishable vectors cannot split apart — that still fails
    * loud rather than looping). Off by default: an unexpected overflow
    * should stop a pipeline that has not opted into online resharding. */
  def maintainer(spark: SparkSession, dir: String, idCol: String,
                 vecCol: String, m: Int = 16, efConstruction: Int = 64,
                 maxPerShard: Int = GraphShards.MaxShardVectors,
                 autoSplit: Boolean = false)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => if (!batch.isEmpty) {
      val base = Similarity.withNorm(batch, vecCol)
        .select(col(idCol).cast("long").as("id"), col("vecd"), col("norm"))
        .localCheckpoint(true)
      var round = 0
      var done = false
      while (!done) {
        val manifest = readManifest(dir)
        val cents = currentCentroids(spark, dir)
        val assigned = Similarity.assignCells(base, "id", cents)
          .filter(col("cell").isNotNull)
          .select(col("cell").cast("long"), col("id"), col("vecd"))
          .localCheckpoint(true)
        val touched = assigned.select("cell").distinct()
          .collect().map(_.getLong(0)).toSeq
        // content-addressed newness: cells whose batch rows are ALL
        // already present insert nothing and must not be rewritten
        val existing = loadShardRows(spark, dir, manifest, touched)
          .select(col("cell"), col("id"))
        val freshOnly = assigned
          .join(existing, Seq("cell", "id"), "left_anti")
          .localCheckpoint(true)
        val changed = freshOnly
          .select("cell").distinct().collect().map(_.getLong(0)).toSet
        // cells this batch would push past the ceiling (existing + the
        // deduped fresh count — one bounded aggregation, split targets)
        val overflow = if (!autoSplit) Seq.empty[Long] else {
          val ex = existing.groupBy("cell")
            .agg(count(lit(1)).as("nOld"))
          freshOnly.dropDuplicates("cell", "id").groupBy("cell")
            .agg(count(lit(1)).as("nNew"))
            .join(ex, Seq("cell"), "left")
            .filter(coalesce(col("nOld"), lit(0L)) + col("nNew")
              > maxPerShard)
            .select("cell").collect().map(_.getLong(0)).toSeq.sorted
        }
        if (overflow.nonEmpty) {
          require(round < 16,
            s"autoSplit did not converge after 16 rounds (cells " +
              s"${overflow.mkString(",")} still past $maxPerShard — " +
              "indistinguishable vectors cannot split apart)")
          // a cell with NO standing shard that the batch alone would
          // overfill cannot be split (there are no members to seed
          // from); split the splittable overflow — the revised
          // quantizer may pull rows away from the empty cell — and
          // fail loud only when no progress is possible at all: that
          // is a batch-vs-cap sizing error, not an index state
          // splitting can repair
          val splittable = overflow.filter(manifest.contains)
          require(splittable.nonEmpty,
            s"batch $batchId alone would push empty cell(s) " +
              s"${overflow.mkString(",")} past $maxPerShard — " +
              "autoSplit cannot help (nothing to split); use smaller " +
              "micro-batches or raise maxPerShard")
          splittable.foreach { c =>
            splitCell(spark, dir, c, s"b$batchId-r$round-c$c", m,
              efConstruction, maxPerShard)
          }
          round += 1
        } else {
          if (changed.nonEmpty) {
            val changedSeq = changed.toSeq.sorted
            val grown = growCells(spark,
              loadShardRows(spark, dir, manifest, changedSeq),
              assigned.filter(col("cell").isin(changedSeq: _*)),
              m, efConstruction, maxPerShard)
            grown.write.mode("overwrite").partitionBy("cell")
              .parquet(s"$dir/graphs-b$batchId")
            val updated = manifest ++
              changedSeq.map(c => c -> s"graphs-b$batchId/cell=$c")
            commitManifest(dir, s"manifest-b$batchId", updated,
              readCentroidsRel(dir))
          }
          done = true
        }
      }
    }

  /** SPLIT an oversized cell ONLINE — the maintenance operation that
    * makes the sharded tier's capacity truly unbounded: where the
    * per-shard ceiling says "refine the quantizer", this IS the
    * refinement, committed with the same atomic-manifest discipline as
    * a grow batch. The quantizer revision rides INSIDE the manifest
    * (header line), so serving can never pair new cells with an old
    * centroid table.
    *
    * Method, fully deterministic:
    *   1. SEEDS: members of the cell become the new centroids — the
    *      lowest-id member plus the member LEAST like the old centroid
    *      (minimum cosine, lowest-id tie-break), with farthest-point
    *      additions until every sub-cell fits the cap (two seeds
    *      cannot absorb a cell far past it). Members whose id is
    *      already a cent_id of ANOTHER live cell are ineligible
    *      (cent_ids must stay unique); fails loud with fewer than two
    *      eligible members.
    *   2. QUANTIZER REVISION: old table minus the split cell plus the
    *      seeds, written whole (the centroid table is bounded by
    *      contract — rewriting it is O(|C|), not O(corpus)).
    *   3. WHOLE-INDEX REASSIGNMENT — the exactness price a quantizer
    *      revision cannot dodge: adding centroids can steal the argmax
    *      of rows in UNSPLIT cells, and a row left at a stale placement
    *      breaks the tier's core invariant (every row sits in its
    *      global-argmax cell) that both the maintainer's
    *      content-addressed replay dedup and the probe's recall math
    *      rely on. One map-only SCAN of the index through the very
    *      in-scan assignment expression future batches will use
    *      ([[Similarity.assignCells]] — bitwise the same rule, so
    *      replays after the split content-address correctly by
    *      construction); rows whose argmax moved migrate. Non-members
    *      can only move TO a seed (their old cell was their old argmax,
    *      so only a new centroid can beat it); the dissolved cell's own
    *      members go wherever the revised argmax says.
    *   4. REBUILD every affected cell (lost or gained any row) from its
    *      new membership — deterministic ascending-id executor builds,
    *      per-shard ceiling still loud; a migration target the split
    *      would overflow is PRE-SPLIT recursively first (depth-bounded,
    *      loud past 16).
    *
    * Cost: one O(index) assignment SCAN (map-only, pruned columns, no
    * payload shuffle) + O(affected cells) rebuild/write — the scan is
    * the honest price of exact placement under a revised quantizer; the
    * write volume stays bounded by what actually changed. Returns the
    * seed cent_ids. */
  def splitCell(spark: SparkSession, dir: String, cell: Long, tag: String,
                m: Int = 16, efConstruction: Int = 64,
                maxPerShard: Int = GraphShards.MaxShardVectors,
                depth: Int = 0): Seq[Long] = {
    import spark.implicits._
    require(depth < 16,
      s"splitCell recursion past depth 16 at cell $cell — migrations " +
        "keep overflowing neighbors; the data is pathologically " +
        "concentrated for this maxPerShard")
    val manifest = readManifest(dir)
    require(manifest.contains(cell),
      s"cell $cell is not in the current manifest — nothing to split")
    val centRows = currentCentroids(spark, dir)
      .select(col("cent_id").cast("long"), col("cent_vec"), col("cent_norm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    require(centRows.exists(_._1 == cell),
      s"manifest names cell $cell but the centroid sidecar does not — " +
        "corrupt index")
    val old = centRows.find(_._1 == cell).get
    // seed election runs on the split cell's members, DRIVER-side (the
    // shard fits one task by construction; only (id, vec) travel)
    val members = loadShardRows(spark, dir, manifest, Seq(cell))
      .select(col("id").cast("long"), col("vec"))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        var acc = 0.0
        var i = 0
        while (i < v.length) { acc += v(i) * v(i); i += 1 }
        (r.getLong(0), v, math.sqrt(acc))
      }.sortBy(_._1)
    def cosTo(v: Array[Double], n: Double,
              c: Array[Double], cn: Double): Double = {
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += v(i) * c(i); i += 1 }
      acc / (n * cn)
    }
    val otherCents = centRows.filter(_._1 != cell)
    val otherIds = otherCents.map(_._1).toSet
    val eligible = members.filter(t => !otherIds.contains(t._1))
    require(eligible.length >= 2,
      s"cell $cell has fewer than two eligible members — nothing to " +
        "split apart; raise maxPerShard instead")
    // every (cell, id, vec) row of the index, the whole-index
    // reassignment's input — read once, reused per seed iteration
    val allRows = loadShardRows(spark, dir, manifest,
      manifest.keys.toSeq.sorted)
      .select(col("cell").cast("long").as("old_cell"),
        col("id").cast("long"), col("vec").as("vecd"),
        Similarity.normD(col("vec")).as("norm"))
      .localCheckpoint(true)
    // seed growth loop: start with lowest-id + least-like-the-old-
    // centroid; if the revised quantizer would overfill a SEED cell,
    // add the member most dissimilar from every chosen seed (min of
    // max-cosine, lowest-id tie-break) and reassign
    var seeds = Vector(eligible.head,
      eligible.tail.minBy(t => (cosTo(t._2, t._3, old._2, old._3), t._1)))
    def reassign(): DataFrame = {
      val table = (otherCents.map(t => (t._1, t._2.toSeq, t._3)) ++
        seeds.map(t => (t._1, t._2.toSeq, t._3))).toSeq
        .toDF("cent_id", "cent_vec", "cent_norm")
      Similarity.assignCells(allRows, "id", table)
        .select(col("old_cell"), col("id"), col("vecd"),
          col("cell").cast("long").as("new_cell"))
        .localCheckpoint(true)
    }
    var assigned = reassign()
    var iters = 0
    var done = false
    while (!done) {
      require(iters < 8,
        s"cell $cell cannot split under $maxPerShard within 8 seed " +
          "additions — indistinguishable vectors cannot split apart")
      val seedIds = seeds.map(_._1).toSet
      val counts = assigned.groupBy("new_cell").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val overSeed = counts.exists { case (c, n) =>
        seedIds.contains(c) && n > maxPerShard }
      if (overSeed) {
        val cands = eligible.filter(t => !seedIds.contains(t._1))
        require(cands.nonEmpty,
          s"cell $cell cannot split under $maxPerShard: every eligible " +
            "member is already a seed (indistinguishable vectors?)")
        seeds = seeds :+ cands.minBy(t =>
          (seeds.map(s => cosTo(t._2, t._3, s._2, s._3)).max, t._1))
        assigned = reassign()
        iters += 1
      } else {
        // a NON-seed cell the dissolved cell's members would overfill
        // is pre-split recursively, then this split restarts clean
        val overfull = counts.filter { case (c, n) =>
          !seedIds.contains(c) && c != cell && n > maxPerShard }
          .keys.toSeq.sorted
        if (overfull.nonEmpty) {
          overfull.foreach { c =>
            splitCell(spark, dir, c, s"$tag-m$c", m, efConstruction,
              maxPerShard, depth + 1)
          }
          return splitCell(spark, dir, cell, s"$tag-r", m,
            efConstruction, maxPerShard, depth + 1)
        }
        done = true
      }
    }
    // commit: revised quantizer + a full deterministic rebuild of every
    // AFFECTED cell (lost or gained a row) from its new membership
    val affected = assigned
      .filter(col("old_cell") =!= col("new_cell"))
      .select(explode(array(col("old_cell"), col("new_cell"))).as("c"))
      .distinct().collect().map(_.getLong(0)).toSet + cell
    val affectedSeq = affected.toSeq.sorted
    (otherCents.map(t => (t._1, t._2.toSeq, t._3)) ++
      seeds.map(t => (t._1, t._2.toSeq, t._3))).toSeq
      .toDF("cent_id", "cent_vec", "cent_norm")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/centroids-$tag")
    val rebuilt = assigned
      .filter(col("new_cell").isin(affectedSeq: _*))
      .select(col("new_cell").as("cell"), col("id"), col("vecd"))
      .as[(Long, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (c, it) =>
        val rows = it.map { case (_, id, v) => (id, v) }.toArray
        require(rows.length <= maxPerShard,
          s"cell $c holds ${rows.length} rows past $maxPerShard after " +
            "the split — capacity check missed it (bug)")
        val g = GraphAnn.buildGraphFromRows(rows.sortBy(_._1).toIndexedSeq,
          m, efConstruction)
        g.ids.indices.iterator.map { i =>
          (c, i.toLong, g.ids(i),
            g.vecs.slice(i * g.dim, (i + 1) * g.dim).toSeq,
            g.nbrs(i).map(g.ids(_)).toSeq)
        }
      }.toDF("cell", "ord", "id", "vec", "nbr_ids")
    rebuilt.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/graphs-$tag")
    // affected cells that end EMPTY (every row left) drop out of the
    // manifest entirely; the rest repoint at the rebuild
    val nonEmpty = assigned.filter(col("new_cell").isin(affectedSeq: _*))
      .select("new_cell").distinct().collect().map(_.getLong(0)).toSet
    val updated = (manifest -- affected) ++
      affectedSeq.filter(nonEmpty.contains)
        .map(c => c -> s"graphs-$tag/cell=$c")
    commitManifest(dir, s"manifest-$tag", updated, s"centroids-$tag")
    seeds.map(_._1)
  }

  private def tombPath(dir: String) = Paths.get(dir, "tombstones")

  /** Ids tombstoned since the last [[vacuumDeleted]]. */
  def tombstones(dir: String): Set[Long] =
    if (!Files.exists(tombPath(dir))) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(tombPath(dir)).asScala
        .filter(_.nonEmpty).map(_.toLong).toSet
    }

  /** DELETE vectors from the sharded tier — [[StreamGraphIndex.delete]]'s
    * corpus-scale twin, same MARK-DELETE discipline: tombstoned ids are
    * filtered from every serve path's results immediately (deleted
    * nodes remain traversal waypoints), and [[vacuumDeleted]] later
    * drops them physically at per-cell cost. Presence is NOT checked
    * (that would cost an O(index) scan per call); absent ids filter
    * nothing and the vacuum clears them. Atomic tombstone-file rewrite;
    * idempotent. Returns newly recorded ids. */
  def delete(spark: SparkSession, dir: String, ids: Seq[Long]): Long = {
    require(ids.size <= graft.store.ClaimRetraction.MaxRetractIds,
      s"${ids.size} deletion ids exceed the " +
        s"${graft.store.ClaimRetraction.MaxRetractIds} batch ceiling")
    require(Files.exists(markerPath(dir)),
      s"no sharded index at $dir — nothing to delete from")
    val existing = tombstones(dir)
    val fresh = ids.toSet.diff(existing)
    if (fresh.nonEmpty) {
      val merged = (existing ++ fresh).toSeq.sorted
      val tmp = Paths.get(dir, "tombstones.tmp")
      Files.write(tmp, merged.mkString("\n").getBytes)
      Files.move(tmp, tombPath(dir), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    fresh.size.toLong
  }

  /** Audit read for [[delete]]: ids among `ids` still SERVABLE — stored
    * in some cell AND not tombstoned (0 after a completed delete; the
    * takedown verification [[graft.pipeline.Forget.verify]] reads).
    * Costs one pruned id-column scan over the manifest cells — the
    * audit is a rare administrative event. */
  def held(spark: SparkSession, dir: String, ids: Seq[Long]): Long = {
    require(Files.exists(markerPath(dir)),
      s"no sharded index at $dir — nothing to audit")
    val live = ids.toSet.diff(tombstones(dir))
    if (live.isEmpty) 0L
    else {
      val manifest = readManifest(dir)
      graft.store.ClaimRetraction.among(
        loadShardRows(spark, dir, manifest, manifest.keys.toSeq),
        col("id"), live.toSeq)
        .select("id").distinct().count()
    }
  }

  /** Filter a candidate frame to live ids — the serve paths' mark-delete
    * gate (a no-op when nothing is tombstoned). Broadcast anti-join, not
    * an in-list: the tombstone set is bounded by the retraction ceiling,
    * far past what an expression tree should carry. */
  private def dropTombstoned(dir: String, cand: DataFrame,
                             idCol: String): DataFrame = {
    val tombs = tombstones(dir)
    if (tombs.isEmpty) cand
    else {
      val spark = cand.sparkSession
      import spark.implicits._
      cand.join(broadcast(tombs.toSeq.toDF("_tid")),
        cand(idCol) === col("_tid"), "left_anti")
    }
  }

  /** PHYSICALLY drop tombstoned vectors: rebuild ONLY the cells that
    * contain them (deterministic ascending-id executor rebuilds from
    * the survivors — the bootstrap's own construction), repoint those
    * cells in a fresh manifest (cells whose every member died drop from
    * the manifest entirely), and clear the tombstone file. Cost is
    * O(touched cells) rebuild + one pruned id-column scan to find them
    * — never an O(index) rewrite; a crash between the manifest commit
    * and the tombstone clear leaves only absent-id tombstones (harmless
    * filters, cleared by the next vacuum). Returns the rebuilt (or
    * dropped) cell ids. */
  def vacuumDeleted(spark: SparkSession, dir: String, tag: String,
                    m: Int = 16, efConstruction: Int = 64): Seq[Long] = {
    import spark.implicits._
    val tombs = tombstones(dir)
    if (tombs.isEmpty) Seq.empty
    else {
      val manifest = readManifest(dir)
      val tombsDf = broadcast(tombs.toSeq.toDF("_tid"))
      val all = loadShardRows(spark, dir, manifest,
        manifest.keys.toSeq.sorted)
      val hit = all.select(col("cell"), col("id"))
        .join(tombsDf, col("id") === col("_tid"), "left_semi")
        .select("cell").distinct().collect().map(_.getLong(0)).toSeq.sorted
      if (hit.nonEmpty) {
        val rebuilt = loadShardRows(spark, dir, manifest, hit)
          .join(tombsDf, col("id") === col("_tid"), "left_anti")
          .select(col("cell").cast("long"), col("id").cast("long"),
            col("vec"))
          .as[(Long, Long, Seq[Double])]
          .groupByKey(_._1)
          .flatMapGroups { (cell, it) =>
            val rows = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
            val g = GraphAnn.buildGraphFromRows(rows.toIndexedSeq, m,
              efConstruction)
            g.ids.indices.iterator.map { i =>
              (cell, i.toLong, g.ids(i),
                g.vecs.slice(i * g.dim, (i + 1) * g.dim).toSeq,
                g.nbrs(i).map(g.ids(_)).toSeq)
            }
          }.toDF("cell", "ord", "id", "vec", "nbr_ids")
          .localCheckpoint(true)
        val alive = rebuilt.select("cell").distinct()
          .collect().map(_.getLong(0)).toSet
        if (alive.nonEmpty)
          rebuilt.write.mode("overwrite").partitionBy("cell")
            .parquet(s"$dir/graphs-$tag")
        val updated = (manifest -- hit) ++
          hit.filter(alive).map(c => c -> s"graphs-$tag/cell=$c")
        commitManifest(dir, s"manifest-$tag", updated,
          readCentroidsRel(dir))
      }
      Files.deleteIfExists(tombPath(dir))
      hit
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
    val cents = currentCentroids(spark, dir)
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
    val centIds = currentCentroids(spark, dir)
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
    val cents = currentCentroids(spark, dir)
    val probed = GraphShards.bruteProbe(queries, idCol, vecCol, cents,
      nprobe)
    val manifest = readManifest(dir)
    val cells = probed.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    dropTombstoned(dir, GraphShards.walkShards(probed, idCol,
      loadShardRows(spark, dir, manifest, cells), ef, excludeSelf), idCol)
  }

  private def serveProbed(probed: DataFrame, idCol: String, dir: String,
                          k: Int, ef: Int,
                          excludeSelf: Boolean): DataFrame = {
    val spark = probed.sparkSession
    val manifest = readManifest(dir)
    val cells = probed.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    // tombstones filter BEFORE the rank window: each walk returns ef
    // candidates, so survivors fill the top-k naturally (mark-delete)
    val cand = dropTombstoned(dir, GraphShards.walkShards(probed, idCol,
      loadShardRows(spark, dir, manifest, cells), ef, excludeSelf), idCol)
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_r").desc, col(idCol).asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("cos_r"), col("rank"))
  }

  /** VACUUM: delete version roots (`graphs-*`, and `centroids-*`
    * quantizer revisions) that the CURRENT manifest references nowhere,
    * plus superseded manifest files — the storage GC the manifest chain
    * needs (every repointed cell strands its old shard file; a root
    * whose every cell is superseded is dead weight; every [[splitCell]]
    * strands the previous quantizer revision). Partially-referenced
    * roots are kept whole (their live cells still serve). Never touches
    * `boot/` (the original build, including the pre-split centroid
    * sidecar), the current manifest, or the marker; safe to run any
    * time between commits — readers resolve only through the manifest,
    * so deleting unreferenced roots cannot disturb a search
    * (spec-pinned). Returns the deleted root names. */
  def vacuum(dir: String): Seq[String] = {
    val p = markerPath(dir)
    require(Files.exists(p), s"no sharded index at $dir — bootstrap first")
    val currentManifest = new String(Files.readAllBytes(p)).trim
    val manifest = readManifest(dir)
    val liveRoots = manifest.values.map(_.split("/")(0)).toSet +
      readCentroidsRel(dir).split("/")(0)
    val root = new java.io.File(dir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val deadDirs = root.listFiles()
      .filter(f => f.isDirectory &&
        (f.getName.startsWith("graphs-") ||
          f.getName.startsWith("centroids-")) &&
        !liveRoots.contains(f.getName))
      .map { f => rm(f); f.getName }.toSeq
    root.listFiles()
      .filter(f => f.isFile && f.getName.startsWith("manifest-") &&
        f.getName != currentManifest)
      .foreach(_.delete())
    deadDirs.sorted
  }
}
