package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PER-CELL graph sharding — the graph tier past [[GraphAnn]]'s driver
  * ceiling: one deterministic NSW graph PER IVF CELL, built in
  * EXECUTORS (each cell's rows group to one task, which runs the exact
  * [[GraphAnn.buildGraphFromRows]] construction the monolithic tier
  * uses) and stored as a parquet sidecar PARTITIONED BY cell. Capacity
  * is cells × maxPerShard — the corpus scales by adding cells (the
  * quantizer's job) while each shard stays bounded, so NO single graph
  * ever exceeds a task's memory: the faiss IVF-HNSW layout with the
  * cell graphs on the DATA side rather than only the centroid side
  * ([[GraphAnn.ivfGraphProbeBatch]] remains the centroid-side
  * composition; this tier replaces the probed cells' EXACT within-cell
  * scan with a beam walk).
  *
  * Serving shape: rank cells per query against the index's own centroid
  * sidecar (broadcast — the q40 probe), PRUNE the shard read to the
  * probed cells (partition filter on the `cell` directory key), then
  * COGROUP probed shards with their probing queries on the cell key:
  * each task reconstructs its cell's graph once and walks every query
  * probing that cell — per-batch work is O(probed shards + |Q|·walks),
  * and the corpus outside the probed cells is never read at all. The
  * per-batch shard load is the honest price of a stateless serving
  * plan; a standing service would pin hot cell graphs in memory.
  *
  * Recall factors as probe-recall(nprobe) × walk-recall(ef): the walk
  * recall is the graph tier's measured ~0.95+, so at a MATCHED scan
  * cost the sharded tier buys MORE probed cells than exact-scan IVF
  * (each walk touches ~ef·M/cell-fraction instead of the whole cell)
  * — measured on both axes in the `ann_recall`/`ann_cost` sidecar
  * (`graph_sharded`). */
object GraphShards {

  /** Per-shard ceiling: a cell's graph must fit ONE task comfortably
    * (n·(dim·8 + M·8) bytes + construction transients). Loud, never
    * truncating — the monolithic tier's discipline, per shard. */
  val MaxShardVectors: Int = 1 << 17

  /** Build the sharded index at `dir`: `graphs/` (one NSW graph per
    * cell, partitioned by cell; rows are (ord, id, vec, nbr_ids) in
    * insertion order — [[GraphAnn.writeIndex]]'s schema plus the cell
    * key) and `centroids/` (the quantizer, so index and probe can
    * never disagree). Rows with NULL cells (malformed vectors, like
    * [[Similarity.assignCells]]) are excluded. Each cell builds with
    * ascending-id insertion — bitwise the graph [[GraphAnn.buildGraph]]
    * would build over that cell alone. */
  def buildShardedIndex(corpus: DataFrame, idCol: String, vecCol: String,
                        cents: DataFrame, dir: String,
                        m: Int = 16, efConstruction: Int = 64,
                        maxPerShard: Int = MaxShardVectors): Unit = {
    require(m >= 1 && efConstruction >= m, "need efConstruction >= m >= 1")
    require(maxPerShard >= 1, "maxPerShard must be >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = Similarity.withNorm(corpus, vecCol)
    val assigned = Similarity.assignCells(base, idCol, cents)
      .filter(col("cell").isNotNull)
      .select(col("cell").cast("long"), col(idCol).cast("long"),
        col("vecd"))
      .as[(Long, Long, Seq[Double])]
    assigned.groupByKey(_._1).flatMapGroups { (cell, it) =>
      // the per-SHARD ceiling is loud, never truncating: stop buffering
      // one row past the cap and fail if it was reached
      val rows = it.map { case (_, id, v) => (id, v) }
        .take(maxPerShard + 1).toArray
      require(rows.length <= maxPerShard,
        s"cell $cell holds more than $maxPerShard vectors: past the " +
          "per-shard graph ceiling — refine the quantizer (more cells) " +
          "or raise maxPerShard with the task-memory arithmetic")
      val g = GraphAnn.buildGraphFromRows(
        rows.sortBy(_._1).toIndexedSeq, m, efConstruction)
      g.ids.indices.iterator.map { i =>
        (cell, i.toLong, g.ids(i),
          g.vecs.slice(i * g.dim, (i + 1) * g.dim).toSeq,
          g.nbrs(i).map(g.ids(_)).toSeq)
      }
    }.toDF("cell", "ord", "id", "vec", "nbr_ids")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/graphs")
    cents.select(col("cent_id").cast("long"), col("cent_vec"),
      col("cent_norm"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Candidate stage with the measured walk cost attached — one row per
    * beam hit: (qid, id, cos_r, cell, visits) where `visits` is THAT
    * walk's distance evaluations (constant across a (qid, cell)
    * walk's rows). [[AnnRecall]] reads the cost axis from here;
    * [[shardedTopKBatch]] is the public top-k. */
  private[operators] def shardedCandidates(
      queries: DataFrame, idCol: String, vecCol: String, dir: String,
      nprobe: Int, ef: Int, excludeSelf: Boolean): DataFrame = {
    require(nprobe >= 1 && ef >= 1, "need nprobe >= 1 and ef >= 1")
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    val probed = bruteProbe(queries, idCol, vecCol, cents, nprobe)
    walkCandidates(probed, idCol, dir, ef, excludeSelf)
  }

  /** Per-query brute cell ranking against an explicit centroid table —
    * (cell, qid, qvec), checkpointed so the probe computes once. */
  private[graft] def bruteProbe(queries: DataFrame, idCol: String,
                                vecCol: String, cents: DataFrame,
                                nprobe: Int): DataFrame = {
    val q = Similarity.withNorm(queries, vecCol)
      .select(col(idCol).cast("long").as("qid"), col("vecd").as("qvec"),
        // zero-norm queries fail LOUD in-plan (the corpus-side
        // 'cosine undefined' contract) — NaN centroid cosines would
        // silently rank garbage cells
        when(col("norm") > 0, col("norm"))
          .otherwise(raise_error(concat(
            lit("zero-norm query vector qid="), col(idCol).cast("string"),
            lit(": cosine undefined")))).as("qnorm"))
    val wProbe = Window.partitionBy("qid")
      .orderBy(col("cent_cos").desc, col("cent_id").asc)
    cents.crossJoin(broadcast(q))
      .withColumn("cent_cos", Similarity.cosine(
        col("qvec"), col("cent_vec"), col("qnorm"), col("cent_norm")))
      .withColumn("_pr", row_number().over(wProbe))
      .filter(col("_pr") <= nprobe)
      .select(col("cent_id").cast("long").as("cell"), col("qid"),
        col("qvec"))
      .localCheckpoint(true)
  }

  /** The WALK stage against an explicit (cell, qid, qvec) probe table —
    * shared by the brute-probed [[shardedCandidates]] and the
    * graph-probed [[shardedTopKBatchGraphProbe]]. */
  private def walkCandidates(probed: DataFrame, idCol: String,
                             dir: String, ef: Int,
                             excludeSelf: Boolean): DataFrame = {
    val spark = probed.sparkSession
    // probed cells are driver-bounded (≤ |C|): collect them so the
    // shard read PRUNES to probed partitions — the unprobed corpus is
    // never read
    val cells = probed.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val shards = spark.read.parquet(s"$dir/graphs")
      .filter(col("cell").isin(cells: _*))
    walkShards(probed, idCol, shards, ef, excludeSelf)
  }

  /** Reconstruct one cell's graph from its (ord-sorted) shard rows —
    * [[GraphAnn.loadIndex]]'s rule, shared with the streaming
    * maintenance tier. */
  private[graft] def graphOfShardRows(
      sorted: Array[(Long, Long, Long, Seq[Double], Seq[Long])])
      : GraphAnn.Graph = {
    val n = sorted.length
    val ids = sorted.map(_._3)
    val idToIdx = ids.zipWithIndex.toMap
    val dim = sorted(0)._4.length
    val vecs = new Array[Double](n * dim)
    val norms = new Array[Double](n)
    val nbrs = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val v = sorted(i)._4
      var acc = 0.0
      var d = 0
      while (d < dim) { val x = v(d); vecs(i * dim + d) = x; acc += x * x; d += 1 }
      norms(i) = math.sqrt(acc)
      nbrs(i) = sorted(i)._5.map(idToIdx).toArray
      i += 1
    }
    GraphAnn.Graph(ids, dim, vecs, norms, nbrs)
  }

  /** The walk against an EXPLICIT shard-row frame (cell, ord, id, vec,
    * nbr_ids) — the manifest-versioned streaming tier supplies its own
    * pruned union here ([[graft.streaming.StreamGraphShards]]). */
  private[graft] def walkShards(probed: DataFrame, idCol: String,
                                shardRows: DataFrame, ef: Int,
                                excludeSelf: Boolean): DataFrame = {
    val spark = probed.sparkSession
    import spark.implicits._
    val shards = shardRows
      .select(col("cell").cast("long"), col("ord").cast("long"),
        col("id").cast("long"), col("vec"), col("nbr_ids"))
      .as[(Long, Long, Long, Seq[Double], Seq[Long])]
      .groupByKey(_._1)
    val probes = probed.as[(Long, Long, Seq[Double])].groupByKey(_._1)
    shards.cogroup(probes) { (_, sIt, qIt) =>
      val qs = qIt.toArray
      if (qs.isEmpty) Iterator.empty
      else {
        val rows = sIt.toArray
        if (rows.isEmpty) Iterator.empty // empty cell: no candidates, like IVF
        else {
          // reconstruct in insertion order (ord), adjacency verbatim —
          // loadIndex's rule, per cell
          val sorted = rows.sortBy(_._2)
          val cellId = sorted(0)._1
          val g = graphOfShardRows(sorted)
          qs.iterator.flatMap { case (_, qid, qv) =>
            val qarr = qv.toArray
            val qn = math.sqrt(qarr.map(x => x * x).sum)
            // mirror the corpus-side 'cosine undefined' contract
            // (GraphAnn.allocGraph/insertVectorsLocal require norm > 0):
            // a zero-norm query fails LOUD, never NaN-beams to garbage
            require(qn > 0, s"zero-norm query vector qid=$qid: " +
              "cosine undefined")
            val hits = GraphAnn.beam(g, qarr, qn, entry = 0, ef = ef)
            val visits = GraphAnn.lastVisited()
            hits.iterator
              .filter { case (i2, _) => !excludeSelf || g.ids(i2) != qid }
              .map { case (i2, s) =>
                val rounded = java.math.BigDecimal.valueOf(s)
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
                (qid, g.ids(i2), rounded, cellId, visits)
              }
          }
        }
      }
    }.toDF("qid", idCol, "cos_r", "cell", "visits")
  }

  /** BATCH search over the sharded index: per-query cell ranking, pruned
    * shard read, cogrouped beam walks, then the global per-query top-k.
    * Output (qid, idCol, cos_r, rank) — [[GraphAnn.graphTopKBatch]]'s
    * schema, so the monolithic and sharded tiers swap freely. */
  def shardedTopKBatch(queries: DataFrame, idCol: String, vecCol: String,
                       dir: String, k: Int, nprobe: Int = 2, ef: Int = 64,
                       excludeSelf: Boolean = true): DataFrame = {
    require(k >= 1 && ef >= k, "need ef >= k >= 1")
    val cand = shardedCandidates(queries, idCol, vecCol, dir, nprobe, ef,
      excludeSelf)
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_r").desc, col(idCol).asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("cos_r"), col("rank"))
  }

  /** [[shardedTopKBatch]] with the CENTROID ranking itself served by a
    * graph — the faiss IVF-HNSW shape at BOTH levels: the bounded
    * centroid table gets a beam walk ([[GraphAnn.graphTopKBatch]] over
    * `cg`, cutting the per-query cell ranking from |C| to ~ef·M at
    * 64k+ centroids), and the probed cells' corpora get beam walks
    * through their shard graphs. With `efProbe ≥ |C|` the centroid beam
    * saturates and the operator EQUALS [[shardedTopKBatch]] exactly
    * (GraphShardsSpec's control); at scale the probe becomes
    * approximate with the graph tier's measured recall. The same
    * bidirectional staleness guards as
    * [[GraphAnn.ivfGraphProbeBatchWith]] apply: the centroid graph and
    * the index's centroid sidecar must name the same cells, both ways,
    * or cells would silently vanish from every probe. */
  def shardedTopKBatchGraphProbe(queries: DataFrame, idCol: String,
                                 vecCol: String, dir: String,
                                 cg: GraphAnn.Graph, k: Int,
                                 nprobe: Int = 2, ef: Int = 64,
                                 efProbe: Int = 64,
                                 excludeSelf: Boolean = true): DataFrame = {
    require(k >= 1 && ef >= k, "need ef >= k >= 1")
    require(nprobe >= 1 && efProbe >= nprobe, "need efProbe >= nprobe >= 1")
    val spark = queries.sparkSession
    val centIds = spark.read.parquet(s"$dir/centroids")
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
    // rank cells by walking the centroid graph (self-exclusion OFF:
    // cent_ids and query ids are different id spaces), then attach the
    // query vectors for the shard walks
    val probedCells = GraphAnn.graphTopKBatch(queries, idCol, vecCol, cg,
      k = nprobe, ef = efProbe, excludeSelf = false)
      .select(col("qid"), col(idCol).as("cell"))
    val q = Similarity.withNorm(queries, vecCol)
      .select(col(idCol).cast("long").as("qid"), col("vecd").as("qvec"))
    val probed = probedCells.join(broadcast(q), Seq("qid"))
      .select(col("cell"), col("qid"), col("qvec"))
      .localCheckpoint(true)
    val cand = walkCandidates(probed, idCol, dir, ef, excludeSelf)
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_r").desc, col(idCol).asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("cos_r"), col("rank"))
  }
}
