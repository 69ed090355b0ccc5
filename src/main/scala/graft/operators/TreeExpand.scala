package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Recursive tree expansion (SURVEY.md J3): the set-based replacement for the
  * reference's `build_item_tree` (`/root/reference/hnarchive.py:306-319`),
  * which issues one SQL point-query per tree node (N+1 pattern). Spark has no
  * recursive CTE, so this is the classic semi-naive BFS: one self-join per
  * tree *level* (not per node), accumulating (id, root, depth, path).
  *
  * Scale design:
  *  - `edges` is repartitioned by the parent key once and cached, so every
  *    iteration's join reuses the same partitioning — the frontier (small
  *    side) moves to the edges, never the reverse.
  *  - each round is `localCheckpoint`ed to cut lineage growth (otherwise the
  *    plan doubles per level and the driver OOMs planning level ~30).
  *  - termination is the fixpoint (empty frontier) with a maxDepth fuse
  *    against cyclic/corrupt edge sets.
  */
object TreeExpand {

  /** @param edges (idCol, parentCol) adjacency rows, parent NULL for roots
    * @param roots one column `idCol`: the subtree roots to expand (included
    *              in the output at depth 0)
    * @param levelsPerRound BFS levels expanded inside ONE physical plan per
    *              driver round. Each round costs a fixed ~2 jobs
    *              (materialize batch, fetch next frontier) regardless of
    *              how many levels it covers, so batching divides the
    *              dominant driver-scheduling cost by the batch size;
    *              Catalyst's exchange reuse keeps the chained joins linear.
    * @return (id, root, depth: int, path: string "root/…/id")
    */
  def expand(
      edges: DataFrame,
      roots: DataFrame,
      idCol: String = "id",
      parentCol: String = "parent",
      maxDepth: Int = 1000,
      levelsPerRound: Int = 4,
      useBroadcast: Boolean = true): DataFrame = {
    require(levelsPerRound >= 1, "levelsPerRound must be >= 1")
    val childOf = edges
      .select(col(idCol).as("_id"), col(parentCol).as("_parent"))
      .filter(col("_parent").isNotNull)
      .repartition(col("_parent"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    def step(level: DataFrame, bcast: Boolean): DataFrame = {
      // level 1 of a round broadcasts the (checkpointed, small) frontier so
      // the cached parent-partitioned edge side streams with no shuffle;
      // deeper in-plan levels are lazy, so they shuffle instead (tiny) —
      // broadcasting them would force per-level materialization jobs back in
      val keyed = level.select(col("_id").as("_pid"), col("_root"),
        col("_depth"), col("_path"))
      val probe = if (bcast && useBroadcast) broadcast(keyed)
                  else keyed.hint("shuffle_hash")
      childOf
        .join(probe, col("_parent") === col("_pid"))
        .select(col("_id"), col("_root"), (col("_depth") + 1).as("_depth"),
          concat(col("_path"), lit("/"), col("_id").cast("string")).as("_path"))
    }

    val spark = edges.sparkSession
    val frontier0 = roots
      .select(col(idCol).as("_id"))
      .distinct()
      .select(col("_id"), col("_id").as("_root"), lit(0).as("_depth"),
        col("_id").cast("string").as("_path"))

    // Broadcast mode keeps the frontier on the DRIVER between rounds: the
    // frontier must fit in a broadcast anyway, so collecting it makes the
    // emptiness check free and turns the join side into a local relation
    // (broadcast build without a cluster job) — 2 jobs per round
    // (materialize + frontier fetch) instead of 3. The useBroadcast=false
    // path never collects and is the wide-frontier fallback.
    var frontierRows: Array[org.apache.spark.sql.Row] =
      if (useBroadcast) frontier0.collect() else Array.empty
    val frontierSchema = frontier0.schema
    def localFrontier() = spark.createDataFrame(
      java.util.Arrays.asList(frontierRows: _*), frontierSchema)

    var frontier: DataFrame = if (useBroadcast) localFrontier() else
      frontier0.localCheckpoint()
    var acc = frontier
    var depth = 0
    def frontierEmpty: Boolean =
      if (useBroadcast) frontierRows.isEmpty else frontier.isEmpty
    while (depth < maxDepth && !frontierEmpty) {
      val rounds = math.min(levelsPerRound, maxDepth - depth)
      var levels = List(step(frontier, bcast = true))
      (2 to rounds).foreach { _ => levels = step(levels.head, bcast = false) :: levels }
      // one job materializes every level of the batch (coalesced: frontiers
      // are small and 32 near-empty partitions per probe is pure overhead)
      val batch = levels.reverse.reduce(_ unionAll _)
        .coalesce(8)
        .localCheckpoint()
      depth += rounds
      if (useBroadcast) {
        frontierRows = batch.filter(col("_depth") === depth).collect()
        frontier = localFrontier()
      } else {
        frontier = batch.filter(col("_depth") === depth)
      }
      acc = acc.unionAll(batch)
    }
    if (!frontierEmpty) {
      // nodes at exactly depth == maxDepth may simply be leaves: a tree of
      // height maxDepth converged legitimately. Only fail if the frontier
      // actually has children (rows would exist at depth maxDepth + 1) —
      // same contract as expandByDoubling, which rejects only _dist > maxDepth
      val deeper = step(frontier, bcast = true).head(1).nonEmpty
      if (deeper) {
        childOf.unpersist(blocking = false)
        throw new IllegalStateException(
          s"TreeExpand did not converge within maxDepth=$maxDepth — " +
            "cyclic or corrupt edge set? (matches Components.of fail-loud policy)")
      }
    }
    childOf.unpersist(blocking = false)
    acc.select(col("_id").as(idCol), col("_root").as("root"),
      col("_depth").as("depth"), col("_path").as("path"))
  }

  /** Pointer-doubling expansion: [[expand]]'s output contract in
    * O(log depth) rounds instead of O(depth / levelsPerRound), with ONE
    * qualification — NEAREST-ROOT semantics. Each node is attributed to the
    * closest chosen root on its ancestor path (one output row per node),
    * whereas [[expand]] emits a node once per covering root. The two agree
    * exactly whenever the chosen roots are disjoint subtrees (the typical
    * case — q11's siblings, q55's single chain; spec-pinned); for nested
    * roots use [[expand]].
    *
    * Every node tracks (ptr, dist, seg): its current known ancestor, the
    * distance to it, and the path from just below that ancestor down to
    * itself. Each round contracts chains by joining every unfinished node
    * to its ancestor's state — ptr jumps 2^k parents per round. The chosen
    * roots act as cut points (their ptr starts null), so chains terminate
    * at the nearest chosen root; nodes whose chains end elsewhere are
    * outside the requested subtrees and drop out.
    *
    * Trade-off vs BFS: every round self-joins the WHOLE node table (the
    * frontier trick doesn't apply), so for shallow trees — HN comment
    * threads — the BFS is cheaper. This is the deep-chain fallback: depth
    * 10^3 costs 10 rounds instead of 250. Because it computes globally, it
    * also fails loud on cyclic edges ANYWHERE in the table, where the BFS
    * only trips on cycles reachable from the chosen roots. */
  /** @param withPath when false, path accumulation is skipped and the
    *        output `path` column is just the node id. On a DEEP chain the
    *        materialized paths are quadratic in total size (node k's path
    *        has k components) — depth-only expansion is the only sane mode
    *        there, and it's what depth/root analyses need. */
  def expandByDoubling(
      edges: DataFrame,
      roots: DataFrame,
      idCol: String = "id",
      parentCol: String = "parent",
      maxDepth: Int = 1000,
      withPath: Boolean = true): DataFrame = {
    val idType = edges.schema(idCol).dataType
    val rootSet = roots.select(col(idCol).as("_rid")).distinct()
      .localCheckpoint(true)
    // State per node: _ptr  = current jump target (null ⟺ chain resolved)
    //                 _term = terminal node once resolved (a cut point:
    //                         chosen root, or a real root — filtered later)
    //                 _dist = distance to _ptr (unresolved) / _term (resolved)
    //                 _seg  = path ids from just below the anchor to _id;
    //                         final path = _term "/" _seg (or _seg at dist 0)
    // seed from edges ∪ chosen roots absent from the edge table — expand()
    // emits a depth-0 row for every requested root regardless of presence
    // (the dedup only ever collapses chosen-root rows, whose parent is cut
    // to null right below — so first()'s pick among duplicates is moot)
    val seedNodes = edges
      .select(col(idCol).as("_id"), col(parentCol).as("_parent"))
      .unionAll(rootSet.select(col("_rid").as("_id"),
        lit(null).cast(edges.schema(parentCol).dataType).as("_parent")))
      .groupBy("_id").agg(first(col("_parent"), ignoreNulls = false).as("_parent"))
    var state = seedNodes
      .join(broadcast(rootSet), col("_id") === col("_rid"), "left")
      .select(col("_id"),
        when(col("_rid").isNotNull || col("_parent").isNull,
          lit(null).cast(idType)).otherwise(col("_parent")).as("_ptr"),
        when(col("_rid").isNotNull || col("_parent").isNull, col("_id"))
          .otherwise(lit(null).cast(idType)).as("_term"),
        when(col("_rid").isNotNull || col("_parent").isNull, lit(0))
          .otherwise(lit(1)).as("_dist"),
        col("_id").cast("string").as("_seg"))
      .localCheckpoint(true)
    var rounds = 0
    val maxRounds = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxDepth.toLong))
    var open = state.filter(col("_ptr").isNotNull).count()
    while (open > 0) {
      rounds += 1
      if (rounds > maxRounds + 1)
        throw new IllegalStateException(
          s"expandByDoubling: ancestor chains exceed maxDepth=$maxDepth — " +
            "tree deeper than the bound, or a cyclic/corrupt edge set " +
            "(matches expand's fail-loud policy)")
      val anc = state.select(col("_id").as("_aid"), col("_ptr").as("_aptr"),
        col("_term").as("_aterm"), col("_dist").as("_adist"),
        col("_seg").as("_aseg"))
      val resolved = col("s._ptr").isNull
      val ancResolved = col("_aterm").isNotNull
      val ancIsTerminal = ancResolved && col("_adist") === 0
      state = state.as("s")
        .join(anc, col("s._ptr") === col("_aid"), "left")
        .select(col("s._id").as("_id"),
          when(resolved, lit(null).cast(idType))
            .when(ancResolved, lit(null).cast(idType))
            .otherwise(col("_aptr")).as("_ptr"),
          when(resolved, col("s._term"))
            .when(ancResolved, col("_aterm"))
            .otherwise(lit(null).cast(idType)).as("_term"),
          when(resolved, col("s._dist"))
            .otherwise(col("s._dist") + col("_adist")).as("_dist"),
          (if (withPath)
             when(resolved || ancIsTerminal, col("s._seg"))
               .otherwise(concat(col("_aseg"), lit("/"), col("s._seg")))
           else col("s._seg")).as("_seg"))
        .localCheckpoint(true)
      open = state.filter(col("_ptr").isNotNull).count()
    }
    val inScope = state
      .join(broadcast(rootSet), col("_term") === col("_rid"), "left_semi")
    if (inScope.filter(col("_dist") > maxDepth).head(1).nonEmpty)
      throw new IllegalStateException(
        s"expandByDoubling: subtree deeper than maxDepth=$maxDepth — " +
          "matches expand's fail-loud policy")
    inScope
      .select(col("_id").as(idCol), col("_term").as("root"),
        col("_dist").as("depth"),
        (if (withPath)
           when(col("_dist") === 0, col("_seg"))
             .otherwise(concat(col("_term").cast("string"), lit("/"), col("_seg")))
         else col("_seg")).as("path"))
  }
}
