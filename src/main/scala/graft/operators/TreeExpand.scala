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
    var frontierRows = frontier0.collect()
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
      childOf.unpersist(blocking = false)
      throw new IllegalStateException(
        s"TreeExpand did not converge within maxDepth=$maxDepth — " +
          "cyclic or corrupt edge set? (matches Components.of fail-loud policy)")
    }
    childOf.unpersist(blocking = false)
    acc.select(col("_id").as(idCol), col("_root").as("root"),
      col("_depth").as("depth"), col("_path").as("path"))
  }
}
