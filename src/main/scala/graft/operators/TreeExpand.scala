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
    * @return (id, root, depth: int, path: string "root/…/id")
    */
  def expand(
      edges: DataFrame,
      roots: DataFrame,
      idCol: String = "id",
      parentCol: String = "parent",
      maxDepth: Int = 1000): DataFrame = {
    val childOf = edges
      .select(col(idCol).as("_id"), col(parentCol).as("_parent"))
      .filter(col("_parent").isNotNull)
      .repartition(col("_parent"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var frontier = roots
      .select(col(idCol).as("_id"))
      .distinct()
      .select(col("_id"), col("_id").as("_root"), lit(0).as("_depth"),
        col("_id").cast("string").as("_path"))
      .localCheckpoint()
    var acc = frontier
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      // the frontier is one tree level — broadcast it so the (large, cached,
      // parent-partitioned) edge side streams with no shuffle or sort per
      // level. A production variant flips to a shuffle join past a frontier
      // size threshold; test-scale frontiers are always broadcastable.
      // coalesce before the eager checkpoint: frontiers are small, and 32
      // near-empty partitions × (checkpoint + isEmpty) jobs per level is
      // pure scheduling overhead at test scale
      frontier = childOf
        .join(broadcast(frontier.select(col("_id").as("_pid"), col("_root"),
            col("_depth"), col("_path"))),
          col("_parent") === col("_pid"))
        .select(col("_id"), col("_root"), (col("_depth") + 1).as("_depth"),
          concat(col("_path"), lit("/"), col("_id").cast("string")).as("_path"))
        .coalesce(8)
        .localCheckpoint()
      acc = acc.unionAll(frontier)
    }
    if (!frontier.isEmpty) {
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
