package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected pair graph — the step that turns
  * near-duplicate PAIRS (Jaccard/MinHash output) into duplicate CLUSTERS
  * with one canonical id each, so a dedup pipeline can keep exactly one
  * representative per cluster.
  *
  * Algorithm: min-label propagation — every node starts labeled with its
  * own id; each round takes the min of its own and its neighbors' labels;
  * fixpoint after O(component diameter) rounds. Near-dup clusters are
  * small and shallow, so this converges in 2-4 rounds; the symmetrized
  * edge list is partitioned by source once and reused each round, and
  * labels are localCheckpoint'ed to cap lineage (same regime as
  * [[TreeExpand]]).
  */
object Components {

  /** @return (id, component) for every node appearing in `edges`, where
    *         component = min node id of the connected component. */
  def of(edges: DataFrame, aCol: String, bCol: String,
         maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var round = 0
    var changed = true
    while (changed) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"Components.of did not converge in $maxRounds rounds — " +
            "component diameter exceeds maxRounds; raise it")
      round += 1
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("dlabel")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dlabel")).as("nlabel"))
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint()
      changed = next
        .join(labels.select(col("id"), col("label").as("old")), "id")
        .filter(col("label") =!= col("old"))
        .head(1).nonEmpty
      labels = next
    }
    sym.unpersist(blocking = false)
    labels.select(col("id"), col("label").as("component"))
  }
}
