package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.GraphAnn

/** Standing GRAPH ANN index under continuous ingestion — the
  * [[StreamVectorIndex]] lifecycle applied to the NSW tier, exploiting
  * that the NSW BUILD IS a sequence of inserts
  * ([[GraphAnn.insertVectors]]): each micro-batch's vectors link into
  * the standing graph with the exact construction rule the bootstrap
  * used, and readers keep serving the previous version until the new
  * one commits.
  *
  * Durability discipline (the [[graft.store.Snapshots]] pointer
  * pattern): every absorbed batch writes a COMPLETE graph sidecar under
  * `dir/g-b<batchId>` and then swaps the `current` marker with an
  * ATOMIC_MOVE — a crash mid-write leaves the marker on the previous
  * version (the orphan directory is overwritten by the replay, never
  * read); a replayed batch re-inserts nothing (ids already present —
  * content-addressed idempotence), rewrites the same bytes, and
  * re-swaps the marker to the same value, so replays are bit-identical
  * end to end (StreamGraphIndexSpec pins adjacency equality through a
  * replay and a simulated crash).
  *
  * Scale contract is [[GraphAnn]]'s: the graph is a bounded driver
  * artifact (fail-loud ceiling) serving the ≤10⁶-vector regime — a hot
  * working set, an entry table, the centroid book of
  * [[GraphAnn.ivfGraphProbeBatch]]. Per batch the maintainer pays one
  * load + |batch| inserts + one full sidecar rewrite: O(graph), not
  * O(batch) — the honest price of a monolithic artifact (the
  * delta-log stores stay the right answer for corpus-scale indexes).
  */
object StreamGraphIndex {

  private def markerPath(dir: String) = Paths.get(dir, "current")

  /** Bootstrap ONCE over the seed corpus; subsequent batches flow
    * through [[maintainer]]. */
  def bootstrap(spark: SparkSession, dir: String, corpus: DataFrame,
                idCol: String, vecCol: String, m: Int = 16,
                efConstruction: Int = 64): Unit = {
    val g = GraphAnn.buildGraph(corpus, idCol, vecCol, m, efConstruction)
    commit(spark, dir, g, "boot")
  }

  /** The graph currently marked `current` — what readers serve. */
  def loadLatest(spark: SparkSession, dir: String): GraphAnn.Graph = {
    val p = markerPath(dir)
    require(Files.exists(p), s"no graph index at $dir — bootstrap first")
    val token = new String(Files.readAllBytes(p)).trim
    GraphAnn.loadIndex(spark, s"$dir/g-$token")
  }

  private def commit(spark: SparkSession, dir: String, g: GraphAnn.Graph,
                     token: String): Unit = {
    GraphAnn.writeIndex(g, spark, s"$dir/g-$token")
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, s"current.tmp")
    Files.write(tmp, token.getBytes)
    Files.move(tmp, markerPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The `foreachBatch` binder: absorb the micro-batch into the
    * standing graph and commit a new version. Batches that add nothing
    * (empty, or fully replayed ids) leave the marker untouched. */
  def maintainer(spark: SparkSession, dir: String, idCol: String,
                 vecCol: String, m: Int = 16, efConstruction: Int = 64)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      if (!batch.isEmpty) {
        val g = loadLatest(spark, dir)
        val g2 = GraphAnn.insertVectors(g, batch, idCol, vecCol, m,
          efConstruction)
        if (!(g2 eq g)) commit(spark, dir, g2, s"b$batchId")
      }
    }
}
