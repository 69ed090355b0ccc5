package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Density-based pruning ([[Similarity.densityRank]], the SSL-prototypes
  * method): per-cell prototypicality rank (cosine to the assigned centroid
  * DESC) and the multiplication-form drop of the prototypical head —
  * exactly `floor(dropMilli·n_cell / 1000)` rows per cell, always the
  * rank-1.. prefix. */
class DensityPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  // Two cells (deterministic centroids at ids 0 and 4, centroidEvery = 4):
  // within each, cosine to the own centroid strictly decreases with id, so
  // ranks are the id order and the dropped head is unambiguous.
  private def handBuilt = {
    import spark.implicits._
    Seq(
      (0L, Array(1f, 0f, 0f, 0f)), // centroid of cell 0; cos 1.0  → rank 1
      (1L, Array(4f, 1f, 0f, 0f)), // cos ≈ 0.970                  → rank 2
      (2L, Array(3f, 1f, 0f, 0f)), // cos ≈ 0.949                  → rank 3
      (4L, Array(0f, 1f, 0f, 0f)), // centroid of cell 4; cos 1.0  → rank 1
      (5L, Array(0f, 5f, 1f, 0f)), // cos ≈ 0.981                  → rank 2
      (6L, Array(0f, 2f, 2f, 0f)), // cos ≈ 0.707                  → rank 3
      (7L, Array(0f, 1f, 2f, 0f))  // cos ≈ 0.447                  → rank 4
    ).toDF("vec_id", "embedding")
  }

  test("hand-built cells: ranks follow prototypicality, the drop is the " +
    "per-cell floor of the milli fraction, keep is the hard tail") {
    val r = Similarity.densityRank(handBuilt, "vec_id", "embedding",
      dropMilli = 400, centroidEvery = 4)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(3), x.getLong(4),
        x.getLong(5)))).toMap
    // (cell, rank, n_cell, kept): cell 0 drops floor(400·3/1000) = 1 row,
    // cell 4 drops floor(400·4/1000) = 1 row — the rank-1 prototypes
    assert(r(0L) == ((0L, 1L, 3L, 0L)), r.toString)
    assert(r(1L) == ((0L, 2L, 3L, 1L)))
    assert(r(2L) == ((0L, 3L, 3L, 1L)))
    assert(r(4L) == ((4L, 1L, 4L, 0L)))
    assert(r(5L) == ((4L, 2L, 4L, 1L)))
    assert(r(6L) == ((4L, 3L, 4L, 1L)))
    assert(r(7L) == ((4L, 4L, 4L, 1L)))
    val kept = Similarity.densityPruneKeep(handBuilt, "vec_id", "embedding",
      dropMilli = 400, centroidEvery = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L, 6L, 7L))
  }

  test("boundary fractions are exact: 0 keeps everything, 1000 drops " +
    "everything") {
    def keptAt(m: Long) = Similarity.densityRank(handBuilt, "vec_id",
      "embedding", dropMilli = m, centroidEvery = 4)
      .filter(col("kept") === 1L).count()
    assert(keptAt(0L) == 7L)
    assert(keptAt(1000L) == 0L)
  }

  test("fixture corpus: every cell drops exactly floor(dropMilli·n/1000) " +
    "rows and the dropped set is the rank prefix; deterministic") {
    val emb = Tables.embeddings(spark, dir)
    val r = Similarity.densityRank(emb, "vec_id", "embedding",
      dropMilli = 300, centroidEvery = 50)
    val perCell = r.groupBy("cell")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql
        .functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          (col("kept") === 0L).cast("long")).as("nDropped"),
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.when(col("kept") === 0L,
            col("rank"))).as("maxDroppedRank"))
      .collect()
    assert(perCell.nonEmpty)
    perCell.foreach { row =>
      val (n, nDropped) = (row.getLong(1), row.getLong(2))
      assert(nDropped == 300L * n / 1000L,
        s"cell ${row.get(0)}: dropped $nDropped of $n")
      // dropped rows are exactly ranks 1..nDropped — the prototype head
      if (nDropped > 0)
        assert(row.getLong(3) == nDropped,
          s"cell ${row.get(0)}: dropped ranks are not the prefix")
    }
    val a = r.orderBy("vec_id").collect().toSeq
    val b = Similarity.densityRank(emb, "vec_id", "embedding",
      dropMilli = 300, centroidEvery = 50).orderBy("vec_id").collect().toSeq
    assert(a == b, "densityRank is not deterministic")
  }

  test("plan: assignment is in-scan, the centroid join broadcasts, and " +
    "the ONE shuffle is the per-cell ranking window") {
    val emb = Tables.embeddings(spark, dir)
    val plan = Similarity.densityRank(emb, "vec_id", "embedding",
      dropMilli = 300, centroidEvery = 50)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(graft.PlanChecks.shuffleExchanges(plan) == 1,
      s"expected exactly the window's cell shuffle:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"centroid table must broadcast:\n$plan")
  }
}
