package graft.operators

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{PlanChecks, Tables, TestSpark}

/** The two-level coarse quantizer's 100 TB contract: a composite cell
  * vocabulary LARGER than the single-level shipping budget
  * ([[Similarity.MaxDriverCentroids]]) from two codebooks that each stay
  * far UNDER it, assigned with zero corpus exchanges — the regime where a
  * single-level quantizer must either blow up cell population or fall
  * back to broadcasting an O(n) centroid set. */
class TwoLevelQuantizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 6000 dim-4 vectors with deterministic pseudo-random directions —
    * big enough that stride subsamples give 300×240 = 72 000 composite
    * cells (> 64k) while shipping only 540 codebook vectors. */
  private lazy val synthetic = {
    import spark.implicits._
    (0L until 6000L).map { id =>
      (id, Seq(((id * 7) % 13 + 1).toDouble, ((id * 11) % 17 + 1).toDouble,
        ((id * 3) % 19 + 1).toDouble, 1.0))
    }.toDF("vec_id", "embedding")
  }

  test("composite vocabulary exceeds the 64k single-level budget from two " +
      "bounded codebooks; assignment takes zero corpus exchanges") {
    val base = Similarity.withNorm(synthetic, "embedding")
    val cb = Similarity.buildCodebooks(base, "vec_id",
      every1 = 20, every2 = 25, maxDriver = Similarity.MaxDriverCentroids)
    val c1 = cb.ids1.length
    val c2 = cb.ids2.length
    // the claim the single-level quantizer cannot make: more cells than
    // fit the per-task budget, from codebooks that both fit it easily
    assert(c1.toLong * c2 > Similarity.MaxDriverCentroids,
      s"composite vocabulary $c1 x $c2 must exceed the 64k budget")
    assert(c1 + c2 < Similarity.MaxDriverCentroids / 100,
      s"shipped codebooks ($c1 + $c2) must stay far under the budget")

    val assigned = Similarity.assignCellsTwoLevel(base, "vec_id",
      every1 = 20, every2 = 25)
    val plan = assigned.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(PlanChecks.shuffleExchanges(plan) == 0,
      s"two-level assignment must not exchange the corpus:\n$plan")

    // refinement bounds population: composite (cell1, cell2) cells
    // partition each level-1 cell, so the max composite population can
    // only shrink — and on this corpus it genuinely does (the level-2
    // residual split is doing real work, not relabeling)
    val l1Max = assigned.groupBy("cell1").count()
      .agg(max("count")).head.getLong(0)
    val compMax = assigned.groupBy("cell1", "cell2").count()
      .agg(max("count")).head.getLong(0)
    assert(compMax < l1Max,
      s"composite max population $compMax must refine level-1 max $l1Max")
    assert(assigned.count() == 6000) // every row assigned, none dropped
  }

  test("level-1 assignment is the single-level assignCells, unchanged") {
    val base = Similarity.withNorm(
      Tables.embeddings(spark, "/root/testdata/sf0.001"), "embedding")
    val cents = base.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cent_id"), col("vecd").as("cent_vec"),
        col("norm").as("cent_norm"))
    val single = Similarity.assignCells(base, "vec_id", cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Similarity.assignCellsTwoLevel(base, "vec_id",
      every1 = 50, every2 = 37)
      .select("vec_id", "cell1").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two.nonEmpty && two == single)
  }

  test("full-probe two-level IVF equals brute-force top-k") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = Similarity.withNorm(emb, "embedding")
    val cb = Similarity.buildCodebooks(base, "vec_id",
      every1 = 50, every2 = 37, maxDriver = Similarity.MaxDriverCentroids)
    // probing every level-1 cell and every codebook entry covers every
    // composite cell, so ANN degrades to exact — same rows, same order
    val ann = Similarity.ivfTopKTwoLevel(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, every1 = 50, every2 = 37,
      nprobe1 = cb.ids1.length, nprobe2 = cb.ids2.length)
      .select("vec_id", "cos_r").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ann == brute)
  }

  test("exact-replay trained books (q102's trainer): deterministic, and " +
      "the saturating probe through them equals brute-force top-k") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def train() = Quantize.twoLevelTrainExact(emb, "vec_id", "embedding",
      every1 = 10, every2 = 7)
    val cb = train()
    val cb2 = train()
    // bitwise-identical books across runs — the property the DuckDB
    // oracle replay (q102) depends on
    assert(cb.ids1 == cb2.ids1 && cb.flat1 == cb2.flat1 &&
      cb.norms1 == cb2.norms1 && cb.ids2 == cb2.ids2 && cb.flat2 == cb2.flat2,
      "exact-replay trainer diverged across runs")
    // probing every composite cell degrades ANN to exact — validates the
    // trained books + With-plumbing end to end against the brute oracle
    val ann = Similarity.ivfTopKTwoLevelWith(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, cb,
      nprobe1 = cb.ids1.length, nprobe2 = cb.ids2.length)
      .select("vec_id", "cos_r").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ann == brute)
  }

  test("two-level index materializes nested cell1/cell2 partitions with " +
      "both codebook sidecars") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf2").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    Similarity.ivfWriteIndexTwoLevel(emb, "vec_id", "embedding", dir,
      every1 = 50, every2 = 37)
    val l1Dirs = new java.io.File(s"$dir/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell1="))
    assert(l1Dirs.nonEmpty)
    // nested layout: every level-1 directory subdivides into cell2 dirs,
    // so a two-level probe prunes at both directory levels
    assert(l1Dirs.forall(_.listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("cell2="))))
    val c1 = spark.read.parquet(s"$dir/centroids1")
    val c2 = spark.read.parquet(s"$dir/codebook2")
    assert(c1.columns.toSet == Set("cell1", "cent_vec", "cent_norm"))
    assert(c2.columns.toSet == Set("cell2", "rvec"))
    assert(c1.count() == 10 && c2.count() > 0) // 500 rows / every1=50
    // the index data carries every corpus row exactly once
    assert(spark.read.parquet(s"$dir/data").count() == emb.count())
  }
}
