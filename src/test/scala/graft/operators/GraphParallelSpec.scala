package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The batch-synchronous parallel bootstrap ([[GraphAnn
  * .buildGraphParallel]]): build-for-build determinism (thread
  * scheduling cannot reach the output), a measured recall floor on the
  * real fixture (the doubling-generation schedule must not cost
  * meaningful quality), and the measured speedup vs the sequential
  * build at 10^5 vectors — the number that justifies the operator. */
class GraphParallelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.01"
  private def emb = Tables.embeddings(spark, dir)
  private val qids = Seq(40L, 100L, 200L, 300L, 400L, 499L)
  private def queries = emb.filter(col("vec_id").isin(qids: _*))

  test("parallel build is deterministic: identical adjacency across " +
    "builds, identical search results") {
    val g1 = GraphAnn.buildGraphParallel(emb, "vec_id", "embedding", 16, 64)
    val g2 = GraphAnn.buildGraphParallel(emb, "vec_id", "embedding", 16, 64)
    assert(g1.ids.toSeq == g2.ids.toSeq)
    assert(g1.nbrs.map(_.toSeq).toSeq == g2.nbrs.map(_.toSeq).toSeq,
      "two parallel builds over the same rows must be structurally identical")
    def run(g: GraphAnn.Graph) =
      GraphAnn.graphTopKBatch(queries, "vec_id", "embedding", g, 10, 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(run(g1) == run(g2), "search results diverged across builds")
  }

  test("recall floor on the real fixture: the doubling-generation " +
    "schedule holds the graph tier's quality") {
    val g = GraphAnn.buildGraphParallel(emb, "vec_id", "embedding", 16, 64)
    val truth = Similarity.knnJoin(emb, queries, "vec_id", "embedding", 10)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)).toSet }
    val got = GraphAnn.graphTopKBatch(queries, "vec_id", "embedding", g, 10, 64)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)).toSet }
    val (h, p) = qids.foldLeft((0, 0)) { case ((h, p), q) =>
      (h + got.getOrElse(q, Set.empty).intersect(truth.getOrElse(q, Set.empty)).size,
        p + truth.getOrElse(q, Set.empty).size)
    }
    val recall = h.toDouble / p
    info(f"parallel-build graph recall@10 (m=16, ef=64): $recall%.3f ($h/$p)")
    assert(recall >= 0.85, f"parallel build degraded recall: $recall%.3f")
  }

  test("measured speedup at 10^5 vectors: parallel build <= 1/4 of the " +
    "sequential build") {
    import spark.implicits._
    // deterministic synthetic directions at the deployment dim (64):
    // the distance work the parallel phase divides must dominate, as it
    // does in the regime the operator exists for
    val n = 100000
    val vecs = (0 until n).map { id =>
      (id.toLong, Seq.tabulate(64)(d =>
        ((((id.toLong * (d * 2 + 3) + d * 17) % 97) - 48) + 0.5)))
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tSeq1) = time(
      GraphAnn.buildGraph(vecs, "vec_id", "embedding", 16, 64))
    val (gp, tPar1) = time(
      GraphAnn.buildGraphParallel(vecs, "vec_id", "embedding", 16, 64))
    assert(gp.size == n)
    // one timing pair flakes under host contention (the parallel phase
    // loses more than the sequential one when cores are stolen); only a
    // failing first pair pays for a second, and the MIN of each side is
    // the number — the repo's min-of-reps bench discipline
    val (tSeq, tPar) =
      if (tPar1 <= tSeq1 / 4) (tSeq1, tPar1)
      else {
        val (_, s2) = time(
          GraphAnn.buildGraph(vecs, "vec_id", "embedding", 16, 64))
        val (_, p2) = time(
          GraphAnn.buildGraphParallel(vecs, "vec_id", "embedding", 16, 64))
        (math.min(tSeq1, s2), math.min(tPar1, p2))
      }
    info(f"sequential $tSeq%.1f s vs parallel $tPar%.1f s " +
      f"(${tSeq / tPar}%.1fx) at $n vectors")
    assert(tPar <= tSeq / 4,
      f"parallel build $tPar%.1f s not <= 1/4 of sequential $tSeq%.1f s")
  }
}
