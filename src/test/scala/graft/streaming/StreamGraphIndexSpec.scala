package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.{GraphAnn, Similarity}

/** Standing NSW graph index under a real micro-batched stream
  * ([[StreamGraphIndex]]): every streamed vector becomes searchable,
  * search quality holds against the brute truth over the union,
  * replays are bit-identical (content-addressed inserts + marker
  * re-swap), and a crash between the sidecar write and the marker swap
  * leaves readers on the previous version until the replay repairs it. */
class StreamGraphIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private val qids = Seq(40L, 150L, 260L, 380L, 490L)
  private def queries = emb.filter(col("vec_id").isin(qids: _*))

  private def marker(dir: String): String =
    new String(Files.readAllBytes(Paths.get(dir, "current"))).trim

  private def adjacency(g: GraphAnn.Graph): Seq[(Long, Seq[Long])] =
    g.ids.indices.map(i => g.ids(i) -> g.nbrs(i).map(g.ids(_)).toSeq)

  test("a real micro-batched stream of vectors: every id searchable, " +
    "recall holds vs brute truth over the union") {
    val dir = Files.createTempDirectory("graft-gidx-stream").toString
    val seed = emb.filter(col("vec_id") < 200)
    StreamGraphIndex.bootstrap(spark, dir, seed, "vec_id", "embedding")

    val srcDir = Files.createTempDirectory("graft-gidx-src").toString
    val schema = emb.schema
    def write(cond: org.apache.spark.sql.Column): Unit =
      emb.filter(cond).write.mode("append").parquet(srcDir)
    write(col("vec_id") >= 200 && col("vec_id") < 350)
    val maintain = StreamGraphIndex.maintainer(spark, dir,
      "vec_id", "embedding")
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch(maintain)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-gidx-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      write(col("vec_id") >= 350)
      q.processAllAvailable()
    } finally q.stop()

    val g = StreamGraphIndex.loadLatest(spark, dir)
    assert(g.ids.toSet == emb.select("vec_id").as[Long].collect().toSet,
      "a streamed vector is missing from the standing graph")
    val truth = Similarity.knnJoin(emb, queries, "vec_id", "embedding", 10)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (k, r) => k -> r.map(_.getLong(1)).toSet }
    val got = GraphAnn.graphTopKBatch(queries, "vec_id", "embedding", g,
      k = 10, ef = 64)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (k, r) => k -> r.map(_.getLong(1)).toSet }
    val (h, p) = qids.foldLeft((0, 0)) { case ((h, p), k) =>
      (h + got.getOrElse(k, Set.empty).intersect(truth.getOrElse(k, Set.empty)).size,
        p + truth.getOrElse(k, Set.empty).size)
    }
    val recall = h.toDouble / p
    info(f"incrementally-grown graph recall@10: $recall%.3f ($h/$p)")
    assert(recall >= 0.85, f"streamed graph recall collapsed: $recall%.3f")
  }

  test("ADVERSARIAL arrival order: bootstrap on the HIGH-id half, stream " +
    "the low half — recall still holds (graph structure depends on " +
    "arrival order, quality must not)") {
    val dir = Files.createTempDirectory("graft-gidx-adv").toString
    StreamGraphIndex.bootstrap(spark, dir,
      emb.filter(col("vec_id") >= 250), "vec_id", "embedding")
    val maintain = StreamGraphIndex.maintainer(spark, dir,
      "vec_id", "embedding")
    // stream the low half in two reverse-ordered slices
    maintain(emb.filter(col("vec_id") >= 125 && col("vec_id") < 250), 1L)
    maintain(emb.filter(col("vec_id") < 125), 2L)
    val g = StreamGraphIndex.loadLatest(spark, dir)
    assert(g.ids.toSet == emb.select("vec_id").as[Long].collect().toSet)
    val truth = Similarity.knnJoin(emb, queries, "vec_id", "embedding", 10)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (k, r) => k -> r.map(_.getLong(1)).toSet }
    val got = GraphAnn.graphTopKBatch(queries, "vec_id", "embedding", g,
      k = 10, ef = 64)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (k, r) => k -> r.map(_.getLong(1)).toSet }
    val (h, p) = qids.foldLeft((0, 0)) { case ((h, p), k) =>
      (h + got.getOrElse(k, Set.empty).intersect(truth.getOrElse(k, Set.empty)).size,
        p + truth.getOrElse(k, Set.empty).size)
    }
    val recall = h.toDouble / p
    info(f"adversarial-order graph recall@10: $recall%.3f ($h/$p)")
    assert(recall >= 0.85,
      f"arrival order degraded recall beyond tolerance: $recall%.3f")
  }

  test("replayed batch is a no-op: same adjacency, same marker; empty " +
    "and fully-replayed batches leave the marker untouched") {
    val dir = Files.createTempDirectory("graft-gidx-replay").toString
    StreamGraphIndex.bootstrap(spark, dir,
      emb.filter(col("vec_id") < 300), "vec_id", "embedding")
    val batch = emb.filter(col("vec_id") >= 300)
    val maintain = StreamGraphIndex.maintainer(spark, dir,
      "vec_id", "embedding")
    maintain(batch, 7L)
    assert(marker(dir) == "b7")
    val a1 = adjacency(StreamGraphIndex.loadLatest(spark, dir))
    // crash-replay of the same epoch: all ids already present
    maintain(batch, 7L)
    assert(marker(dir) == "b7", "replay moved the marker")
    assert(adjacency(StreamGraphIndex.loadLatest(spark, dir)) == a1,
      "replay changed the graph")
    // empty batch: nothing happens
    maintain(emb.filter(col("vec_id") < 0), 8L)
    assert(marker(dir) == "b7")
  }

  test("crash between sidecar write and marker swap: readers stay on the " +
    "previous version; the replay repairs the orphan and commits") {
    val dir = Files.createTempDirectory("graft-gidx-crash").toString
    StreamGraphIndex.bootstrap(spark, dir,
      emb.filter(col("vec_id") < 300), "vec_id", "embedding")
    val before = adjacency(StreamGraphIndex.loadLatest(spark, dir))
    // simulate the torn write: the sidecar directory for batch 9 exists
    // (with GARBAGE — a stale copy of the bootstrap graph) but the
    // marker never swapped
    GraphAnn.writeIndex(StreamGraphIndex.loadLatest(spark, dir), spark,
      s"$dir/g-b9")
    assert(marker(dir) == "boot", "crash simulation must not move the marker")
    assert(adjacency(StreamGraphIndex.loadLatest(spark, dir)) == before,
      "a torn write leaked into the served version")
    // replay of epoch 9 overwrites the orphan and commits atomically
    val batch = emb.filter(col("vec_id") >= 300)
    StreamGraphIndex.maintainer(spark, dir, "vec_id", "embedding")(batch, 9L)
    assert(marker(dir) == "b9")
    val g = StreamGraphIndex.loadLatest(spark, dir)
    assert(g.ids.toSet == emb.select("vec_id").as[Long].collect().toSet,
      "replay did not absorb the batch after the simulated crash")
  }
}
