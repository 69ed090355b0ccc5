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
    assert(marker(dir) == "d-b7")
    val a1 = adjacency(StreamGraphIndex.loadLatest(spark, dir))
    // crash-replay of the same epoch: all ids already present
    maintain(batch, 7L)
    assert(marker(dir) == "d-b7", "replay moved the marker")
    assert(adjacency(StreamGraphIndex.loadLatest(spark, dir)) == a1,
      "replay changed the graph")
    // empty batch: nothing happens
    maintain(emb.filter(col("vec_id") < 0), 8L)
    assert(marker(dir) == "d-b7")
  }

  test("crash between sidecar write and marker swap: readers stay on the " +
    "previous version; the replay repairs the orphan delta and commits") {
    val dir = Files.createTempDirectory("graft-gidx-crash").toString
    StreamGraphIndex.bootstrap(spark, dir,
      emb.filter(col("vec_id") < 300), "vec_id", "embedding")
    val before = adjacency(StreamGraphIndex.loadLatest(spark, dir))
    // simulate the torn DELTA write: d-b9/nodes exists with GARBAGE (a
    // stale copy of the whole bootstrap graph), no parent pointer, and
    // the marker never swapped
    GraphAnn.writeIndex(StreamGraphIndex.loadLatest(spark, dir), spark,
      s"$dir/d-b9/nodes")
    // ...and a torn COMPACTION too: an orphan FULL directory that a
    // bare-token marker scheme could have mistaken for a version
    GraphAnn.writeIndex(StreamGraphIndex.loadLatest(spark, dir), spark,
      s"$dir/g-b9")
    assert(marker(dir) == "g-boot", "crash simulation must not move the marker")
    assert(adjacency(StreamGraphIndex.loadLatest(spark, dir)) == before,
      "a torn write leaked into the served version")
    // replay of epoch 9 overwrites the orphan and commits atomically
    val batch = emb.filter(col("vec_id") >= 300)
    StreamGraphIndex.maintainer(spark, dir, "vec_id", "embedding")(batch, 9L)
    assert(marker(dir) == "d-b9")
    val g = StreamGraphIndex.loadLatest(spark, dir)
    assert(g.ids.toSet == emb.select("vec_id").as[Long].collect().toSet,
      "replay did not absorb the batch after the simulated crash")
  }

  test("delta sidecars are O(batch*M), and the chain roundtrip rebuilds " +
    "the in-memory graph EXACTLY") {
    val dir = Files.createTempDirectory("graft-gidx-delta").toString
    val seed = emb.filter(col("vec_id") < 400)
    StreamGraphIndex.bootstrap(spark, dir, seed, "vec_id", "embedding")
    val boot = StreamGraphIndex.loadLatest(spark, dir)
    val batch = emb.filter(col("vec_id") >= 400 && col("vec_id") < 420)
    StreamGraphIndex.maintainer(spark, dir, "vec_id", "embedding")(batch, 1L)
    assert(marker(dir) == "d-b1")
    // write volume: the inserted tail + the touched adjacency rows only
    val nNodes = spark.read.parquet(s"$dir/d-b1/nodes").count()
    val nTouched = spark.read.parquet(s"$dir/d-b1/touched").count()
    val full = boot.size + 20
    info(s"delta rows: $nNodes nodes + $nTouched touched vs $full full")
    assert(nNodes == 20, s"delta must carry exactly the inserted tail: $nNodes")
    assert(nTouched <= 20L * 16,
      s"touched rows $nTouched exceed the batch*M bound (${20 * 16})")
    assert(nNodes + nTouched < full,
      "the delta wrote more rows than a full sidecar would")
    // EXACT equivalence: chain-resolved graph == the in-memory insert
    val ref = GraphAnn.insertVectors(boot, batch, "vec_id", "embedding")
    val got = StreamGraphIndex.loadLatest(spark, dir)
    assert(got.ids.toSeq == ref.ids.toSeq &&
      adjacency(got) == adjacency(ref),
      "delta roundtrip diverged from the in-memory insert")
  }

  test("depth-triggered compaction folds the chain into a full sidecar; " +
    "mixed full+delta chains keep serving the exact graph") {
    val dir = Files.createTempDirectory("graft-gidx-compact").toString
    StreamGraphIndex.bootstrap(spark, dir,
      emb.filter(col("vec_id") < 200), "vec_id", "embedding")
    val maintain = StreamGraphIndex.maintainer(spark, dir,
      "vec_id", "embedding", compactEvery = 2)
    def slice(lo: Long, hi: Long) =
      emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
    maintain(slice(200, 300), 1L)
    assert(marker(dir) == "d-b1", "first batch should be a delta")
    maintain(slice(300, 400), 2L)
    assert(marker(dir) == "g-b2",
      "second batch should have compacted (depth reached compactEvery)")
    assert(Files.exists(Paths.get(dir, "g-b2")))
    maintain(slice(400, 500), 3L)
    assert(marker(dir) == "d-b3", "post-compaction batch chains off the full")
    // the served graph equals the sequential in-memory reference
    var ref = GraphAnn.buildGraph(
      emb.filter(col("vec_id") < 200), "vec_id", "embedding")
    for ((lo, hi) <- Seq((200L, 300L), (300L, 400L), (400L, 500L)))
      ref = GraphAnn.insertVectors(ref, slice(lo, hi), "vec_id", "embedding")
    val got = StreamGraphIndex.loadLatest(spark, dir)
    assert(got.ids.toSeq == ref.ids.toSeq && adjacency(got) == adjacency(ref),
      "mixed full+delta chain diverged from the sequential reference")
  }

  test("deletion: tombstoned ids vanish from search results immediately " +
    "(mark-delete), are physically dropped at the next compaction, and " +
    "deletes are idempotent") {
    val dir = Files.createTempDirectory("graft-gidx-del").toString
    StreamGraphIndex.bootstrap(spark, dir,
      emb.filter(col("vec_id") < 300), "vec_id", "embedding")
    val qvec = emb.filter(col("vec_id") === 40L)
      .select(Similarity.vecD(col("embedding"))).head().getSeq[Double](0)
    val before = StreamGraphIndex.searchLatest(spark, dir, qvec, k = 5)
    assert(before.head._1 == 40L) // its own id leads
    // tombstone the top two — results filter immediately, waypoints stay
    val removed = StreamGraphIndex.delete(spark, dir,
      Seq(before.head._1, before(1)._1, 999999L))
    assert(removed == 2L, s"removed $removed")
    val after = StreamGraphIndex.searchLatest(spark, dir, qvec, k = 5)
    assert(after.size == 5 &&
      !after.exists(r => r._1 == before.head._1 || r._1 == before(1)._1),
      s"$after")
    // idempotent
    assert(StreamGraphIndex.delete(spark, dir,
      Seq(before.head._1)) == 0L)
    // the graph still CONTAINS the nodes until compaction…
    assert(StreamGraphIndex.loadLatest(spark, dir).ids.contains(40L))
    // …which physically drops them: force a compaction via the
    // maintainer at compactEvery = 1
    val maintain = StreamGraphIndex.maintainer(spark, dir,
      "vec_id", "embedding", compactEvery = 1)
    maintain(emb.filter(col("vec_id") >= 300 && col("vec_id") < 320), 0L)
    val g = StreamGraphIndex.loadLatest(spark, dir)
    assert(!g.ids.contains(40L) && !g.ids.contains(before(1)._1))
    assert(StreamGraphIndex.tombstones(dir).isEmpty,
      "tombstones must clear after the physical drop")
    // post-compaction search parity: equals a fresh bootstrap over the
    // survivors (ascending-id rebuild, the deterministic construction)
    val survDir = Files.createTempDirectory("graft-gidx-del-want").toString
    StreamGraphIndex.bootstrap(spark, survDir,
      emb.filter(col("vec_id") < 320 &&
        !col("vec_id").isin(before.head._1, before(1)._1)),
      "vec_id", "embedding")
    assert(StreamGraphIndex.searchLatest(spark, dir, qvec, k = 5) ==
      StreamGraphIndex.searchLatest(spark, survDir, qvec, k = 5))
  }
}
