package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Similarity

/** Online cell splitting for the sharded graph tier
  * ([[StreamGraphShards.splitCell]] and the maintainer's `autoSplit`):
  * the quantizer revision rides inside the atomically-swapped manifest,
  * membership is preserved exactly (global reassignment — no loss, no
  * duplicates), the saturating probe stays the brute answer across a
  * split, and an overflowing stream either fails loud (default) or
  * resolves itself (autoSplit). */
class StreamShardSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
  private def cents = Similarity.centroidsOf(
    Similarity.withNorm(emb, "embedding"), "vec_id", 137)

  private def manifestIds(dir: String): Seq[Long] = {
    val manifest = StreamGraphShards.readManifest(dir)
    manifest.toSeq.flatMap { case (_, rel) =>
      spark.read.parquet(s"$dir/$rel").select("id").as[Long].collect()
    }
  }

  private def brute(qid: Long, corpus: org.apache.spark.sql.DataFrame) =
    Similarity.cosineTopK(corpus, "vec_id", "embedding", qid, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("explicit split: membership preserved exactly (no loss, no " +
    "duplicate ids), quantizer revised inside the manifest, and the " +
    "saturating probe is STILL the brute answer") {
    val dir = Files.createTempDirectory("graft-split").toString
    StreamGraphShards.bootstrap(spark, dir, emb, "vec_id", "embedding",
      cents.localCheckpoint(true))
    val nCells0 = StreamGraphShards.readManifest(dir).size
    assert(StreamGraphShards.readCentroidsRel(dir) == "boot/centroids")
    // split the fullest cell
    val biggest = StreamGraphShards.readManifest(dir).toSeq.map {
      case (c, rel) => c -> spark.read.parquet(s"$dir/$rel").count()
    }.maxBy(_._2)._1
    val seeds = StreamGraphShards.splitCell(spark, dir, biggest, "t0")
    assert(seeds.distinct.size == seeds.size && seeds.size >= 2)
    val Seq(s1, s2) = seeds.take(2)
    // the quantizer revision is live: old cell gone (unless re-seeded by
    // its own centroid row), both seeds present, |C| grew by one
    val rel = StreamGraphShards.readCentroidsRel(dir)
    assert(rel == "centroids-t0", rel)
    val newCents = spark.read.parquet(s"$dir/$rel")
      .select(col("cent_id").cast("long")).as[Long].collect().toSet
    assert(newCents.contains(s1) && newCents.contains(s2))
    assert(newCents.size == nCells0 + 1)
    // membership: every id exactly once across the manifest
    val ids = manifestIds(dir)
    assert(ids.size == ids.distinct.size, "an id appears in two cells")
    assert(ids.toSet == emb.select("vec_id").as[Long].collect().toSet,
      "split lost or invented a vector")
    // saturating knobs: probe every cell, walk whole cells — exact
    for (qid <- Seq(0L, 250L, 499L)) {
      val got = StreamGraphShards.topKBatch(
        emb.filter(col("vec_id") === qid), "vec_id", "embedding", dir,
        k = 10, nprobe = newCents.size, ef = 500)
        .orderBy("rank")
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(got == brute(qid, emb), s"qid=$qid diverged after the split")
    }
    // unknown cell fails loud
    val e = intercept[IllegalArgumentException] {
      StreamGraphShards.splitCell(spark, dir, 999999L, "t1")
    }
    assert(e.getMessage.contains("not in the current manifest"))
  }

  test("the ceiling require names splitCell; autoSplit=false still " +
    "stops loud with the marker untouched") {
    val dir = Files.createTempDirectory("graft-split-loud").toString
    val corpus = emb.filter(col("vec_id") < 100) // 1 cell (centroid 0)
    StreamGraphShards.bootstrap(spark, dir, corpus, "vec_id", "embedding",
      Similarity.centroidsOf(Similarity.withNorm(corpus, "embedding"),
        "vec_id", 137).localCheckpoint(true))
    val e = intercept[Exception] {
      StreamGraphShards.maintainer(spark, dir, "vec_id", "embedding",
        maxPerShard = 150)(
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 250), 1L)
    }
    assert(e.getMessage.contains("splitCell"), e.getMessage)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "current"))).trim == "manifest-boot")
  }

  test("autoSplit: an overflowing stream resolves itself — cells split " +
    "online, every ceiling holds, membership exact, saturating probe " +
    "still brute; and the whole run is deterministic") {
    def run(): (String, Set[(Long, Long)], Set[Long]) = {
      val dir = Files.createTempDirectory("graft-split-auto").toString
      val corpus = emb.filter(col("vec_id") < 100)
      StreamGraphShards.bootstrap(spark, dir, corpus, "vec_id",
        "embedding",
        Similarity.centroidsOf(Similarity.withNorm(corpus, "embedding"),
          "vec_id", 137).localCheckpoint(true))
      val maintain = StreamGraphShards.maintainer(spark, dir, "vec_id",
        "embedding", maxPerShard = 150, autoSplit = true)
      maintain(emb.filter(col("vec_id") >= 100 && col("vec_id") < 250), 1L)
      maintain(emb.filter(col("vec_id") >= 250), 2L)
      val cellsOf = StreamGraphShards.readManifest(dir).toSeq
        .flatMap { case (c, rel) =>
          spark.read.parquet(s"$dir/$rel").select("id").as[Long].collect()
            .map(c -> _)
        }.toSet
      (dir, cellsOf,
        spark.read.parquet(s"$dir/${StreamGraphShards.readCentroidsRel(dir)}")
          .select(col("cent_id").cast("long")).as[Long].collect().toSet)
    }
    val (dir, cellsOf, centIds) = run()
    // REPLAY across the splits: a batch whose rows are all present must
    // be a marker-stable no-op — this is the pin that the split's
    // DRIVER-side argmax (which placed migrated rows) agrees bitwise
    // with the maintainer's IN-SCAN assignment (which content-addresses
    // the replay); any divergence would re-insert a migrated row into
    // its in-scan cell as a duplicate
    val markerBefore = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "current"))).trim
    StreamGraphShards.maintainer(spark, dir, "vec_id", "embedding",
      maxPerShard = 150, autoSplit = true)(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 250), 9L)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "current"))).trim == markerBefore,
      "a fully-replayed batch moved the marker after splits")
    // every ceiling holds and the index grew past one cell
    val perCell = cellsOf.groupBy(_._1).view.mapValues(_.size)
    assert(perCell.values.forall(_ <= 150),
      s"a cell exceeds the ceiling: $perCell")
    assert(centIds.size >= 4, s"expected splits, got cells $centIds")
    // membership exact across the splits
    val ids = cellsOf.toSeq.map(_._2)
    assert(ids.size == ids.distinct.size, "an id appears in two cells")
    assert(ids.toSet == emb.select("vec_id").as[Long].collect().toSet)
    // saturating probe stays brute over the full union
    for (qid <- Seq(0L, 120L, 499L)) {
      val got = StreamGraphShards.topKBatch(
        emb.filter(col("vec_id") === qid), "vec_id", "embedding", dir,
        k = 10, nprobe = centIds.size, ef = 500)
        .orderBy("rank")
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(got == brute(qid, emb), s"qid=$qid diverged under autoSplit")
    }
    // deterministic: an identical second run produces the identical
    // (cell, id) membership and quantizer
    val (_, cellsOf2, centIds2) = run()
    assert(cellsOf2 == cellsOf && centIds2 == centIds,
      "autoSplit run is not deterministic")
    // vacuum after splits: superseded quantizer revisions and shard
    // roots go, the live ones stay, serving is unchanged
    val q0 = emb.filter(col("vec_id") === 0)
    val before = StreamGraphShards.topKBatch(q0, "vec_id", "embedding",
      dir, k = 5, nprobe = 2, ef = 64)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    StreamGraphShards.vacuum(dir)
    val liveCentRoot = StreamGraphShards.readCentroidsRel(dir).split("/")(0)
    val centRoots = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("centroids-"))
      .map(_.getName).toSet
    assert(centRoots == Set(liveCentRoot),
      s"stale quantizer revisions survived vacuum: $centRoots")
    val after = StreamGraphShards.topKBatch(q0, "vec_id", "embedding",
      dir, k = 5, nprobe = 2, ef = 64)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before, "vacuum disturbed a search after splits")
  }
}
