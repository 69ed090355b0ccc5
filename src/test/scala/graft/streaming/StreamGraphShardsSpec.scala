package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Similarity

/** The manifest-versioned sharded graph tier under ingestion
  * ([[StreamGraphShards]]): streamed vectors become searchable, the
  * saturating probe stays EXACT over the union, untouched cells keep
  * their old shard files (the O(touched) write property), replays are
  * no-ops, crashes leave readers on the previous manifest, and the
  * per-shard ceiling stays loud. */
class StreamGraphShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
  private def cents = Similarity.centroidsOf(
    Similarity.withNorm(emb, "embedding"), "vec_id", 137)

  private def marker(dir: String): String =
    new String(Files.readAllBytes(Paths.get(dir, "current"))).trim

  private def brute(qid: Long) =
    Similarity.cosineTopK(emb, "vec_id", "embedding", qid, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("a micro-batched stream of vectors: every id searchable, and the " +
    "saturating probe over the grown index IS brute top-k over the union") {
    val dir = Files.createTempDirectory("graft-sgs").toString
    StreamGraphShards.bootstrap(spark, dir,
      emb.filter(col("vec_id") < 250), "vec_id", "embedding",
      cents.localCheckpoint(true))
    val maintain = StreamGraphShards.maintainer(spark, dir,
      "vec_id", "embedding")
    maintain(emb.filter(col("vec_id") >= 250 && col("vec_id") < 400), 1L)
    maintain(emb.filter(col("vec_id") >= 400), 2L)
    // every streamed id is present in some cell's shard
    val manifest = StreamGraphShards.readManifest(dir)
    val allIds = manifest.toSeq.flatMap { case (_, rel) =>
      spark.read.parquet(s"$dir/$rel").select("id").as[Long].collect()
    }.toSet
    assert(allIds == emb.select("vec_id").as[Long].collect().toSet,
      "a streamed vector is missing from the sharded index")
    // saturating probe + beam = exact, ordering and rounding included
    for (qid <- Seq(0L, 300L, 499L)) {
      val got = StreamGraphShards.topKBatch(
        emb.filter(col("vec_id") === qid), "vec_id", "embedding", dir,
        k = 10, nprobe = 4, ef = 300)
        .orderBy("rank")
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(got == brute(qid), s"qid=$qid: grown index diverged from brute")
    }
  }

  test("O(touched) writes: a batch landing in a strict subset of cells " +
    "repoints ONLY those cells; replay is a marker-stable no-op") {
    val dir = Files.createTempDirectory("graft-sgs-touch").toString
    StreamGraphShards.bootstrap(spark, dir, emb.filter(col("vec_id") < 400),
      "vec_id", "embedding", cents.localCheckpoint(true))
    val m0 = StreamGraphShards.readManifest(dir)
    assert(marker(dir) == "manifest-boot")
    val batch = emb.filter(col("vec_id") >= 400) // 100 rows
    StreamGraphShards.maintainer(spark, dir, "vec_id", "embedding")(batch, 5L)
    assert(marker(dir) == "manifest-b5")
    val m5 = StreamGraphShards.readManifest(dir)
    val repointed = m5.filter { case (c, p) => m0.get(c) != Some(p) }
    assert(repointed.nonEmpty, "the batch touched no cell?")
    assert(repointed.forall(_._2.startsWith("graphs-b5/")))
    // cells the batch did not change keep their ORIGINAL files
    val untouched = m5.keySet -- repointed.keySet
    assert(untouched.forall(c => m5(c) == m0(c)),
      "an untouched cell's shard was rewritten")
    // write volume on disk: only the repointed cells appear under b5
    val b5cells = new java.io.File(s"$dir/graphs-b5").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.getName.stripPrefix("cell=").toLong).toSet
    assert(b5cells == repointed.keySet)
    // replay: all ids already present -> nothing written, marker stable
    StreamGraphShards.maintainer(spark, dir, "vec_id", "embedding")(batch, 5L)
    assert(marker(dir) == "manifest-b5", "replay moved the marker")
    assert(StreamGraphShards.readManifest(dir) == m5,
      "replay changed the manifest")
  }

  test("crash between shard write and marker swap: readers stay on the " +
    "previous manifest; the replay overwrites the orphan and commits") {
    val dir = Files.createTempDirectory("graft-sgs-crash").toString
    StreamGraphShards.bootstrap(spark, dir, emb.filter(col("vec_id") < 400),
      "vec_id", "embedding", cents.localCheckpoint(true))
    val before = StreamGraphShards.topKBatch(
      emb.filter(col("vec_id") === 0), "vec_id", "embedding", dir,
      k = 5, nprobe = 2, ef = 32)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // torn write: garbage shard data under graphs-b9, no manifest swap
    emb.filter(col("vec_id") < 10)
      .select(col("vec_id").cast("long").as("cell"), col("vec_id")
        .cast("long").as("ord"), col("vec_id").cast("long").as("id"))
      .write.mode("overwrite").parquet(s"$dir/graphs-b9")
    assert(marker(dir) == "manifest-boot")
    val after = StreamGraphShards.topKBatch(
      emb.filter(col("vec_id") === 0), "vec_id", "embedding", dir,
      k = 5, nprobe = 2, ef = 32)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before, "a torn write leaked into the served version")
    // replay of epoch 9 overwrites the orphan and commits
    StreamGraphShards.maintainer(spark, dir, "vec_id", "embedding")(
      emb.filter(col("vec_id") >= 400), 9L)
    assert(marker(dir) == "manifest-b9")
    val allIds = StreamGraphShards.readManifest(dir).toSeq
      .flatMap { case (_, rel) =>
        spark.read.parquet(s"$dir/$rel").select("id").as[Long].collect()
      }.toSet
    assert(allIds == emb.select("vec_id").as[Long].collect().toSet)
  }

  test("per-shard ceiling stays loud under streaming growth") {
    val dir = Files.createTempDirectory("graft-sgs-ceil").toString
    StreamGraphShards.bootstrap(spark, dir, emb.filter(col("vec_id") < 400),
      "vec_id", "embedding", cents.localCheckpoint(true))
    val e = intercept[Exception] {
      StreamGraphShards.maintainer(spark, dir, "vec_id", "embedding",
        maxPerShard = 100)(emb.filter(col("vec_id") >= 400), 3L)
    }
    assert(e.getMessage.contains("per-shard"), e.getMessage)
    // the failed batch must not have committed
    assert(marker(dir) == "manifest-boot")
  }

  test("vacuum deletes fully-superseded version roots and stale " +
    "manifests; serving is undisturbed (readers resolve only through " +
    "the current manifest)") {
    val dir = Files.createTempDirectory("graft-sgs-vac").toString
    StreamGraphShards.bootstrap(spark, dir, emb.filter(col("vec_id") < 400),
      "vec_id", "embedding", cents.localCheckpoint(true))
    val maintain = StreamGraphShards.maintainer(spark, dir,
      "vec_id", "embedding")
    val b5 = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
      .localCheckpoint(true)
    maintain(b5, 5L)
    // batch 6 carries the SAME vectors under shifted ids: it lands in
    // exactly batch 5's cells, so every graphs-b5 shard is superseded
    maintain(b5.withColumn("vec_id", col("vec_id") + 300), 6L)
    val q0 = emb.filter(col("vec_id") === 0)
    val before = StreamGraphShards.topKBatch(q0, "vec_id", "embedding",
      dir, k = 5, nprobe = 2, ef = 32)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val deleted = StreamGraphShards.vacuum(dir)
    assert(deleted == Seq("graphs-b5"),
      s"expected exactly the superseded root, got $deleted")
    assert(!new java.io.File(s"$dir/graphs-b5").exists())
    assert(new java.io.File(s"$dir/graphs-b6").exists())
    // stale manifests pruned, current kept
    val manifests = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("manifest-")).map(_.getName).toSet
    assert(manifests == Set("manifest-b6"), manifests.toString)
    assert(marker(dir) == "manifest-b6")
    val after = StreamGraphShards.topKBatch(q0, "vec_id", "embedding",
      dir, k = 5, nprobe = 2, ef = 32)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before, "vacuum disturbed a search")
  }

  test("streamed-grown index vs batch-built index: saturating knobs " +
    "serve IDENTICAL results (the audit's graph_stream_sharded row " +
    "measures pure insertion-order effects, not a different operator); " +
    "candidates exposes the per-walk visit cost") {
    val dir = Files.createTempDirectory("graft-sgs-twin").toString
    val cts = cents.localCheckpoint(true)
    // streamed: bootstrap on the first half, absorb the rest in batches
    StreamGraphShards.bootstrap(spark, dir, emb.filter(col("vec_id") < 250),
      "vec_id", "embedding", cts)
    val maintain = StreamGraphShards.maintainer(spark, dir,
      "vec_id", "embedding")
    maintain(emb.filter(col("vec_id") >= 250 && col("vec_id") < 375), 1L)
    maintain(emb.filter(col("vec_id") >= 375), 2L)
    // batch: one ascending-id build over the SAME corpus and quantizer
    val batchDir = Files.createTempDirectory("graft-sgs-twin-b").toString
    graft.operators.GraphShards.buildShardedIndex(emb, "vec_id",
      "embedding", cts, batchDir)
    val queries = emb.filter(col("vec_id").isin(1L, 200L, 450L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    // saturating ef: every walk visits its whole cell, so BOTH indexes
    // equal the exact scan of the probed cells — adjacency differences
    // from insertion history cannot show, which is the control that the
    // two paths serve the same SEARCH (recall differences at production
    // ef are then attributable to insertion order alone)
    val streamed = rows(StreamGraphShards.topKBatch(queries, "vec_id",
      "embedding", dir, k = 10, nprobe = 3, ef = 300))
    val batch = rows(graft.operators.GraphShards.shardedTopKBatch(queries,
      "vec_id", "embedding", batchDir, k = 10, nprobe = 3, ef = 300))
    assert(streamed == batch,
      "streamed-grown index diverged from the batch build at saturation")
    // the cost surface: one row per beam hit, visits constant per
    // (qid, cell) walk and >= the hits that walk emitted
    val cand = StreamGraphShards.candidates(queries, "vec_id", "embedding",
      dir, nprobe = 2, ef = 16)
    val perWalk = cand.groupBy("qid", "cell")
      .agg(org.apache.spark.sql.functions.countDistinct("visits").as("nv"),
        org.apache.spark.sql.functions.count("*").as("hits"),
        org.apache.spark.sql.functions.max("visits").as("v"))
      .collect()
    assert(perWalk.nonEmpty)
    assert(perWalk.forall(_.getLong(2) == 1L),
      "visits must be constant across one (qid, cell) walk's rows")
    assert(perWalk.forall(r => r.getLong(4) >= r.getLong(3)),
      "a walk cannot emit more hits than it visited")
  }

  test("graph-probed serving over the streamed index: saturating " +
    "efProbe equals the brute-probed search") {
    val dir = Files.createTempDirectory("graft-sgs-gp").toString
    val cts = cents.localCheckpoint(true)
    StreamGraphShards.bootstrap(spark, dir, emb.filter(col("vec_id") < 300),
      "vec_id", "embedding", cts)
    StreamGraphShards.maintainer(spark, dir, "vec_id", "embedding")(
      emb.filter(col("vec_id") >= 300), 1L)
    val cg = graft.operators.GraphAnn.buildGraph(
      cts.select(col("cent_id").as("vec_id"), col("cent_vec").as("embedding")),
      "vec_id", "embedding", m = 4, efConstruction = 4)
    val queries = emb.filter(col("vec_id").isin(0L, 250L, 499L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    val brute = rows(StreamGraphShards.topKBatch(queries, "vec_id",
      "embedding", dir, k = 10, nprobe = 2, ef = 32))
    val gp = rows(StreamGraphShards.topKBatchGraphProbe(queries, "vec_id",
      "embedding", dir, cg, k = 10, nprobe = 2, ef = 32, efProbe = 4))
    assert(gp == brute)
  }

  test("deletion: tombstoned ids vanish from serve results immediately; " +
    "vacuumDeleted rebuilds ONLY the touched cells, drops all-dead " +
    "cells from the manifest, and clears the tombstones") {
    val dir = Files.createTempDirectory("graft-gshard-del").toString
    StreamGraphShards.bootstrap(spark, dir, emb, "vec_id", "embedding",
      cents)
    val queries = emb.filter(col("vec_id") === 42L)
    def top() = StreamGraphShards.topKBatch(queries, "vec_id",
      "embedding", dir, k = 5, nprobe = 2, ef = 32)
      .collect().map(_.getLong(1)).toSeq
    val before = top() // self-match excluded: nearest OTHER ids lead
    assert(before.size == 5)
    // mark-delete: gone from results at once, graph files untouched
    val manifestBefore = marker(dir)
    assert(StreamGraphShards.delete(spark, dir,
      Seq(before.head, before(1))) == 2L)
    assert(StreamGraphShards.delete(spark, dir, Seq(before.head)) == 0L)
    val after = top()
    assert(after.size == 5 && !after.contains(before.head) &&
      !after.contains(before(1)), s"$after")
    assert(marker(dir) == manifestBefore, "mark-delete must not commit")
    // physical drop: only the cells holding the two ids rebuild
    val manifest0 = StreamGraphShards.readManifest(dir)
    val hit = StreamGraphShards.vacuumDeleted(spark, dir, "del1")
    assert(hit.nonEmpty && hit.size <= 2, s"rebuilt cells: $hit")
    assert(StreamGraphShards.tombstones(dir).isEmpty)
    val manifest1 = StreamGraphShards.readManifest(dir)
    assert((manifest0.keySet -- manifest1.keySet).forall(hit.contains))
    assert(manifest1.filter { case (c, p) => manifest0.get(c) != Some(p) }
      .keySet.subsetOf(hit.toSet),
      "only hit cells may repoint")
    // search parity after the drop, and idempotent vacuum
    assert(top() == after)
    assert(StreamGraphShards.vacuumDeleted(spark, dir, "del2").isEmpty)
  }
}
