package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The standing IVF index ([[VectorIndex]] + [[graft.streaming
  * .StreamVectorIndex]]): append-parity with a batch-written index over
  * the same frozen quantizer, directory pruning across base AND deltas,
  * replay idempotence (incl. across a compaction), compaction
  * transparency. */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dirData = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dirData)

  private def qvec: Seq[Double] = emb.filter(col("vec_id") === 0)
    .select(Similarity.vecD(col("embedding"))).head().getSeq[Double](0)

  private def probe(dir: String, nprobe: Int = 2) =
    VectorIndex.topKIndexed(spark, dir, qvec, k = 5, nprobe = nprobe)

  test("streamed appends converge to the batch-written index over the " +
    "same frozen quantizer; probes prune directories in base and deltas") {
    val seed = emb.filter(col("vec_id") < 300)
    val rest = emb.filter(col("vec_id") >= 300).orderBy("vec_id").collect()
    val (b1, b2) = rest.splitAt(rest.length / 2)
    def toDf(part: Array[org.apache.spark.sql.Row]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(part.toIndexedSeq), emb.schema)

    // streamed index: bootstrap on the seed, append two micro-batches
    val sDir = Files.createTempDirectory("graft-vidx-s").toString
    VectorIndex.writeIndex(seed, "vec_id", "embedding", sDir,
      centroidEvery = 50)
    val maintain = graft.streaming.StreamVectorIndex.indexMaintainer(
      spark, sDir, "vec_id", "embedding", compactEvery = 16)
    maintain(toDf(b1), 0L)
    maintain(toDf(b2), 1L)

    // batch comparator: the WHOLE corpus written once, with the SAME
    // quantizer (the seed's stride centroids) — append semantics must be
    // exactly "as if the rows had been there at write time"
    val bDir = Files.createTempDirectory("graft-vidx-b").toString
    val seedCents = Similarity.centroidsOf(
      Similarity.withNorm(seed, "embedding"), "vec_id", 50)
    VectorIndex.writeIndexWith(emb, "vec_id", "embedding", bDir, seedCents)

    val got = probe(sDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = probe(bDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, s"streamed index diverged: $got vs $want")
    assert(got.nonEmpty && got.head._1 == 0L && got.head._3 == 1.0)

    // pruning: every parquet scan in the probe plan (base + 2 deltas)
    // touches at most nprobe partition directories
    val res = probe(sDir)
    res.collect()
    val scanned = res.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.forall(_ <= 2),
      s"a probe scan read more than nprobe partitions: $scanned")

    // replay of an already-applied batch: no-op (store row count stable)
    val before = VectorIndex.indexDeltaCount(spark, sDir)
    maintain(toDf(b2), 1L)
    assert(VectorIndex.indexDeltaCount(spark, sDir) == before,
      "replayed batch appended a second delta")
    assert(probe(sDir).collect().map(_.getLong(0)).toSeq ==
      got.map(_._1), "replay changed the probe answer")
  }

  test("compaction folds deltas without changing answers; a replay of a " +
    "compacted-away batch stays a no-op") {
    val seed = emb.filter(col("vec_id") < 400)
    val b1 = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    val b2 = emb.filter(col("vec_id") >= 450)
    val dir = Files.createTempDirectory("graft-vidx-c").toString
    VectorIndex.writeIndex(seed, "vec_id", "embedding", dir,
      centroidEvery = 50)
    // compactEvery = 2: the second append triggers the fold
    val maintain = graft.streaming.StreamVectorIndex.indexMaintainer(
      spark, dir, "vec_id", "embedding", compactEvery = 2)
    maintain(b1, 10L)
    val preCompact = probe(dir).collect().map(_.getLong(0)).toSeq
    maintain(b2, 11L)
    assert(VectorIndex.indexDeltaCount(spark, dir) == 0,
      "cadence hit did not compact")
    val postCompact = probe(dir, nprobe = 8).collect()
    assert(postCompact.length == 5)
    // replay of batch 10, whose delta the compaction already folded away:
    // the consumed-token ledger must make it a no-op, not a double-append
    maintain(b1, 10L)
    assert(VectorIndex.indexDeltaCount(spark, dir) == 0,
      "replay after compaction re-appended a folded delta")
    assert(preCompact.nonEmpty)
  }

  test("deletion: a probe stops returning deleted ids and equals an " +
    "index rebuilt from the survivors under the same frozen quantizer") {
    val dir = Files.createTempDirectory("graft-vidx-del").toString
    VectorIndex.writeIndex(emb, "vec_id", "embedding", dir,
      centroidEvery = 50)
    val top = probe(dir).collect().map(_.getLong(0)).toSeq
    assert(top.head == 0L) // the query vector's own id leads
    val removed = VectorIndex.deleteIndex(spark, dir, Seq(0L, top(1)))
    assert(removed == 2L, s"removed $removed")
    val after = probe(dir).collect().map(_.getLong(0)).toSeq
    assert(!after.contains(0L) && !after.contains(top(1)), s"$after")
    // parity with a rebuild from the survivors, same quantizer
    val survDir = Files.createTempDirectory("graft-vidx-del-want").toString
    val cents = Similarity.centroidsOf(
      Similarity.withNorm(emb, "embedding"), "vec_id", 50)
    VectorIndex.writeIndexWith(
      emb.filter(!col("vec_id").isin(0L, top(1))), "vec_id", "embedding",
      survDir, cents)
    assert(probe(dir).collect().toSeq == probe(survDir).collect().toSeq)
    // idempotent retry + no-op
    assert(VectorIndex.deleteIndex(spark, dir, Seq(0L, top(1))) == 0L)
    assert(VectorIndex.deleteIndex(spark, dir, Seq.empty) == 0L)
    // deleting from a nonexistent index fails loud (init() must not
    // silently bootstrap an empty store)
    intercept[IllegalArgumentException] {
      VectorIndex.deleteIndex(spark,
        Files.createTempDirectory("graft-vidx-none").toString, Seq(1L))
    }
  }
}
