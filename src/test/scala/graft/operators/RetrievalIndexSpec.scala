package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The materialized BM25 layout ([[Retrieval.bm25WriteIndex]]): term-hash
  * bucket partitions on disk, query = pruning + the shared scoring. */
class RetrievalIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** File scans under AQE wrappers — the plan must already be executed
    * so the adaptive plan is final. */
  private def postingsScans(
      df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    def go(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case q: QueryStageExec => go(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(go) ++ other.subqueries.flatMap(go)
    }
    go(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("postings")))
  }

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private def corpus = docs.filter(col("doc_id") % 89 =!= 0)
  private def queries = docs.filter(col("doc_id") % 89 === 0)

  /** Directory names a store's pointer-commit manifest references —
    * everything else on disk must be invisible to readers. */
  private def manifestDirs(root: String): Seq[String] =
    new String(Files.readAllBytes(
      java.nio.file.Paths.get(root, "current"))).trim
      .split("\n").toSeq.map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#"))

  private def copyDir(src: java.nio.file.Path,
                      dst: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(src).iterator().asScala.toSeq.foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  test("indexed query equals the direct operator and prunes to the " +
    "probed buckets") {
    val dir = Files.createTempDirectory("graft-bm25-index").toString
    Retrieval.bm25WriteIndex(corpus, "doc_id", "text", dir, buckets = 16)

    val res = Retrieval.bm25TopKIndexed(spark, dir, queries,
      "doc_id", "text", k = 3)
    val want = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val got = res.as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == want)
    assert(got.nonEmpty)

    // pruning is visible in the physical plan: the postings scan selects
    // only buckets containing query terms, never all of them (the base
    // snapshot lives under the store's manifest-referenced directory)
    val snap = manifestDirs(s"$dir/postings").head
    val bucketDirs = new java.io.File(s"$dir/postings/$snap").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("_b="))
    val scanned = postingsScans(res).map(_.selectedPartitions.partitionCount)
    assert(scanned.nonEmpty)
    // the synthetic corpus's full eval set touches every vocab term, so
    // ALL populated buckets are legitimately probed here — the bound is
    // that pruning never reads more than the populated directories; the
    // single-term test below proves the non-vacuous case
    assert(scanned.forall(p => p > 0 && p <= bucketDirs))
  }

  test("append deltas equal a full rebuild, replays are idempotent, and " +
    "compaction preserves the answer") {
    val dir = Files.createTempDirectory("graft-bm25-inc").toString
    val ids = corpus.select("doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val a = corpus.filter(col("doc_id") <= cut)
    val b = corpus.filter(col("doc_id") > cut)
    Retrieval.bm25WriteIndex(a, "doc_id", "text", dir, buckets = 16)
    Retrieval.bm25AppendIndex(b, "doc_id", "text", dir, batchId = 1L)

    def indexed() = Retrieval.bm25TopKIndexed(spark, dir, queries,
        "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val want = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(indexed() == want, "base + delta must equal the full corpus")

    // a replayed batch is a manifest-token no-op — same answer, no
    // double counting, no second delta
    Retrieval.bm25AppendIndex(b, "doc_id", "text", dir, batchId = 1L)
    assert(manifestDirs(s"$dir/postings").length == 2,
      "replayed append added a delta")
    assert(indexed() == want, "replayed append double-counted")

    Retrieval.bm25CompactIndex(spark, dir)
    Seq("postings", "df", "meta").foreach { sub =>
      assert(manifestDirs(s"$dir/$sub") ==
        Seq(manifestDirs(s"$dir/$sub").head),
        s"$sub deltas survived compaction")
    }
    assert(indexed() == want, "compaction changed the answer")
  }

  test("compaction kill-points: uncommitted snapshots, unreferenced " +
    "deltas, and replays of compacted batches are all invisible") {
    val dir = Files.createTempDirectory("graft-bm25-crash").toString
    val ids = corpus.select("doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val a = corpus.filter(col("doc_id") <= cut)
    val b = corpus.filter(col("doc_id") > cut)
    Retrieval.bm25WriteIndex(a, "doc_id", "text", dir, buckets = 16)
    Retrieval.bm25AppendIndex(b, "doc_id", "text", dir, batchId = 1L)

    def indexed() = Retrieval.bm25TopKIndexed(spark, dir, queries,
        "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val want = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(indexed() == want)

    // kill-point 1 — compaction crashed BETWEEN writing the new folded
    // base and committing the manifest: the written-but-unreferenced
    // snapshot (here: a byte-identical copy of the live base, i.e. a
    // worst-case plausible double) must not be read
    val proot = java.nio.file.Paths.get(dir, "postings")
    val liveSnap = manifestDirs(s"$dir/postings").head
    copyDir(proot.resolve(liveSnap), proot.resolve("snap-00crashed"))
    assert(indexed() == want, "uncommitted snapshot leaked into reads")

    // kill-point 2 — compaction crashed BETWEEN the manifest commit and
    // the delta GC: a delta directory still on disk but no longer in the
    // manifest must not be double-counted
    val liveDelta = manifestDirs(s"$dir/postings").last
    copyDir(proot.resolve(liveDelta), proot.resolve("delta-00ghost"))
    assert(indexed() == want, "unreferenced delta double-counted")

    // a finishing compaction folds base+delta and SWEEPS both leftovers
    Retrieval.bm25CompactIndex(spark, dir)
    assert(indexed() == want, "compaction changed the answer")
    assert(!Files.exists(proot.resolve("snap-00crashed")) &&
      !Files.exists(proot.resolve("delta-00ghost")),
      "compaction's init() must sweep crash leftovers")

    // kill-point 3 — a crash-replay of a batch whose delta the compaction
    // already folded away: the consumed-tokens ledger makes it a no-op
    Retrieval.bm25AppendIndex(b, "doc_id", "text", dir, batchId = 1L)
    assert(manifestDirs(s"$dir/postings").length == 1,
      "replay of a compacted batch re-appended its delta")
    assert(indexed() == want, "replay of a compacted batch double-counted")
  }

  test("a query set touching few terms opens few buckets") {
    val dir = Files.createTempDirectory("graft-bm25-index2").toString
    Retrieval.bm25WriteIndex(corpus, "doc_id", "text", dir, buckets = 16)
    // single-term query: exactly one bucket may be opened
    val oneTerm = Seq((9999L, "table")).toDF("doc_id", "text")
    val res = Retrieval.bm25TopKIndexed(spark, dir, oneTerm,
      "doc_id", "text", k = 2)
    val rows = res.collect()
    val scanned = postingsScans(res).map(_.selectedPartitions.partitionCount)
    assert(scanned.nonEmpty && scanned.forall(_ == 1), s"scanned $scanned")
    assert(rows.length == 2 && rows.forall(_.getLong(3) > 0))
  }

  test("deletion equals an index built from the surviving corpus " +
    "(postings, df AND idf/meta), is idempotent, and folds deltas") {
    val dir = Files.createTempDirectory("graft-bm25-del").toString
    val ids = corpus.select("doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val a = corpus.filter(col("doc_id") <= cut)
    val b = corpus.filter(col("doc_id") > cut)
    Retrieval.bm25WriteIndex(a, "doc_id", "text", dir, buckets = 16)
    Retrieval.bm25AppendIndex(b, "doc_id", "text", dir, batchId = 1L)
    // delete every third doc — WITH a delta outstanding
    val toDelete = ids.filter(_ % 3 == 0).toSeq
    val removed = Retrieval.bm25DeleteIndex(spark, dir, toDelete)
    assert(removed == toDelete.size, s"removed $removed")
    def res(d: String) = Retrieval.bm25TopKIndexed(spark, d, queries,
      "doc_id", "text", k = 3).collect().toSeq
    // parity: scores (idf, avgdl — N and S included) must be BITWISE
    // the index a fresh build over the surviving corpus produces
    val survDir = Files.createTempDirectory("graft-bm25-del-want").toString
    Retrieval.bm25WriteIndex(corpus.filter(col("doc_id") % 3 =!= 0),
      "doc_id", "text", survDir, buckets = 16)
    assert(res(dir) == res(survDir),
      "deleted index must equal a rebuild from the surviving corpus")
    // idempotent retry (the crash-heal contract): same call, no change
    assert(Retrieval.bm25DeleteIndex(spark, dir, toDelete) == 0L)
    assert(res(dir) == res(survDir))
    // no-ops
    assert(Retrieval.bm25DeleteIndex(spark, dir, Seq.empty) == 0L)
    // deleting from a nonexistent index fails loud (init() must not
    // silently bootstrap an empty store)
    intercept[IllegalArgumentException] {
      Retrieval.bm25DeleteIndex(spark,
        Files.createTempDirectory("graft-bm25-none").toString, Seq(1L))
    }
  }
}
