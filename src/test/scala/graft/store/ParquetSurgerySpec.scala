package graft.store

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The bounded-parallel surgery driver ([[ParquetSurgery.inParallel]]):
  * input order preserved, work actually fans out, a failing item's
  * exception propagates (not an ExecutionException wrapper), and the
  * single-item path never builds a pool. Plus the periodic
  * [[ParquetSurgery.compact]] maintenance verb: chain resets,
  * row-identical content, and heal-safe crash states on either side of
  * the commit marker. */
class ParquetSurgerySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("inParallel preserves input order and runs items concurrently") {
    val running = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = ParquetSurgery.inParallel((1 to 24).toSeq) { i =>
      val now = running.incrementAndGet()
      peak.updateAndGet(p => math.max(p, now))
      Thread.sleep(30)
      running.decrementAndGet()
      i * 10
    }
    assert(out == (1 to 24).map(_ * 10))
    // bounded: never past the cap; parallel: more than one in flight
    assert(peak.get() <= ParquetSurgery.SurgeryParallelism, s"${peak.get()}")
    assert(peak.get() > 1, "no overlap observed — the pool serialized")
  }

  test("a failing item rethrows its own exception after in-flight " +
    "items finish; single-item input takes the direct path") {
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      ParquetSurgery.inParallel(Seq(1, 2, 3, 4)) { i =>
        if (i == 2) throw new IllegalStateException(s"item $i failed")
        done.incrementAndGet()
      }
    }
    assert(e.getMessage == "item 2 failed")
    assert(ParquetSurgery.inParallel(Seq(7))(i => {
      assert(Thread.currentThread().getName != "pool-thread")
      i + 1
    }) == Seq(8))
  }

  test("after a failure, items that have not yet STARTED never run — " +
    "and the rethrown cause is the real failure, not a skip marker") {
    // deterministic shape: the failer and 7 blockers occupy all
    // SurgeryParallelism threads; the canary is queued behind them. The
    // failer waits until every blocker is running, releases them, then
    // throws — it trips the shared failed-flag BEFORE its thread frees,
    // so whenever the canary is eventually scheduled the flag is
    // already set and its op is skipped (no race against the
    // collector's cancel).
    val p = ParquetSurgery.SurgeryParallelism
    val started = new java.util.concurrent.CountDownLatch(p - 1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val canaryRan = new java.util.concurrent.atomic.AtomicBoolean(false)
    val blockersDone = new java.util.concurrent.atomic.AtomicInteger(0)
    // items: 0 = failer, 1..p-1 = blockers, p = canary
    val e = intercept[IllegalStateException] {
      ParquetSurgery.inParallel((0 to p).toSeq) {
        case 0 =>
          started.await()
          release.countDown()
          throw new IllegalStateException("surgery 0 failed")
        case i if i < p =>
          started.countDown()
          release.await()
          blockersDone.incrementAndGet()
        case _ =>
          canaryRan.set(true); 0
      }
    }
    assert(e.getMessage == "surgery 0 failed",
      s"rethrown cause was ${e.getMessage}")
    assert(!canaryRan.get(),
      "a not-yet-started surgery ran after the batch failed")
    // in-flight items were never interrupted — they all finished
    assert(blockersDone.get() == p - 1, s"${blockersDone.get()}")
  }

  // ---- compact -------------------------------------------------------

  /** A surgery-worn dataset: 4 parts of (id, payload), two of them
    * renamed into one- and two-deep `.forget` chains (exactly the state
    * repeated takedowns leave behind). Returns (dir, expected rows). */
  private def wornDataset(): (String, Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString
    (0L until 40L).map(i => (i, s"payload-$i")).toDF("id", "payload")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val parts = ParquetSurgery.dataFiles(dir).sortBy(_.toString)
    assert(parts.size == 4)
    def chain(p: Path, n: Int): Unit = {
      val base = p.getFileName.toString.stripSuffix(".parquet")
      val worn = p.getParent.resolve(
        base + (".forget" * n) + ".parquet")
      Files.move(p, worn); ()
    }
    chain(parts(0), 1)
    chain(parts(1), 2)
    (dir, (0L until 40L).map(i => (i, s"payload-$i")))
  }

  private def readAll(dir: String): Seq[(Long, String)] = {
    import spark.implicits._
    val files = ParquetSurgery.dataFiles(dir)
    if (files.isEmpty) Seq.empty
    else spark.read.parquet(files.map(_.toString): _*)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
  }

  test("compact resets forget chains, keeps rows identical, and " +
    "reports an honest receipt") {
    val (dir, expected) = wornDataset()
    val r = ParquetSurgery.compact(spark, dir)
    assert(r.rows == 40L)
    assert(r.filesBefore == 4L)
    assert(r.chainedBefore == 2L)
    assert(r.filesAfter >= 1L)
    val after = ParquetSurgery.dataFiles(dir)
    assert(after.size.toLong == r.filesAfter)
    assert(after.forall(!_.getFileName.toString.contains(".forget.")),
      s"chain survived compaction: $after")
    assert(readAll(dir) == expected)
    // no stage or marker residue
    assert(!Files.exists(Paths.get(dir, ParquetSurgery.CompactStageName)))
    assert(!Files.exists(Paths.get(dir, ParquetSurgery.CompactMarkerName)))
    // idempotent: a second compact is a plain rewrite, rows unchanged
    val r2 = ParquetSurgery.compact(spark, dir)
    assert(r2.rows == 40L && r2.chainedBefore == 0L)
    assert(readAll(dir) == expected)
  }

  test("compact honors targetBytes (small target => multiple parts) " +
    "and an empty dir returns a zero receipt") {
    val (dir, expected) = wornDataset()
    val r = ParquetSurgery.compact(spark, dir, targetBytes = 1L)
    assert(r.filesAfter > 1L, s"expected a multi-part rewrite, got $r")
    assert(readAll(dir) == expected)
    val empty = Files.createTempDirectory("graft-compact-empty").toString
    assert(ParquetSurgery.compact(spark, empty) ==
      ParquetSurgery.CompactReceipt(0L, 0L, 0L, 0L))
  }

  /** Stage a compacted copy + marker by hand — the exact on-disk state
    * a compact leaves at its commit point — without running the swap. */
  private def stageWithMarker(dir: String): (List[String], List[String]) = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    val files = ParquetSurgery.dataFiles(dir)
    val stage = root.resolve(ParquetSurgery.CompactStageName)
    spark.read.parquet(files.map(_.toString): _*)
      .repartition(1).write.mode("overwrite").parquet(stage.toString)
    val staged = {
      val s = Files.list(stage)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
          !n.startsWith(".")).toList.sorted
      finally s.close()
    }
    val origs = files.map(f => root.relativize(f).toString).toList
    val tmp = Files.createTempFile(root, ".graft-compact-marker", ".tmp")
    Files.write(tmp, (staged.map("stage:" + _) ++ origs.map("orig:" + _))
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, root.resolve(ParquetSurgery.CompactMarkerName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    (staged, origs)
  }

  test("pre-commit crash (stage, no marker) rolls BACK: healPending " +
    "sweeps the stage and the originals stand untouched") {
    val (dir, expected) = wornDataset()
    val root = Paths.get(dir)
    val stage = root.resolve(ParquetSurgery.CompactStageName)
    spark.read.parquet(
        ParquetSurgery.dataFiles(dir).map(_.toString): _*)
      .repartition(1).write.mode("overwrite").parquet(stage.toString)
    val before = ParquetSurgery.dataFiles(dir).map(_.toString).sorted
    ParquetSurgery.healPending(dir)
    assert(!Files.exists(stage), "pre-commit stage survived the heal")
    assert(ParquetSurgery.dataFiles(dir).map(_.toString).sorted == before)
    assert(readAll(dir) == expected)
  }

  test("post-commit crash (marker published, swap not started) rolls " +
    "FORWARD: healPending finishes the swap") {
    val (dir, expected) = wornDataset()
    val (staged, _) = stageWithMarker(dir)
    ParquetSurgery.healPending(dir)
    val after = ParquetSurgery.dataFiles(dir)
    assert(after.map(_.getFileName.toString).sorted == staged)
    assert(readAll(dir) == expected)
    assert(!Files.exists(Paths.get(dir, ParquetSurgery.CompactStageName)))
    assert(!Files.exists(Paths.get(dir, ParquetSurgery.CompactMarkerName)))
  }

  test("mid-swap crash (one part moved in, one original deleted) " +
    "completes idempotently on heal — and re-heals are no-ops") {
    val (dir, expected) = wornDataset()
    val root = Paths.get(dir)
    val (staged, origs) = stageWithMarker(dir)
    // simulate a crash half-way through the swap
    val stage = root.resolve(ParquetSurgery.CompactStageName)
    Files.move(stage.resolve(staged.head), root.resolve(staged.head),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Files.delete(root.resolve(origs.head))
    ParquetSurgery.healPending(dir)
    val after = ParquetSurgery.dataFiles(dir)
    assert(after.map(_.getFileName.toString).sorted == staged)
    assert(readAll(dir) == expected)
    ParquetSurgery.healPending(dir) // idempotent
    assert(readAll(dir) == expected)
  }

  test("a committed compaction whose staged part vanished from BOTH " +
    "locations fails loud naming the part") {
    val (dir, _) = wornDataset()
    val root = Paths.get(dir)
    val (staged, _) = stageWithMarker(dir)
    Files.delete(root.resolve(ParquetSurgery.CompactStageName)
      .resolve(staged.head))
    val e = intercept[IllegalArgumentException] {
      ParquetSurgery.healPending(dir)
    }
    assert(e.getMessage.contains(staged.head))
  }
}
