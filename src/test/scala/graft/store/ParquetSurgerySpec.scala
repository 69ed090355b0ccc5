package graft.store

import org.scalatest.funsuite.AnyFunSuite

/** The bounded-parallel surgery driver ([[ParquetSurgery.inParallel]]):
  * input order preserved, work actually fans out, a failing item's
  * exception propagates (not an ExecutionException wrapper), and the
  * single-item path never builds a pool. */
class ParquetSurgerySpec extends AnyFunSuite {

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
}
