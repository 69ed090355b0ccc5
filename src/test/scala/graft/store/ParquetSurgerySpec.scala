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
}
