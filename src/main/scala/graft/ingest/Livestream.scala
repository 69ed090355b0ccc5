package graft.ingest

/** S5: the unbounded livestream source — a faithful, deterministic port of
  * the reference's poll-loop state machine (`livestream`,
  * `/root/reference/hnarchive.py:162-195`) decoupled from wall-clock so it
  * is unit-testable against a scripted [[FakeFetcher]].
  *
  * Semantics preserved exactly:
  *  - miss → linear backoff sleep (m=2, b=5, max=60 s; hnarchive.py:163)
  *  - every 5th consecutive miss, probe `latestId`; if `latest > id + 50`
  *    the id is proven deleted (not just unpublished — the 50-id margin
  *    guards the batch-publish race, rationale hnarchive.py:166-177) and is
  *    skipped WITHOUT sleeping (the `continue`, hnarchive.py:184-188)
  *  - hit → advance, reset miss counter, rewind backoff by 2 steps
  *    (hnarchive.py:190-194)
  *
  * In Spark this iterator is the offset-advancing core of a custom
  * micro-batch streaming source: each `nextBatch` drain is one trigger's
  * worth of rows, merged into the store via the idempotent upsert (T6 —
  * effective exactly-once). See [[graft.streaming.LivestreamRunner]].
  */
final class Livestream(
    fetcher: Fetcher,
    startId: Long,
    sleep: Long => Unit) {

  /** Linear backoff m=2, b=5, max=60 (seconds), with rewind(2) on success —
    * mirrors voussoirkit backoff.Linear as used at hnarchive.py:163,190,194. */
  private var step: Int = 0
  private def backoffNext(): Long = {
    val v = math.min(60L, 5L + 2L * step)
    step += 1
    v
  }
  private def backoffRewind(n: Int): Unit = step = math.max(0, step - n)

  private var id: Long = startId
  private var missedLoops: Int = 0

  def currentId: Long = id

  /** Advance the state machine until the next existing item is found.
    * Returns its raw body. Blocks (via `sleep`) while waiting on
    * unpublished ids — callers bound it with `take`/time budgets. */
  def next(): String = {
    while (true) {
      fetcher.fetch(id) match {
        case None =>
          missedLoops += 1
          if (missedLoops % 5 == 0 && fetcher.latestId() > id + 50) {
            id += 1 // proven deleted: skip, no sleep
          } else {
            sleep(backoffNext() * 1000L)
          }
        case Some(body) =>
          id += 1
          missedLoops = 0
          backoffRewind(2)
          return body
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Drain exactly `max` items (one micro-batch); the fetched id is always
    * `currentId - 1` because `next()` advances past it on success. */
  def nextBatch(max: Int): Seq[(Long, String)] =
    Seq.fill(max) { val body = next(); (id - 1, body) }
}
