package graft.ingest

import org.apache.spark.sql.SparkSession

import graft.store.ItemStore

/** E1 `update` / `update_items` — the catch-up and re-crawl pipelines
  * (SURVEY.md E1/E4; reference `update_argparse` hnarchive.py:524-537,
  * `update_items_argparse` hnarchive.py:539-562) as set-based jobs.
  */
object Update {

  /** Catch up the archive to the remote max id: loop (bound discovery →
    * range fetch → merge) until lower > upper, exactly the reference's
    * `while lower < upper` (hnarchive.py:527-531) with the fetch expressed
    * as a bounded distributed scan instead of a thread pool.
    * Returns the number of loop iterations. */
  def catchUp(spark: SparkSession, store: ItemStore, fetcher: Fetcher,
              parallelism: Int, now: () => Long,
              batchLimit: Long = 100000L): Int = {
    store.init()
    var rounds = 0
    // the cursor advances past every fetched range regardless of how many
    // rows survived normalization — deriving it from store.latestId() would
    // livelock on a fully-tombstoned range (the store max never moves, so
    // the same dead ids would be refetched forever)
    var cursor = store.latestId().map(_ + 1).getOrElse(1L)
    var upper = fetcher.latestId()
    while (cursor <= upper) {
      val hi = math.min(upper, cursor + batchLimit - 1)
      val batch = BulkFetch.fetchItems(spark, fetcher, cursor, hi,
        parallelism, now())
      store.merge(batch)
      rounds += 1
      cursor = hi + 1
      upper = fetcher.latestId() // bound re-read per round, like the reference
    }
    rounds
  }

  /** E4 re-crawl: refetch volatile rows (age-at-retrieval within `days`,
    * optionally mature-only) and merge the revisions. The id set stays
    * distributed end-to-end (contrast the reference's driver-side
    * `fetchall`, hnarchive.py:550-551). */
  def recrawl(spark: SparkSession, store: ItemStore, fetcher: Fetcher,
              days: Int, onlyMature: Boolean, parallelism: Int,
              now: () => Long): Long = {
    import spark.implicits._
    val ids = store.recrawlIds(days, onlyMature, now()).as[Long]
    val n = ids.count()
    if (n > 0) {
      val t = now()
      val raw = ids.repartition(parallelism)
        .mapPartitions { it => it.map(id => (id, fetcher.fetch(id).orNull)) }
        .toDF("id", "body")
      store.merge(graft.schema.Item.normalize(raw,
        org.apache.spark.sql.functions.lit(t)))
    }
    n
  }
}
