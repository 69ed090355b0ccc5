package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Merge
import graft.schema.Item

/** The item archive: a parquet snapshot store with the reference's upsert
  * semantics (SURVEY.md S6-S8; `/root/reference/hnarchive.py:197-290`).
  *
  * Plain parquet has no MERGE, so a merge writes a new snapshot directory
  * and atomically swaps a `current` pointer file (see [[Snapshots]]) — the
  * batch analog of the reference's per-200-row transactional commit
  * (hnarchive.py:255-262). Upsert column asymmetry mirrors `insert_item`
  * (hnarchive.py:231-246): incoming NULL keeps the stored value for
  * author/text/poll/url/score/title; flags, parent, descendants, type and
  * time always overwrite; `retrieved` always refreshes. Tombstones never
  * delete (README.md:18).
  *
  * Scale: the merge is one key-shuffle full-outer join (broadcast when the
  * batch is small). With `buckets > 0` every snapshot is stored BUCKETED
  * by id ([[Snapshots]] bucketed mode), so the merge join plans with no
  * Exchange on the store side — successive merges shuffle only the
  * incoming batch, never the accumulated archive. That asymmetry is the
  * whole 100 TB story: the store is ~25M rows × years, the batch is
  * whatever one crawl returned.
  */
final class ItemStore(spark: SparkSession, root: String, buckets: Int = 0) {

  private val snaps = new Snapshots(spark, root, Item.schema,
    if (buckets > 0) Some(("id", buckets)) else None)

  /** Reference column groups (hnarchive.py:231-246). */
  val coalesceCols: Seq[String] = Seq("author", "text", "poll", "url", "score", "title")
  val overwriteCols: Seq[String] =
    Seq("deleted", "type", "time", "dead", "parent", "descendants", "retrieved")

  /** S6 `init_db`: create an empty snapshot iff absent (idempotent). */
  def init(): Unit = snaps.init()

  def current(): DataFrame = snaps.read()

  /** S7/S8: merge a normalized item batch into the store and commit a new
    * snapshot. Idempotent by id (re-merging the same batch is a no-op
    * modulo `retrieved`). */
  def merge(batch: DataFrame): Unit = {
    val merged = Merge.upsert(current(), batch, "id", coalesceCols, overwriteCols,
        precedenceCols = Seq("retrieved"))
      .select(Item.schema.fieldNames.toIndexedSeq.map(col): _*)
    snaps.replace(merged)
  }

  /** A1 `select_latest_id` (hnarchive.py:285-290): resume offset. */
  def latestId(): Option[Long] =
    current().agg(max(col("id"))).head().get(0) match {
      case null => None
      case v: Long => Some(v)
    }

  /** P4/P5 re-crawl candidates (`update_items_argparse` hnarchive.py:540-549):
    * ids whose age-at-retrieval is within `days`, optionally only items past
    * the 14-day maturity window (hnarchive.py:543-546). `now` injected for
    * determinism (F3). */
  def recrawlIds(days: Int, onlyMature: Boolean, now: Long): DataFrame = {
    val base = current()
      .filter(col("retrieved") - col("time") <= lit(days.toLong * 86400L))
    val filtered =
      if (onlyMature) base.filter(col("time") < lit(now - 14L * 86400L))
      else base
    filtered.select("id")
  }
}
