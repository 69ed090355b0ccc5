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
  *
  * With `compactEvery > 0` the WRITE side becomes O(batch) too — the last
  * piece of the continuous-ingestion scale story (the reference's own sink
  * commits 200-row deltas, hnarchive.py:255-262; `replace` rewrites the
  * whole archive per micro-batch). A merge then just appends the
  * (deduplicated) batch as one delta directory; [[current]] is
  * merge-on-read — the deltas fold to one row per id under the EXACT
  * sequential-upsert semantics (overwrite columns: latest delta wins;
  * coalesce columns: latest NON-NULL delta wins, else the base value — see
  * [[foldedDeltas]] for why that reproduces upsert-after-upsert), and one
  * [[graft.operators.Merge.upsert]] applies the fold to the base, so a
  * bucketed base still joins Exchange-free. Every `compactEvery` commits
  * the log compacts back into one base snapshot — amortized
  * O(store / compactEvery) I/O per batch instead of O(store).
  */
final class ItemStore(spark: SparkSession, root: String, buckets: Int = 0,
                      compactEvery: Int = 0) {

  private val snaps = new Snapshots(spark, root, Item.schema,
    if (buckets > 0) Some(("id", buckets)) else None)

  /** Reference column groups (hnarchive.py:231-246). */
  val coalesceCols: Seq[String] = Seq("author", "text", "poll", "url", "score", "title")
  val overwriteCols: Seq[String] =
    Seq("deleted", "type", "time", "dead", "parent", "descendants", "retrieved")

  /** S6 `init_db`: create an empty snapshot iff absent (idempotent). */
  def init(): Unit = snaps.init()

  def current(): DataFrame = foldedDeltas() match {
    case None => snaps.read()
    case Some(folded) =>
      Merge.upsert(snaps.readBase(), folded, "id", coalesceCols, overwriteCols)
        .select(Item.schema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** The delta log folded to ONE row per id, reproducing what sequentially
    * upserting each delta would leave: an overwrite column takes its value
    * from the LATEST delta carrying the id (upsert overwrites uncondition-
    * ally whenever an incoming row exists); a coalesce column takes the
    * latest NON-NULL delta value (each upsert keeps the stored value on
    * incoming NULL, so values chain through `coalesce` newest-first) and
    * stays NULL only if every delta left it NULL — in which case the outer
    * [[Merge.upsert]] coalesces in the base value. `max_by` over the
    * manifest commit order `_seq` implements both ("latest non-null" via a
    * NULL ordering key on NULL values, which max_by ignores); ids are
    * unique per delta ([[merge]] dedupes before appending), so the
    * ordering key never ties. */
  private def foldedDeltas(): Option[DataFrame] = snaps.readDeltas().map { d =>
    val aggs =
      coalesceCols.map(c =>
        max_by(col(c), when(col(c).isNotNull, col("_seq"))).as(c)) ++
      overwriteCols.map(c => max_by(col(c), col("_seq")).as(c))
    d.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .select(Item.schema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** S7/S8: merge a normalized item batch into the store and commit it
    * atomically. Idempotent by id (re-merging the same batch is a no-op
    * modulo `retrieved`). `compactEvery == 0`: rewrite one merged snapshot
    * (O(store) I/O). `compactEvery > 0`: append the batch as one delta
    * directory (O(batch) I/O) and compact the log every `compactEvery`
    * commits. */
  def merge(batch: DataFrame): Unit =
    if (compactEvery > 0) {
      val deduped = Merge.dedupeByKey(batch, "id", Seq("retrieved"))
        .select(Item.schema.fieldNames.toIndexedSeq.map(col): _*)
      snaps.appendDelta(deduped)
      if (snaps.deltaCount >= compactEvery)
        snaps.replace(current()) // old dirs deleted only after the swap
    } else {
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
