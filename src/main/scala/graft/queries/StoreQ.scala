package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** STORE-MAINTENANCE queries — the on-disk surgery verbs under the
  * oracle gate. The forget legs' semantics are spec-tested per store;
  * these rows pin the end-to-end ON-DISK content contract the verbs
  * promise a deployment: after takedowns and the periodic compaction
  * rewrite, the dataset a reader sees is EXACTLY the filtered corpus —
  * hash-checked column by column against DuckDB filtering the same
  * parquet input.
  *
  * Reference: voussoir/hnarchive keeps one mutable SQLite file and
  * deletes in place (hnarchive.py:210-245 `delete_item`); a distributed
  * corpus is immutable parquet, so deletion is file surgery
  * ([[graft.store.CorpusForget]]) and periodic compaction
  * ([[graft.store.ParquetSurgery.compact]]) is the maintenance verb
  * that keeps the surgery-worn layout healthy. */
object StoreQ {

  /** q158: TAKEDOWN → TAKEDOWN → COMPACT content identity. Two deletion
    * generations hit the same materialized corpus store (every file is
    * touched twice — the receipt REQUIRES `.forget.forget` chains to
    * have formed, so the scenario exercised is the worn layout, not a
    * fresh one), then [[graft.store.ParquetSurgery.compact]] rewrites
    * the store under fresh names. The query returns the compacted
    * store's full content; the oracle is the trivially-true statement
    * compact must preserve: the original corpus minus both deletion
    * batches, row for row, NULL text included. A compaction that drops
    * a row, resurrects a deleted one, or mangles a column breaks the
    * hash; the chain/receipt mechanics are additionally pinned by
    * ParquetSurgerySpec's crash-state cases. */
  val q158 = Q(
    "q158_store_compact",
    """SELECT doc_id, text, lang
      |FROM documents
      |WHERE NOT (doc_id % 13 = 5 OR doc_id % 17 = 2)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).select("doc_id", "text", "lang")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-q158-store").toString
    try {
      docs.repartition(8).write.mode("overwrite").parquet(scratch)
      // one collect for both deletion generations (driver-side split —
      // the second batch deliberately re-includes ids the first already
      // removed, exactly as the former per-batch scans did)
      val dead = docs
        .filter(col("doc_id") % 13 === 5 || col("doc_id") % 17 === 2)
        .select(col("doc_id").cast("long"))
        .collect().map(_.getLong(0)).toSeq
      graft.store.CorpusForget.forget(s, scratch, "doc_id",
        dead.filter(_ % 13 == 5))
      graft.store.CorpusForget.forget(s, scratch, "doc_id",
        dead.filter(_ % 17 == 2))
      val r = graft.store.ParquetSurgery.compact(s, scratch)
      require(r.chainedBefore > 0,
        "the double takedown formed no .forget chains — the compaction " +
          "scenario under test did not materialize")
      // checkpoint before the scratch store is swept: the returned plan
      // must not dangle on a deleted directory
      s.read.parquet(scratch).orderBy("doc_id").localCheckpoint(true)
    } finally {
      graft.store.ParquetSurgery.deleteRecursively(
        java.nio.file.Paths.get(scratch))
    }
  }

  val all: Seq[Q] = Seq(q158)
}
