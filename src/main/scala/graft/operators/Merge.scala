package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch upsert / MERGE as a declarative DataFrame operation.
  *
  * Reference semantics (`/root/reference/hnarchive.py:203-253`, `insert_item`):
  * per key, if the row is new it is inserted; if it exists, "coalesce"
  * columns keep the stored value when the incoming value is NULL
  * (hnarchive.py:235-243), while "overwrite" columns always take the incoming
  * value whenever an incoming row exists at all. Rows never get deleted.
  *
  * The reference runs this row-at-a-time against SQLite; the Spark-native
  * shape is a single set-based plan: full-outer join on the key + a
  * per-column coalesce/conditional projection. At scale this is one shuffle
  * on the key (or zero if both sides are bucketed by the key); when the
  * incoming batch is small relative to the store, pass it pre-`broadcast`-
  * hinted and Catalyst/AQE turn the join into a broadcast join.
  */
object Merge {

  def upsert(
      stored: DataFrame,
      incoming: DataFrame,
      key: String,
      coalesceCols: Seq[String],
      overwriteCols: Seq[String]): DataFrame = {
    val st = stored.as("st")
    val in = incoming.as("in")
    val joined = st.join(in, col(s"st.$key") === col(s"in.$key"), "full_outer")
    val hasIncoming = col(s"in.$key").isNotNull
    val keyCol = coalesce(col(s"in.$key"), col(s"st.$key")).as(key)
    val merged =
      coalesceCols.map(c => coalesce(col(s"in.$c"), col(s"st.$c")).as(c)) ++
      overwriteCols.map(c =>
        when(hasIncoming, col(s"in.$c")).otherwise(col(s"st.$c")).as(c))
    joined.select(keyCol +: merged: _*)
  }
}
