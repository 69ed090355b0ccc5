package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the batch twin of
  * Structured Streaming's session windows, needed by any training-data
  * pipeline that groups raw interaction logs into sessions.
  *
  * A new session starts when the gap to the previous event of the same key
  * exceeds `gapSeconds`. Implemented as two stacked window functions over one
  * shuffle (partitionBy key): lag → new-session flag → running sum = session
  * id. Scale note: a single hash partitioning by key serves both windows; no
  * second shuffle.
  */
object Sessionize {

  /** Adds `session_id` (0-based per key) to `df`.
    * @param tsSeconds epoch-seconds column (integer semantics, so oracle
    *                  engines agree regardless of sub-second precision)
    * @param tieBreak total-orders events within a key at equal timestamps
    */
  def assign(
      df: DataFrame,
      keyCol: String,
      tsSeconds: Column,
      tieBreak: Column,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsSeconds, tieBreak)
    val prev = lag(tsSeconds, 1).over(w)
    val newSession = when(
      prev.isNull || tsSeconds - prev > gapSeconds, lit(1)).otherwise(lit(0))
    df.withColumn("_new_s", newSession)
      .withColumn("session_id",
        (sum(col("_new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast("long"))
      .drop("_new_s")
  }
}
