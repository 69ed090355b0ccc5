package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row of the same
  * key with `right.ts <= left.ts`. Spark has no AsOfJoin operator; the
  * idiomatic scale answer is NOT a range join (quadratic blowup per key) but
  * the union + single-sort + carry-forward idiom:
  *
  *   1. tag both sides and union them (right sorts before left on ties, so
  *      `<=` semantics hold),
  *   2. one window sorted by (ts, side, tiebreak) per key,
  *   3. carry the last non-null right payload forward, keep left rows.
  *
  * Cost: ONE shuffle on the key over left+right — versus a per-key
  * cross-product for the naive range-join formulation. This is the classic
  * time-series enrichment operator (trade→quote, event→dimension-version).
  */
object AsofJoin {

  /** @param left   rows to enrich (all columns preserved)
    * @param right  rows providing the carried payload
    * @param keyCol equality key present on both sides
    * @param tsCol  ordering column present on both sides
    * @param leftTieCol  left column total-ordering left rows within (key, ts)
    * @param rightTieCol right column total-ordering right rows within
    *                    (key, ts) — the LAST right row by this order wins ties
    * @param payloadCols right columns to carry, emitted as `asof_<name>`
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, leftTieCol: String, rightTieCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = right.select(struct(payloadCols.map(col): _*)).schema.head.dataType

    val lTagged = left
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(payloadType))
      .withColumn("_tie", col(leftTieCol).cast("long"))
      .select((leftCols ++ Seq("_side", "_payload", "_tie")).map(col): _*)

    val rTagged = {
      val base = right
        .withColumn("_side", lit(0))
        .withColumn("_payload", struct(payloadCols.map(col): _*))
        .withColumn("_tie", col(rightTieCol).cast("long"))
      // align to the left schema: left-only columns are null on right rows
      val aligned = leftCols.foldLeft(base) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      aligned.select((leftCols ++ Seq("_side", "_payload", "_tie")).map(col): _*)
    }

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionAll(rTagged)
      .withColumn("_carried", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(p => col(s"_carried.$p").as(s"asof_$p")): _*)
  }
}
