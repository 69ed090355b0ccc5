package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis.strHash

/** Corpus mixing for the training-data pipeline: control how much each
  * domain/source contributes to the training set. Two deterministic
  * policies, both content-addressed (a stable hash of the document id, so
  * membership is reproducible and append-stable — adding documents never
  * flips an existing decision for rate mixing; for quota sampling it can
  * only displace the largest-hash members, never reorder survivors):
  *
  *  - [[quotaSample]]: cap every group at exactly `quota` documents — the
  *    domain-balancing step ("no source exceeds N docs/tokens").
  *  - [[rateMix]]: keep a per-group FRACTION (Pile/Dolma-style static
  *    mixture weights).
  *
  * Scale shapes: quota sampling uses the bounded [[TopKAgg]] buffer
  * (map-side partial aggregation ships ≤ quota rows per group per
  * partition — never a full per-group sort; the regime gate is quota
  * small enough that quota rows fit an executor, same contract as any
  * top-k). Rate mixing is a pure map-side filter — zero shuffle at any
  * corpus size; only the per-group summary aggregates.
  */
object Mixing {

  /** Deterministic per-group cap: keep the `quota` documents with the
    * smallest (hash(id), id) per group. Output: (groupCol, rank, idCol),
    * rank 1-based in hash order.
    */
  def quotaSample(docs: DataFrame, idCol: String, groupCol: String,
                  quota: Int): DataFrame = {
    require(quota >= 1, "quota must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.PolyHash.ensureRegistered(spark)
    val base: Dataset[(String, Long, Long)] = docs
      .select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        strHash(col(idCol).cast("string")).as("hv"))
      .as[(String, Long, Long)]
    // TopKAgg keeps the k HIGHEST scores; ascending hash order = negated
    // score (hv < 2^31 is exact in a Double), id ascending tie-break.
    val agg = TopKAgg.topK[(String, Long, Long)](quota) {
      case (_, id, hv) => (-hv.toDouble, id)
    }
    base.groupByKey(_._1).agg(agg.toColumn.name("top"))
      .flatMap { case (g, entries) =>
        entries.zipWithIndex.map { case ((_, id), i) => (g, (i + 1).toLong, id) }
      }
      .toDF(groupCol, "rank", idCol)
  }

  /** The per-mille rate a row's group resolves to — ONE definition shared
    * by the filter and its audit so they cannot drift. */
  private def rateExpr(groupCol: String, ratesMilli: Map[String, Int],
                       defaultMilli: Int): org.apache.spark.sql.Column = {
    require((ratesMilli.values ++ Seq(defaultMilli)).forall(r => r >= 0 && r <= 1000),
      "rates are per-mille: 0..1000")
    ratesMilli.foldLeft(lit(defaultMilli)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
  }

  /** Static-mixture filter: keep a document iff
    * `hash(id) % 1000 < ratesMilli(group)` (missing groups use
    * `defaultMilli`). Returns the kept rows of `docs`, all columns. */
  def rateMix(docs: DataFrame, idCol: String, groupCol: String,
              ratesMilli: Map[String, Int],
              defaultMilli: Int = 1000): DataFrame = {
    graft.functions.PolyHash.ensureRegistered(docs.sparkSession)
    val rate = rateExpr(groupCol, ratesMilli, defaultMilli)
    docs.filter(strHash(col(idCol).cast("string")) % 1000 < rate)
  }

  /** Per-group audit of a [[rateMix]] decision: group, total, kept, and
    * the applied per-mille rate. One scan, one small agg. */
  def rateMixSummary(docs: DataFrame, idCol: String, groupCol: String,
                     ratesMilli: Map[String, Int],
                     defaultMilli: Int = 1000): DataFrame = {
    graft.functions.PolyHash.ensureRegistered(docs.sparkSession)
    val rate = rateExpr(groupCol, ratesMilli, defaultMilli)
    docs
      .select(col(groupCol).as("g"),
        rate.cast("long").as("rate_milli"),
        (strHash(col(idCol).cast("string")) % 1000 < rate).cast("long").as("keep"))
      .groupBy("g", "rate_milli")
      .agg(count(lit(1)).as("n_total"), sum(col("keep")).as("n_kept"))
      .select(col("g").as(groupCol), col("rate_milli"), col("n_total"),
        col("n_kept"))
  }
}
