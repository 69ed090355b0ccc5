package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE RETRAIN DECISION — the consumer that closes the tokenizer
  * maintenance loop the fertility monitor opens: given
  * [[graft.streaming.StreamFertility.report]]'s per-group fertility
  * and (optionally) the funnel's per-group unknown-piece telemetry
  * (the `n_bpe_unk` the [[graft.streaming.StreamCuration]] report
  * alarms on, sliced by the same group column), name the PROPORTIONAL
  * response per group:
  *
  *  - **`warm`** — the group ships SYMBOLS outside the frozen
  *    vocabulary (`n_unk > 0`): [[graft.operators.Unigram.warmStart]]'s
  *    coverage floor admits the new singles (encoding becomes total
  *    again) and re-calibrates every cost against the drifted
  *    frequencies — one EM pass over the bounded word table, no span
  *    enumeration.
  *  - **`cold`** — the group's fertility sits at/above the ceiling
  *    (`pieces_per_word_milli > maxPiecesPerWordMilli`): the inventory
  *    cannot COMPOSE the group's content (the per-symbol segmentation
  *    regime), and only the full span enumeration learns new multi
  *    pieces — the warm path's documented non-goal
  *    ([[graft.operators.Unigram.warmStartFromVocab]]). Cold dominates
  *    warm when both fire.
  *  - **`none`** — covered and compressing; leave the frozen artifact
  *    alone (retraining without cause churns every downstream id).
  *
  * Pure column arithmetic over two bounded per-group frames (one row
  * per group — driver-artifact-sized); no scan, no shuffle beyond the
  * one group-keyed join. The thresholds are per-deployment: the q148
  * A/B table is where a deployment reads its own ceiling from. */
object Retrain {

  /** One verdict row per group: (grp, pieces_per_word_milli, n_unk,
    * action ∈ none|warm|cold). `unkByGroup` is optional (a deployment
    * without unk telemetry gets fertility-only verdicts; absent groups
    * read 0). */
  def plan(fertilityReport: DataFrame,
           unkByGroup: Option[DataFrame] = None,
           maxPiecesPerWordMilli: Long = 3000L): DataFrame = {
    require(maxPiecesPerWordMilli > 0,
      s"maxPiecesPerWordMilli must be > 0, got $maxPiecesPerWordMilli")
    val base = fertilityReport.select(col("grp"),
      col("pieces_per_word_milli").cast("long")
        .as("pieces_per_word_milli"))
    val withUnk = unkByGroup match {
      case Some(u) => base.join(
        u.select(col("grp"), col("n_unk").cast("long").as("n_unk")),
        Seq("grp"), "left")
        .withColumn("n_unk", coalesce(col("n_unk"), lit(0L)))
      case None => base.withColumn("n_unk", lit(0L))
    }
    withUnk.withColumn("action",
      when(col("pieces_per_word_milli") > maxPiecesPerWordMilli,
        lit("cold"))
        .when(col("n_unk") > 0L, lit("warm"))
        .otherwise(lit("none")))
  }
}
