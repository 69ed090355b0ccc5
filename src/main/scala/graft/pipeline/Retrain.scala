package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Unigram}

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
  *    (`pieces_per_word_milli >= maxPiecesPerWordMilli` — the ceiling
  *    itself is already the regime the knob names): the inventory
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
  * A/B table is where a deployment reads its own ceiling from.
  *
  * [[plan]] names the verdicts; [[execute]] runs them (warm+ / cold
  * per group, receipts per group) and [[restampTokenizer]] re-stamps
  * the release card under the artifacts now in force — monitor →
  * verdict → retrain → cleared verdict, closed in one module. */
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
      when(col("pieces_per_word_milli") >= maxPiecesPerWordMilli,
        lit("cold"))
        .when(col("n_unk") > 0L, lit("warm"))
        .otherwise(lit("none")))
  }

  /** One group's EXECUTED verdict: the action taken, the artifact now
    * denominating the group's token ids (`none` groups carry the
    * previous model untouched), and the receipt numbers — documents
    * re-encoded under the new artifact and the unknown pieces they
    * still ship (0 after a successful warm/warm+/cold pass: the number
    * [[plan]] reads next cycle). `none` groups report `nDocs = -1` and
    * `nUnkAfter = -1`: the churn discipline says an untouched group
    * costs ZERO scans, so there is nothing re-measured to report.
    *
    * `modelHash` is the group's NEW denomination
    * ([[Unigram.modelHash]]) — the value a deployment stamps its
    * re-encoded token datasets with ([[graft.store.Denomination]]), so
    * shards encoded under the retired artifact fail loud at load
    * instead of being silently read in the wrong id space (`none`
    * groups keep the previous hash: nothing re-denominated). */
  final case class Executed(grp: String, action: String,
                            model: Unigram.Model, nDocs: Long,
                            piecesBefore: Long, piecesAfter: Long,
                            nUnkAfter: Long) {
    def modelHash: Long = Unigram.modelHash(model)
  }

  /** EXECUTE the verdicts — the middle step [[plan]] used to leave to
    * hand-written glue: slice the corpus by group and give each group
    * exactly the response its verdict names.
    *
    *  - `none` — untouched (retraining without cause churns every
    *    downstream id); the previous artifact carries forward, no scan.
    *  - `warm` — [[Unigram.warmPlus]] over the group's slice (the warm
    *    seed plus span enumeration bounded to the DRIFTED words — the
    *    warm verdict fires exactly when new symbols arrived, so the
    *    drift-restricted growth tier is the proportional response);
    *    `growOnWarm = false` drops to the plain [[Unigram.warmStart]]
    *    (coverage + re-calibration only, no new multi pieces).
    *  - `cold` — [[Unigram.train]] over the group's slice under the
    *    previous model's pre-tokenization policy (the full span
    *    enumeration: the inventory could not compose the content).
    *
    * Per-group receipts come back as [[Executed]] rows; each retrained
    * group is re-encoded once under its new artifact so the receipt
    * carries the cleared `nUnkAfter` — the same number the next
    * [[plan]] cycle reads from the funnel telemetry. Re-stamp the
    * release card with [[restampTokenizer]] and re-freeze each group's
    * artifact with [[graft.operators.Unigram.saveModel]].
    *
    * Scale shape: group count is deployment-bounded (languages /
    * domains — the fertility report's own cardinality), and each
    * retrained group costs one bounded word-frequency aggregation over
    * its slice plus one receipt encode aggregate (two slice scans,
    * filter pushed to the source; partition the corpus by `groupCol`
    * and they prune). `none` groups cost nothing. A warm/cold verdict
    * over an EMPTY slice fails loud naming the group — a verdict for
    * content that no longer exists is a stale plan, not a no-op. */
  def execute(plan: DataFrame, docs: DataFrame, idCol: String,
              textCol: String, groupCol: String, prev: Unigram.Model,
              knobs: Unigram.Knobs = Unigram.Knobs(),
              warmRounds: Int = 1, minFreq: Long = 1L,
              maxVocab: Int = Bpe.DefaultMaxVocab,
              growOnWarm: Boolean = true): Seq[Executed] = {
    val verdicts = plan
      .select(col("grp").cast("string"), col("action").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    require(verdicts.nonEmpty, "empty retrain plan — nothing to execute")
    val dup = verdicts.groupBy(_._1)
      .collect { case (g, vs) if vs.sizeIs > 1 => g }
    require(dup.isEmpty,
      s"retrain plan names ${dup.toSeq.sorted.mkString(", ")} more than " +
        "once — one verdict per group")
    verdicts.sortBy(_._1).map {
      case (grp, "none") =>
        Executed(grp, "none", prev, -1L, prev.pieces.length.toLong,
          prev.pieces.length.toLong, -1L)
      case (grp, action @ ("warm" | "cold")) =>
        val slice = docs.filter(col(groupCol) === grp)
        val model =
          try {
            if (action == "cold")
              Unigram.train(slice, textCol, knobs, minFreq, maxVocab,
                prev.preTok)
            else if (growOnWarm)
              Unigram.warmPlus(slice, textCol, prev, knobs, warmRounds,
                minFreq, maxVocab)
            else
              Unigram.warmStart(slice, textCol, prev, knobs, warmRounds,
                minFreq, maxVocab)
          } catch {
            case e: IllegalArgumentException => throw
              new IllegalArgumentException(
                s"retrain '$action' for group '$grp' failed: " +
                  s"${e.getMessage}", e)
          }
        val enc = Unigram.encode(slice, idCol, textCol, model)
          .agg(count(lit(1)), coalesce(sum(col("n_unk")), lit(0L))).head()
        Executed(grp, action, model, enc.getLong(0),
          prev.pieces.length.toLong, model.pieces.length.toLong,
          enc.getLong(1))
      case (grp, other) => throw new IllegalArgumentException(
        s"unknown retrain action '$other' for group '$grp' — execute " +
          "takes Retrain.plan output (none|warm|cold)")
    }
  }

  /** Re-stamp a release card's tokenizer section after [[execute]]:
    * the section must denominate the token counts in the artifacts NOW
    * in force, per group. Totals come from one encode aggregate per
    * group under that group's artifact (drift telemetry: `nUnkPieces`
    * reads 0 when every verdict cleared — the number
    * [[DataCard.diff]]'s `unkRatePpmDelta` tracks release over
    * release); the shape fields total over the DISTINCT artifacts in
    * use (`none` groups share the previous model; each retrained group
    * freezes its own), so the section says how much tokenizer the
    * release ships overall. Fails loud on a corpus group without an
    * executed verdict — a card that cannot say which tokenizer
    * denominates a slice's counts is not a release note. */
  def restampTokenizer(card: DataCard.Card, docs: DataFrame, idCol: String,
                       textCol: String, groupCol: String,
                       executed: Seq[Executed],
                       byteFallback: Boolean = false): DataCard.Card = {
    require(executed.nonEmpty, "no executed verdicts — nothing to stamp")
    val byGrp = executed.map(e => e.grp -> e.model).toMap
    require(byGrp.size == executed.size,
      "executed verdicts name a group more than once")
    val present = docs.select(col(groupCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val uncovered = present.filterNot(byGrp.contains)
    require(uncovered.isEmpty,
      s"corpus groups without an executed retrain verdict: " +
        s"${uncovered.mkString(", ")} — the card cannot say which " +
        "tokenizer denominates their counts")
    var nTok = 0L
    var nUnk = 0L
    present.foreach { g =>
      val enc = Unigram.encode(docs.filter(col(groupCol) === g), idCol,
        textCol, byGrp(g), byteFallback = byteFallback)
        .agg(coalesce(sum(col("n_tokens")), lit(0L)),
          coalesce(sum(col("n_unk")), lit(0L))).head()
      nTok += enc.getLong(0)
      nUnk += enc.getLong(1)
    }
    // distinct by REFERENCE: none groups share the previous model
    // object; two equal retrained models for different groups are
    // still two frozen artifacts
    val distinct = executed.map(_.model)
      .foldLeft(Vector.empty[Unigram.Model]) { (acc, m) =>
        if (acc.exists(_ eq m)) acc else acc :+ m }
    val nMerges = distinct.map(m =>
      (m.pieces.length - m.pieces.count(p => Unigram.symLen(p) == 1))
        .toLong).sum
    val vocabSize = distinct.map(_.vocab(byteFallback).size.toLong).sum
    card.copy(tokenizer = Some(DataCard.TokenizerSection(
      nMerges = nMerges, vocabSize = vocabSize,
      nBpeTokens = nTok, nUnkPieces = nUnk)))
  }
}
