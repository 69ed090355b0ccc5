package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Mixing

/** DSIR importance weighting under continuous ingestion — the q99
  * scorer as a stream stage, with the contract an online importance
  * sampler has to make explicit: the DISTRIBUTION BOOKS FREEZE at
  * binder creation. Both the target book (the reference slice — frozen
  * by definition) and the RAW book (the seed corpus the binder is built
  * over) are computed ONCE (`Mixing.dsirRatio`, two bounded bucket
  * aggregations) and every micro-batch then scores against them
  * statelessly (`Mixing.dsirScoreWith`: in-scan, zero shuffles, no
  * store).
  *
  * Why frozen, not accumulated: letting the raw book track the stream
  * would make a document's weight depend on WHEN it arrived (the same
  * text scores differently in batch 3 and batch 300), so shipped
  * weights would be unstable under replay and incomparable across the
  * corpus — the exact property q100's epoch artifacts and the split
  * tier's first-writer claims exist to prevent. Frozen books make
  * scoring pure: replays are bit-identical, a batch's weights never
  * change after shipment, and batch-vs-stream parity is exact
  * (StreamDsirSpec). The honest residual is RAW-DISTRIBUTION DRIFT:
  * when the live stream drifts from the seed corpus the ratios go
  * stale — measure it with [[StreamDrift.monitor]] over the same
  * hashed features and re-derive the binder per release (the batch
  * q99 remains ground truth), exactly the reconcile discipline the
  * split tier uses.
  */
object StreamDsir {

  /** Build the frozen-book scorer. `seedRaw` is the corpus the raw
    * distribution freezes over; `target` the reference slice. The
    * returned function is pure — use it in `foreachBatch` or a plain
    * `transform`. */
  def scorer(seedRaw: DataFrame, target: DataFrame, idCol: String,
             textCol: String, buckets: Int = 1024, maxFeatures: Int = 64,
             ngram: Int = 1): DataFrame => DataFrame = {
    val ratio = Mixing.dsirRatio(seedRaw, textCol, target, textCol,
      buckets, ngram)
    (batch: DataFrame) =>
      Mixing.dsirScoreWith(batch, idCol, textCol, ratio, maxFeatures, ngram)
  }
}
