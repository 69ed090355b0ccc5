package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis.tokens

/** BM25 top-k retrieval: rank corpus documents against a set of query
  * documents — the ranking/retrieval tier of the training-data pipeline
  * (retrieval-based decontamination, eval-set attribution, "which training
  * docs does this benchmark question leak from"). The reference engine has
  * no retrieval surface; this extends the decontamination family (q58/q60/
  * q73 flag by exact n-gram overlap; retrieval ranks by relevance when
  * overlap is partial).
  *
  * Scoring is the q48 libm-free contract, BM25-shaped: with k1 = 6/5 and
  * b = 3/4 the Robertson tf saturation term is EXACTLY the integer
  * rational
  * {{{
  *   part_permille = (22·tf·S·1000) div (10·tf·S + 3·S + 9·dl·N)
  * }}}
  * (multiply numerator and denominator of tf·(k1+1) / (tf + k1·(1−b) +
  * k1·b·dl/avgdl) by 10·S, with avgdl = S/N held as the exact pair (S, N)
  * — no float division anywhere), and the idf is the BM25 odds
  * (N−df+0.5)/(df+0.5) doubled into integers:
  * {{{
  *   idf_milli = ((2N − 2·df + 1)·1000) div (2·df + 1)
  * }}}
  * No ln(): libm log implementations differ across engines, so a float idf
  * would break bitwise oracle parity; the unlogged odds are monotone in
  * the BM25 idf, so per-term ordering is preserved (documented trade, same
  * as q48/q77). All arithmetic is Long; products stay under 2^63 for
  * corpora up to ~10^9 tokens × 10^5-token documents — past that, rescale
  * S to kilo-tokens (the contract is explicit so the oracle can follow).
  *
  * Scale shape: document text never crosses an exchange — tokens explode
  * in-scan, and only (id, term, tf, dl) aggregates shuffle. The query set
  * (an eval suite: thousands of documents, like [[Decontaminate]]'s eval
  * side) BROADCASTS twice — once into the df lookup, once into the
  * postings join — so the corpus-side tf table is never repartitioned by
  * term and hot terms cause no skew. Final ranking is the bounded
  * [[TopKAgg]] heap (≤ k rows per query per partition cross the last
  * exchange), not a window sort over every candidate.
  */
object Retrieval {

  /** Top-k corpus documents per query document by integer-exact BM25.
    * Output: (query_id, rank, doc_id, score) — rank 1-based by
    * (score desc, doc_id asc); queries with no token in common with any
    * corpus document produce no rows. */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
               textCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._

    val c = corpus.select(col(idCol).cast("long").as("_id"),
      tokens(col(textCol)).as("_w"))
      .withColumn("_dl", size(col("_w")).cast("long"))
    // posexplode: the position-0 marker survives the (doc, term) rollup as
    // _first (exactly one marked row per document), so N and S later fall
    // out of ONE plain global aggregate — no countDistinct expansion, no
    // per-document rollup
    val ct = c.select(col("_id"), col("_dl"),
      posexplode(col("_w")).as(Seq("_p", "_t")))
    // tf IS the inverted index: one row per (doc, term), docs × distinct
    // terms — orders of magnitude smaller than the token stream it folds.
    // It feeds three consumers (df, corpus stats, the postings join), so
    // without materialization Catalyst re-scans and re-explodes the corpus
    // once per consumer (no ReusedExchange: column pruning makes the three
    // subplans differ). localCheckpoint pins the compact aggregate instead
    // — the corpus parquet is read exactly once. Null-text documents have
    // no tokens and drop out of the index (and of N and S).
    // keepParallelism: without it AQE coalesces the compact index exchange
    // to ~1 partition by size, and the multiplying postings join below
    // (|terms per doc| × |queries per term| rows out per index row) runs
    // on one task — measured 1.5 s of a 2.4 s query on one core
    val pw = ConfWindow.keepParallelism(spark)
    pw.suspend()
    val tf =
      try ct.groupBy("_id", "_t")
        .agg(count(lit(1)).as("_tf"), min(col("_dl")).as("_dl"),
          max(when(col("_p") === 0, 1L).otherwise(0L)).as("_first"))
        .localCheckpoint(true)
      finally pw.restore()
    // N and S collect as two numbers and inline as literals: S = Σ tf
    // (total tokens), N = Σ first-markers (distinct docs) — one partial-
    // aggregated single-exchange job over the index, nothing broadcast
    val statsRow = tf.agg(sum(col("_first")).as("_n"), sum(col("_tf")).as("_s"))
      .head()
    val (n, s) = (statsRow.getLong(0), statsRow.getLong(1))

    // the query side is driver-small by contract (an eval suite, like
    // [[Decontaminate]]'s eval set and BloomGate's sketch literal):
    // collect it once and tokenize with the tokenizer's bitwise JVM twin —
    // the per-(query, term) idf table then builds as a LOCAL relation,
    // and its broadcast ships without any distinct exchange or build job
    val qRows = queries.select(col(idCol).cast("long"), col(textCol)).collect()
    val qtLocal = qRows.iterator
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .flatMap { r =>
        graft.functions.TextAnalysis.jvmTokens(r.getString(1)).distinct
          .map(t => (r.getLong(0), t))
      }.toSeq
    val dfLocal = spark.createDataFrame(qtLocal).toDF("_qid", "_t")
    val qidf = tf.groupBy("_t").agg(count(lit(1)).as("_df"))
      .join(broadcast(dfLocal), "_t")
      .select(col("_t"), col("_qid"),
        expr(s"((${2 * n + 1}L - _df*2) * 1000) div (_df*2 + 1)")
          .as("_idf_milli"))

    // one exchange serves BOTH aggregations below: HashPartitioning(_qid)
    // satisfies the (_qid, _id) clustering of the score aggregate (subset
    // rule) and the _qid clustering of the top-k aggregate, so neither
    // inserts its own shuffle
    val scored = tf.join(broadcast(qidf), "_t")
      .withColumn("_part_permille",
        expr(s"(${22 * s}L * _tf * 1000) div " +
          s"(${10 * s}L * _tf + ${3 * s}L + ${9 * n}L * _dl)"))
      .repartition(col("_qid"))
      .groupBy("_qid", "_id")
      .agg(sum(col("_idf_milli") * col("_part_permille")).as("_score"))

    // untyped udaf wrapper so the grouping key IS _qid (a typed groupByKey
    // would re-key on a serialized value column, forcing its own exchange
    // the repartition above could not satisfy)
    val topAgg = udaf(TopKAgg.topK[(Long, Long)](k) {
      case (id, score) => (score.toDouble, id) // integer-valued: exact
    }, Encoders.product[(Long, Long)])
    scored
      .groupBy("_qid")
      .agg(topAgg(col("_id"), col("_score")).as("_top"))
      .select(col("_qid").as("query_id"),
        posexplode(col("_top")).as(Seq("_i", "_e")))
      .select(col("query_id"), (col("_i") + 1).cast("long").as("rank"),
        col("_e._2").as("doc_id"), col("_e._1").cast("long").as("score"))
  }
}
