package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the 100 TB properties the queries must keep:
  * predicate pushdown reaching the parquet scan, column pruning, broadcast
  * joins for dimensions, TakeOrderedAndProject for top-k (never a full
  * sort). Encoding them as tests stops plan regressions silently costing
  * 100× at scale. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q02 pushes filters into the parquet scan and prunes columns") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:") &&
      p.matches("(?s).*PushedFilters: \\[.*l_shipdate.*\\].*"),
      s"no pushed l_shipdate filter in:\n$p")
    // projection needs only 6 columns — l_tax/l_returnflag must not be read
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_returnflag"),
      s"scan reads pruned columns: $readSchema")
  }

  test("q04 broadcasts the dimension tables") {
    val p = plan("q04_star_join_revenue")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("q05 plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q05_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered in:\n$p")
  }

  test("q03 point lookup pushes the key predicate") {
    val p = plan("q03_point_lookup")
    assert(p.matches("(?s).*PushedFilters: \\[.*o_orderkey.*\\].*"),
      s"no pushed key filter in:\n$p")
  }

  test("q30 brute-force knn never shuffles the corpus (one exchange max)") {
    val p = plan("q30_knn_brute")
    val exchanges = PlanChecks.shuffleExchanges(p)
    assert(p.contains("TakeOrderedAndProject"), s"knn missing TakeOrdered:\n$p")
    assert(exchanges <= 1, s"corpus shuffle detected ($exchanges exchanges):\n$p")
  }

  test("canary: the shuffle-exchange counter sees a real shuffle") {
    // a repartition is the plainest shuffle there is — if a Spark upgrade
    // changes the formatted-explain operator syntax, this fails instead of
    // every shuffleExchanges assertion going silently vacuous
    import org.apache.spark.sql.functions.col
    val p = Tables.orders(spark, dir).repartition(col("o_orderkey"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(PlanChecks.shuffleExchanges(p) >= 1,
      s"counter matched no Exchange in a repartition plan:\n$p")
  }

  test("MinHash signature stage is map-only — no exchange, codegen'd expression") {
    import org.apache.spark.sql.functions._
    Tables.registerViews(spark, dir) // registers minhash_sig
    val sig = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.MinHashSig(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
    val p = sig.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"signature stage shuffles:\n$p")
    // formatted mode marks whole-stage-codegen'd operators with '*'
    assert(p.contains("* Project"), s"signature stage not codegen'd:\n$p")
  }

  test("shingle relation needs no exchange (per-doc dedup in the expression)") {
    val sh = graft.operators.Dedup.shingles(
      Tables.documents(spark, dir), "doc_id", "text")
    val p = sh.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"shingle relation shuffles:\n$p")
  }

  test("q47 vocabulary top-k is TakeOrderedAndProject with partial aggregation") {
    val p = plan("q47_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), s"vocab top-k sorts globally:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"no map-side partial aggregation:\n$p")
  }

  test("q58 decontamination broadcasts the eval shingles — corpus never shuffles") {
    val p = plan("q58_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$p")
    // the only shuffles are the two match-set aggregations and the final
    // sort — never a corpus-wide exchange below the join
    assert(PlanChecks.shuffleExchanges(p) <= 3,
      s"unexpected extra shuffle:\n$p")
  }

  test("q73 bloom decontamination: both stacked aggs ride one repartition") {
    val p = plan("q73_decontaminate_bloom")
    // exactly four exchanges: the two shuffle-hash join sides (gram key),
    // the single repartition(id) that serves BOTH aggregation levels, and
    // the final orderBy. A fifth exchange means the stacked-agg fusion
    // regressed to two sequential aggregation shuffles.
    assert(PlanChecks.shuffleExchanges(p) <= 4,
      s"stacked-agg fusion regressed — extra exchange in:\n$p")
  }

  test("q74 temperature mix: corpus never shuffles, rates broadcast back") {
    import org.apache.spark.sql.functions.col
    val df = graft.operators.Mixing.temperatureMix(
      Tables.documents(spark, dir), "doc_id", "source", budget = 30000L)
      .orderBy("source")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the rate table joins back by BROADCAST (it is a handful of source
    // rows); a shuffle join there would exchange the corpus
    assert(p.contains("BroadcastHashJoin"), s"rate join not broadcast:\n$p")
    // the corpus text column never crosses an exchange: counts aggregate
    // map-side, the membership decision is an in-scan filter
    val exchangeLines = p.linesIterator
      .filter(_.trim.matches("""\(\d+\) Exchange.*""")).mkString("\n")
    assert(!exchangeLines.contains("text"),
      s"corpus text crosses an exchange:\n$exchangeLines")
    // shape bound: count agg + the tiny window's single-partition
    // exchange + summary agg + sort — all on source-keyed summary rows
    assert(PlanChecks.shuffleExchanges(p) <= 5, s"unexpected extra shuffle:\n$p")
  }

  test("q75 span scrub: eval hashes broadcast, corpus text never exchanges") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, dir)
    val ev = docs.filter(col("doc_id") % 89 === 0).select("doc_id", "text")
    val df = graft.operators.Decontaminate.scrubSpans(
      docs.filter(col("doc_id") % 89 =!= 0).select("doc_id", "text"),
      ev, "doc_id", "text", minTokens = 8)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the eval window-hash set and the per-doc run lists both come back by
    // BROADCAST; the only shuffles are the flagged (id, p) pairs' window
    // partitioning and the run-list aggregation — corpus-volume data never
    // exchanges on either pass
    assert(p.contains("BroadcastHashJoin"), s"no broadcast joins:\n$p")
    val exchangeLines = p.linesIterator
      .filter(_.trim.matches("""\(\d+\) Exchange.*""")).mkString("\n")
    assert(!exchangeLines.contains("text") && !exchangeLines.contains("_w"),
      s"corpus tokens cross an exchange:\n$exchangeLines")
    assert(PlanChecks.shuffleExchanges(p) <= 3, s"unexpected extra shuffle:\n$p")
  }

  test("q60 skewed decontamination: salted shuffle join, corpus text stays below") {
    // The hot-gram set is MEASURED, so the salted SHAPE only exists when
    // some gram crosses the threshold — true at the sf0.1 bench scale,
    // not at spec scale (sf0.01 max gram count is 35 < hotMin 64; below
    // it an empty hot set constant-folds the salt to 0, a correct
    // degenerate plan). Pin the skew shape by running the same operator
    // with a threshold the sf0.01 eval distribution actually crosses —
    // hotMin 16 ≤ the partition count also exercises the exact-count
    // regime of the hot detector.
    import org.apache.spark.sql.functions.col
    val sf01 = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, sf01)
    val evalDocs = Tables.events(spark, sf01)
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id"), col("user_id"))
      .join(docs.select(col("doc_id").as("src_doc"), col("text")),
        col("src_doc") === col("user_id"))
      .select(col("event_id").as("doc_id"), col("text"))
    val df = graft.operators.Decontaminate.flaggedSalted(
      docs.filter(col("doc_id") % 97 =!= 0), evalDocs,
      "doc_id", "text", minShared = 2, saltR = 8, hotMin = 16L)
      .orderBy("doc_id")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the overlap join must be the salted SHUFFLE join — a broadcast there
    // would make the salt a no-op (no per-key placement to spread)
    assert(p.contains("ShuffledHashJoin"), s"overlap join not shuffle-hash:\n$p")
    // formatted mode details the keys below the tree: the ShuffledHashJoin
    // section's "Left keys" must include the salt column
    val shjDetail = p.split("""\(\d+\) ShuffledHashJoin""").drop(1).mkString
    assert(shjDetail.linesIterator.exists(l =>
      l.contains("keys") && l.contains("_salt")),
      s"overlap join keys carry no salt:\n$p")
    // the measured hot-gram set rides into both sides as an in-scan set
    // predicate (no aggregation exchange, no broadcast tag joins)
    assert(!p.contains("BroadcastHashJoin"),
      s"hot tagging regressed to broadcast joins:\n$p")
    // corpus-wide data never shuffles: every Exchange partitions on gram/
    // salt or agg keys — the raw text column must be consumed by the
    // in-scan shingle Generate BELOW the exchanges, never partitioned
    val exchangeLines = p.linesIterator
      .filter(_.trim.matches("""\(\d+\) Exchange.*""")).mkString("\n")
    assert(!exchangeLines.contains("text"),
      s"corpus text crosses an exchange:\n$exchangeLines")
    // shape bound: two salted join sides + ONE post-join exchange on the
    // train id (its hash-partitioning satisfies the pair-level AND the
    // doc-level grouping, so the stacked aggs run in one stage) + sort —
    // every one partitions on gram/salt/id keys, none on corpus rows
    assert(PlanChecks.shuffleExchanges(p) <= 4,
      s"unexpected extra shuffle:\n$p")
  }

  test("q85 band join is ids-only: no array column crosses the band " +
    "exchange; whole query runs in <= 8 jobs") {
    import org.apache.spark.sql.functions.col
    var jobs = 0
    val jl = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(jl)
    try {
      // construct INSIDE the listener scope: the signature localCheckpoint
      // runs its jobs at construction time and counts toward the floor
      val df = graft.operators.Similarity.hyperplaneSigPairs(
        Tables.embeddings(spark, dir), "vec_id", "embedding", minCos = 0.3)
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      // every Exchange block that partitions on the band key must carry
      // ids and band keys ONLY — the vectors ride the checkpointed
      // signature table and join back to candidates, never the band
      // explode (blocks run from an "(N) Operator" header to the next)
      val blocks = p.split("""(?m)^(?=\(\d+\) )""").toSeq
      val bandExchanges = blocks.filter(b =>
        b.trim.startsWith("(") && b.linesIterator.next().contains("Exchange") &&
          b.contains("bkey"))
      assert(bandExchanges.nonEmpty, s"no band exchange found in plan:\n$p")
      bandExchanges.foreach { b =>
        assert(!b.contains("vecd") && !b.contains("embedding") && !b.contains("norm"),
          s"array/vector column crosses the band exchange:\n$b")
      }
      df.orderBy(col("id_a"), col("id_b")).collect() // drive the jobs
      org.apache.spark.GraftTestBus.flush(spark.sparkContext)
      // 9, was 8 before the identical-signature pre-collapse: the one
      // extra job is the collapse's window exchange on hsig — the
      // linear cost that replaces the m-copy C(m,2) bucket pileup
      assert(jobs <= 9, s"q85 spent $jobs jobs (pin: <= 9)")
    } finally spark.sparkContext.removeSparkListener(jl)
  }

  test("q63 quota sampling aggregates bounded buffers — no window sort") {
    val p = plan("q63_quota_sample")
    // the whole point of the TopKAgg path: map-side partial aggregation
    // (<= quota rows per group per partition cross the exchange), never a
    // per-group window ranking over the full corpus
    assert(p.contains("ObjectHashAggregate"), s"typed aggregation missing:\n$p")
    assert(!p.contains("Window"), s"quota sampling fell back to a window:\n$p")
    // group-key exchange + final ORDER BY only
    assert(PlanChecks.shuffleExchanges(p) <= 2, s"unexpected extra shuffle:\n$p")
  }

  test("q59 repetition stats stay in-scan: one sort exchange, codegen'd") {
    val p = plan("q59_repetition_filter")
    assert(PlanChecks.shuffleExchanges(p) <= 1, // the ORDER BY only
      s"repetition metrics shuffled the corpus:\n$p")
    // codegen markers only appear on the EXECUTED final plan under AQE —
    // explaining the lazy plan made this assert depend on whether another
    // suite's AQE-off window happened to be open (a real flake)
    val df = SparkEntry.queries("q59_repetition_filter")(spark, dir)
    df.collect()
    val executed = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(executed.contains("* Project"),
      s"metric projection not codegen'd:\n$executed")
  }

  test("q144 CDC dup stats: text never crosses an exchange (only " +
    "id/hash/count longs), chunker codegen'd in the scan stage") {
    val p = plan("q144_cdc_dup")
    // the chunker expression sits scan-side; the exchanges that follow
    // carry (doc_id, h, n_tokens) longs only. Readable signal: every
    // Exchange hashpartitioning in the plan keys on h or doc_id, and no
    // Exchange line's schema mentions the text column
    val exchangeDetails = p.linesIterator.filter(_.contains("Arguments: hashpartitioning"))
      .toSeq
    assert(exchangeDetails.nonEmpty, s"no exchanges found:\n$p")
    assert(exchangeDetails.forall(l => !l.contains("text#")),
      s"document text crosses an exchange:\n${exchangeDetails.mkString("\n")}")
    assert(p.contains("cdc_chunks"), s"chunker missing from the plan:\n$p")
  }

  test("q145 CDC pairs: the star emission is ids-only — no text past " +
    "the scan, bounded exchange count") {
    val p = plan("q145_cdc_pairs")
    val exchangeDetails = p.linesIterator
      .filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchangeDetails.forall(l => !l.contains("text#")),
      s"document text crosses an exchange:\n${exchangeDetails.mkString("\n")}")
    assert(PlanChecks.shuffleExchanges(p) <= 6,
      s"unexpected exchange growth:\n$p")
  }
}
