package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{StreamCuration, StreamDataCard}

/** Bench sidecar for the FORGET CASCADE — the deletion family's claims
  * measured, not asserted (the media funnel's discipline): builds real
  * standing state over the bench corpus in per-audit owned scratch
  * (curation claims via one funnel batch, CDC chunk claims, a BM25
  * index, an IVF index, a cumulative card, fertility telemetry, the
  * pack-stream dataset and the corpus parquet itself range-partitioned
  * by id), runs ONE `Forget.cascade` over a scattered ~1% takedown
  * list, then
  * `Forget.verify` — published: the cascade wall, per-leg removal
  * receipts, and whether every post-audit leg reads zero.
  *
  * The corpus-file locality claim gets its own measurement: a CLUSTERED
  * takedown (one contiguous id range) against the same 16-file
  * id-range-partitioned corpus touches ~1 file where the scattered list
  * touches most — `touched_clustered` vs `touched_scattered` is the
  * number the O(touched files) story rests on.
  *
  * Round 17 appends the composed close of the deletion lifecycle, timed
  * as its own tail (`maint_sec` — `cascade_sec`/`verify_sec` stay
  * cross-round comparable): both takedowns recorded in the persisted
  * [[ForgetLedger]], then the surgery-worn corpus draws its
  * [[graft.store.Maintenance]] verdict and the compaction receipt. */
object ForgetAudit {

  def run(spark: SparkSession, sfDir: String): String = {
    val base = Files.createTempDirectory("graft-forget-audit").toString
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source")
      .filter(col("text").isNotNull)
      .localCheckpoint(true)
    val nDocs = docs.count()

    // the materialized corpus: 16 id-range files (the clustered layout)
    val corpusDir = s"$base/corpus"
    docs.repartitionByRange(16, col("doc_id")).write.parquet(corpusDir)

    // curation claims via one real funnel batch
    val claimsDir = s"$base/claims"
    val curate = StreamCuration.curator(spark,
      docs.limit(0).select("doc_id", "text"), claimsDir,
      repetitionTopBigramMilli = 1000)
    graft.Bench.runFully(curate(docs.select("doc_id", "text", "source"), 0L))

    // the materialized pack-stream dataset (q132's shape: BPE-encoded
    // docs, epoch-shuffled, token-budget packs with doc_ids) — the
    // cascade's in-place mask leg works against this
    val packsDir = s"$base/packs"
    // fused train+alphabet (one corpus pass), token_ids-only encode,
    // and the identity re-attach join dropped — the q132-family
    // optimizations applied to the sidecar's pack build too
    val (merges, alphabet) = graft.operators.Bpe.trainAndAlphabet(
      docs, "text", numMerges = 30)
    val vocab = graft.operators.Bpe.vocabOf(alphabet, merges)
    val encTok = graft.operators.Bpe
      .encode(docs, "doc_id", "text", merges, vocab, emitPieces = false)
    val eps = graft.operators.Mixing.epochShuffle(
      encTok.select(col("doc_id"), col("token_ids")),
      "doc_id", seed = 7L, nShards = 8)
    graft.operators.Packing.packTokenStreams(eps, "shard", "pos",
      "token_ids", budget = 700L, sepId = vocab.length.toLong,
      docIdCol = Some("doc_id"))
      .repartitionByRange(16, col("pack_id"))
      .write.parquet(packsDir)
    val padId = vocab.length.toLong + 1L

    // standing CDC chunk claims over the corpus (the partial-overlap
    // dedup tier's store — its deletion leg measured like the rest)
    val cdcDir = s"$base/cdcclaims"
    val cdc = new graft.streaming.IncrementalCdcDedup(spark, cdcDir,
      window = 8, maskBits = 4)
    cdc.init()
    graft.Bench.runFully(
      cdc.filterAndClaim(docs.select("doc_id", "text"), "doc_id", "text"))

    // standing fertility telemetry under the same frozen BPE tokenizer
    val fertDir = s"$base/fertility"
    val fert = new graft.streaming.StreamFertility(spark, fertDir)
    fert.init()
    val fertCounts = graft.operators.Bpe
      .pieceCounts(docs, "doc_id", "text", merges)
      .localCheckpoint(true)
    fert.observe(docs, "doc_id", "text", "lang", fertCounts, batchId = 0L)

    // standing BM25 + IVF indexes and the cumulative card
    val bm25Dir = s"$base/bm25"
    graft.operators.Retrieval.bm25WriteIndex(docs, "doc_id", "text",
      bm25Dir, buckets = 8)
    val ivfDir = s"$base/ivf"
    graft.operators.VectorIndex.writeIndex(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding", ivfDir, centroidEvery = 50)
    val card = new StreamDataCard(spark, s"$base/card")
    card.init()
    card.observe(docs, 0L)

    // the scattered ~1% takedown (also hits vec_ids < 500 in the IVF)
    val deadDf = docs.filter(col("doc_id") % 101 === 3)
      .select("doc_id").localCheckpoint(true)
    val dead = deadDf.collect().map(_.getLong(0)).toSeq
    val ledgerDir = s"$base/ledger"
    val t0 = System.nanoTime()
    val receipts = Forget.cascade(spark, dead,
      ledger = Some(Forget.LedgerTarget(ledgerDir, 1L)),
      textClaimsDir = Some(claimsDir),
      cdcClaimsDir = Some(cdcDir),
      bm25IndexDir = Some(bm25Dir),
      vectorIndexDir = Some(ivfDir),
      card = Some(Forget.CardTarget(card,
        docs.filter(col("doc_id") % 101 === 3), "doc_id", eventId = 1L)),
      fertility = Some(Forget.FertilityTarget(fert,
        docs.filter(col("doc_id") % 101 === 3), "doc_id", "text", "lang",
        fertCounts.filter(col("doc_id") % 101 === 3), eventId = 1L)),
      corpus = Some(Forget.CorpusTarget(corpusDir, "doc_id")),
      packs = Some(Forget.PackTarget(packsDir, padId)))
    val cascadeSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val audit = Forget.verify(spark, dead,
      textClaimsDir = Some(claimsDir),
      cdcClaimsDir = Some(cdcDir),
      bm25IndexDir = Some(bm25Dir),
      vectorIndexDir = Some(ivfDir),
      corpus = Some(Forget.CorpusTarget(corpusDir, "doc_id")),
      packs = Some(Forget.PackTarget(packsDir, padId)))
    val verifySec = (System.nanoTime() - t1) / 1e9
    val allZero = audit.forall(_.removed == 0L)
    // scattered locality: replacements carry the deterministic name
    val scatteredTouched = {
      val s = Files.walk(java.nio.file.Paths.get(corpusDir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(
          _.getFileName.toString.endsWith(".forget.parquet")).toLong
      } finally s.close()
    }

    // locality: a CLUSTERED takedown of the same size touches ~1 of the
    // 16 id-range files; the scattered list above touched most
    val lo = nDocs / 2
    val clustered = (lo until math.min(lo + dead.size, nDocs)).toSeq
    val rClustered = graft.store.CorpusForget.forget(spark, corpusDir,
      "doc_id", clustered)
    val rec = receipts.map(r => s""""${r.component}":${r.removed}""")
      .mkString(",")

    // the audit trail + maintenance loop, composed end to end (round
    // 17): both takedowns recorded in the persisted ledger (replay
    // token = event id), then the surgery-worn corpus draws its
    // maintenance verdict and the compaction receipt — measured as its
    // own tail (maint_sec) so cascade_sec/verify_sec stay cross-round
    // comparable.
    val t2 = System.nanoTime()
    ForgetLedger.record(spark, ledgerDir, 2L, clustered.size.toLong,
      Seq(Forget.Receipt("corpus", rClustered.rowsRemoved)))
    val ledgerEvents = ForgetLedger.read(spark, ledgerDir)
      .select("event_id").distinct().count()
    val verdicts = graft.store.Maintenance.plan(
      Seq("corpus" -> corpusDir), maxChain = 1)
    val maint = graft.store.Maintenance.execute(spark, verdicts)
    val mAction = maint.head.action
    val mr = maint.head.receipt
    val maintSec = (System.nanoTime() - t2) / 1e9

    spark.catalog.clearCache()
    f"""{"docs":$nDocs,"files":16,"deleted":${dead.size},""" +
      f""""cascade_sec":$cascadeSec%.3f,"verify_sec":$verifySec%.3f,""" +
      f""""audit_zero":$allZero,"receipts":{$rec},""" +
      f""""touched_scattered":$scatteredTouched,""" +
      f""""clustered_deleted":${clustered.size},""" +
      f""""touched_clustered":${rClustered.filesTouched},""" +
      f""""ledger_events":$ledgerEvents,"maint_action":"$mAction",""" +
      f""""maint_sec":$maintSec%.3f,""" +
      f""""compact_files_before":${mr.map(_.filesBefore).getOrElse(-1L)},""" +
      f""""compact_files_after":${mr.map(_.filesAfter).getOrElse(-1L)},""" +
      f""""compact_chained":${mr.map(_.chainedBefore).getOrElse(-1L)}}"""
  }
}
