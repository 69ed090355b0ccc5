package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.{StreamCuration, StreamDataCard}

/** The deletion event end to end ([[Forget.cascade]]): one takedown
  * call clears the funnel's claims (the recrawled copy ships again),
  * removes the document from the standing BM25 and IVF indexes (it
  * stops being retrievable), and decrements the cumulative card (the
  * release card describes the survivors) — with a per-leg receipt and
  * idempotent re-runs. */
class ForgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one cascade call clears claims, indexes and the card; receipts " +
    "per leg; a crash-retried cascade is a no-op") {
    val base = Files.createTempDirectory("graft-forget").toString
    val text = "the quick brown fox jumps over the lazy dog again today fine"
    val other = "completely different words compose this other sentence here ok"
    val corpus = Seq((1L, text, "a"), (2L, other, "a"))
      .toDF("doc_id", "text", "source")

    // text-claims funnel: docs 1 and 2 ship, an exact copy of 1 drops
    val claimsDir = s"$base/claims"
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val curate = StreamCuration.curator(spark, emptyEval, claimsDir,
      repetitionTopBigramMilli = 1000)
    assert(curate(corpus, 0L).count() == 2)
    assert(curate(Seq((11L, text, "a"))
      .toDF("doc_id", "text", "source"), 1L).count() == 0)

    // standing BM25 index over both docs: "fox" retrieves doc 1
    val bm25Dir = s"$base/bm25"
    graft.operators.Retrieval.bm25WriteIndex(corpus, "doc_id", "text",
      bm25Dir, buckets = 4)
    def bm25Hits(): Set[Long] = graft.operators.Retrieval.bm25TopKIndexed(
      spark, bm25Dir, Seq((100L, "quick fox")).toDF("doc_id", "text"),
      "doc_id", "text", k = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(bm25Hits() == Set(1L))

    // standing IVF index: doc 1's vector is the query's nearest
    val ivfDir = s"$base/ivf"
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)), (3L, Seq(0.1f, 0.9f, 0.0f)))
      .toDF("vec_id", "embedding")
    graft.operators.VectorIndex.writeIndex(vecs, "vec_id", "embedding",
      ivfDir, centroidEvery = 2)
    def ivfHits(): Set[Long] = graft.operators.VectorIndex.topKIndexed(
      spark, ivfDir, Seq(1.0, 0.0, 0.0), k = 4, nprobe = 2)
      .select("id").as[Long].collect().toSet
    assert(ivfHits().contains(1L))

    // cumulative card over the shipped corpus
    val cardRoot = s"$base/card"
    val card = new StreamDataCard(spark, cardRoot)
    card.init()
    card.observe(corpus.withColumn("lang", lit("en"))
      .select("doc_id", "text", "lang", "source"), 0L)
    assert(card.card().nDocs == 2L)

    // boilerplate chunk-count accumulators (fixed-span + CDC twins)
    val boiler = new graft.streaming.StreamBoilerplate.ChunkCounts(
      spark, s"$base/boiler", span = 8)
    boiler.observe(corpus, "doc_id", "text", batchId = 0L)
    val cdcCounts = new graft.streaming.StreamBoilerplate.CdcCounts(
      spark, s"$base/cdc")
    cdcCounts.observe(corpus, "doc_id", "text", batchId = 0L)

    // the materialized corpus itself (the caller's parquet sink)
    val corpusDir = s"$base/corpus"
    corpus.repartitionByRange(2, col("doc_id")).write.parquet(corpusDir)

    // THE TAKEDOWN of doc 1, one call — and the pre-audit shows every
    // leg still references it
    def audit() = Forget.verify(spark, Seq(1L),
      textClaimsDir = Some(claimsDir),
      bm25IndexDir = Some(bm25Dir),
      vectorIndexDir = Some(ivfDir),
      corpus = Some(Forget.CorpusTarget(corpusDir, "doc_id")))
      .map(r => r.component -> r.removed).toMap
    val before = audit()
    assert(before("text_claims") > 0L && before("bm25_index") == 1L &&
      before("vector_index") == 1L && before("corpus_rows") == 1L,
      s"$before")
    val deletedRows = corpus.filter(col("doc_id") === 1L)
      .withColumn("lang", lit("en"))
      .select("doc_id", "text", "lang", "source")
    def run() = Forget.cascade(spark, Seq(1L),
      textClaimsDir = Some(claimsDir),
      bm25IndexDir = Some(bm25Dir),
      vectorIndexDir = Some(ivfDir),
      card = Some(Forget.CardTarget(card, deletedRows, "doc_id",
        eventId = 7L)),
      boiler = Some(Forget.BoilerTarget(boiler,
        corpus.filter(col("doc_id") === 1L), "doc_id", "text",
        eventId = 7L)),
      cdcBoiler = Some(Forget.CdcBoilerTarget(cdcCounts,
        corpus.filter(col("doc_id") === 1L), "doc_id", "text",
        eventId = 7L)),
      corpus = Some(Forget.CorpusTarget(corpusDir, "doc_id")))
    val receipts = run().map(r => r.component -> r.removed).toMap
    assert(receipts("boiler_counts") == 1L, s"$receipts")
    assert(receipts("cdc_counts") == 1L, s"$receipts")
    assert(receipts("corpus_rows") == 1L, s"$receipts")
    assert(receipts("corpus_files") == 1L, s"$receipts")
    // the materialized corpus itself holds only the survivor
    assert(spark.read.parquet(corpusDir).select("doc_id")
      .as[Long].collect().toSeq == Seq(2L))
    // the post-audit reads 0 on every leg
    assert(audit().values.forall(_ == 0L), s"${audit()}")
    assert(receipts("text_claims") > 0L, s"$receipts")
    assert(receipts("bm25_index") > 0L, s"$receipts")
    assert(receipts("vector_index") == 1L, s"$receipts")
    assert(receipts("data_card") == 1L, s"$receipts")

    // every leg forgot: recrawl ships again, indexes stop returning 1,
    // the card describes the survivor
    assert(curate(Seq((21L, text, "a"))
      .toDF("doc_id", "text", "source"), 2L).count() == 1)
    assert(bm25Hits().isEmpty) // "quick"/"fox" appear only in doc 1
    assert(!ivfHits().contains(1L) && ivfHits().contains(0L))
    val c = card.card()
    assert(c.nDocs == 1L && c.nTokens == 9L, s"$c")

    // crash-retried cascade: claims/indexes already clear, the card's
    // replay token folds nothing twice
    val again = run().map(r => r.component -> r.removed).toMap
    assert(again("text_claims") == 0L && again("bm25_index") == 0L &&
      again("vector_index") == 0L, s"$again")
    assert(card.card() == c)

    // rows outside the deletion batch fail loud before touching the card
    val e = intercept[IllegalArgumentException] {
      Forget.cascade(spark, Seq(1L),
        card = Some(Forget.CardTarget(card,
          corpus.withColumn("lang", lit("en"))
            .select("doc_id", "text", "lang", "source"), "doc_id", 8L)))
    }
    assert(e.getMessage.contains("outside the deletion batch"))
  }

  test("cdc-claims and fertility legs cascade end to end: the dead " +
    "claimant's chunk claims clear (verify reads 0) and the fertility " +
    "report describes the survivors") {
    val base = Files.createTempDirectory("graft-forget2").toString
    val para = (1 to 300)
      .map(i => s"w${i % 41}y${(i * 13) % 89}").mkString(" ")
    val other = (1 to 300).map(i => s"own$i").mkString(" ")
    val corpus = Seq((1L, para, "en"), (2L, other, "en"))
      .toDF("doc_id", "text", "lang")

    // standing CDC chunk claims: both docs ship and claim
    val cdcDir = s"$base/cdcclaims"
    val cdc = new graft.streaming.IncrementalCdcDedup(spark, cdcDir,
      window = 8, maskBits = 4)
    cdc.init()
    assert(cdc.filterAndClaim(corpus, "doc_id", "text").count() == 2)
    // ...and a shifted copy of doc 1 drops against them
    val copy = Seq((9L, "EDITED PREFIX " + para, "en"))
      .toDF("doc_id", "text", "lang")
    assert(cdc.filterAndClaim(copy, "doc_id", "text").count() == 0)

    // standing fertility telemetry under a frozen (synthetic) tokenizer
    val fertDir = s"$base/fertility"
    val fert = new graft.streaming.StreamFertility(spark, fertDir)
    fert.init()
    val counts = Seq((1L, 25L, 40L), (2L, 17L, 20L))
      .toDF("doc_id", "n_words", "n_pieces")
    fert.observe(corpus, "doc_id", "text", "lang", counts, batchId = 0L)
    assert(fert.report().select("n_docs").as[Long].head() == 2L)

    // pre-audit: the cdc leg still holds doc 1's claims
    def audit() = Forget.verify(spark, Seq(1L),
      cdcClaimsDir = Some(cdcDir))
      .map(r => r.component -> r.removed).toMap
    assert(audit()("cdc_claims") > 0L, s"${audit()}")

    def run() = Forget.cascade(spark, Seq(1L),
      cdcClaimsDir = Some(cdcDir),
      fertility = Some(Forget.FertilityTarget(fert,
        corpus.filter(col("doc_id") === 1L), "doc_id", "text", "lang",
        counts.filter(col("doc_id") === 1L), eventId = 3L)))
    val receipts = run().map(r => r.component -> r.removed).toMap
    assert(receipts("cdc_claims") > 0L, s"$receipts")
    assert(receipts("fertility_docs") == 1L, s"$receipts")

    // post-audit zero; the recrawled partial copy claims again; the
    // report is exactly the survivor's counters
    assert(audit()("cdc_claims") == 0L, s"${audit()}")
    assert(cdc.filterAndClaim(copy, "doc_id", "text").count() == 1)
    val r = fert.report()
      .select("grp", "n_docs", "n_words", "n_pieces")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("en", 1L, 17L, 20L)), s"$r")

    // retried fertility leg folds nothing twice (replay token); a
    // second cdc retraction removes nothing
    val again = run().map(r => r.component -> r.removed).toMap
    assert(again("cdc_claims") == 0L, s"$again")
    assert(fert.report()
      .select("n_docs").as[Long].head() == 1L)

    // a cascade leg pointed at a dir with no CDC store fails naming
    // the cause, not with a manifest stack trace
    val e0 = intercept[IllegalArgumentException] {
      Forget.cascade(spark, Seq(1L),
        cdcClaimsDir = Some(s"$base/never-created"))
    }
    assert(e0.getMessage.contains("no CDC claim store"))

    // fertility rows outside the deletion batch fail loud before the
    // monitor is touched (the card-leg discipline)
    val e = intercept[IllegalArgumentException] {
      Forget.cascade(spark, Seq(1L),
        fertility = Some(Forget.FertilityTarget(fert, corpus,
          "doc_id", "text", "lang", counts, eventId = 4L)))
    }
    assert(e.getMessage.contains("outside the deletion batch"))
  }

  test("a takedown pointed at a WRONG funnel root fails naming the " +
    "cause instead of auditing clean (retract 0 + held 0, the " +
    "false-clean): text and media funnels, cascade and verify") {
    val base = Files.createTempDirectory("graft-forget3").toString
    // a real text funnel exists at claims/ ... but the takedown is
    // configured with a typo'd path — every sub-store probe would
    // silently skip and the receipt AND the audit would read 0
    val claimsDir = s"$base/claims"
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val curate = StreamCuration.curator(spark, emptyEval, claimsDir,
      repetitionTopBigramMilli = 1000)
    assert(curate(Seq((1L, "some shipped text right here", "a"))
      .toDF("doc_id", "text", "source"), 0L).count() == 1)
    val typo = s"$base/clams" // the misconfiguration
    val e1 = intercept[IllegalArgumentException] {
      Forget.cascade(spark, Seq(1L), textClaimsDir = Some(typo))
    }
    assert(e1.getMessage.contains("no claim store under"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Forget.verify(spark, Seq(1L), textClaimsDir = Some(typo))
    }
    assert(e2.getMessage.contains("no claim store under"), e2.getMessage)
    // the media twin: same discipline, its own recognition list
    val e3 = intercept[IllegalArgumentException] {
      Forget.cascade(spark, Seq(1L), mediaClaimsDir = Some(typo))
    }
    assert(e3.getMessage.contains("no media claim store under"),
      e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Forget.verify(spark, Seq(1L), mediaClaimsDir = Some(typo))
    }
    assert(e4.getMessage.contains("no media claim store under"),
      e4.getMessage)
    // the REAL root still retracts/audits fine (one recognized store
    // is enough — optional stages may never have been enabled)
    assert(StreamCuration.held(spark, claimsDir, Seq(1L)) > 0L)
    assert(StreamCuration.retract(spark, claimsDir, Seq(1L)) > 0L)
    assert(StreamCuration.held(spark, claimsDir, Seq(1L)) == 0L)
  }

  test("SELF-ENFORCING coverage map: every standing store in " +
    "graft.streaming is named in Forget's deletion coverage map") {
    // the map's own stated invariant — "a new store the deployment
    // added without wiring it here" must fail THIS spec, not surface
    // at the next takedown: every top-level class/object declared
    // under graft/streaming must appear by name in Forget.scala
    // (wired leg, documented waiver, or item-domain row)
    val streamDir = java.nio.file.Paths.get(
      "src/main/scala/graft/streaming")
    val forgetSrc = new String(Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/pipeline/Forget.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val decl = ("""^(?:private\[\w+\]\s+)?(?:final\s+)?""" +
      """(?:class|object)\s+(\w+)""").r
    val listing = Files.list(streamDir)
    val names = try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".scala"))
        .flatMap { p =>
          new String(Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
            .linesIterator
            .flatMap(l => decl.findPrefixMatchOf(l).map(_.group(1)))
        }.toSet
    } finally listing.close()
    assert(names.size >= 25, s"suspiciously few stores parsed: $names")
    val missing = names.filterNot(forgetSrc.contains)
    assert(missing.isEmpty,
      s"standing stores missing from Forget's deletion coverage map: " +
        s"${missing.toSeq.sorted.mkString(", ")} — add a wired leg, a " +
        "documented waiver, or an item-domain row")
  }
}
