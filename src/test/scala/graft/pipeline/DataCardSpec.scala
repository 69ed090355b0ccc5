package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.{Components, Dedup}

/** The data card's every field must equal the component operator it
  * claims to summarize — computed independently here on the fixture. */
class DataCardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("card fields match their component operators on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val card = DataCard.build(docs, "doc_id", "text", "lang", "source",
      thresholdMilli = 500)
    assert(card.nDocs == docs.count())
    assert(card.nChars == docs.agg(sum(length(col("text")))).head().getLong(0))
    assert(card.langDocs == docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(card.sourceDocs.values.sum == card.nDocs)
    // near-dup numbers against the operators directly
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      thresholdMilli = 500)
    val comp = Components.of(pairs, "id_a", "id_b")
    assert(card.nearDupDocs == comp.count())
    assert(card.nearDupClusters ==
      comp.select("component").distinct().count())
    assert(card.nearDupClusters > 0, "fixture needs clusters")
    assert(card.dupChunkDocs ==
      Dedup.spanDupStats(docs, "doc_id", "text").count())
    // the synthetic corpus has no PII and no exact dups
    assert(card.piiDocs == 0L && card.piiRateMilli == 0L)
    assert(card.exactDupGroups == 0L)
    assert(card.nTokens > 0)
    // length-distribution section: the q118 derivation, re-derived here
    val q = graft.operators.Sketches.exactQuantiles(
      docs.select(graft.functions.TokenStats(col("text"))
        .getField("n_tokens").cast("long").as("v")),
      "v", Seq(10, 25, 50, 75, 90, 99))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(card.tokenQuantiles == q && q.size == 6)
    assert(q(10) <= q(50) && q(50) <= q(99), "quantiles must be monotone")
  }

  test("card diff: identity is all-zero; a composition shift shows up in " +
    "the mix TV and nowhere else") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val card = DataCard.build(docs, "doc_id", "text", "lang", "source",
      thresholdMilli = 500)
    val same = DataCard.diff(card, card)
    assert(same == DataCard.CardDiff(0L, 0L, 0L, 0L, 0L))
    // release B drops one language entirely: doc/token deltas negative,
    // lang TV positive, PII rate unchanged
    val cardB = DataCard.build(docs.filter(col("lang") =!= "zh"),
      "doc_id", "text", "lang", "source", thresholdMilli = 500)
    val d = DataCard.diff(card, cardB)
    assert(d.docsDelta < 0 && d.tokensDelta < 0)
    assert(d.langTvPpm > 0, "dropping a language must move the lang mix")
    assert(d.piiRateDeltaMilli == 0L)
  }

  test("link-hygiene fields match Urls.linkStats on a planted corpus; " +
    "URL-free corpus reads zero") {
    import spark.implicits._
    val planted = Seq(
      (1L, "plain words only here", "en", "s0"),
      (2L, "see http://a.example.com/x and http://b.org/y now", "en", "s0"),
      (3L, "one http://c.net/z link", "en", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val card = DataCard.build(planted, "doc_id", "text", "lang", "source",
      thresholdMilli = 500)
    assert(card.urlDocs == 2L, s"urlDocs ${card.urlDocs}")
    // 3 urls over (4 + 8 + 4) = 16 tokens -> 187 milli
    val stats = graft.operators.Urls.linkStats(planted, "doc_id", "text")
      .agg(org.apache.spark.sql.functions.sum("n_urls")).head().getLong(0)
    assert(card.linkDensityMilli == stats * 1000 / card.nTokens,
      s"density ${card.linkDensityMilli} inconsistent with linkStats")
    // the real (URL-free) corpus reads zero on both fields
    val real = DataCard.build(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", "lang", "source", thresholdMilli = 500)
    assert(real.urlDocs == 0L && real.linkDensityMilli == 0L)
    val m = DataCard.toDF(spark, card).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("url_docs") == card.urlDocs &&
      m("link_density_milli") == card.linkDensityMilli)
  }

  test("card over an EMPTY corpus reads all-zero, no NPE (pii sums included)") {
    val empty = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 0)
    val card = DataCard.build(empty, "doc_id", "text", "lang", "source",
      thresholdMilli = 500)
    assert(card.nDocs == 0L && card.nTokens == 0L && card.nChars == 0L)
    assert(card.piiDocs == 0L && card.piiRateMilli == 0L)
    assert(card.langDocs.isEmpty && card.sourceDocs.isEmpty)
    assert(card.exactDupGroups == 0L && card.nearDupDocs == 0L)
    assert(card.tokenQuantiles.isEmpty,
      "an empty corpus has no length distribution")
  }

  test("toDF flattens every field; value column totals are consistent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val card = DataCard.build(docs, "doc_id", "text", "lang", "source",
      thresholdMilli = 500)
    val df = DataCard.toDF(spark, card)
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("n_docs") == card.nDocs)
    assert(m.keys.count(_.startsWith("lang_docs.")) == card.langDocs.size)
    assert(m.filter(_._1.startsWith("source_docs.")).values.sum == card.nDocs)
    // quality section absent when no artifact was supplied
    assert(!m.contains("quality_pos_milli"))
    assert(!m.keys.exists(_.startsWith("source_quality_milli.")))
    // length-distribution section rides along, one row per percentile
    assert(m.keys.count(_.startsWith("token_quantiles.p")) == 6)
    assert(m("token_quantiles.p50") == card.tokenQuantiles(50))
  }

  test("quality section: rates re-derive exactly from the q108 rollup, " +
    "off by default, and the diff only engages when both cards have it") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val w = graft.operators.Classify.evidenceWeights(
      docs.filter(col("lang") === "en"), "text",
      docs.filter(col("lang") =!= "en"), "text", buckets = 1024)
    val card = DataCard.build(docs, "doc_id", "text", "lang", "source",
      thresholdMilli = 500, classifierWeights = Some(w))
    val rep = graft.operators.Classify.sourceReport(docs, "doc_id",
      "text", "source", w).collect()
    val nScored = rep.map(_.getLong(2)).sum
    val nPos = rep.map(_.getLong(3)).sum
    assert(nScored > 0)
    assert(card.qualityPosMilli == nPos * 1000 / nScored)
    assert(card.sourceQualityMilli == rep.map { r =>
      r.getString(0) ->
        (if (r.getLong(2) == 0) 0L else r.getLong(3) * 1000 / r.getLong(2))
    }.toMap)
    // off by default
    val plain = DataCard.build(docs, "doc_id", "text", "lang", "source",
      thresholdMilli = 500)
    assert(plain.qualityPosMilli == -1L &&
      plain.sourceQualityMilli.isEmpty)
    // diff: engages between two quality-bearing cards, stays 0 against
    // a card without the section (no artifact = no claim)
    val d = DataCard.diff(card, card)
    assert(d.qualityPosDeltaMilli == 0L)
    assert(DataCard.diff(plain, card).qualityPosDeltaMilli == 0L)
    // toDF carries the section
    val m = DataCard.toDF(spark, card).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("quality_pos_milli") == card.qualityPosMilli)
    assert(m.keys.count(_.startsWith("source_quality_milli.")) ==
      card.sourceQualityMilli.size)
  }

  test("media + tokenizer sections: every field pins to its component " +
    "operator (MediaCuration.Report verbatim; Bpe.encode totals), off " +
    "by default, flattened by toDF") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = DataCard.build(docs, "doc_id", "text", "lang", "source",
      thresholdMilli = 500)
    assert(base.media.isEmpty && base.tokenizer.isEmpty,
      "sections must be opt-in")
    // media: the report IS the operator's audited output — field-for-field
    def png(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32)
        img.setRGB(x, y, ((x * 8 + seed * 37) % 256) << 16)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq((1L, png(1)), (2L, png(1)), (3L, png(2)),
      (4L, Array.empty[Byte])).toDF("media_id", "media")
    val (_, report) = MediaCuration.curate(media, "media", "media_id")
    val withM = DataCard.withMedia(base, report)
    val ms = withM.media.get
    assert(ms.nInput == report.nInput && ms.nAfterSize == report.nAfterSize &&
      ms.nAfterExact == report.nAfterExact &&
      ms.nAfterImageDedup == report.nAfterImageDedup &&
      ms.nAfterVideoDedup == report.nAfterVideoDedup &&
      ms.nAfterAudioDedup == report.nAfterAudioDedup &&
      ms.nOut == report.nOut)
    assert(ms.keepRateMilli == report.nOut * 1000 / report.nInput)
    // tokenizer: artifact shape + observed encode totals, re-derived here
    val merges = graft.operators.Bpe.train(docs, "text", numMerges = 10)
    val vocab = graft.operators.Bpe.vocabOf(
      graft.operators.Bpe.alphabetOf(docs, "text"), merges)
    val card = DataCard.withTokenizer(withM, docs, "doc_id", "text",
      merges, vocab)
    val ts = card.tokenizer.get
    assert(ts.nMerges == merges.size.toLong &&
      ts.vocabSize == vocab.size.toLong)
    val direct = graft.operators.Bpe.encode(docs, "doc_id", "text",
      merges, vocab)
      .agg(sum(col("n_tokens")), sum(col("n_unk"))).head()
    assert(ts.nBpeTokens == direct.getLong(0) && ts.nBpeTokens > 0)
    assert(ts.nUnkPieces == direct.getLong(1) && ts.nUnkPieces == 0L,
      "the training corpus encodes unk-free under its own vocab")
    // toDF flattens both sections; absent on the base card
    val flat = DataCard.toDF(spark, card).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat("media.n_input") == ms.nInput &&
      flat("media.n_after_exact") == ms.nAfterExact &&
      flat("media.n_after_video_dedup") == ms.nAfterVideoDedup &&
      flat("media.n_out") == ms.nOut &&
      flat("media.keep_rate_milli") == ms.keepRateMilli)
    assert(flat("tokenizer.n_merges") == ts.nMerges &&
      flat("tokenizer.vocab_size") == ts.vocabSize &&
      flat("tokenizer.n_bpe_tokens") == ts.nBpeTokens &&
      flat("tokenizer.n_unk_pieces") == ts.nUnkPieces)
    val flatBase = DataCard.toDF(spark, base).collect().map(_.getString(0))
    assert(!flatBase.exists(k => k.startsWith("media.") ||
      k.startsWith("tokenizer.")))
    // diff: media keep-rate and unk-ppm drift engage only when BOTH
    // cards carry the section; identity is zero
    val idDiff = DataCard.diff(card, card)
    assert(idDiff.mediaKeepRateDeltaMilli == 0L && idDiff.unkRatePpmDelta == 0L)
    assert(DataCard.diff(base, card).mediaKeepRateDeltaMilli == 0L,
      "one-sided media section must not fabricate drift")
    val shifted = card.copy(
      media = card.media.map(m => m.copy(nOut = m.nOut - 1)),
      tokenizer = card.tokenizer.map(t =>
        t.copy(nUnkPieces = t.nUnkPieces + t.nBpeTokens / 100)))
    val d = DataCard.diff(card, shifted)
    assert(d.mediaKeepRateDeltaMilli ==
      shifted.media.get.keepRateMilli - card.media.get.keepRateMilli &&
      d.mediaKeepRateDeltaMilli < 0L)
    assert(d.unkRatePpmDelta ==
      (shifted.tokenizer.get.nUnkPieces * 1000000L /
        shifted.tokenizer.get.nBpeTokens) -
      (card.tokenizer.get.nUnkPieces * 1000000L /
        card.tokenizer.get.nBpeTokens) && d.unkRatePpmDelta > 0L)
  }

  test("unigram tokenizer section: totals pin to a direct encode, " +
    "learned-unit count excludes the coverage alphabet, drift diff " +
    "works unchanged") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang", "source")
    val base = DataCard.build(docs, "doc_id", "text", "lang", "source")
    val model = graft.operators.Unigram.train(docs, "text",
      graft.operators.Unigram.Knobs(maxPieceSyms = 4, minSeedCount = 2L,
        seedSize = 200, emRounds = 1, vocabTarget = 20, postEmRounds = 1))
    val card = DataCard.withUnigramTokenizer(base, docs, "doc_id",
      "text", model)
    val ts = card.tokenizer.get
    val singles = model.pieces
      .count(p => graft.operators.Unigram.symLen(p) == 1)
    assert(ts.nMerges == (model.pieces.length - singles).toLong &&
      ts.nMerges > 0L)
    assert(ts.vocabSize == model.pieces.length.toLong)
    val direct = graft.operators.Unigram
      .encode(docs, "doc_id", "text", model)
      .agg(sum(col("n_tokens")), sum(col("n_unk"))).head()
    assert(ts.nBpeTokens == direct.getLong(0) && ts.nBpeTokens > 0L)
    assert(ts.nUnkPieces == direct.getLong(1) && ts.nUnkPieces == 0L,
      "the training corpus encodes unk-free under its own vocab")
    // the drift diff is section-shape-generic
    val shifted = card.copy(tokenizer = card.tokenizer.map(t =>
      t.copy(nUnkPieces = t.nBpeTokens / 50)))
    assert(DataCard.diff(card, shifted).unkRatePpmDelta > 0L)
  }
}
