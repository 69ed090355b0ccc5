package graft.operators

import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Corpus mixing ([[Mixing]]): deterministic quota sampling and
  * static-rate mixture filtering. */
class MixingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("quotaSample caps every group at the quota, ranks densely from 1") {
    val out = Mixing.quotaSample(docs, "doc_id", "source", quota = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byGroup = out.groupBy(_._1)
    assert(byGroup.nonEmpty)
    byGroup.foreach { case (g, rows) =>
      assert(rows.length <= 5, s"group $g exceeds quota")
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq,
        s"group $g ranks not dense")
    }
    // membership is deterministic: a second run returns the same set
    val again = Mixing.quotaSample(docs, "doc_id", "source", quota = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == again.toSet)
  }

  test("quotaSample survivors are stable when new documents arrive") {
    // append-stability: growing the corpus can only displace members from
    // the quota, never admit a document that previously hashed higher than
    // a surviving member — survivors keep their relative hash order.
    val half = docs.filter(col("doc_id") % 2 === 0)
    val fullKept = Mixing.quotaSample(docs, "doc_id", "source", quota = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val halfKept = Mixing.quotaSample(half, "doc_id", "source", quota = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every full-corpus survivor present in the half corpus was also kept
    // there unless the half corpus had spare quota for lower-hash ids —
    // the contrapositive: survivors of the HALF corpus that still survive
    // the full corpus keep identical ranks is too strong; assert the
    // membership monotonicity that holds: full survivors ∩ half corpus ⊆
    // half survivors when groups are at quota in both.
    val halfIds = half.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((fullKept intersect halfIds).subsetOf(halfKept))
  }

  test("rateMix keeps the hash-selected fraction; rate 0 and 1000 are exact") {
    val all = Mixing.rateMix(docs, "doc_id", "source",
      Map("src0" -> 0), defaultMilli = 1000)
    assert(all.filter(col("source") === "src0").count() == 0)
    val n = docs.filter(col("source") =!= "src0").count()
    assert(all.count() == n, "default 1000 must keep every other source")
    // kept set is a subset of docs and deterministic
    val k1 = Mixing.rateMix(docs, "doc_id", "source", Map("src1" -> 300),
      defaultMilli = 500).select("doc_id").collect().map(_.getLong(0)).toSet
    val k2 = Mixing.rateMix(docs, "doc_id", "source", Map("src1" -> 300),
      defaultMilli = 500).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k1 == k2)
  }

  test("rateMix is append-stable: a document's decision never changes") {
    val rates = Map("src0" -> 400)
    val fullKept = Mixing.rateMix(docs, "doc_id", "source", rates, 700)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = docs.filter(col("doc_id") % 2 === 0)
    val halfKept = Mixing.rateMix(half, "doc_id", "source", rates, 700)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val halfIds = half.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(halfKept == (fullKept intersect halfIds))
  }

  test("rateMixSummary counts agree with rateMix") {
    val rates = Map("src0" -> 100, "src1" -> 900)
    val sum = Mixing.rateMixSummary(docs, "doc_id", "source", rates, 250)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val kept = Mixing.rateMix(docs, "doc_id", "source", rates, 250)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sum.foreach { case (g, (rate, total, nk)) =>
      assert(nk == kept.getOrElse(g, 0L), s"group $g summary/filter disagree")
      assert(nk <= total)
      val want = if (g == "src0") 100L else if (g == "src1") 900L else 250L
      assert(rate == want)
    }
  }

  test("rateMix plan is a pure map-side filter — zero exchanges") {
    val p = Mixing.rateMix(docs, "doc_id", "source", Map("src0" -> 300), 500)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(graft.PlanChecks.shuffleExchanges(p) == 0,
      s"rate mixing must not shuffle:\n$p")
    assert(!p.contains("Exchange"), s"no exchange of any kind expected:\n$p")
  }

  test("temperatureMix: exact integer quotas from milli-sqrt weights") {
    // sources sized 100/25/4/1: milli-sqrt weights 10000/5000/2000/1000,
    // W = 18000. budget 90 -> quotas 50/25/10/5 exactly (all divisions
    // land on integers); rates then min(1e6, quota*1e6 div n)
    val rows = Seq("a" -> 100, "b" -> 25, "c" -> 4, "d" -> 1).flatMap {
      case (s, n) => (0 until n).map(i => (s, s.hashCode.abs * 1000L + i))
    }
    val df = rows.toDF("source", "doc_id")
    val out = Mixing.temperatureMix(df, "doc_id", "source", budget = 90L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out("a")._1 == 100L && out("a")._2 == 10000L && out("a")._3 == 50L)
    assert(out("b")._3 == 25L && out("c")._3 == 10L && out("d")._3 == 5L)
    // rate_ppm: a 500000, b 1000000 (quota==n), c 1000000 capped? 10/4 ->
    // 2500000 capped to 1e6; d 5/1 -> capped 1e6
    assert(out("a")._4 == 500000L)
    assert(out("b")._4 == 1000000L && out("c")._4 == 1000000L)
    assert(out("d")._4 == 1000000L)
    // rate 1e6 keeps everything; the 500000-ppm source must keep a real
    // strict subset — the mixed hash has to actually disperse at ppm
    // resolution (the raw short-id polyhash does not; see ppmHash)
    assert(out("b")._5 == 25L && out("c")._5 == 4L && out("d")._5 == 1L)
    assert(out("a")._5 > 0L && out("a")._5 < 100L)
    // the flattening property: the big source's RATE is the smallest
    // even though its quota is the largest
    assert(out("a")._4 < out("b")._4)
  }

  test("temperatureMixDocs agrees with the summary and is deterministic") {
    val out = Mixing.temperatureMix(docs, "doc_id", "source", budget = 200L)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    val kept = Mixing.temperatureMixDocs(docs, "doc_id", "source", budget = 200L)
    val keptCounts = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptCounts == out.filter(_._2 > 0))
    val again = Mixing.temperatureMixDocs(docs, "doc_id", "source",
      budget = 200L).select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
  }

  test("temperatureMixTokens: token-sqrt weights, exact token quotas") {
    // two sources with EQUAL doc counts but 100x different doc lengths:
    // doc-count weighting would split the budget 50/50; token weighting
    // must give the long source sqrt(100) = 10x the short one's weight.
    // short: 10 docs x 4 tokens = 40 tokens -> w = floor(sqrt(40)*1000) = 6324
    // long: 10 docs x 400 tokens = 4000 tokens -> w = 63245; W = 69569
    val short = (0 until 10).map(i =>
      ("short", 1000L + i, "a b c d"))
    val long = (0 until 10).map(i =>
      ("long", 2000L + i, (0 until 400).map(k => s"t$k").mkString(" ")))
    val df = (short ++ long).toDF("source", "doc_id", "text")
    val out = Mixing.temperatureMixTokens(df, "doc_id", "source", "text",
      budget = 1000L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    val (wS, wL) = (math.sqrt(40).*(1000).floor.toLong,
      math.sqrt(4000).*(1000).floor.toLong)
    assert(out("short") == ((10L, 40L, wS, 1000L * wS / (wS + wL),
      math.min(1000000L, 1000L * wS / (wS + wL) * 1000000L / 40L),
      out("short")._6, out("short")._7)))
    assert(out("long")._3 == wL &&
      out("long")._4 == 1000L * wL / (wS + wL))
    // token weighting gives the long source ~10x the short one's quota
    // (doc-count weighting would give them equal quotas)
    assert(out("long")._4 >= 9 * out("short")._4 &&
      out("long")._4 <= 11 * out("short")._4)
    // kept_tokens is exactly the token sum of kept docs: every short doc
    // is 4 tokens, every long doc 400
    assert(out("short")._7 == out("short")._6 * 4L)
    assert(out("long")._7 == out("long")._6 * 400L)
  }

  test("temperatureMixTokensDocs agrees with the audit and is deterministic") {
    val out = Mixing.temperatureMixTokens(docs, "doc_id", "source", "text",
      budget = 50000L)
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    val kept = Mixing.temperatureMixTokensDocs(docs, "doc_id", "source",
      "text", budget = 50000L)
    val keptCounts = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptCounts == out.filter(_._2 > 0))
    val again = Mixing.temperatureMixTokensDocs(docs, "doc_id", "source",
      "text", budget = 50000L).select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
    assert(again.nonEmpty)
  }

  test("invalid rates and quotas fail loud") {
    intercept[IllegalArgumentException] {
      Mixing.rateMix(docs, "doc_id", "source", Map("src0" -> 1001))
    }
    intercept[IllegalArgumentException] {
      Mixing.quotaSample(docs, "doc_id", "source", quota = 0)
    }
  }

  test("leakageSafeSplit: no near-dup pair straddles the split; unpaired " +
    "docs are their own cluster; assignment is deterministic") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Mixing.leakageSafeSplit(corpus, "doc_id", "text",
      valMilli = 100, thresholdMilli = 500)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out.size == corpus.count())
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text",
      thresholdMilli = 500)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture needs near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(out(a)._2 == out(b)._2,
        s"near-dup pair ($a, $b) straddles the split")
      assert(out(a)._1 == out(b)._1, "pair in different clusters")
    }
    // unpaired docs: rep == own id
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    out.filterNot { case (id, _) => paired(id) }.foreach { case (id, (rep, _)) =>
      assert(rep == id, s"unpaired doc $id got rep $rep")
    }
    // both splits populated at these knobs
    assert(out.values.map(_._2).toSet == Set("train", "val"))
    // deterministic
    val again = Mixing.leakageSafeSplit(corpus, "doc_id", "text",
      valMilli = 100, thresholdMilli = 500)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(again == out)
  }

  test("dsirWeights: target-like docs score above off-target docs, the " +
    "weight direction follows the target distribution, empty docs score " +
    "1, and the plan scores in-scan") {
    // raw corpus: half "alpha"-vocabulary, half "zeta"-vocabulary;
    // target: alpha only — alpha docs must out-weigh zeta docs
    val raw = (0L until 20L).map { i =>
      if (i % 2 == 0) (i, "alpha beta gamma delta alpha beta")
      else (i, "zeta eta theta iota zeta eta")
    }.toDF("doc_id", "text")
      .union(Seq((100L, "   ")).toDF("doc_id", "text"))
    val target = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Mixing.dsirWeights(raw, "doc_id", "text", target, "text",
      buckets = 256, maxFeatures = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out.size == 21, "a row was dropped")
    assert(out(100L) == ((0L, 1.0)), "token-free doc must score weight 1")
    // NULL text folds like the empty doc, never a NULL weight
    val withNull = raw.union(Seq((101L, Option.empty[String]))
      .toDF("doc_id", "text"))
    val nw = Mixing.dsirWeights(withNull, "doc_id", "text", target, "text",
      buckets = 256).filter(col("doc_id") === 101L).collect()(0)
    assert(nw.getLong(1) == 0L && nw.getDouble(2) == 1.0,
      "null-text doc must score (0 features, weight 1)")
    val alphaW = out(0L)._2
    val zetaW = out(1L)._2
    assert(alphaW > 1.0, s"target-vocabulary doc should up-weight ($alphaW)")
    assert(zetaW < 1.0, s"off-target doc should down-weight ($zetaW)")
    assert(alphaW > zetaW * 10,
      s"separation too weak: alpha $alphaW vs zeta $zetaW")
    // deterministic
    val again = Mixing.dsirWeights(raw, "doc_id", "text", target, "text",
      buckets = 256, maxFeatures = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(again == out)
    // scoring is in-scan: zero shuffles (the two ppm aggregations are
    // separate bounded jobs; the returned plan itself only scans)
    val p = Mixing.dsirWeights(raw, "doc_id", "text", target, "text",
      buckets = 256).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(graft.PlanChecks.shuffleExchanges(p) == 0,
      s"dsir scoring should not shuffle:\n$p")
    // empty target fails loud
    intercept[IllegalArgumentException] {
      Mixing.dsirWeights(raw, "doc_id", "text",
        raw.filter(col("doc_id") < 0), "text")
    }
  }

  test("dsirWeights ngram=2: separates corpora with IDENTICAL unigram " +
    "profiles by word order, where the unigram scorer is blind") {
    // both styles use the tokens {a, b, c} with identical unigram
    // counts, but their adjacency is REVERSED, so the bigram sets are
    // disjoint ({a b, b c, c a} vs {c b, b a, a c}) — only word order
    // carries the signal
    val raw = (0L until 20L).map { i =>
      if (i % 2 == 0) (i, "a b c a b c a b c")
      else (i, "c b a c b a c b a")
    }.toDF("doc_id", "text")
    val target = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    def weights(n: Int) = Mixing.dsirWeights(raw, "doc_id", "text",
      target, "text", buckets = 256, maxFeatures = 64, ngram = n)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val uni = weights(1)
    // unigram scorer: both styles carry {x, y} — weights equal (blind)
    assert(uni(0L) == uni(1L),
      s"unigram scorer should not separate order-only styles: $uni")
    val bi = weights(2)
    assert(bi(0L) > 1.0 && bi(1L) < bi(0L),
      s"bigram scorer must separate word-order styles: $bi")
    assert(bi(0L) > bi(1L) * 10,
      s"bigram separation too weak: ${bi(0L)} vs ${bi(1L)}")
    // short docs (< ngram tokens) carry no n-gram features: weight 1
    val short = raw.union(Seq((50L, "x")).toDF("doc_id", "text"))
    val sw = Mixing.dsirWeights(short, "doc_id", "text", target, "text",
      buckets = 256, ngram = 2)
      .filter(col("doc_id") === 50L).collect()(0)
    assert(sw.getLong(1) == 0L && sw.getDouble(2) == 1.0,
      "sub-ngram doc must score (0 features, weight 1)")
  }

  test("epochShuffle: reproducible per seed, fresh permutation per seed, " +
    "shards are contiguous key-range slices of ONE global permutation, " +
    "positions dense per shard") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id")
    def run(seed: Long) = Mixing.epochShuffle(docs, "doc_id", seed, 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val e1 = run(7L)
    assert(run(7L) == e1, "same seed must reproduce the epoch order")
    val e2 = run(8L)
    assert(e1 != e2, "a new seed must produce a fresh permutation")
    assert(e1.keySet == e2.keySet, "no document may be lost or invented")
    // positions dense 1..n_i within every shard
    e1.values.groupBy(_._1).foreach { case (sh, rows) =>
      val ps = rows.map(_._2).toSeq.sorted
      assert(ps == (1L to ps.length).toSeq, s"shard $sh positions not dense")
    }
    // global-permutation property: shards are CONTIGUOUS key ranges —
    // every key in shard i sorts before every key in shard i+1
    import graft.functions.TextAnalysis.strHash
    val keys = docs
      .select(col("doc_id"),
        ((strHash(concat(lit("7"), lit(":"), col("doc_id").cast("string")))
          * lit(2654435761L)) % lit(graft.functions.TextAnalysis.P))
          .as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byShard = e1.toSeq.groupBy(_._2._1).view
      .mapValues(_.map { case (id, _) => keys(id) }).toMap
    val shards = byShard.keys.toSeq.sorted
    shards.sliding(2).foreach {
      case Seq(a, b) =>
        assert(byShard(a).max < byShard(b).min,
          s"shards $a and $b overlap in key space — not one global permutation")
      case _ =>
    }
  }

  test("curriculumOrder: tier agrees with qualityGate at every rung, " +
    "and WITHIN a tier the schedule IS epochShuffle of that tier's " +
    "subset (the composition is exact); one-shuffle plan") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val w = Classify.evidenceWeights(
      docs.filter(col("lang") === "en"), "text",
      docs.filter(col("lang") =!= "en"), "text", buckets = 256)
    val thr = Seq(-1000L, 0L, 1000L)
    val cur = Mixing.curriculumOrder(docs, "doc_id", "text", w, thr,
      seed = 5L, nShards = 8)
      .select("doc_id", "tier", "shard", "pos")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(cur.keySet == docs.select("doc_id").collect()
      .map(_.getLong(0)).toSet, "a document was lost or invented")
    // tier == rungs cleared, exactly qualityGate's verdicts
    val cleared = thr.map { t =>
      Classify.qualityGate(docs, "doc_id", "text", w, t)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    cur.foreach { case (id, (tier, _, _)) =>
      val expect = cleared.count(_.contains(id)).toLong
      assert(tier == expect, s"doc $id: tier $tier != $expect rungs cleared")
    }
    // composition exactness: per tier, (shard, pos) is epochShuffle of
    // that tier's subset — the curriculum is literally "epoch shuffle
    // within quality band"
    cur.values.map(_._1).toSet.foreach { (t: Long) =>
      val ids = cur.filter(_._2._1 == t).keySet
      val sub = Mixing.epochShuffle(
        docs.filter(col("doc_id").isin(ids.toSeq: _*)), "doc_id",
        seed = 5L, nShards = 8)
        .select("doc_id", "shard", "pos").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      ids.foreach { id =>
        assert((cur(id)._2, cur(id)._3) == sub(id),
          s"tier $t doc $id: curriculum diverged from the tier's own " +
            "epoch shuffle")
      }
    }
    // the one exchange is the (tier, shard) window — scoring and the
    // key ride the scan
    val plan = Mixing.curriculumOrder(docs, "doc_id", "text", w, thr,
      seed = 5L, nShards = 8)
      .queryExecution.explainString(org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))
    assert(graft.PlanChecks.shuffleExchanges(plan) == 1, plan)
  }

  test("mixturePlan: water-filling redistributes a saturated source's " +
    "unfilled share (where clipping would strand it), rounds and rates " +
    "are exact, and the plan-applied gate keeps saturated sources whole") {
    // A wants 80% of the budget but holds 10 tokens; B and C split the
    // redistributed mass equally. Naive clipping would take 10+10+10.
    val docs = (
      (1 to 1) .map(i => (i.toLong,       "A", Seq.fill(10)("t").mkString(" "))) ++
      (1 to 10).map(i => (100L + i, "B", Seq.fill(100)("t").mkString(" "))) ++
      (1 to 10).map(i => (200L + i, "C", Seq.fill(100)("t").mkString(" ")))
    ).toDF("doc_id", "source", "text")
    val recipe = Map("A" -> 800000L, "B" -> 100000L, "C" -> 100000L)
    val plan = Mixing.mixturePlan(docs, "doc_id", "source", "text",
      recipe, budget = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // (avail, take, rate_ppm, round): A saturates round 1 at its whole
    // stock; B and C each get (100-10)*0.1/0.2 = 45 in round 2
    assert(plan("A") == ((10L, 10L, 1000000L, 1L)), plan.toString)
    assert(plan("B") == ((1000L, 45L, 45000L, 2L)), plan.toString)
    assert(plan("C") == ((1000L, 45L, 45000L, 2L)))
    assert(plan.values.map(_._2).sum == 100L,
      "redistribution must spend the whole budget here")
    // no-saturation recipe: everything fixes in round 1 at its share
    val flat = Mixing.mixturePlan(docs, "doc_id", "source", "text",
      Map("A" -> 10000L, "B" -> 495000L, "C" -> 495000L), budget = 100L)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(5))))
      .toMap
    assert(flat.values.forall(_._2 == 1L), s"no source saturates: $flat")
    assert(flat("A")._1 == 1L && flat("B")._1 == 49L && flat("C")._1 == 49L)
    // a source the recipe never heard of fails loud
    val e = intercept[IllegalArgumentException] {
      Mixing.mixturePlan(docs, "doc_id", "source", "text",
        Map("A" -> 500000L, "B" -> 500000L), budget = 100L)
    }
    assert(e.getMessage.contains("no weight for sources"), e.getMessage)
    // the data-constrained knob: at maxEpochs = 4, A's effective stock
    // is 40 — it still saturates (desired 80 ≥ 40) but now absorbs four
    // passes (rate_ppm 4e6 = 4 micro-epochs over its 10 real tokens),
    // and B/C split the remaining 60
    val epochs = Mixing.mixturePlan(docs, "doc_id", "source", "text",
      recipe, budget = 100L, maxEpochs = 4L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(epochs("A") == ((10L, 40L, 4000000L, 1L)), epochs.toString)
    assert(epochs("B") == ((1000L, 30L, 30000L, 2L)))
    assert(epochs("C") == ((1000L, 30L, 30000L, 2L)))
    assert(epochs.values.map(_._2).sum == 100L)
    // the repetition-expanded corpus: A's doc appears EXACTLY 4 times
    // (rate 4e6 = 4 full micro-epochs, no partial), epoch_nos dense
    // 1..4; B/C docs at rate 0.03e6 appear 0 or 1 times; deterministic
    val rep = Mixing.mixtureEpochsDocs(docs, "doc_id", "source", "text",
      recipe, budget = 100L, maxEpochs = 4L)
      .select("doc_id", "epoch_no").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rep.filter(_._1 == 1L).map(_._2).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L), s"saturated doc must repeat exactly 4x: " +
      rep.filter(_._1 == 1L).toSeq)
    assert(rep.filterNot(_._1 == 1L).forall(_._2 == 1L),
      "sub-1.0-rate docs may only appear in epoch 1")
    val rep2 = Mixing.mixtureEpochsDocs(docs, "doc_id", "source", "text",
      recipe, budget = 100L, maxEpochs = 4L)
      .select("doc_id", "epoch_no").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rep.toSet == rep2.toSet, "expansion is not deterministic")
    // the applied gate: rate 1e6 keeps EVERY doc of a saturated source;
    // kept set is deterministic
    val kept = Mixing.mixturePlanDocs(docs, "doc_id", "source", "text",
      recipe, budget = 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L), "the saturated source's doc must be kept")
    val again = Mixing.mixturePlanDocs(docs, "doc_id", "source", "text",
      recipe, budget = 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept, "plan-applied gate is not deterministic")
  }

  test("dsirRateMix: the DIRECTION property — at the same rate budget, " +
    "target-like documents sample >= 10x more often than off-target; " +
    "total kept tracks the budget; zero shuffles past the weight agg") {
    // 200 docs: even ids speak the target's vocabulary, odd ids a
    // disjoint one — the weights separate hard, so the ppm gate must
    // convert nearly the whole budget into target-like rows
    val corpus = (0L until 200L).map { i =>
      val t = if (i % 2 == 0) s"alpha beta gamma delta epsilon v$i"
              else s"zulu yankee xray whiskey victor v$i"
      (i, t)
    }.toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") % 2 === 0)
    val kept = Mixing.dsirRateMix(corpus, "doc_id", "text", target, "text",
      budget = 50L, buckets = 256, maxFeatures = 16)
      .select("doc_id").collect().map(_.getLong(0))
    val keptOn = kept.count(_ % 2 == 0)
    val keptOff = kept.count(_ % 2 == 1)
    info(s"kept $keptOn target-like / $keptOff off-target of 100+100 " +
      s"at budget 50")
    assert(keptOn >= 10 * math.max(1, keptOff),
      s"direction property failed: $keptOn on-target vs $keptOff off")
    // equal-budget property: expected kept == budget (ppm-gate variance
    // allows slack; clipping is inactive at these rates)
    assert(math.abs(kept.length - 50) <= 25,
      s"kept ${kept.length} strays too far from the budget of 50")
    // determinism: the same call keeps the same ids
    val again = Mixing.dsirRateMix(corpus, "doc_id", "text", target, "text",
      budget = 50L, buckets = 256, maxFeatures = 16)
      .select("doc_id").collect().map(_.getLong(0))
    assert(again.sorted.toSeq == kept.sorted.toSeq)
  }

  test("dsirRateMix kept-rows plan is IN-SCAN: zero exchanges (the one " +
    "weight agg happens before the filter plan, not inside it)") {
    val corpus = (0L until 100L).map(i => (i, s"alpha beta v$i"))
      .toDF("doc_id", "text")
    val ratio = Mixing.dsirRatio(corpus, "text",
      corpus.filter(col("doc_id") % 2 === 0), "text", buckets = 64)
    val out = Mixing.dsirRateMixDocs(corpus, "doc_id", "text", ratio,
      budget = 20L, maxFeatures = 16)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(graft.PlanChecks.shuffleExchanges(plan) == 0,
      s"the sampling filter must ride the scan:\n$plan")
  }

  test("plan: the DSIR weight fold and the curriculum score evaluate " +
    "ONCE per row — pushed/inferred filters must not re-expand them") {
    // the keep-rate filter (dsirSampleWith) and the inferred
    // isnotnull(tier) constraints (curriculumOrder's pack consumers)
    // used to substitute the whole feature-hash + fold subtree below
    // the projection, doubling the scan stage; pin_eval makes the
    // substitution impossible, and these pins keep it so.
    // (A parquet-backed corpus, not a local Seq: the optimizer folds a
    // LocalRelation-rooted plan wholesale — correct but planless.)
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val ratio = Mixing.dsirRatio(corpus, "text",
      corpus.filter(col("doc_id") % 2 === 0), "text", buckets = 64)
    val sampled = Mixing.dsirRateMixDocs(corpus, "doc_id", "text", ratio,
      budget = 20L, maxFeatures = 16)
    val p1 = sampled.queryExecution.optimizedPlan.toString
    assert(!p1.contains("< pin_eval") && !p1.matches(
      "(?s).*Filter [^\\n]*aggregate\\(.*"),
      s"weight fold duplicated into the filter:\n${p1.take(3000)}")
    // the weight must still evaluate (pin_eval visible in the plan)
    assert(p1.contains("pin_eval"), s"pin missing:\n${p1.take(2000)}")
    // downstream-join shape: filtering on a tier-derived predicate must
    // not re-expand the score fold below the projection
    val w = Classify.evidenceWeights(
      corpus.filter(col("lang") === "en"), "text",
      corpus.filter(col("lang") =!= "en"), "text", buckets = 64)
    val cur = Mixing.curriculumOrder(corpus, "doc_id", "text", w,
      thresholds = Seq(0L), seed = 1L, nShards = 2)
      .filter(col("tier").isNotNull)
    val p2 = cur.queryExecution.optimizedPlan.toString
    assert(!p2.matches("(?s).*Filter [^\\n]*aggregate\\(.*"),
      s"score fold duplicated into a filter:\n${p2.take(3000)}")
  }

  test("dsirRateMixTokens: kept TOKEN mass tracks the token budget, and " +
    "target-like token mass dominates at the same budget") {
    // even ids speak the target vocabulary, odd ids a disjoint one;
    // token counts vary 2..8 so the doc/token unit difference is real
    val corpus = (0L until 200L).map { i =>
      val n = (i % 7 + 2).toInt
      val w = if (i % 2 == 0) "alpha" else "zulu"
      (i, (Seq.fill(n)(w) :+ s"v$i").mkString(" "))
    }.toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") % 2 === 0)
    val kept = Mixing.dsirRateMixTokens(corpus, "doc_id", "text", target,
      "text", budgetTokens = 200L, buckets = 256, maxFeatures = 16)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").length.toLong))
    val total = kept.map(_._2).sum
    val onTok = kept.filter(_._1 % 2 == 0).map(_._2).sum
    val offTok = kept.filter(_._1 % 2 == 1).map(_._2).sum
    info(s"kept token mass: $total (on-target $onTok / off-target $offTok) " +
      "at budget 200")
    // expectation equals the budget; ppm-gate + short-corpus variance
    assert(math.abs(total - 200L) <= 150L,
      s"kept token mass $total strays too far from the 200-token budget")
    assert(onTok >= 5 * math.max(1L, offTok),
      s"token mass direction failed: $onTok on vs $offTok off")
    // determinism
    val again = Mixing.dsirRateMixTokens(corpus, "doc_id", "text", target,
      "text", budgetTokens = 200L, buckets = 256, maxFeatures = 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept.map(_._1).toSet)
  }
}
