package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Hashed linear classifier ([[Classify]]): evidence-weight bounds,
  * actual class separation on the labeled fixture, the in-scan
  * zero-exchange scoring plan, the multiplication-not-division gate,
  * and feature-free-doc conventions. */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.01")

  private def enWeights(ngram: Int = 1): IndexedSeq[Long] =
    Classify.evidenceWeights(
      docs.filter(col("lang") === "en"), "text",
      docs.filter(col("lang") =!= "en"), "text",
      buckets = 1024, ngram = ngram)

  test("evidence weights: table length = buckets, ppm-bounded, and both " +
    "signs present (the classes actually differ)") {
    val w = enWeights()
    assert(w.length == 1024)
    assert(w.forall(x => x >= -1000000L && x <= 1000000L))
    assert(w.exists(_ > 0) && w.exists(_ < 0),
      "a one-sided table means the slices were not separated at all")
  }

  test("mechanism control: disjoint vocabularies separate perfectly") {
    // planted two-vocabulary corpus — evidence weights must fit it
    // exactly, or the hash/lookup/sum plumbing is miswired
    val d = ((1L to 20L).map(i => (i, s"alpha beta gamma delta w$i", "en"))
      ++ (21L to 40L).map(i => (i, s"uno dos tres cuatro w$i", "es")))
      .toDF("doc_id", "text", "lang")
    val w = Classify.evidenceWeights(
      d.filter(col("lang") === "en"), "text",
      d.filter(col("lang") =!= "en"), "text", buckets = 1024)
    val scored = Classify.linearScore(d, "doc_id", "text", w)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("pred"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .collect()
    val acc = scored.count(r => r.getLong(0) == r.getLong(1)).toDouble /
      scored.length
    assert(acc == 1.0, s"disjoint vocabularies must fit exactly: $acc")
  }

  test("labeled fixture: evidence beats the majority-class baseline — " +
    "the honest reading of a corpus whose langs SHARE a vocabulary") {
    // the synthetic documents draw every lang from one word pool (only
    // frequency drift separates them), so a linear bag-of-words model
    // has a low fit ceiling HERE by construction; the pin is against
    // the majority baseline, not an absolute that would only measure
    // the fixture. Deterministic corpus + hash -> exact repeatability.
    val w = enWeights()
    val scored = Classify.linearScore(docs, "doc_id", "text", w)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .filter(col("n_feat") > 0) // feature-free docs are gate business
      .select(col("pred"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .collect()
    val acc = scored.count(r => r.getLong(0) == r.getLong(1)).toDouble /
      scored.length
    val p = scored.count(_.getLong(1) == 1L).toDouble / scored.length
    val base = math.max(p, 1 - p)
    assert(acc > base + 0.04,
      s"accuracy $acc does not beat the majority baseline $base")
    assert(acc >= 0.6, s"accuracy $acc below the measured 0.626 floor")
  }

  test("scoring is in-scan: zero exchanges, weight table rides as a " +
    "literal (no join)") {
    val w = enWeights()
    val plan = Classify.linearScore(docs, "doc_id", "text", w)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(graft.PlanChecks.shuffleExchanges(plan) == 0, plan)
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
  }

  private def accOf(w: IndexedSeq[Long], ngram: Int): Double = {
    val scored = Classify.linearScore(docs, "doc_id", "text", w, ngram)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .filter(col("n_feat") > 0)
      .select(col("pred"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .collect()
    scored.count(r => r.getLong(0) == r.getLong(1)).toDouble / scored.length
  }

  test("perceptron trainer: deterministic, perfect on disjoint " +
    "vocabularies, and in the bigram space the mistake-driven fit " +
    "clearly beats count-derived evidence (measured 0.95 vs 0.81)") {
    // mechanism control — disjoint vocabularies must fit exactly
    val d = ((1L to 20L).map(i => (i, s"alpha beta gamma delta w$i", "en"))
      ++ (21L to 40L).map(i => (i, s"uno dos tres cuatro w$i", "es")))
      .toDF("doc_id", "text", "lang")
    val wd = Classify.perceptronWeights(d, "doc_id", "text",
      col("lang") === "en")
    val scored = Classify.linearScore(d, "doc_id", "text", wd)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("pred"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .collect()
    assert(scored.forall(r => r.getLong(0) == r.getLong(1)),
      "disjoint vocabularies must fit exactly")
    // determinism: bounded ascending-id sample + fixed loop
    val w2a = Classify.perceptronWeights(docs, "doc_id", "text",
      col("lang") === "en", ngram = 2)
    val w2b = Classify.perceptronWeights(docs, "doc_id", "text",
      col("lang") === "en", ngram = 2)
    assert(w2a == w2b, "perceptron training diverged across runs")
    // the discriminative win lives in the bigram space: the unigram
    // bag is SHARED across the fixture's langs (both trainers sit at
    // that space's ~0.62 ceiling), but word-order features separate,
    // and mistake-driven fitting exploits them far past counting
    val evid2 = Classify.evidenceWeights(
      docs.filter(col("lang") === "en"), "text",
      docs.filter(col("lang") =!= "en"), "text", buckets = 1024,
      ngram = 2)
    val accP = accOf(w2a, 2)
    val accE = accOf(evid2, 2)
    assert(accP >= accE + 0.1,
      s"perceptron bigram fit $accP should clearly beat evidence $accE")
    assert(accP >= 0.9, s"bigram perceptron fit $accP below measured 0.95")
  }

  test("sourceReport: per-source totals reconcile exactly with the " +
    "per-doc scores, and the rollup never joins") {
    val w = enWeights()
    val rep = Classify.sourceReport(docs, "doc_id", "text", "source", w)
    val rows = rep.collect()
    assert(rows.map(_.getLong(1)).sum == docs.count())
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1),
        s"counts must nest: $r")
    }
    // exact reconciliation against the scored-per-doc view
    val perDoc = Classify.linearScore(docs, "doc_id", "text", w)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source")
      .agg(sum(col("score_ppm")).as("s"), sum(col("n_feat")).as("f"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    rows.foreach { r =>
      assert((r.getLong(4), r.getLong(5)) == perDoc(r.getString(0)),
        s"rollup totals diverged for ${r.getString(0)}")
    }
    val plan = rep.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), s"sourceReport must not join:\n$plan")
  }

  test("thresholdSweep: monotone non-increasing survivors, constant " +
    "scoreable base, exact agreement with the gate at each rung, and " +
    "no per-threshold rescan (single-aggregate plan, no explode)") {
    val w = enWeights()
    val ts = (-5L to 5L).map(_ * 100)
    val sweep = Classify.thresholdSweep(docs, "doc_id", "text", w, ts)
      .orderBy("thr_ppm").collect()
    assert(sweep.map(_.getLong(0)).toSeq == ts)
    assert(sweep.map(_.getLong(1)).distinct.length == 1,
      "n_scored must be constant across thresholds")
    val kept = sweep.map(_.getLong(2))
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b },
      s"survivors must be monotone non-increasing: ${kept.toSeq}")
    // each rung IS the gate's own count (restricted to scoreable docs)
    for (t <- Seq(-200L, 0L, 300L)) {
      val gateN = Classify.qualityGate(docs, "doc_id", "text", w, t)
        .filter(org.apache.spark.sql.functions.size(
          Mixing.dsirFeatStrings(col("text"), 1)) > 0) // scoreable only
        .count()
      val row = sweep.find(_.getLong(0) == t).get
      assert(row.getLong(2) == gateN,
        s"sweep rung $t (${row.getLong(2)}) != gate count ($gateN)")
    }
  }

  test("qualityGate thresholds the per-feature mean by MULTIPLICATION " +
    "and keeps feature-free docs") {
    val d = Seq(
      (1L, "good good good"), // 3 features, all in one bucket
      (2L, "bad bad"),
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val b = 1024
    // derive each word's bucket through the operator's own hash
    val buckets = Seq("good", "bad").toDF("w")
      .select(col("w"),
        (graft.functions.TextAnalysis.strHash(col("w")) % b).cast("int")
          .as("bkt"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val w = IndexedSeq.tabulate(b) { i =>
      if (i == buckets("good")) 500L
      else if (i == buckets("bad")) -500L else 0L
    }
    val kept = Classify.qualityGate(d, "doc_id", "text", w,
      minPerFeatPpm = 100L)
      .select("doc_id").as[Long].collect().toSet
    // doc1 mean evidence 500 >= 100 keeps; doc2 mean -500 drops;
    // feature-free docs 3 and 4 pass by convention
    assert(kept == Set(1L, 3L, 4L), s"gate kept $kept")
  }

  test("bigram evidence reads word ORDER: it fits the shared-vocabulary " +
    "fixture strictly better than unigrams (measured 0.808 vs 0.626)") {
    val w2 = enWeights(ngram = 2)
    assert(w2 != enWeights(), "bigram table identical to unigram table")
    def accOf(w: IndexedSeq[Long], ngram: Int): Double = {
      val scored = Classify.linearScore(docs, "doc_id", "text", w, ngram)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .filter(col("n_feat") > 0)
        .select(col("pred"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        .collect()
      scored.count(r => r.getLong(0) == r.getLong(1)).toDouble / scored.length
    }
    val a1 = accOf(enWeights(), 1)
    val a2 = accOf(w2, 2)
    assert(a2 > a1 + 0.05,
      s"bigram fit $a2 should clearly beat unigram $a1 on this fixture")
    assert(a2 >= 0.75, s"bigram accuracy $a2 below the measured 0.808 floor")
  }
}
