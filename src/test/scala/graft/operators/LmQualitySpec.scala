package graft.operators

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.{PlanChecks, Tables, TestSpark}
import graft.functions.{PolyHash, TextAnalysis}

/** LM-quality scoring ([[LmQuality]]): exact-integer bigram likelihood
  * against a brute-force JVM twin, regime parity, edge semantics, and the
  * corpus-never-shuffles plan shape. */
class LmQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)
  private def refPred = TextAnalysis.strHash(col("doc_id").cast("string")) % 10 === 0

  /** Brute-force twin: trains and scores the same model with plain Scala
    * collections — no Spark, no SQL — from the same tokenizer and hash. */
  private def bruteScores(): Map[Long, (Long, Long, Option[Long], Option[Long])] = {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), TextAnalysis.jvmTokens(r.getString(1))))
    val ref = rows.filter { case (id, _) => PolyHash.hash(id.toString) % 10 == 0 }
    val c1 = ref.flatMap(_._2).map(PolyHash.hash)
      .groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
    val c12 = ref.flatMap { case (_, w) =>
      w.sliding(2).filter(_.length == 2).map(p => PolyHash.hash(p.mkString(" ")))
    }.toSeq.groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
    val v = math.max(c1.size.toLong, 1L)
    rows.map { case (id, w) =>
      val ps = w.sliding(2).filter(_.length == 2).map { p =>
        val cb = c12.get(PolyHash.hash(p.mkString(" ")))
        val cu = c1.getOrElse(PolyHash.hash(p.head), 0L)
        ((cb.getOrElse(0L) + 1L) * 1000000L / (cu + v), cb.isEmpty)
      }.toSeq
      if (ps.isEmpty) id -> ((0L, 0L, None, None))
      else id -> ((ps.length.toLong, ps.count(_._2).toLong,
        Some(ps.map(_._1).sum / ps.length), Some(ps.map(_._1).min)))
    }.toMap
  }

  private def fromDf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    }.toMap

  test("score matches the collections brute force exactly (every doc)") {
    val got = fromDf(LmQuality.score(docs, refPred, "doc_id", "text"))
    val want = bruteScores()
    assert(got.keySet == want.keySet, "row per document")
    val diff = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(diff.isEmpty, s"first diffs: ${diff.take(3)}")
    // the corpus genuinely exercises both branches
    assert(got.values.exists(_._2 > 0), "some OOV bigrams expected")
    assert(got.values.exists(v => v._2 == 0 && v._1 > 0),
      "some fully in-vocabulary docs expected")
  }

  test("shuffle-model regime (broadcastModel = false) is output-identical") {
    val b = LmQuality.score(docs, refPred, "doc_id", "text")
    val s = LmQuality.score(docs, refPred, "doc_id", "text",
      broadcastModel = false)
    assert(fromDf(b) == fromDf(s))
  }

  test("documents with fewer than two tokens get a row with NULL scores") {
    val tiny = Seq((1L, "alpha beta alpha beta"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val out = fromDf(LmQuality.score(tiny, col("doc_id") >= 1, "doc_id", "text"))
    assert(out(2L) == ((0L, 0L, None, None)))
    // "" tokenizes to a single empty token (the Spark/DuckDB split
    // contract) — still no bigram, still a NULL-scored row
    assert(out(3L) == ((0L, 0L, None, None)))
    assert(out(1L)._1 == 3L)
  }

  test("empty reference slice: everything OOV at uniform 10^6 ppm, no error") {
    val corpus = Seq((1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val out = fromDf(LmQuality.score(corpus, lit(false), "doc_id", "text"))
    assert(out(1L) == ((2L, 2L, Some(1000000L), Some(1000000L))))
    assert(out(2L) == ((0L, 0L, None, None)))
  }

  test("an all-OOV document scores strictly below an in-vocabulary one") {
    // ref slice = doc 1 only; doc 2 repeats its bigrams, doc 3 shares none
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox"),
      (3L, "zxq wvu tsr qpo nml")).toDF("doc_id", "text")
    val out = fromDf(LmQuality.score(corpus, col("doc_id") === 1, "doc_id", "text"))
    assert(out(3L)._2 == out(3L)._1, "every doc-3 bigram is OOV")
    assert(out(2L)._3.get > out(3L)._3.get)
    assert(out(2L)._2 == 0L)
  }

  test("plan: model joins broadcast, corpus text never crosses an exchange") {
    val df = LmQuality.score(docs, refPred, "doc_id", "text").orderBy("doc_id")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), s"model lookups not broadcast:\n$p")
    val exchangeLines = p.linesIterator
      .filter(_.trim.matches("""\(\d+\) Exchange.*""")).mkString("\n")
    assert(!exchangeLines.contains("text"),
      s"corpus text crosses an exchange:\n$exchangeLines")
    // shuffles: model-count aggs (bounded by the reference slice), the
    // per-doc score agg, the all-docs left join, and the final sort — all
    // on id/hash-keyed narrow rows
    assert(PlanChecks.shuffleExchanges(p) <= 6, s"unexpected extra shuffle:\n$p")
  }
}
