package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.TextAnalysis

/** BM25 retrieval ([[Retrieval.bm25TopK]]): integer-exact scoring against
  * a plain-collections brute force, bounded-heap-vs-window agreement on
  * ties, and edge semantics (k past candidates, disjoint vocab). */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)

  /** Brute-force twin: the q78 scoring contract with Scala collections —
    * same tokenizer, same integer rationals, same tie-break. */
  private def brute(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
                    k: Int): Seq[(Long, Long, Long, Long)] = {
    val ct = corpus.map { case (id, t) => (id, TextAnalysis.jvmTokens(t)) }
    val n = ct.size.toLong
    val s = ct.map(_._2.length.toLong).sum
    val tf = ct.flatMap { case (id, w) =>
      w.groupBy(identity).map { case (t, xs) =>
        (id, t, xs.length.toLong, w.length.toLong)
      }
    }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    queries.flatMap { case (qid, qt) =>
      val terms = TextAnalysis.jvmTokens(qt).distinct.toSet
      val scored = tf.filter(r => terms(r._2)).groupBy(_._1).map {
        case (id, rows) =>
          val score = rows.map { case (_, t, f, dl) =>
            val idf = ((2 * n - 2 * df(t) + 1) * 1000) / (2 * df(t) + 1)
            val part = (22 * f * s * 1000) / (10 * f * s + 3 * s + 9 * dl * n)
            idf * part
          }.sum
          (id, score)
      }.toSeq
      scored.sortBy { case (id, sc) => (-sc, id) }.take(k)
        .zipWithIndex.map { case ((id, sc), i) => (qid, (i + 1).toLong, id, sc) }
    }
  }

  private def run(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
                  k: Int): Seq[(Long, Long, Long, Long)] =
    Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        queries.toDF("doc_id", "text"), "doc_id", "text", k)
      .as[(Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("matches the collections brute force on real corpus text") {
    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toSeq
    val corpus = rows.filter(_._1 % 89 != 0)
    val queries = rows.filter(_._1 % 89 == 0)
    assert(queries.nonEmpty, "fixture needs query docs")
    val got = run(corpus, queries, 3)
    val want = brute(corpus, queries, 3)
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.nonEmpty && got.exists(_._4 > 0L), "non-trivial scores")
  }

  test("exact ties rank by ascending doc_id through the bounded heap") {
    // identical docs => identical scores; the heap's tie-break must match
    // the window's (score desc, doc_id asc)
    val corpus = Seq(5L -> "a b c", 3L -> "a b c", 9L -> "a b c", 1L -> "x y")
    val got = run(corpus, Seq(100L -> "a c"), 3)
    assert(got.map(_._3) == Seq(3L, 5L, 9L), s"got $got")
    assert(got.map(_._2) == Seq(1L, 2L, 3L))
    assert(got.map(_._4).distinct.size == 1, "tied scores identical")
  }

  test("k past the candidate count returns only the candidates") {
    val corpus = Seq(1L -> "a b", 2L -> "c d")
    val got = run(corpus, Seq(10L -> "a"), 5)
    assert(got == Seq((10L, 1L, 1L, got.head._4)))
  }

  test("a query sharing no vocabulary produces no rows") {
    val corpus = Seq(1L -> "a b", 2L -> "c d")
    assert(run(corpus, Seq(10L -> "zz qq"), 3).isEmpty)
  }

  test("query text never repartitions the corpus by term (broadcast joins)") {
    val plan = Retrieval.bm25TopK(
      docs.filter(col("doc_id") % 89 =!= 0),
      docs.filter(col("doc_id") % 89 === 0), "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    // both query-side joins broadcast; the only exchanges are the corpus
    // tf/df/score aggregations and the final top-k grouping
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"), s"unexpected sort-merge join:\n$plan")
  }

  test("rrfFuse: hand-computed fusion — both-list docs dominate, " +
    "single-list docs score one term, integer milli arithmetic exact") {
    import spark.implicits._
    // query 7: doc 1 ranks 1 lexically and 2 semantically; doc 2 only
    // lexical rank 2; doc 3 only semantic rank 1
    val lex = Seq((7L, 1L, 1L), (7L, 2L, 2L)).toDF("q", "id", "rank")
    val sem = Seq((7L, 3L, 1L), (7L, 1L, 2L)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(lex, sem, "q", "id", rrfK = 60, k = 3)
      .collect().map(r => (r.getLong(3), r.getLong(1), r.getLong(2))).sorted.toSeq
    // 60000 div 61 = 983, div 62 = 967
    // doc 1: 983 + 967 = 1950; doc 3: 0 + 983 = 983; doc 2: 967 + 0 = 967
    assert(out == Seq((1L, 1L, 1950L), (2L, 3L, 983L), (3L, 2L, 967L)),
      s"got $out")
  }

  test("rrfFuse: ties break by ascending id; k truncates per query") {
    import spark.implicits._
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("q", "id", "rank")
    val sem = Seq((1L, 11L, 1L), (1L, 10L, 2L)).toDF("q", "id", "rank")
    // both docs score 983 + 967 = 1950: tie -> id 10 first
    val out = Retrieval.rrfFuse(lex, sem, "q", "id", rrfK = 60, k = 1)
      .collect().map(r => (r.getLong(3), r.getLong(1))).toSeq
    assert(out == Seq((1L, 10L)))
  }
}
