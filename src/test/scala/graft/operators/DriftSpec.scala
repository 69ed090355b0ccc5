package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Vocabulary-drift semantics: hand-computed ppm values, union
  * vocabulary, identical corpora at zero, TV bounds and direction. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("hand-computed drift: shared, a-only, and b-only terms") {
    // A: 4 tokens — x x y z ; B: 4 tokens — x w w w
    val out = Drift.vocabDrift(df("x x y z"), df("x w w w"), "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("x") == ((500000L, 250000L, 250000L)))
    assert(out("y") == ((250000L, 0L, 250000L)))
    assert(out("z") == ((250000L, 0L, 250000L)))
    assert(out("w") == ((0L, 750000L, 750000L)))
    assert(out.size == 4, "union vocabulary")
  }

  test("identical corpora drift zero; TV is bounded and floors downward") {
    val a = df("alpha beta gamma", "delta epsilon zeta")
    assert(Drift.totalVariationPpm(a, a, "text") == 0L)
    // disjoint corpora: exact TV is 10^6; the floor-division bound stays
    // at or below it (never above — the alert never cries wolf)
    val tv = Drift.totalVariationPpm(df("p q r"), df("s t u"), "text")
    assert(tv <= 1000000L && tv >= 900000L, s"disjoint TV $tv")
  }

  test("an empty side fails loud, not with an NPE") {
    val e = intercept[IllegalArgumentException] {
      Drift.vocabDrift(df(), df("some words here"), "text").collect()
    }
    assert(e.getMessage.contains("both corpora must contain tokens"))
  }

  test("categoryDrift: source-mix shift in ppm over a categorical column") {
    val a = Seq((1L, "s0"), (2L, "s0"), (3L, "s1"), (4L, "s1"))
      .toDF("doc_id", "source")
    val b = Seq((5L, "s0"), (6L, "s1"), (7L, "s1"), (8L, "s2"))
      .toDF("doc_id", "source")
    val out = Drift.categoryDrift(a, b, "source")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // A: s0 50%, s1 50%; B: s0 25%, s1 50%, s2 25%
    assert(out == Map("s0" -> 250000L, "s1" -> 0L, "s2" -> 250000L))
  }

  test("embeddingDrift: identical slices score cos 1; an axis flip is " +
    "caught; labels missing a side drop") {
    val a = Seq(
      ("l0", Array(1.0f, 0.0f)), ("l0", Array(1.0f, 0.2f)),
      ("l1", Array(0.0f, 1.0f)),
      ("l2", Array(1.0f, 1.0f)) // only in slice A
    ).toDF("label", "vec")
    val b = Seq(
      ("l0", Array(1.0f, 0.0f)), ("l0", Array(1.0f, 0.2f)),
      ("l1", Array(0.0f, -1.0f)) // flipped
    ).toDF("label", "vec")
    val out = Drift.embeddingDrift(a, b, "label", "vec")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out("l0") == ((2L, 2L, 1.0)))
    assert(out("l1") == ((1L, 1L, -1.0)), "axis flip must score cos -1")
    assert(!out.contains("l2"), "one-sided label must drop")
  }

  test("topDrift ranks by drift then term, truncates to k") {
    val out = Drift.topDrift(df("x x y z"), df("x w w w"), "text", k = 2)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("w", "x"), s"got $out") // 750k, then x<y<z tie at 250k
  }
}
