package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Line-level dedup ([[Dedup.dedupLinesKeepFirst]] / [[Dedup.scrubFreqLines]])
  * on a hand corpus whose duplicate structure is fully known: every removal
  * position, the trim-identity folding, the blank-line exemption, and the
  * byte-identity of untouched documents are asserted exactly.
  */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // global occurrences of trimmed "x": (1,0) (1,2) (2,3) (4,0) — first is
  // (1,0); of "y": (1,1) (2,0) — first is (1,1). Blank/whitespace lines at
  // (1,3) and (2,2) are exempt. Doc 3 is untouched and carries odd
  // whitespace that must survive byte-identical. Doc 4's only line is
  // " x" — a dup by TRIM identity, removed, leaving the empty string.
  private val docs = Seq(
    (1L, "x\ny\nx\n\nz"),
    (2L, "y\nq\n  \nx"),
    (3L, "unique  line\nanother one\t"),
    (4L, " x")
  ).toDF("doc_id", "text")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

  test("keep-first: global first occurrence survives, every later copy " +
    "is removed, blanks exempt, untouched docs byte-identical") {
    val out = collect(Dedup.dedupLinesKeepFirst(docs, "doc_id", "text"))
    assert(out(1L) == (("x\ny\n\nz", 1L)))        // lost x@2
    assert(out(2L) == (("q\n  ", 2L)))            // lost y@0, x@3
    assert(out(3L) == (("unique  line\nanother one\t", 0L))) // verbatim
    assert(out(4L) == (("", 1L)))                 // " x" folds onto "x"
  }

  test("keep-first with STRING-typed ids: 'global first occurrence' is " +
    "decided on the long-cast id (the family's long-castable contract, " +
    "matching IncrementalLineDedup), never lexicographically — a raw " +
    "string min(struct) would call \"10\" < \"9\"") {
    // dup line "d" lives in docs "9" and "10": numeric order keeps 9's
    // copy; lexicographic order would wrongly keep 10's
    val sdocs = Seq(("9", "d\nkeep9"), ("10", "d\nkeep10"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLinesKeepFirst(sdocs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(9L) == "d\nkeep9", s"doc 9 must keep the first copy: $out")
    assert(out(10L) == "keep10", s"doc 10 must lose the later copy: $out")
  }

  test("keep-first honors minReps: lines under the occurrence floor are " +
    "untouched even when duplicated") {
    // "y" occurs twice — under minReps=3 it survives everywhere; "x"
    // occurs 4 times and still dedups
    val out = collect(
      Dedup.dedupLinesKeepFirst(docs, "doc_id", "text", minReps = 3))
    assert(out(1L) == (("x\ny\n\nz", 1L)))
    assert(out(2L) == (("y\nq\n  ", 1L)))         // y kept, x removed
    assert(out(4L) == (("", 1L)))
  }

  test("frequency scrub removes ALL copies past the floor, first included") {
    // "x": 4 occurrences >= 3 → all die; "y": 2 < 3 → all survive
    val out = collect(
      Dedup.scrubFreqLines(docs, "doc_id", "text", minReps = 3))
    assert(out(1L) == (("y\n\nz", 2L)))           // both x copies gone
    assert(out(2L) == (("y\nq\n  ", 1L)))
    assert(out(3L) == (("unique  line\nanother one\t", 0L)))
    assert(out(4L) == (("", 1L)))
  }

  test("trailing newline yields an exempt trailing empty line that " +
    "round-trips") {
    val d = Seq((1L, "a\nb\n"), (2L, "a\nc\n")).toDF("doc_id", "text")
    val out = collect(Dedup.dedupLinesKeepFirst(d, "doc_id", "text"))
    assert(out(1L) == (("a\nb\n", 0L)))
    assert(out(2L) == (("c\n", 1L)))              // lost a@0, empties kept
  }

  test("partitioning-invariant and deterministic: a repartitioned input " +
    "produces the identical result set") {
    val base = Dedup.dedupLinesKeepFirst(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val shuffled = Dedup.dedupLinesKeepFirst(
      docs.repartition(7, col("text")), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(shuffled == base)
  }

  test("plan shape: detection is an aggregate, never a window sort, and " +
    "the line-identity aggregate sees coordinates only") {
    val plan = Dedup.dedupLinesKeepFirst(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    // no window anywhere: the skew-robust formulation is aggregate+join
    // (a window would sort a 10^9-repeat line inside one partition)
    assert(plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, "line detection regressed to a window sort")
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.groupingExpressions.exists(_.references.exists(
          _.name == "lhv")) => a
    }
    assert(aggs.nonEmpty, "expected the per-line aggregate")
    aggs.foreach { a =>
      val inputs = a.child.output.map(_.name)
      assert(!inputs.exists(n => n == "l" || n == "_t" || n == "text"),
        s"line aggregate input carries text: $inputs")
    }
  }
}
