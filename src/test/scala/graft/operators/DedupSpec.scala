package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup family on constructed corpora with known duplicate structure. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base.replace("today", "tomorrow") // high 3-gram overlap
  private val distinct = "completely different words compose this other sentence here now ok"

  private val docs = Seq(
    (1L, base, "s0"), (2L, "The  quick brown fox jumps over the lazy dog again and again today!", "s0"),
    (3L, nearDup, "s0"), (4L, distinct, "s0"), (5L, distinct + " extra", "s1")
  ).toDF("doc_id", "text", "source")

  test("exactGroups folds case/punct/whitespace variants") {
    val out = Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L) // docs 1+2 normalize equal
    assert(out(3L) == 1L)
  }

  test("ngramJaccardPairs finds near-dups, respects blocking") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      blockCols = Seq("source"), thresholdMilli = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.contains((4L, 5L))) // near-identical but blocked apart (different source)
  }

  test("minhashPairs recovers high-jaccard pairs via LSH banding") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", thresholdMilli = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical shingle sets always share bands
  }

  test("simhashPairs finds hamming-0 rewrites, respects blocking") {
    val d = Seq(
      (1L, "alpha beta gamma alpha delta epsilon", "s0"),
      (2L, "beta alpha alpha gamma epsilon delta", "s0"), // same multiset -> hamming 0
      (3L, "zeta eta theta iota kappa lambda", "s0"),
      (4L, "alpha beta gamma alpha delta epsilon", "s1")  // dup of 1, other block
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.simhashPairs(d, "doc_id", "text",
      maxHamming = 0, blockCols = Seq("source"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 4L)) // blocked apart
  }

  test("simhash: identical token multisets equal; disjoint texts differ") {
    val d = Seq((1L, "alpha beta gamma alpha"), (2L, "beta alpha alpha gamma"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }
}
