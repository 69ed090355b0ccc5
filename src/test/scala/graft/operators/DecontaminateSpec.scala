package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Benchmark-decontamination semantics on a hand-built corpus: threshold on
  * DISTINCT shared shingles, broadcast and shuffle paths identical, clean()
  * drops exactly the flagged ids. */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // eval doc shingles: {"alpha beta gamma", "beta gamma delta"}
  private lazy val eval =
    Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
  // train 1 shares both eval shingles; train 2 shares one; train 3 none
  private lazy val train = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma zzz"),
    (3L, "nothing in common here")).toDF("doc_id", "text")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("flags by distinct shared-shingle threshold") {
    val two = asMap(Decontaminate.flagged(train, eval, "doc_id", "text",
      minShared = 2))
    assert(two == Map(1L -> ((1L, 2L))))
    val one = asMap(Decontaminate.flagged(train, eval, "doc_id", "text",
      minShared = 1))
    assert(one == Map(1L -> ((1L, 2L)), 2L -> ((1L, 1L))))
  }

  test("shuffle fallback matches the broadcast plan") {
    val bc = asMap(Decontaminate.flagged(train, eval, "doc_id", "text",
      minShared = 1))
    val sh = asMap(Decontaminate.flagged(train, eval, "doc_id", "text",
      minShared = 1, broadcastEval = false))
    assert(sh == bc)
  }

  test("salted shuffle path matches the broadcast plan under duplication") {
    // an events-style eval corpus: the same text repeated many times makes
    // its grams hot; the salted path must still produce identical flags
    val dupEval = (100L to 139L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val bc = asMap(Decontaminate.flagged(train, dupEval, "doc_id", "text",
      minShared = 1))
    for (r <- Seq(1, 8); hotMin <- Seq(1L, 8L, 1000L)) {
      val salted = asMap(Decontaminate.flaggedSalted(train, dupEval,
        "doc_id", "text", minShared = 1, saltR = r, hotMin = hotMin))
      assert(salted == bc, s"r=$r hotMin=$hotMin")
    }
    // n_eval_hits counts every duplicated eval doc separately
    assert(bc(1L)._1 == 40L)
  }

  test("clean() drops exactly the flagged documents") {
    val kept = Decontaminate.clean(train, eval, "doc_id", "text",
      minShared = 2).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    // repeated shingles in one doc do not inflate the DISTINCT overlap
    val rep = Seq((9L, "alpha beta gamma alpha beta gamma")).toDF("doc_id", "text")
    val flaggedRep = asMap(Decontaminate.flagged(rep, eval, "doc_id", "text",
      minShared = 1))
    // shingle set of doc 9 = {alpha beta gamma, beta gamma alpha,
    // gamma alpha beta} → exactly ONE distinct shared shingle
    assert(flaggedRep == Map(9L -> ((1L, 1L))))
  }
}
