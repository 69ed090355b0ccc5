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
    for (r <- Seq(1, 8); hotMin <- Seq(1L, 8L, 1000L);
         bloom <- Seq(false, true)) {
      val salted = asMap(Decontaminate.flaggedSalted(train, dupEval,
        "doc_id", "text", minShared = 1, saltR = r, hotMin = hotMin,
        bloomGate = bloom))
      assert(salted == bc, s"r=$r hotMin=$hotMin bloom=$bloom")
    }
    // n_eval_hits counts every duplicated eval doc separately
    assert(bc(1L)._1 == 40L)
  }

  test("bloom-gated path matches the broadcast plan at any fpp") {
    // the gate only changes what reaches the exchange; the exact join must
    // scrub every false positive, so even an absurd fpp (sketch admits
    // almost everything) and a tight one produce identical flags. NOTE:
    // flagged() joins raw gram strings while flaggedBloom joins PolyHash
    // longs — identical output here pins that the hash-key trade doesn't
    // alter pairing on real text (collisions are the documented 2^-61
    // residual risk)
    val bc = asMap(Decontaminate.flagged(train, eval, "doc_id", "text",
      minShared = 1))
    for (fpp <- Seq(0.5, 0.01, 0.0001)) {
      val bl = asMap(Decontaminate.flaggedBloom(train, eval, "doc_id", "text",
        minShared = 1, fpp = fpp))
      assert(bl == bc, s"fpp=$fpp")
    }
  }

  test("bloom gate runs map-side: no exchange anywhere below the gate filter") {
    val df = Decontaminate.flaggedBloom(train, eval, "doc_id", "text",
      minShared = 1)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("might_contain"), plan)
    // formatted explain = tree section + per-operator details; operator ids
    // link them. Find the Filter detail carrying the gate, locate its tree
    // line, and assert its SUBTREE (following lines with deeper indent —
    // everything executed before the gate) contains no Exchange: the gate
    // must see raw scan output, never shuffled rows.
    val gateId = plan.linesIterator
      .find(l => l.trim.matches("""\(\d+\) (\*\s*)?Filter.*""") &&
        // detail header line; the condition follows on subsequent lines, so
        // scan the whole detail block below the header
        plan.substring(plan.indexOf(l)).split("""\n\(\d+\)""").head
          .contains("might_contain"))
      .map(_.trim.replaceAll("""^\((\d+)\).*""", "$1"))
    assert(gateId.nonEmpty, s"no Filter detail carries the gate:\n$plan")
    val tree = plan.split("\n\n").head.linesIterator.toSeq
    val treeIdx = tree.indexWhere(_.matches(s""".*Filter \\(${gateId.get}\\)\\s*"""))
    assert(treeIdx >= 0, s"gate Filter (${gateId.get}) not in tree:\n$plan")
    def indentOf(l: String) = l.indexWhere(c => c.isLetter || c == '*')
    val gateIndent = indentOf(tree(treeIdx))
    val subtree = tree.drop(treeIdx + 1).takeWhile(indentOf(_) > gateIndent)
    assert(subtree.nonEmpty && !subtree.exists(_.contains("Exchange")),
      s"exchange below the bloom gate:\n${subtree.mkString("\n")}\n\n$plan")
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
