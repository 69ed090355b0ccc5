package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests for [[Dedup.scrubDupSpans]] over ScalaCheck-generated
  * corpora (fixed seeds, the MergePropertySpec discipline): the rewrite
  * must be a pure chunk deletion — surviving words are a subsequence of
  * the original, removed mass is exactly `n_removed · span` words, and
  * a document with no cross-document chunk passes through verbatim. */
class ScrubPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // small vocabulary forces genuine cross-document chunk collisions
  private val vocab = Vector("a", "b", "c", "d")
  private val genDoc: Gen[String] = for {
    n <- Gen.choose(1, 20)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")
  private val genCorpus: Gen[List[String]] = Gen.listOfN(12, genDoc)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def isSubsequence(sub: Seq[String], sup: Seq[String]): Boolean = {
    var i = 0
    sup.foreach { w => if (i < sub.length && sub(i) == w) i += 1 }
    i == sub.length
  }

  test("scrub is pure chunk deletion: subsequence, exact removed mass, " +
    "untouched docs verbatim (24 seeded corpora, span 2 and 3)") {
    for (seed <- 1L to 24L; span <- Seq(2, 3)) {
      val texts = sample(genCorpus, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.scrubDupSpans(docs, "doc_id", "text", span = span)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      assert(out.size == texts.length, s"seed=$seed span=$span lost rows")
      texts.zipWithIndex.foreach { case (t, i) =>
        val (clean, nRem) = out(i.toLong)
        val ow = t.trim.split("\\s+").toSeq
        val cw = if (clean.isEmpty) Seq.empty[String]
          else clean.split(" ").toSeq
        assert(isSubsequence(cw, ow),
          s"seed=$seed span=$span doc=$i: '$clean' not a subsequence of '$t'")
        assert(ow.length - cw.length == nRem * span,
          s"seed=$seed span=$span doc=$i: removed ${ow.length - cw.length} " +
            s"words but n_removed=$nRem (span $span)")
        if (nRem == 0)
          assert(cw == ow, s"seed=$seed span=$span doc=$i rewritten without removals")
      }
    }
  }
}
