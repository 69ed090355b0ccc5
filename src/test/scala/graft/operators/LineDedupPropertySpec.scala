package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests for the line-dedup tier against a straight-line
  * in-memory reference (sampled under fixed seeds, the MergePropertySpec
  * discipline): on random corpora with trim-variant duplicates, blank
  * lines, and empty documents, BOTH policies equal the reference exactly
  * — every rewritten string, every removal count. */
class LineDedupPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // small alphabet with trim variants so cross-doc collisions and
  // trim-identity folding are frequent; blanks are document structure
  private val genLine: Gen[String] = Gen.oneOf(
    "aa", "bb", "cc", " aa", "bb ", "  ", "", "dd ee", " dd ee ")
  private val genDoc: Gen[String] =
    Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, genLine))
      .map(_.mkString("\n"))
  private val genCorpus: Gen[List[(Long, String)]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, genDoc))
      .map(_.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) })

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** The reference: corpus-wide trimmed-line occurrence map, removal by
    * policy, rebuild from surviving original lines. */
  private def ref(docs: List[(Long, String)], minReps: Int,
                  keepFirst: Boolean): Map[Long, (String, Long)] = {
    val occ = for {
      (id, t) <- docs
      (l, p) <- t.split("\n", -1).zipWithIndex.toSeq
      if l.trim.nonEmpty
    } yield (l.trim, id, p)
    val removed = occ.groupBy(_._1).values.flatMap { os =>
      if (os.size >= minReps) {
        val sorted = os.sortBy(o => (o._2, o._3))
        if (keepFirst) sorted.tail else sorted
      } else Nil
    }.map(o => (o._2, o._3)).toSet
    docs.map { case (id, t) =>
      val lines = t.split("\n", -1).zipWithIndex.toSeq
      val kept = lines.filterNot { case (_, p) => removed.contains((id, p)) }
      id -> ((kept.map(_._1).mkString("\n"),
        (lines.length - kept.length).toLong))
    }.toMap
  }

  private def run(docs: List[(Long, String)], minReps: Int,
                  keepFirst: Boolean): Map[Long, (String, Long)] = {
    val df = docs.toDF("doc_id", "text")
    val out = if (keepFirst)
      Dedup.dedupLinesKeepFirst(df, "doc_id", "text", minReps)
    else Dedup.scrubFreqLines(df, "doc_id", "text", minReps)
    out.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
  }

  test("both policies equal the in-memory reference on random corpora " +
    "(trim variants, blanks, empty docs) at minReps 2 and 3") {
    for (seed <- 1L to 20L) {
      val corpus = sample(genCorpus, seed)
      for (minReps <- Seq(2, 3); kf <- Seq(true, false)) {
        val got = run(corpus, minReps, kf)
        val want = ref(corpus, minReps, kf)
        assert(got == want,
          s"seed=$seed minReps=$minReps keepFirst=$kf corpus=$corpus")
      }
    }
  }
}
