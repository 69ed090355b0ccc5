package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SURVEY.md §5.3 property tests over ScalaCheck-generated batches (sampled
  * under fixed seeds — deterministic, no scalatestplus bridge needed):
  * upsert idempotency, and commit-batching invariance — folding split
  * batches equals one merge of the per-column-combined batch, the law
  * behind the reference's arbitrary `commit_period` (hnarchive.py:255-262).
  */
class MergePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Row3 = (Long, Option[String], Option[Long])
  private val genRow: Gen[Row3] = for {
    id <- Gen.choose(1L, 12L)
    author <- Gen.option(Gen.oneOf("a", "b", "c"))
    score <- Gen.option(Gen.choose(0L, 99L))
  } yield (id, author, score)
  private val genBatch: Gen[List[Row3]] =
    Gen.listOfN(8, genRow).map(_.reverse.distinctBy(_._1).reverse)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def df(rows: List[Row3]): DataFrame = rows.toDF("id", "author", "score")

  private def canon(d: DataFrame): Set[Row3] =
    d.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet

  private def m(st: DataFrame, in: DataFrame): DataFrame =
    Merge.upsert(st, in, "id", Seq("author"), Seq("score"))

  test("idempotency: merge(merge(db,b),b) == merge(db,b)") {
    (1L to 8L).foreach { seed =>
      val stored = sample(genBatch, seed)
      val batch = sample(genBatch, seed + 100)
      val once = m(df(stored), df(batch))
      val twice = m(once, df(batch))
      assert(canon(once) == canon(twice), s"seed=$seed")
    }
  }

  test("batching invariance: fold of split batches == one per-column-combined merge") {
    (1L to 8L).foreach { seed =>
      val batch = sample(genBatch, seed)
      val cut = (seed % 9).toInt.min(batch.length)
      val stored = List[Row3]((1L, Some("z"), Some(1L)), (5L, None, Some(5L)))
      val (b1, b2) = batch.splitAt(cut)
      val folded = m(m(df(stored), df(b1)), df(b2))
      // single-batch equivalent: per id, coalesce columns chain through
      // later batches (later non-null wins, else earlier), overwrite
      // columns take the later row verbatim
      val byId1 = b1.map(r => r._1 -> r).toMap
      val combined =
        b1.filterNot(r => b2.exists(_._1 == r._1)) ++ b2.map { r2 =>
          byId1.get(r2._1) match {
            case Some(r1) => (r2._1, r2._2.orElse(r1._2), r2._3)
            case None => r2
          }
        }
      val oneShot = m(df(stored), df(combined))
      assert(canon(folded) == canon(oneShot), s"seed=$seed")
    }
  }

  test("tree round-trip: expand of a random forest reproduces every node once") {
    (1L to 5L).foreach { seed =>
      // random forest over ids 1..n: parent(i) ∈ {none} ∪ {1..i-1}
      val n = 12
      val parents = (2 to n).map { i =>
        val g = Gen.option(Gen.choose(1, i - 1))
        i.toLong -> sample(g, seed * 31 + i).map(_.toLong)
      }.toMap + (1L -> Option.empty[Long])
      val edges = parents.toList.map { case (id, p) => (id, p) }
        .toDF("id", "parent")
      val roots = parents.filter(_._2.isEmpty).keys.toList.toDF("id")
      val out = TreeExpand.expand(edges, roots).collect()
      assert(out.map(_.getLong(0)).sorted.toSeq == (1L to n).toSeq, s"seed=$seed")
      // every node's depth = its ancestor chain length
      val depths = out.map(r => r.getLong(0) -> r.getInt(2)).toMap
      def chain(i: Long): Int =
        parents(i) match { case None => 0; case Some(p) => 1 + chain(p) }
      assert((1L to n).forall(i => depths(i) == chain(i)), s"seed=$seed")
    }
  }
}
