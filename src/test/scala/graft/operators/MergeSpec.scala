package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S7 upsert semantics (reference insert_item, hnarchive.py:203-253). */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stored: DataFrame = Seq(
    (1L, Option("alice"), Option(10L)),
    (2L, Option("bob"), Option(20L))
  ).toDF("id", "author", "score")

  private def merge(st: DataFrame, in: DataFrame): Map[Long, (Option[String], Option[Long])] =
    Merge.upsert(st, in, "id", coalesceCols = Seq("author"), overwriteCols = Seq("score"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap

  test("incoming NULL keeps stored value for coalesce columns") {
    val incoming = Seq((1L, Option.empty[String], Option(11L))).toDF("id", "author", "score")
    val out = merge(stored, incoming)
    assert(out(1L) == ((Some("alice"), Some(11L)))) // author kept, score overwritten
    assert(out(2L) == ((Some("bob"), Some(20L))))   // untouched row intact
  }

  test("overwrite columns take incoming value even when NULL") {
    val incoming = Seq((2L, Option("robert"), Option.empty[Long])).toDF("id", "author", "score")
    val out = merge(stored, incoming)
    assert(out(2L) == ((Some("robert"), None))) // score overwritten to null
  }

  test("new ids insert; absent ids survive") {
    val incoming = Seq((3L, Option("carol"), Option(30L))).toDF("id", "author", "score")
    val out = merge(stored, incoming)
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(3L) == ((Some("carol"), Some(30L))))
  }

  test("merge is idempotent: merging the same batch twice equals once") {
    val incoming = Seq(
      (1L, Option.empty[String], Option(99L)),
      (4L, Option("dave"), Option(40L))).toDF("id", "author", "score")
    val once = merge(stored, incoming)
    val st2 = Merge.upsert(stored, incoming, "id", Seq("author"), Seq("score"))
    val twice = merge(st2, incoming)
    assert(once == twice)
  }

  test("duplicate keys in one batch collapse to last-write-wins, no fan-out") {
    val incoming = Seq(
      (1L, Option("al"), Option(11L)),
      (1L, Option("albert"), Option(12L)), // wins: higher precedence (score)
      (6L, Option("fred"), Option(60L)),
      (6L, Option("fred"), Option(61L))
    ).toDF("id", "author", "score")
    val merged = Merge.upsert(stored, incoming, "id", Seq("author"), Seq("score"),
      precedenceCols = Seq("score"))
    assert(merged.count() == 3) // 1, 2, 6 — no duplicated rows in the store
    val out = merged.collect().map(r => r.getLong(0) ->
      ((Option(r.getString(1)), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(out(1L) == ((Some("albert"), Some(12L))))
    assert(out(6L) == ((Some("fred"), Some(61L))))
  }

  test("batching invariance: folding two half-batches equals one batch") {
    val b1 = Seq((1L, Option.empty[String], Option(11L))).toDF("id", "author", "score")
    val b2 = Seq((5L, Option("eve"), Option(50L))).toDF("id", "author", "score")
    val folded = merge(Merge.upsert(stored, b1, "id", Seq("author"), Seq("score")), b2)
    val oneShot = merge(stored, b1.unionAll(b2))
    assert(folded == oneShot)
  }
}
