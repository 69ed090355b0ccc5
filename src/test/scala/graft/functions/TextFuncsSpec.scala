package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** F1-F9 scalar functions + the shared deterministic hash. */
class TextFuncsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("t").select(c.cast("string")).head.getString(0)

  test("fixPtags wraps and closes paragraphs like the reference") {
    assert(one(TextFuncs.fixPtags(col("t")), "a<p>b<p>c") == "<p>a</p><p>b</p><p>c</p>")
    assert(one(TextFuncs.fixPtags(col("t")), "plain") == "<p>plain</p>")
  }

  test("fixPtags leaves user-typed escaped <p> alone (F9 invariant)") {
    assert(one(TextFuncs.fixPtags(col("t")), "say &lt;p&gt; here") ==
      "<p>say &lt;p&gt; here</p>")
  }

  test("hnTimestamp matches strftime('%Y %b %d %H:%M:%S') in UTC") {
    val got = Seq(1704439689L).toDF("s")
      .select(TextFuncs.hnTimestamp(timestamp_seconds(col("s")))).head.getString(0)
    assert(got == "2024 Jan 05 07:28:09")
  }

  test("deletedDefault, itemUrl, scoreLabel") {
    assert(one(TextFuncs.deletedDefault(lit(null).cast("string")), "x") == "[deleted]")
    assert(one(TextFuncs.itemUrl(lit(42L)), "x") ==
      "https://news.ycombinator.com/item?id=42")
    assert(one(TextFuncs.scoreLabel(lit(7L)), "x") == "7 points")
  }

  test("strHash matches the cross-engine polynomial (validated vs DuckDB)") {
    val got = Seq("hash", "the", "a", "merge table").toDF("t")
      .select(TextAnalysis.strHash(col("t"))).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3195150L, 114801L, 97L, 922445077L))
  }
}
