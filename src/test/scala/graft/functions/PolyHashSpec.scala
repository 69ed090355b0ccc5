package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The codegen'd PolyHash expression vs the built-ins-only fold and known
  * cross-engine values. */
class PolyHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches DuckDB-validated constants") {
    PolyHash.ensureRegistered(spark)
    val got = Seq("hash", "the", "a", "merge table", "")
      .toDF("t").select(PolyHash(col("t"))).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3195150L, 114801L, 97L, 922445077L, 0L))
  }

  test("agrees with the portable fold on real corpus tokens") {
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val diff = toks
      .select(PolyHash(col("w")).as("a"), TextAnalysis.strHashPortable(col("w")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("null input yields null, SQL registration works") {
    PolyHash.ensureRegistered(spark)
    val r = spark.sql("SELECT polyhash(CAST(NULL AS STRING)), polyhash('a')").head
    assert(r.isNullAt(0) && r.getLong(1) == 97L)
  }

  test("newlines are hashed (parity with the (?s) oracle regex)") {
    PolyHash.ensureRegistered(spark)
    val got = Seq("a\nb").toDF("t")
      .select(PolyHash(col("t")).as("a"),
        TextAnalysis.strHashPortable(col("t")).as("b")).head
    val expected = ((97L * 31 + 10) * 31 + 98) % TextAnalysis.P
    assert(got.getLong(0) == expected) // DuckDB-validated: 93625
    assert(got.getLong(1) == expected)
  }

  test("non-ASCII code points match the unicode() semantics") {
    PolyHash.ensureRegistered(spark)
    // '中' = U+4E2D (20013): hash = ((0*31+20013) % P)
    val got = Seq("中").toDF("t").select(PolyHash(col("t"))).head.getLong(0)
    assert(got == 20013L)
  }
}
