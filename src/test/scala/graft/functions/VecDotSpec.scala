package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Similarity

class VecDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bitwise-equal to the interpreted fold on real embeddings") {
    Tables.registerViews(spark, "/root/testdata/sf0.001") // registers fns
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("vecd", Similarity.vecD(col("embedding")))
    val diff = e.select(
      VecDot(col("vecd"), col("vecd")).as("a"),
      Similarity.dotDPortable(col("vecd"), col("vecd")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("known value and SQL callability") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))").head
    assert(r.getDouble(0) == 32.0)
  }

  test("unequal lengths and null elements yield NULL, like the HOF form") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val rows = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(4.0d, 5.0d, 6.0d)) AS short_long,
        |       vec_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(4.0d, 5.0d)) AS with_null,
        |       vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(4.0d)) AS null_side
        |""".stripMargin).head
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
  }
}
