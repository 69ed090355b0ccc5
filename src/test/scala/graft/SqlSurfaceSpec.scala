package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door: registered temp views + spark.sql produce the same
  * results as the DataFrame plans (and the custom functions resolve from
  * SQL). */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("spark.sql over registered views matches the DataFrame plan") {
    Tables.registerViews(spark, dir)
    val viaSql = spark.sql(
      """SELECT o_orderstatus, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = Tables.orders(spark, dir)
      .groupBy("o_orderstatus").count()
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf)
  }

  test("custom expressions are SQL-callable") {
    Tables.registerViews(spark, dir)
    val r = spark.sql(
      """SELECT polyhash(text) AS h, size(word_shingles(text)) AS n
        |FROM documents WHERE doc_id = 0""".stripMargin).head
    assert(r.getLong(0) > 0 && r.getInt(1) > 0)
  }
}
