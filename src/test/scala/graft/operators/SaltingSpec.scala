package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // 90% of rows share one hot key
    val skewed = (1L to 1000L)
      .map(i => (if (i <= 900) 1L else i, i)).toDF("key", "row_id")
    val small = Seq((1L, "hot"), (950L, "cold")).toDF("key", "label")

    val plain = skewed.join(small, "key")
      .select("row_id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Salting.saltedJoin(skewed, small, "key", col("row_id"), r = 8)
      .select("row_id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(plain.count(_._2 == "hot") == 900)
  }

  test("salt spreads a hot key across sub-partitions") {
    val skewed = (1L to 1000L).map(i => (1L, i)).toDF("key", "row_id")
    val salts = skewed.withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(salts == 8)
  }
}
