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

  test("hot-key salted join equals the plain join, replicates only hot keys") {
    val skewed = (1L to 1000L)
      .map(i => (if (i <= 900) 1L else i, i)).toDF("key", "row_id")
    // small side: key 1 is hot (20 rows), 950 is cold (1 row)
    val small = ((1 to 20).map(j => (1L, s"hot$j")) :+ ((950L, "cold")))
      .toDF("key", "label")
    val plain = skewed.join(small, "key")
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val salted = Salting.hotSaltedJoin(skewed, small, "key", col("row_id"),
        r = 8, hotMin = 10)
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(salted == plain) // multiset equality: pairing unchanged, incl. dup labels
    // the cold key must NOT replicate: rebuild the replicated small side the
    // operator constructs and check row counts directly
    val hot = small.groupBy("key").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 10).select(col("key").as("_hk"))
    val replicated = small.join(broadcast(hot), col("key") === col("_hk"), "left")
      .withColumn("_salts", when(col("_hk").isNotNull, sequence(lit(0), lit(7)))
        .otherwise(array(lit(0))))
      .select(col("key"), explode(col("_salts")).as("_salt"))
    val byKey = replicated.groupBy("key").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey(1L) == 20L * 8 && byKey(950L) == 1L)
  }

  test("salt spreads a hot key across sub-partitions") {
    val skewed = (1L to 1000L).map(i => (1L, i)).toDF("key", "row_id")
    val salts = skewed.withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(salts == 8)
  }
}
