package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Similarity

/** The SparkSessionExtensions tier: HOF dot products compile to VecDot. */
class VecDotRewriteSpec extends AnyFunSuite {

  test("rule rewrites the composed HOF form on a real plan") {
    val spark = TestSpark.spark
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("vecd", Similarity.vecD(col("embedding")))
      .select(col("vec_id"),
        Similarity.dotDPortable(col("vecd"), col("vecd")).as("dot"))
    val before = df.queryExecution.optimizedPlan
    val after = VecDotRewrite(before)
    assert(before.toString.contains("aggregate(zip_with"))
    assert(!after.toString.contains("aggregate(zip_with"))
    assert(after.toString.contains("vec_dot"))
    // value parity of the two forms is pinned bitwise by VecDotSpec; the
    // end-to-end execution of the rewritten form runs in the extensions test
  }

  test("rule leaves non-dot aggregates untouched") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "xs")
      .select(aggregate(col("xs"), lit(0.0), (acc, x) => acc + x).as("s"))
    val plan = df.queryExecution.optimizedPlan
    assert(VecDotRewrite(plan) == plan)
  }

  test("extensions install the rule and functions in a fresh session") {
    val prev = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // spark.sql.extensions is a STATIC conf — it only applies when the
      // SparkContext is created, and the test JVM's context already exists.
      // withExtensions drives the identical injection path in-process.
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions()(_))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // non-literal input so constant folding can't collapse the plan
      val row = s2.range(1).selectExpr(
        "vec_dot(array(CAST(id AS DOUBLE) + 1.0D, 2.0D), array(3.0D, 4.0D)) AS direct",
        "aggregate(zip_with(array(CAST(id AS DOUBLE) + 1.0D, 2.0D), array(3.0D, 4.0D), " +
          "(x, y) -> x * y), 0.0D, (acc, v) -> acc + v) AS composed",
        "polyhash(CAST(id AS STRING)) AS h",
        "wide_polyhash(CAST(id AS STRING)) AS wh")
      assert(row.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      assert(!row.queryExecution.optimizedPlan.toString.contains("aggregate(zip_with"))
      val r = row.head
      assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 11.0)
      assert(r.getLong(2) == graft.functions.PolyHash.hash("0"))
      assert(r.getLong(3) == graft.functions.PolyHash.wideHash("0"))
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
