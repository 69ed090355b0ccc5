package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout scale story: date-partitioned writes + partition pruning
  * (the engine's substitute for the reference's (type, time) composite
  * index — SURVEY.md §1.2 physical design). */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitioned write prunes non-matching partitions at scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val read = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val plan = read.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert(plan.matches("(?s).*PartitionFilters: \\[.*day.*\\].*"),
      s"day not in partition filters:\n$plan")
    val n = read.count()
    assert(n > 0)
    // pruned scan reads exactly the one day
    val all = spark.read.parquet(dir)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(n == all)
  }
}
