package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] takes `(spark, sfDir)` and reads
  * through here, so the scale factor is purely an input path concern and the
  * same plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+ (bench).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.PolyHash.ensureRegistered(spark)
    graft.functions.WordShingles.ensureRegistered(spark)
    graft.functions.WordShingleSet.ensureRegistered(spark)
    graft.functions.MinHashSig.ensureRegistered(spark)
    graft.functions.HyperplaneBucket.ensureRegistered(spark)
    graft.functions.SimHashSig.ensureRegistered(spark)
    graft.functions.VecDot.ensureRegistered(spark)
    graft.functions.TokenStats.ensureRegistered(spark)
    graft.functions.StopHits.ensureRegistered(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is nanosecond parquet, which Spark 4 refuses to read as a
    * timestamp — read it as a nanos-long (legacy conf) and convert to a
    * microsecond timestamp (truncation; never output sub-second values in
    * oracle-checked queries). The file is NTZ and the session TZ is pinned
    * UTC, so the instant matches DuckDB's naive reading.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views for `spark.sql` use (events goes
    * through its nanos-normalizing loader). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
