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

  /** Footer schemas, keyed per (dir, table): schema inference on a
    * schemaless `read.parquet` runs a footer-read JOB on every call, and
    * every query execution re-resolves its tables — so an uncached loader
    * pays 1–3 jobs per run just to rediscover schemas that never change.
    * The test tables are immutable driver artifacts; caching their
    * inferred schema per path is exactly what a production deployment
    * gets from a catalog/metastore. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

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
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
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
