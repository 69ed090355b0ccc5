package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The HN `items` data model (SURVEY.md §1.1-1.2; reference DDL
  * `/root/reference/hnarchive.py:34-60`).
  *
  * One wide table, five entity subtypes via the `type` discriminator,
  * self-FKs `parent` (comment forest) and `poll` (poll → pollopts).
  * The reference's SQLite TEXT-affinity quirks (`parent`/`poll` declared
  * TEXT but holding ints) are normalized to LongType here, per SURVEY §1.2.
  */
object Item {

  /** Physical table schema (Spark types per SURVEY.md §1.2 column map). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("deleted", BooleanType),
    StructField("type", StringType),
    StructField("author", StringType),
    StructField("time", LongType),
    StructField("text", StringType),
    StructField("dead", BooleanType),
    StructField("parent", LongType),
    StructField("poll", LongType),
    StructField("url", StringType),
    StructField("score", LongType),
    StructField("title", StringType),
    StructField("descendants", LongType),
    StructField("retrieved", LongType)))

  val itemTypes: Set[String] = Set("story", "comment", "job", "poll", "pollopt")

  /** Raw HN API JSON shape (the `kids` array is parsed but, like the
    * reference, children are derived from `parent`, not `kids`). */
  val apiSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("deleted", BooleanType),
    StructField("type", StringType),
    StructField("by", StringType),
    StructField("time", LongType),
    StructField("text", StringType),
    StructField("dead", BooleanType),
    StructField("parent", LongType),
    StructField("poll", LongType),
    StructField("kids", ArrayType(LongType)),
    StructField("url", StringType),
    StructField("score", LongType),
    StructField("title", StringType),
    StructField("descendants", LongType)))

  /** JSON → relational normalization (SURVEY.md P8/P9/F8; reference
    * `insert_item` hnarchive.py:209-224): parse, rename `by`→`author`,
    * coerce flags to boolean (NULL→false like Python `bool(None)`), stamp
    * `retrieved`, and drop tombstones — a null body or a missing `time`
    * means "never existed / deleted before archive" (hnarchive.py:125-130).
    *
    * @param raw (id, body) rows, body nullable JSON text
    * @param retrievedAt epoch seconds to stamp (injected for determinism)
    */
  def normalize(raw: DataFrame, retrievedAt: Column): DataFrame = {
    raw
      .withColumn("j", from_json(col("body"), apiSchema))
      .filter(col("j").isNotNull && col("j.time").isNotNull)
      .select(
        col("j.id").as("id"),
        coalesce(col("j.deleted"), lit(false)).as("deleted"),
        col("j.type").as("type"),
        col("j.by").as("author"),
        col("j.time").as("time"),
        col("j.text").as("text"),
        coalesce(col("j.dead"), lit(false)).as("dead"),
        col("j.parent").as("parent"),
        col("j.poll").as("poll"),
        col("j.url").as("url"),
        col("j.score").as("score"),
        col("j.title").as("title"),
        col("j.descendants").as("descendants"),
        retrievedAt.as("retrieved"))
  }
}
