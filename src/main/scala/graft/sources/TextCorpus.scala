package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingestion — the wire format training corpora actually
  * arrive in (one JSON document per line, usually gzip-compressed;
  * Spark's text/json readers handle the compression codec from the file
  * extension transparently).
  *
  * The 100 TB reality is that some lines are corrupt — truncated uploads,
  * encoding damage, schema drift. Dropping them silently (DROPMALFORMED)
  * destroys the audit trail; failing the job (FAILFAST) lets one bad line
  * kill a day of work. This reader takes the third road: PERMISSIVE parse
  * with an explicit corrupt-record column, split into a (typed, clean)
  * corpus and a quarantine frame carrying the raw offending lines — the
  * caller decides retention policy, and `readJsonlWithStats` makes the
  * drop rate a first-class number (a sudden spike is an upstream incident,
  * not noise).
  *
  * Scale shape: one pass, no shuffle — schema is caller-declared (never
  * inferred: inference scans the data twice and locks in whatever the
  * first files happened to contain), the parse is per-row, and the
  * clean/quarantine split is two filters over the same scan.
  */
object TextCorpus {

  private val CorruptCol = "_corrupt_record"

  /** Parse a JSONL directory/file against `schema`. Returns (clean,
    * quarantine): `clean` has exactly the schema's columns with every
    * row fully parsed; `quarantine` has one `raw_line` column holding
    * each unparsable line verbatim (including blank lines — silently
    * vanishing input is the one thing an ingest audit must never do).
    *
    * Implementation note: the json SOURCE forbids querying only its
    * corrupt-record column without caching the parse
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — caching a 100 TB parse is not
    * a plan. Reading the files as TEXT and parsing with `from_json`
    * keeps both branches as plain filters over one uncached scan and
    * preserves the raw line bytes for the quarantine. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — the reader owns it")
    val withCorrupt = schema.add(CorruptCol,
      org.apache.spark.sql.types.StringType, nullable = true)
    val parsed = spark.read.text(path)
      .withColumn("_parsed", from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)))
    val bad = col("_parsed").isNull ||
      col("_parsed").getField(CorruptCol).isNotNull
    // getField treats the name literally — a legal JSON key containing
    // dots must not be resolved as a nested path
    val clean = parsed.filter(!bad)
      .select(schema.fieldNames.map(f => col("_parsed").getField(f).as(f))
        .toIndexedSeq: _*)
    val quarantine = parsed.filter(bad)
      .select(col("value").as("raw_line"))
    (clean, quarantine)
  }

  /** [[readJsonl]] plus the ingest audit: (clean, quarantine,
    * (nClean, nQuarantined)) — both counts from ONE aggregation pass
    * over the uncached parse, not a scan per count. */
  def readJsonlWithStats(spark: SparkSession, path: String,
                         schema: StructType): (DataFrame, DataFrame, (Long, Long)) = {
    val (clean, quarantine) = readJsonl(spark, path, schema)
    val withCorrupt = schema.add(CorruptCol,
      org.apache.spark.sql.types.StringType, nullable = true)
    val counts = spark.read.text(path)
      .withColumn("_parsed", from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)))
      .select((col("_parsed").isNull ||
        col("_parsed").getField(CorruptCol).isNotNull).as("bad"))
      .agg(sum(when(!col("bad"), 1L)).as("n_clean"),
        sum(when(col("bad"), 1L)).as("n_quarantined"))
      .head()
    def at(i: Int): Long = if (counts.isNullAt(i)) 0L else counts.getLong(i)
    (clean, quarantine, (at(0), at(1)))
  }
}
