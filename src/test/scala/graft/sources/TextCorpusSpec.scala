package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JSONL corpus reader: clean/quarantine split over real files, including
  * gzip-compressed input and corrupt lines. */
class TextCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  private val lines = Seq(
    """{"doc_id": 1, "text": "alpha beta", "source": "s0"}""",
    """{"doc_id": 2, "text": "gamma delta", "source": "s1"}""",
    """{"doc_id": 3, "text": "truncated...""", // corrupt: unterminated
    """not json at all""",                      // corrupt: not JSON
    """{"doc_id": 4, "text": "epsilon", "source": "s0"}""")

  test("plain JSONL splits into typed clean rows and verbatim quarantine") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes)
    val (clean, quarantine, (nc, nq)) =
      TextCorpus.readJsonlWithStats(spark, dir, schema)
    assert(nc == 3 && nq == 2)
    assert(clean.columns.toSeq == Seq("doc_id", "text", "source"))
    val ids = clean.collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L))
    val raw = quarantine.collect().map(_.getString(0)).toSet
    assert(raw.contains("not json at all"))
    assert(raw.exists(_.startsWith("""{"doc_id": 3""")))
  }

  test("gzip-compressed JSONL reads transparently by extension") {
    val dir = Files.createTempDirectory("graft-jsonl-gz").toString
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(
        java.nio.file.Paths.get(dir, "part-0.jsonl.gz").toFile))
    try out.write(lines.mkString("\n").getBytes) finally out.close()
    val (clean, quarantine) = TextCorpus.readJsonl(spark, dir, schema)
    assert(clean.count() == 3)
    assert(quarantine.count() == 2)
  }

  test("schemas claiming the corrupt-record column are rejected") {
    intercept[IllegalArgumentException] {
      TextCorpus.readJsonl(spark, "/tmp/nowhere",
        schema.add("_corrupt_record", StringType))
    }
  }

  test("field names containing dots resolve literally, not as nested paths") {
    val dotted = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("meta.lang", StringType)))
    val dir = Files.createTempDirectory("graft-jsonl-dot").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      """{"doc_id": 5, "meta.lang": "en"}""".getBytes)
    val (clean, quarantine) = TextCorpus.readJsonl(spark, dir, dotted)
    val rows = clean.collect()
    assert(quarantine.count() == 0)
    assert(rows.length == 1 && rows.head.getLong(0) == 5L &&
      rows.head.getString(1) == "en")
  }

  test("a type-mismatched field quarantines the line instead of nulling it") {
    val dir = Files.createTempDirectory("graft-jsonl-type").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      Seq("""{"doc_id": "not-a-number", "text": "t", "source": "s"}""",
        """{"doc_id": 9, "text": "ok", "source": "s"}""").mkString("\n").getBytes)
    val (clean, quarantine) = TextCorpus.readJsonl(spark, dir, schema)
    assert(clean.collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(quarantine.count() == 1)
  }
}
