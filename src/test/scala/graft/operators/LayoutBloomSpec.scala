package graft.operators

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom-filter layout: the filters really land in the parquet footers
  * (verified with the parquet-hadoop reader — exactly what a pruning
  * scan consults), membership answers are correct on present keys and
  * mostly-negative on absent ones, and un-bloomed columns carry no
  * filter. */
class LayoutBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("writeWithBloom: filters present on requested columns only; " +
    "membership exact-positive, near-complete-negative") {
    val dir = Files.createTempDirectory("graft-bloom").toString
    val df = (1L to 2000L).map(i => (i, s"text $i")).toDF("id", "t")
      .coalesce(1)
    Layout.writeWithBloom(df, Seq("id"), dir, ndv = 2000L)

    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(file.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration))
    try {
      val block = rd.getFooter.getBlocks.get(0)
      val cols = block.getColumns.asScala
      val idCol = cols.find(_.getPath.toDotString == "id").get
      val tCol = cols.find(_.getPath.toDotString == "t").get
      assert(idCol.getBloomFilterOffset > 0, "no bloom filter on id")
      assert(tCol.getBloomFilterOffset <= 0, "unexpected bloom filter on t")

      val bf = rd.getBloomFilterDataReader(block).readBloomFilter(idCol)
      assert(bf != null)
      // no false negatives, ever
      (1L to 2000L by 97L).foreach { k =>
        assert(bf.findHash(bf.hash(java.lang.Long.valueOf(k))),
          s"present key $k reported absent")
      }
      // absent keys: mostly rejected (fpp-bounded, not exact)
      val misses = (100000L until 101000L)
        .count(k => !bf.findHash(bf.hash(java.lang.Long.valueOf(k))))
      assert(misses >= 900,
        s"bloom filter rejects only $misses/1000 absent keys")
    } finally rd.close()

    // functional: reads still return exact answers
    val hit = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("id") === 1234L)
    assert(hit.count() == 1L)
  }
}
