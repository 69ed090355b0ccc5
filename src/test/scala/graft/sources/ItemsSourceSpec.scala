package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ingest.FakeFetcher
import graft.schema.Item

/** DataSource V2 scan: partition planning over the id range + tombstone
  * nulls + downstream normalization. */
class ItemsSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val bodies = Map(
    1L -> """{"id":1,"type":"story","by":"alice","time":100,"title":"t"}""",
    2L -> """{"id":2,"type":"comment","by":"bob","time":110,"parent":1}""",
    4L -> """{"id":4,"type":"comment","time":120}""")

  test("reads the id range across partitions; missing ids yield null bodies") {
    ItemsSource.registerFake("t1", new FakeFetcher(bodies, maxId = 5))
    val df = spark.read.format("graft.sources.ItemsSource")
      .option("lower", "1").option("upper", "5")
      .option("partitions", "3").option("fetcher", "fake:t1")
      .load()
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(rows(1L).isDefined && rows(3L).isEmpty && rows(5L).isEmpty)
  }

  test("composes with Item.normalize into typed archive rows") {
    ItemsSource.registerFake("t2", new FakeFetcher(bodies, maxId = 5))
    val raw = spark.read.format("graft.sources.ItemsSource")
      .option("lower", "1").option("upper", "5")
      .option("partitions", "2").option("fetcher", "fake:t2")
      .load()
    val items = Item.normalize(raw, lit(999L)).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("author")).toMap
    assert(items.keySet == Set(1L, 2L, 4L)) // 3,5 tombstoned
    assert(items(1L) == "alice" && items(4L) == null)
  }
}
