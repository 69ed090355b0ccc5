package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.FakeFetcher
import graft.sources.ItemsSource
import graft.store.ItemStore

/** The reference's command surface end-to-end: get → update → html_render
  * against a scripted upstream. */
class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("get + update + html_render round-trip") {
    val db = Files.createTempDirectory("graft-cli-db").toString
    val items = Map(
      1L -> """{"id":1,"type":"story","by":"alice","time":100,"title":"Hello","score":3}""",
      2L -> """{"id":2,"type":"comment","by":"bob","time":110,"text":"hi","parent":1}""")
    ItemsSource.registerFake("cli1", new FakeFetcher(items, maxId = 2))

    Cli.run(spark, "get", Array("--db", db, "--fetcher", "fake:cli1",
      "--lower", "1", "--upper", "2", "--threads", "2"))
    val store = new ItemStore(spark, db)
    assert(store.current().count() == 2)

    // upstream grows; update catches up
    ItemsSource.registerFake("cli2", new FakeFetcher(items +
      (3L -> """{"id":3,"type":"comment","by":"eve","time":120,"parent":1}"""),
      maxId = 3))
    Cli.run(spark, "update", Array("--db", db, "--fetcher", "fake:cli2"))
    assert(store.current().count() == 3)

    val outDir = Files.createTempDirectory("graft-cli-html")
    Cli.run(spark, "html_render", Array("--db", db, "--ids", "1",
      "--output", s"$outDir/page_{id}.html"))
    val html = Files.readString(outDir.resolve("page_1.html"))
    assert(html.contains("<h1>Hello</h1>"))
    assert(html.contains("""<div class="comment" id="2">"""))
    assert(html.contains("""<div class="comment" id="3">"""))
  }

  test("query verb runs a registered query and writes parquet") {
    val out = Files.createTempDirectory("graft-cli-query").toString + "/res"
    Cli.run(spark, "query", Array("--name", "q01_pricing_summary",
      "--sf", "/root/testdata/sf0.001", "--out", out))
    val res = spark.read.parquet(out)
    assert(res.count() > 0)
    assert(res.columns.contains("l_returnflag"))
    val e = intercept[RuntimeException] {
      Cli.run(spark, "query", Array("--name", "nope"))
    }
    assert(e.getMessage.contains("unknown query"))
  }
}
