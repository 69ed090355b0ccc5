package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The takedown ledger: receipts persist one file per event under the
  * deterministic replay name, first write wins, empty dirs read as a
  * typed empty frame, and degenerate records fail loud. */
class ForgetLedgerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def receipts(ns: (String, Long)*): Seq[Forget.Receipt] =
    ns.map { case (c, n) => Forget.Receipt(c, n) }

  test("record publishes one event file; read returns every event's " +
    "legs; has() tracks the replay token") {
    val dir = Files.createTempDirectory("graft-ledger").toString
    assert(!ForgetLedger.has(dir, 7L))
    assert(ForgetLedger.record(spark, dir, 7L, 50L,
      receipts("text_claims" -> 12L, "corpus" -> 50L)))
    assert(ForgetLedger.has(dir, 7L))
    assert(ForgetLedger.record(spark, dir, 8L, 3L,
      receipts("corpus" -> 3L)))
    val rows = ForgetLedger.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).sortBy(t => (t._1, t._3)).toSeq
    assert(rows == Seq(
      (7L, 50L, "corpus", 50L), (7L, 50L, "text_claims", 12L),
      (8L, 3L, "corpus", 3L)))
  }

  test("replaying an event id is a no-op returning false — the first " +
    "record stands") {
    val dir = Files.createTempDirectory("graft-ledger").toString
    assert(ForgetLedger.record(spark, dir, 1L, 10L,
      receipts("corpus" -> 10L)))
    // the crash-retried cascade legitimately reads 0s the second time;
    // the ledger must keep the first complete record
    assert(!ForgetLedger.record(spark, dir, 1L, 10L,
      receipts("corpus" -> 0L)))
    val rows = ForgetLedger.read(spark, dir).collect()
    assert(rows.length == 1 && rows.head.getLong(3) == 10L)
  }

  test("the cascade's ledger leg records the completed event and reads " +
    "0 on the idempotent replay — the first record stands") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val corpusDir = Files.createTempDirectory("graft-ledger-corpus").toString
    val ledgerDir = Files.createTempDirectory("graft-ledger-led").toString
    (0L until 30L).map(i => (i, s"d$i")).toDF("doc_id", "text")
      .repartition(2).write.mode("overwrite").parquet(corpusDir)
    def run() = Forget.cascade(spark, Seq(3L, 7L),
      corpus = Some(Forget.CorpusTarget(corpusDir, "doc_id")),
      ledger = Some(Forget.LedgerTarget(ledgerDir, eventId = 11L)))
    val first = run()
    assert(first.find(_.component == "ledger").map(_.removed) == Some(1L))
    assert(first.find(_.component == "corpus_rows").map(_.removed) ==
      Some(2L))
    val retry = run() // legs idempotent, ledger replay
    assert(retry.find(_.component == "ledger").map(_.removed) == Some(0L))
    val rows = ForgetLedger.read(spark, ledgerDir)
      .filter(col("component") === "corpus_rows").collect()
    assert(rows.length == 1 && rows.head.getLong(3) == 2L,
      "the replay must not overwrite the first record")
    // a ledger-recorded cascade with NO legs is not a takedown
    val e = intercept[IllegalArgumentException] {
      Forget.cascade(spark, Seq(1L),
        ledger = Some(Forget.LedgerTarget(ledgerDir, eventId = 12L)))
    }
    assert(e.getMessage.contains("at least one leg"))
  }

  test("an empty or missing ledger reads as an empty TYPED frame; " +
    "degenerate records fail loud") {
    val dir = Files.createTempDirectory("graft-ledger").toString
    val empty = ForgetLedger.read(spark, dir)
    assert(empty.schema == ForgetLedger.schema && empty.count() == 0L)
    assert(ForgetLedger.read(spark, dir + "-missing").count() == 0L)
    val noLegs = intercept[IllegalArgumentException] {
      ForgetLedger.record(spark, dir, 2L, 10L, Seq.empty)
    }
    assert(noLegs.getMessage.contains("no receipts"))
    val noIds = intercept[IllegalArgumentException] {
      ForgetLedger.record(spark, dir, 3L, 0L, receipts("corpus" -> 0L))
    }
    assert(noIds.getMessage.contains("0 deleted ids"))
  }
}
