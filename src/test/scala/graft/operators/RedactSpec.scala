package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PII redaction semantics: category counts, replace-all, pass-through. */
class RedactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Redact.redactPii(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("each category redacts to its token and counts on the original text") {
    val out = run(Seq(
      (1L, "mail a@b.co and c.d+e@f-g.org now"),
      (2L, "call 555-867-5309 or 555-000-1111"),
      (3L, "host 10.0.0.1 and 192.168.255.17"),
      (4L, "clean text with no pii at all")))
    assert(out(1L) == (("mail <EMAIL> and <EMAIL> now", 2L, 0L, 0L)))
    assert(out(2L) == (("call <PHONE> or <PHONE>", 0L, 2L, 0L)))
    assert(out(3L) == (("host <IP> and <IP>", 0L, 0L, 2L)))
    assert(out(4L) == (("clean text with no pii at all", 0L, 0L, 0L)),
      "pii-free text passes through byte-identical")
  }

  test("mixed text: every family redacts; counts are per-family") {
    val out = run(Seq(
      (1L, "x@y.io dialed 555-123-4567 from 8.8.8.8")))
    assert(out(1L) == (("<EMAIL> dialed <PHONE> from <IP>", 1L, 1L, 1L)))
  }

  test("piiSourceStats: rates and per-family totals, clean sources zero") {
    val df = Seq(
      (1L, "s0", "mail a@b.co and c@d.org now"),
      (2L, "s0", "clean words only here"),
      (3L, "s1", "clean text in this source"),
      (4L, "s1", "also clean over here today"),
      (5L, "s2", "call 555-867-5309 from 10.0.0.1")
    ).toDF("doc_id", "source", "text")
    val out = Redact.piiSourceStats(df, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(out("s0") == ((2L, 1L, 500L, 2L, 0L, 0L)))
    assert(out("s1") == ((2L, 0L, 0L, 0L, 0L, 0L)))
    assert(out("s2") == ((1L, 1L, 1000L, 0L, 1L, 1L)))
  }

  test("word boundaries hold: longer digit runs are not phones/IPs") {
    val out = run(Seq(
      (1L, "serial 1555-123-45678 stays"), // 4-3-5 digits: \b kills both ends
      (2L, "version 1.2.3.4.5 chains")))   // 5 octets: first quad has no right \b... the dot IS a boundary
    assert(out(1L)._1 == "serial 1555-123-45678 stays")
    assert(out(1L)._3 == 0L)
    // 1.2.3.4.5: the regex matches greedily from '1' — '1.2.3.4' ends at a
    // boundary (digit|dot) — RE2 and Java agree; the trailing '.5' stays.
    assert(out(2L)._1 == "version <IP>.5 chains")
    assert(out(2L)._4 == 1L)
  }
}
