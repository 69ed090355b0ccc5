package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-batch distribution monitoring: in-distribution batches score low
  * TV, off-distribution batches alarm, the triage list names the
  * drivers, and replays reproduce the alert bit-for-bit. */
class StreamDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("in-distribution low, off-distribution alarms, triage names terms") {
    val ref = docs("a b c d a b", "a b c d c d")
    val mon = StreamDrift.monitor(spark, ref, "text", topK = 2)
    // same distribution as the reference
    val good = mon(docs("a b c d"), 0L)
    assert(good.nTokens == 4)
    assert(good.tvPpm <= 100000L, s"in-distribution TV ${good.tvPpm}")
    // disjoint vocabulary: total variation ~ 10^6 (floor-bounded below)
    val bad = mon(docs("zz yy zz yy"), 1L)
    assert(bad.tvPpm >= 900000L, s"off-distribution TV ${bad.tvPpm}")
    assert(bad.topTerms.nonEmpty &&
      bad.topTerms.map(_._1).forall(Set("zz", "yy", "a", "b", "c", "d")))
    // the worst drivers are the batch's novel heavy terms or the missing
    // reference mass — either way drift >= the in-distribution level
    assert(bad.topTerms.head._2 > 100000L)
    // replay: bit-identical alert
    assert(mon(docs("zz yy zz yy"), 1L) == bad)
  }

  test("empty batch alarms at full TV with zero tokens") {
    val mon = StreamDrift.monitor(spark, docs("a b c"), "text")
    val alert = mon(docs().limit(0), 7L)
    assert(alert == StreamDrift.Alert(7L, 0L, 1000000L, Seq.empty))
  }

  test("an empty reference corpus fails loud at binder creation") {
    val e = intercept[IllegalArgumentException] {
      StreamDrift.monitor(spark, docs(), "text")
    }
    assert(e.getMessage.contains("reference corpus must contain tokens"))
  }
}
