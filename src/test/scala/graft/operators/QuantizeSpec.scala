package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Symmetric int8 quantization semantics + reconstruction audit. */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codes are half-up floored, scale is max abs, zero vectors survive") {
    val vecs = Seq(
      (1L, Array(2.0f, -1.0f, 0.5f)), // scale 2: codes 127, -63 (floor(-63.0)), 32 (floor 32.25+?)
      (2L, Array(0.0f, 0.0f, 0.0f))   // all-zero: scale 0, codes 0
    ).toDF("vec_id", "embedding")
    val out = Quantize.int8(vecs, "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getSeq[Int](3)))).toMap
    assert(out(1L)._1 == 2.0)
    // x*127/scale + 0.5 floored: 2.0 -> 127.5 -> 127; -1.0 -> -63.0 -> -63;
    // 0.5 -> 32.25 -> 32
    assert(out(1L)._2 == Seq(127, -63, 32))
    assert(out(2L)._1 == 0.0 && out(2L)._2 == Seq(0, 0, 0))
  }

  test("audit reports exact reconstruction for representable values") {
    // values that are exact multiples of scale/127 reconstruct exactly
    val vecs = Seq((1L, Array(127.0f, -64.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Quantize.int8Audit(vecs, "vec_id", "embedding").collect().head
    assert(r.getDouble(1) == 127.0) // scale
    assert(r.getDouble(2) == 0.0)   // max_err: codes 127, -64, 0 exact
    assert(r.getDouble(3) == 0.0)
  }

  test("audit bounds error by half a quantization step") {
    val vecs = Seq((1L, Array.tabulate(64)(i => (math.sin(i) * 3).toFloat)))
      .toDF("vec_id", "embedding")
    val r = Quantize.int8Audit(vecs, "vec_id", "embedding").collect().head
    val scale = r.getDouble(1)
    assert(r.getDouble(2) <= scale / 127 / 2 + 1e-12) // half-step bound
    assert(r.getDouble(3) <= r.getDouble(2))
  }
}
