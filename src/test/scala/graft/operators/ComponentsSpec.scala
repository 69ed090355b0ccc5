package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("labels every node with its component's min id (driver union-find path)") {
    // components: {1,2,3,4} (chain), {7,9}, singleton edges absent
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 7L)).toDF("a", "b")
    val out = Components.of(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("distributed label propagation matches union-find on the same graph") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 7L), (5L, 6L)).toDF("a", "b")
    val dist = Components.of(edges, "a", "b", driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uf = Components.of(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == uf)
  }

  test("long chain converges on the distributed path (diameter > 2 rounds)") {
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val out = Components.of(chain, "a", "b", driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == (1L to 10L).toSet)
    assert(out.values.forall(_ == 1L))
  }

  test("byte bound forces the distributed path even when rows are few") {
    // 4 edges of WIDE string ids: well under any row threshold, but over a
    // tiny byte budget — rows are not a memory unit, the gate must see bytes
    val wide = "x" * 200
    val edges = Seq(("a" + wide, "b" + wide), ("b" + wide, "c" + wide),
      ("p" + wide, "q" + wide), ("q" + wide, "r" + wide)).toDF("a", "b")
    val viaBytes = Components.of(edges, "a", "b", driverMaxBytes = 64L)
      .collect().map(r => r.getString(0).take(1) -> r.getString(1).take(1)).toMap
    val viaDriver = Components.of(edges, "a", "b")
      .collect().map(r => r.getString(0).take(1) -> r.getString(1).take(1)).toMap
    assert(viaBytes == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "p" -> "p", "q" -> "p", "r" -> "p"))
    assert(viaBytes == viaDriver)
  }

  test("pointer doubling: a 512-node chain converges in O(log diameter) " +
    "rounds, labels bit-identical to union-find") {
    val n = 512L
    val chain = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val pairs = chain.select($"a".as("src"), $"b".as("dst"))
    val (labels, rounds) = Components.distributed(pairs, maxRounds = 50)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == (1L to n).toSet)
    assert(out.values.forall(_ == 1L), s"non-min labels: ${
      out.filter(_._2 != 1L).take(5)}")
    // the shortcut closes a 2^t − 1 hop gap after t rounds: diameter 511
    // needs ⌈log₂ 512⌉ = 9 label rounds + 1 no-change round — the old
    // one-hop propagation needed 511 (and threw at the default
    // maxRounds = 50)
    assert(rounds <= 12, s"pointer doubling regressed: $rounds rounds")
  }

  test("pointer doubling parity: random multi-component graph matches " +
    "union-find exactly") {
    val rnd = new scala.util.Random(41)
    // 3 planted clusters + noise edges inside them, plus isolated pairs
    val edges = (1 to 220).map { _ =>
      val base = rnd.nextInt(3) * 1000L
      (base + rnd.nextInt(40), base + rnd.nextInt(40))
    }.filter { case (a, b) => a != b } ++
      Seq((5000L, 5001L), (6000L, 6001L))
    val df = edges.toDF("a", "b")
    val dist = Components.of(df, "a", "b", driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uf = Components.of(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == uf)
  }

  test("throws instead of returning non-converged labels past maxRounds") {
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Components.of(chain, "a", "b", maxRounds = 3, driverThreshold = 0L)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
