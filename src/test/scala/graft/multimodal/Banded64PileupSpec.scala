package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The identical-signature pileup guard ([[Banded64.pairs]]'
  * pre-collapse): `m` copies of ONE signature — the same meme image
  * mirrored across a crawl — must cost m−1 star edges, not the C(m,2)
  * clique on one band key (5·10⁹ pairs at m = 10⁵; the historical
  * all-pairs tier would never finish this spec). Connectivity and
  * keep-one survivors must match the all-pairs semantics exactly. */
class Banded64PileupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("10^5 copies of one signature: edge volume is linear (m-1 star " +
    "edges), near signatures still connect through the representative") {
    val m = 100000
    val pileSig = 0x5a5a5a5a5a5a5a5aL
    val nearSig = pileSig ^ 3L // hamming 2 from the pile
    val rnd = new java.util.Random(7)
    val distinct = (0 until 50).map(i => (200000L + i, rnd.nextLong()))
    val rows = ((0 until m).map(i => (i.toLong, pileSig)) ++
      distinct :+ ((300000L, nearSig))).toDF("id", "sig")
      .repartition(16)
    val pairs = Banded64.pairs(rows, "sig", maxHamming = 3)
      .localCheckpoint(true)
    val total = pairs.count()
    val star = pairs.filter(col("hamming") === 0).count()
    assert(star == m - 1, s"expected ${m - 1} star edges, got $star")
    // the only qualifying cross pair: pile representative (id 0) to the
    // hamming-2 neighbor; 50 random signatures land within hamming 3 of
    // anything with probability ~0
    assert(total == m.toLong, s"expected $m edges total, got $total")
    val near = pairs.filter(col("hamming") > 0).collect()
    assert(near.length == 1 && near(0).getLong(0) == 0L &&
      near(0).getLong(1) == 300000L,
      s"near edge must join the pile REP to the neighbor: ${near.toSeq}")
    // connectivity: every copy and the near neighbor in one component
    val comp = graft.operators.Components.of(pairs, "id_a", "id_b")
    val pileComps = comp.filter(col("id") <= m.toLong || col("id") === 300000L)
      .select("component").distinct().count()
    assert(pileComps == 1, s"pile + neighbor must be ONE component")
  }

  test("survivors match brute-force all-pairs banding on a mixed fixture") {
    val rnd = new java.util.Random(41)
    // groups of identical sigs (sizes 1..5) + near variants
    val sigs = (0 until 12).map(_ => rnd.nextLong())
    val rows = sigs.zipWithIndex.flatMap { case (s, g) =>
      val copies = (g % 5) + 1
      (0 until copies).map(c => (g * 100L + c, s)) :+
        ((g * 100L + 50, s ^ (1L << (g % 64)))) // hamming-1 variant
    }
    val df = rows.toDF("id", "sig").repartition(8).localCheckpoint(true)
    val pairs = Banded64.pairs(df, "sig", maxHamming = 3)
    // brute-force reference: all pairs sharing >=1 of the 4 bands with
    // hamming <= 3 (the historical semantics)
    val all = rows.toArray
    val ref = for {
      i <- all.indices; j <- (i + 1) until all.length
      (ia, sa) = all(i); (ib, sb) = all(j)
      if (0 until 4).exists(b => ((sa >> (b * 16)) & 0xffffL) == ((sb >> (b * 16)) & 0xffffL))
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= 3
    } yield (math.min(ia, ib), math.max(ia, ib))
    // connectivity equivalence: same components => same keep-one survivors
    def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      all.map(_._1).map(id => id -> find(id)).toMap
    }
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(components(got) == components(ref),
      "collapsed edge set must be connectivity-equivalent to all-pairs")
    // keep-one parity: largest-id-quality canonical keep over both edge sets
    val docs = rows.toDF("id", "sig").withColumn("q", col("id") % 7)
    def survivors(p: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.operators.Dedup.keepCanonical(docs, "id", "q", p)
        .filter(col("kept")).select("id").as[Long].collect().toSet
    val refDf = ref.toDF("id_a", "id_b")
    assert(survivors(pairs) == survivors(refDf),
      "keep-one survivors must be unchanged vs all-pairs banding")
  }
}
