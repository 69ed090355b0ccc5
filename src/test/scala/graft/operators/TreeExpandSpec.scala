package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** J3 recursive expansion vs a hand-built forest. */
class TreeExpandSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  //        1            2
  //       / \            \
  //      3   4            7
  //     / \
  //    5   6
  private val edges = Seq(
    (1L, Option.empty[Long]), (2L, Option.empty[Long]),
    (3L, Option(1L)), (4L, Option(1L)),
    (5L, Option(3L)), (6L, Option(3L)), (7L, Option(2L))
  ).toDF("id", "parent")

  test("expansion yields correct roots, depths and paths") {
    val out = TreeExpand.expand(edges, Seq(1L, 2L).toDF("id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getString(3)))).toMap
    assert(out.size == 7)
    assert(out(1L) == ((1L, 0, "1")))
    assert(out(5L) == ((1L, 2, "1/3/5")))
    assert(out(6L) == ((1L, 2, "1/3/6")))
    assert(out(7L) == ((2L, 1, "2/7")))
  }

  test("subtree-only expansion excludes other trees") {
    val out = TreeExpand.expand(edges, Seq(3L).toDF("id")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(3L, 5L, 6L))
    assert(out.forall(_.getLong(1) == 3L))
  }

  test("maxDepth with a live frontier throws instead of truncating silently") {
    val cyc = Seq((1L, Option(2L)), (2L, Option(1L))).toDF("id", "parent")
    val e = intercept[IllegalStateException] {
      TreeExpand.expand(cyc, Seq(1L).toDF("id"), maxDepth = 5)
    }
    assert(e.getMessage.contains("maxDepth=5"))
  }

  test("tree of height exactly maxDepth converges (leaves at the bound)") {
    // chain 1→…→6: deepest node at depth 5 is a LEAF — depth == maxDepth
    // must not spuriously fail (the frontier is non-empty but childless)
    val chain = (1L to 6L).map(i =>
      (i, if (i == 1L) Option.empty[Long] else Option(i - 1))).toDF("id", "parent")
    val out = TreeExpand.expand(chain, Seq(1L).toDF("id"), maxDepth = 5).collect()
    assert(out.length == 6)
    assert(out.map(_.getInt(2)).max == 5)
    // …but one level deeper than the bound still fails loud
    val deeper = (1L to 7L).map(i =>
      (i, if (i == 1L) Option.empty[Long] else Option(i - 1))).toDF("id", "parent")
    val e = intercept[IllegalStateException] {
      TreeExpand.expand(deeper, Seq(1L).toDF("id"), maxDepth = 5)
    }
    assert(e.getMessage.contains("maxDepth=5"))
  }

  test("deep chain within maxDepth converges cleanly") {
    val chain = (1L to 12L).map(i =>
      (i, if (i == 1L) Option.empty[Long] else Option(i - 1))).toDF("id", "parent")
    val out = TreeExpand.expand(chain, Seq(1L).toDF("id"), maxDepth = 20).collect()
    assert(out.length == 12)
    assert(out.map(_.getInt(2)).max == 11)
  }

  test("frontier residency auto-gates: wide frontiers leave the driver") {
    // 1 → 40 children → grandchildren: the 40-row frontier exceeds
    // driverFrontierRows=4, and with broadcastFrontierRows=8 it must take
    // the shuffle path — no driver materialization, identical output
    val wide = Seq((1L, Option.empty[Long])) ++
      (2L to 41L).map(i => (i, Option(1L))) ++
      (42L to 81L).map(i => (i, Option(i - 40L)))
    val wideDf = wide.toDF("id", "parent")
    val modes = scala.collection.mutable.Buffer.empty[String]
    val gated = TreeExpand.expand(wideDf, Seq(1L).toDF("id"),
      levelsPerRound = 1, driverFrontierRows = 4, broadcastFrontierRows = 8,
      modeLog = modes)
    val expected = asMap(TreeExpand.expand(wideDf, Seq(1L).toDF("id")))
    assert(asMap(gated) == expected)
    // root frontier (1 row) is driver-held; the 40-wide levels shuffle
    assert(modes.head == "driver")
    assert(modes.contains("shuffle"))
    // middle ground: a cap that admits broadcast but not driver residency
    val modes2 = scala.collection.mutable.Buffer.empty[String]
    val bcast = TreeExpand.expand(wideDf, Seq(1L).toDF("id"),
      levelsPerRound = 1, driverFrontierRows = 4, broadcastFrontierRows = 100,
      modeLog = modes2)
    assert(asMap(bcast) == expected)
    assert(modes2.contains("broadcast") && !modes2.contains("shuffle"))
  }

  test("byte budget demotes broadcast residency even when rows are few") {
    // 40-row frontiers are tiny by rows but their paths exceed a 64-byte
    // budget: the gate must fall to the shuffle path (rows are not a
    // memory unit), with identical output
    val wide = Seq((1L, Option.empty[Long])) ++
      (2L to 41L).map(i => (i, Option(1L))) ++
      (42L to 81L).map(i => (i, Option(i - 40L)))
    val wideDf = wide.toDF("id", "parent")
    val modes = scala.collection.mutable.Buffer.empty[String]
    val gated = TreeExpand.expand(wideDf, Seq(1L).toDF("id"),
      levelsPerRound = 1, driverFrontierRows = 4096,
      broadcastFrontierRows = 1000000L, broadcastMaxBytes = 64L,
      modeLog = modes)
    val expected = asMap(TreeExpand.expand(wideDf, Seq(1L).toDF("id")))
    assert(asMap(gated) == expected)
    assert(modes.contains("shuffle"), modes)
    // pointer doubling under a tiny state-byte budget still matches
    val dbl = asMap(TreeExpand.expandByDoubling(wideDf, Seq(1L).toDF("id"),
      broadcastStateBytes = 32L))
    assert(dbl == expected)
  }

  test("mid-flight demotion: path growth flips a small graph to shuffle") {
    // 190-char string ids: 20 edges pass the initial small-graph gate
    // (20 * 48 bytes < 1500), but depth-1 paths are ~380 chars, so the
    // first adopted 4-row frontier blows the byte budget mid-flight —
    // exercising the demote branch (smallGraph off, AQE restored), not
    // just the initial gate
    def n(i: Int) = f"n$i%0190d"
    val edges = (Seq((n(1), Option.empty[String])) ++
      (2 to 5).map(i => (n(i), Option(n(1)))) ++
      (6 to 21).map(i => (n(i), Option(n(2 + (i - 6) / 4))))).toDF("id", "parent")
    val roots = Seq(n(1)).toDF("id")
    val modes = scala.collection.mutable.Buffer.empty[String]
    val gated = TreeExpand.expand(edges, roots, levelsPerRound = 1,
      driverFrontierRows = 2, broadcastMaxBytes = 1500L, modeLog = modes)
    def asStrMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getString(3)))).toMap
    val expected = asStrMap(TreeExpand.expand(edges, roots))
    assert(asStrMap(gated) == expected)
    assert(modes.head == "driver" && modes.contains("shuffle"), modes)
    // pointer doubling: seed segs fit the budget, round-1 concatenations
    // exceed it — demotes between rounds, output unchanged
    val dbl = asStrMap(TreeExpand.expandByDoubling(edges, roots,
      broadcastStateBytes = 6000L))
    assert(dbl == expected)
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getString(3)))).toMap

  test("pointer doubling matches BFS on the forest, incl. subtree roots") {
    val bfs = asMap(TreeExpand.expand(edges, Seq(1L, 2L).toDF("id")))
    // default gates take the driver tier; driverStateRows = 0 pins the
    // distributed contraction rounds to the same answer
    val dbl = asMap(TreeExpand.expandByDoubling(edges, Seq(1L, 2L).toDF("id")))
    assert(dbl == bfs)
    val dblDist = asMap(TreeExpand.expandByDoubling(edges, Seq(1L, 2L).toDF("id"),
      driverStateRows = 0))
    assert(dblDist == bfs)
    val bfsSub = asMap(TreeExpand.expand(edges, Seq(3L).toDF("id")))
    val dblSub = asMap(TreeExpand.expandByDoubling(edges, Seq(3L).toDF("id")))
    assert(dblSub == bfsSub)
  }

  test("pointer doubling handles a deep chain in O(log depth) rounds") {
    val n = 100L
    val chain = (1L to n).map(i =>
      (i, if (i == 1L) Option.empty[Long] else Option(i - 1))).toDF("id", "parent")
    val expected = asMap(TreeExpand.expandByDoubling(chain, Seq(1L).toDF("id"),
      driverStateRows = 0))
    assert(expected.size == n)
    assert(expected(n) == ((1L, (n - 1).toInt, (1L to n).mkString("/"))))
    // driver tier agrees with the rounds
    val out = asMap(TreeExpand.expandByDoubling(chain, Seq(1L).toDF("id")))
    assert(out == expected)
  }

  test("driver tier resolves tiny states with fewer jobs than the rounds") {
    val n = 200L
    val chain = (1L to n).map(i =>
      (i, if (i == 1L) Option.empty[Long] else Option(i - 1))).toDF("id", "parent")
    def countJobs(f: => Unit): Int = {
      var jobs = 0
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      }
      spark.sparkContext.addSparkListener(l)
      try { f; org.apache.spark.GraftTestBus.flush(spark.sparkContext) }
      finally spark.sparkContext.removeSparkListener(l)
      jobs
    }
    var driverOut: Map[Long, (Long, Int, String)] = null
    var roundsOut: Map[Long, (Long, Int, String)] = null
    val driverJobs = countJobs {
      driverOut = asMap(TreeExpand.expandByDoubling(chain, Seq(1L).toDF("id")))
    }
    val roundJobs = countJobs {
      roundsOut = asMap(TreeExpand.expandByDoubling(chain, Seq(1L).toDF("id"),
        driverStateRows = 0))
    }
    assert(driverOut == roundsOut)
    // ~8 contraction rounds (one job each) skipped: the gap must be material
    assert(driverJobs + 4 <= roundJobs, s"driver=$driverJobs rounds=$roundJobs")
  }

  test("seed checkpoint is eager by default (deadlock guard), lazy via conf") {
    // the guard costs exactly one extra (tiny) job vs the lazySeed escape
    // hatch — pin the +1 so the default stays eager and the hatch stays live
    val n = 200L
    val chain = (1L to n).map(i =>
      (i, if (i == 1L) Option.empty[Long] else Option(i - 1))).toDF("id", "parent")
    def countJobs(f: => Unit): Int = {
      var jobs = 0
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      }
      spark.sparkContext.addSparkListener(l)
      try { f; org.apache.spark.GraftTestBus.flush(spark.sparkContext) }
      finally spark.sparkContext.removeSparkListener(l)
      jobs
    }
    var eagerOut: Map[Long, (Long, Int, String)] = null
    var lazyOut: Map[Long, (Long, Int, String)] = null
    val eagerJobs = countJobs {
      eagerOut = asMap(TreeExpand.expandByDoubling(chain, Seq(1L).toDF("id")))
    }
    spark.conf.set("spark.graft.treeExpand.lazySeed", "true")
    val lazyJobs =
      try countJobs {
        lazyOut = asMap(TreeExpand.expandByDoubling(chain, Seq(1L).toDF("id")))
      }
      finally spark.conf.unset("spark.graft.treeExpand.lazySeed")
    assert(eagerOut == lazyOut)
    assert(eagerJobs == lazyJobs + 1, s"eager=$eagerJobs lazy=$lazyJobs")
  }

  test("pointer doubling fails loud on cycles and over-deep trees") {
    val cyc = Seq((1L, Option(2L)), (2L, Option(1L)), (3L, Option(1L)))
      .toDF("id", "parent")
    val chain = (1L to 12L).map(i =>
      (i, if (i == 1L) Option.empty[Long] else Option(i - 1))).toDF("id", "parent")
    // both tiers must fail loud the same way
    for (driverRows <- Seq(8192, 0)) {
      intercept[IllegalStateException] {
        TreeExpand.expandByDoubling(cyc, Seq(3L).toDF("id"), maxDepth = 5,
          driverStateRows = driverRows)
      }
      val e = intercept[IllegalStateException] {
        TreeExpand.expandByDoubling(chain, Seq(1L).toDF("id"), maxDepth = 5,
          driverStateRows = driverRows)
      }
      assert(e.getMessage.contains("maxDepth=5"))
    }
  }

  test("out-of-scope deep chains: tiers agree (drop within fuse, throw past)") {
    // maxDepth=5 → round fuse 2^(maxRounds+1)-1=15. A 12-deep chain under
    // an UNREQUESTED root exceeds maxDepth but fits the fuse: both tiers
    // must drop it silently (only the requested isolated root 50 returns)
    def chainPlus(n: Long) =
      ((1L to n).map(i => (i, if (i == 1L) Option.empty[Long] else Option(i - 1)))
        :+ ((50L, Option.empty[Long]))).toDF("id", "parent")
    // the EXACT boundary: a 16-node chain (max dist 15) is the deepest both
    // tiers tolerate; 17 nodes (dist 16) must throw in BOTH — the off-by-one
    // between 'd > 2^(maxRounds+1)' and the round recurrence was a real
    // success/failure flip across the size gate
    for (driverRows <- Seq(8192, 0); n <- Seq(12L, 16L)) {
      val out = asMap(TreeExpand.expandByDoubling(chainPlus(n),
        Seq(50L).toDF("id"), maxDepth = 5, driverStateRows = driverRows))
      assert(out == Map(50L -> ((50L, 0, "50"))), s"driverRows=$driverRows n=$n")
    }
    for (driverRows <- Seq(8192, 0)) {
      intercept[IllegalStateException] {
        TreeExpand.expandByDoubling(chainPlus(17L), Seq(50L).toDF("id"),
          maxDepth = 5, driverStateRows = driverRows)
      }
    }
  }

  test("dangling parent pointers resolve and drop in both tiers") {
    // nodes 10..14 chain up to parent 9, which has NO row (the edge slice
    // omits it): the chain terminates at the missing id and drops. Pinned
    // distributed too — a miss used to contract one level per round and
    // spuriously trip the round fuse on chains deeper than the round count
    val dangling = (Seq((1L, Option.empty[Long])) ++
      (10L to 14L).map(i => (i, Option(i - 1)))).toDF("id", "parent")
    for (driverRows <- Seq(8192, 0)) {
      val out = asMap(TreeExpand.expandByDoubling(dangling, Seq(1L).toDF("id"),
        maxDepth = 5, driverStateRows = driverRows))
      assert(out == Map(1L -> ((1L, 0, "1"))), s"driverRows=$driverRows")
    }
  }

  test("batched DAG rounds need no amplification cap: edge-side builds " +
    "keep multi-parent expansions exact") {
    // duplicate (2,1) edges: each level multiplies (node, path) rows by
    // the parent multiplicity. The former frontier-side broadcasts made
    // levels 2..levelsPerRound UNMEASURED builds (a round-capping hazard);
    // with the edge table as the only build side, amplified level outputs
    // just stream, so a batched round must match the one-level-per-round
    // reference bit for bit with no cap entries in the mode log.
    val dag = Seq(
      (2L, Option(1L)), (2L, Option(1L)), // duplicate edge: multiplicity 2
      (3L, Option(2L)), (4L, Option(3L)), (5L, Option(4L)), (6L, Option(5L))
    ).toDF("id", "parent")
    val modes = scala.collection.mutable.Buffer.empty[String]
    val out = TreeExpand.expand(dag, Seq(1L).toDF("id"),
      levelsPerRound = 4, driverFrontierRows = 12, broadcastFrontierRows = 12,
      modeLog = modes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    // reference: one measured level per round
    val ref = TreeExpand.expand(dag, Seq(1L).toDF("id"),
      levelsPerRound = 1, driverFrontierRows = 12, broadcastFrontierRows = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    assert(out == ref)
    // node 2's duplicate parent rows double every path below it
    assert(out.count(x => x._1 == 6L) == 2)
    assert(!modes.exists(_.startsWith("cap")), modes)
  }

  test("concurrent small-graph expansions restore AQE exactly once") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    assert(prev == "true", "precondition: session starts with AQE on")
    val expected = asMap(TreeExpand.expand(edges, Seq(1L, 2L).toDF("id")))
    val runs = Future.sequence((1 to 4).map(_ => Future {
      asMap(TreeExpand.expand(edges, Seq(1L, 2L).toDF("id")))
    }))
    val results = Await.result(runs, 120.seconds)
    assert(results.forall(_ == expected))
    // the per-session lock serializes the suspend/restore windows, so the
    // saved value can never be another window's "false"
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }

  test("pointer doubling emits depth-0 rows for roots absent from edges") {
    val bfs = asMap(TreeExpand.expand(edges, Seq(1L, 42L).toDF("id")))
    val dbl = asMap(TreeExpand.expandByDoubling(edges, Seq(1L, 42L).toDF("id")))
    assert(dbl == bfs)
    assert(dbl(42L) == ((42L, 0, "42")))
    val dblDist = asMap(TreeExpand.expandByDoubling(edges, Seq(1L, 42L).toDF("id"),
      driverStateRows = 0))
    assert(dblDist == bfs)
  }
}
