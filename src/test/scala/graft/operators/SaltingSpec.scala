package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // 90% of rows share one hot key
    val skewed = (1L to 1000L)
      .map(i => (if (i <= 900) 1L else i, i)).toDF("key", "row_id")
    val small = Seq((1L, "hot"), (950L, "cold")).toDF("key", "label")

    val plain = skewed.join(small, "key")
      .select("row_id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Salting.saltedJoin(skewed, small, "key", col("row_id"), r = 8)
      .select("row_id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(plain.count(_._2 == "hot") == 900)
  }

  test("hot-key salted join equals the plain join, replicates only hot keys") {
    val skewed = (1L to 1000L)
      .map(i => (if (i <= 900) 1L else i, i)).toDF("key", "row_id")
    // small side: key 1 is hot (20 rows), 950 is cold (1 row)
    val small = ((1 to 20).map(j => (1L, s"hot$j")) :+ ((950L, "cold")))
      .toDF("key", "label")
    val plain = skewed.join(small, "key")
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val salted = Salting.hotSaltedJoin(skewed, small, "key", col("row_id"),
        r = 8, hotMin = 10)
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(salted == plain) // multiset equality: pairing unchanged, incl. dup labels
    // the cold key must NOT replicate: rebuild the replicated small side the
    // operator constructs and check row counts directly
    val hot = small.groupBy("key").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 10).select(col("key").as("_hk"))
    val replicated = small.join(broadcast(hot), col("key") === col("_hk"), "left")
      .withColumn("_salts", when(col("_hk").isNotNull, sequence(lit(0), lit(7)))
        .otherwise(array(lit(0))))
      .select(col("key"), explode(col("_salts")).as("_salt"))
    val byKey = replicated.groupBy("key").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey(1L) == 20L * 8 && byKey(950L) == 1L)
  }

  test("composite-key hot-salted join equals the plain join on skewed " +
    "two-column keys, across both hot-detection regimes") {
    // hot composite key (1, "a"); a DIFFERENT composite key sharing the
    // first column, (1, "b"), stays cold — classification must fold BOTH
    // columns, not the first alone
    val skewed = (1L to 1000L).map { i =>
      if (i <= 900) (1L, "a", i)
      else if (i <= 950) (1L, "b", i)
      else (i, s"k$i", i)
    }.toDF("k1", "k2", "row_id")
    val small = ((1 to 20).map(j => (1L, "a", s"hot$j")) ++
      Seq((1L, "b", "coldB"), (960L, "k960", "coldK"))).toDF("k1", "k2", "label")
    val plain = skewed.join(small, Seq("k1", "k2"))
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(plain.count(_._2.startsWith("hot")) == 900 * 20)
    // hotMin values straddling the two hotKeys regimes (exact-agg vs
    // pigeonhole floor) and the never-hot degenerate case
    for (hotMin <- Seq(1L, 10L, 1000L); r <- Seq(1, 8)) {
      val salted = Salting.hotSaltedJoinKeys(skewed, small,
          Seq("k1", "k2"), col("row_id"), r = r, hotMin = hotMin)
        .select("row_id", "label").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(salted == plain, s"hotMin=$hotMin r=$r") // multiset: pairing unchanged
    }
  }

  test("salt spreads a hot key across sub-partitions") {
    val skewed = (1L to 1000L).map(i => (1L, i)).toDF("key", "row_id")
    val salts = skewed.withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(salts == 8)
  }

  private def countJobsStages(f: => Unit): (Int, Int) = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { f; org.apache.spark.GraftTestBus.flush(spark.sparkContext) }
    finally spark.sparkContext.removeSparkListener(l)
    (jobs.get(), stages.get())
  }

  test("hotKeys exact-agg branch (hotMin <= nPart): catches a hot key the " +
    "pigeonhole floor would miss, collect bounded by |small|/hotMin") {
    // adversarial layout for the floor-2 fast path: the hot key lands
    // EXACTLY ONCE in each of 8 partitions (global count 8, zero local
    // repeats), padded with unique cold keys. parallelize slices the seq
    // contiguously, so each group of 5 elements is one partition.
    val perPart = (0 until 8).map(p =>
      Seq("H") ++ (0 until 4).map(c => s"cold_${p}_$c"))
    val small = spark.createDataFrame(
      spark.sparkContext.parallelize(perPart.flatten.map(Tuple1(_)), 8)
        .map(t => org.apache.spark.sql.Row(t._1)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType))))
    assert(small.rdd.getNumPartitions == 8)
    val hotMin = 4L // <= nPart: the pigeonhole argument collapses here
    var hot: Seq[Any] = null
    val (jobs, stages) = countJobsStages {
      hot = Salting.hotKeys(small, "key", hotMin)
    }
    // branch semantics: a per-partition floor-2 pass would emit NOTHING
    // for H (it never repeats locally) — only the exact aggregation
    // finds it. This is the regression pin for the branch selection.
    assert(hot == Seq("H"), s"exact branch must catch the spread hot key, got $hot")
    // boundedness contract: the collect carries only keys with count >=
    // hotMin, so by counting it is <= |small| / hotMin rows
    assert(hot.size <= (40 / hotMin).toInt)
    // plan shape: the exact branch aggregates through an exchange (> 1
    // stage across its job(s)); the one-job zero-exchange profile belongs
    // to the fast path alone
    assert(stages >= 2, s"expected an aggregation exchange, saw $stages stage(s) in $jobs job(s)")
  }

  test("hotKeys pigeonhole fast path (hotMin > nPart): one single-stage " +
    "job, no hot key missed under maximal spread") {
    // hot keys spread as evenly as possible over 4 partitions: count 10
    // over 4 partitions means some partition holds >= 3 — the floor-2
    // emit plus the hotMin - nPart driver threshold must recover every
    // truly-hot key (pigeonhole soundness)
    val hotRows = (0 until 10).flatMap(i => Seq("H1", "H2")) // 10 each, interleaved
    val coldRows = (0 until 20).map(c => s"cold_$c")
    val rows = hotRows ++ coldRows
    val small = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Tuple1(_)), 4)
        .map(t => org.apache.spark.sql.Row(t._1)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType))))
    assert(small.rdd.getNumPartitions == 4)
    val hotMin = 8L // > nPart = 4: pigeonhole regime
    var hot: Seq[Any] = null
    val (jobs, stages) = countJobsStages {
      hot = Salting.hotKeys(small, "key", hotMin)
    }
    assert(hot.toSet == Set("H1", "H2"),
      s"fast path must find every key with count >= hotMin, got $hot")
    // the fast path's whole contract: ONE job, ZERO exchanges (a single
    // mapPartitions + driver merge) — if this grows a stage, the exact
    // branch leaked into the pigeonhole regime
    assert(jobs == 1 && stages == 1, s"expected 1 job / 1 stage, got $jobs / $stages")
  }

  test("checkpointWithHotKeys: fused measurement equals hotKeys in both " +
    "regimes; hotSaltedJoinWith reproduces the self-measuring join") {
    val skewed = (1L to 1000L)
      .map(i => (if (i <= 900) 1L else i, i)).toDF("key", "row_id")
    val small = ((1 to 20).map(j => (1L, s"hot$j")) :+ ((950L, "cold")))
      .toDF("key", "label")
    // fast regime (hotMin > partitions after parallelize default)
    val (ck, hot) = Salting.checkpointWithHotKeys(small, "key", hotMin = 40L)
    assert(ck.collect().length == small.count(), "checkpoint lost rows")
    val viaSelf = Salting.hotSaltedJoin(skewed, small, "key",
      col("row_id"), r = 8, hotMin = 40L)
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val viaPre = Salting.hotSaltedJoinWith(skewed, ck, Seq("key"), hot,
      col("row_id"), r = 8)
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaPre == viaSelf)
    // exact regime (hotMin <= nPart): delegates to the aggregation path
    val (ck2, hot2) = Salting.checkpointWithHotKeys(small, "key", hotMin = 2L)
    assert(ck2.count() == small.count())
    val viaPre2 = Salting.hotSaltedJoinWith(skewed, ck2, Seq("key"), hot2,
      col("row_id"), r = 8)
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaPre2 == viaSelf)
  }
}
