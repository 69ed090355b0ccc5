package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ingest.FakeFetcher
import graft.schema.Item
import graft.streaming.LivestreamRunner

/** S6-S8 store semantics: init, reference column asymmetry, tombstone
  * keep-old, snapshot atomicity, recrawl filter, livestream runner E2E. */
class ItemStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(): ItemStore = {
    val dir = Files.createTempDirectory("graft-store").toString
    val st = new ItemStore(spark, dir)
    st.init()
    st
  }

  private def normalized(rows: (Long, String)*) =
    Item.normalize(rows.toSeq.toDF("id", "body"), lit(100L))

  test("bucketed table reuse verifies location — stale/colliding entries fail loud") {
    val dirA = Files.createTempDirectory("graft-snap-loc-a")
    val dirB = Files.createTempDirectory("graft-snap-loc-b").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val snaps = new Snapshots(spark, dirA.toString, schema, Some(("id", 2)))
    snaps.init()
    assert(snaps.read().count() == 0) // legit reuse: location matches
    // simulate a colliding/stale catalog entry: same table name the store
    // derives (replicating tableFor's sha-256 naming), pointing elsewhere
    val norm = dirA.toAbsolutePath.normalize.toString
    val hex = java.security.MessageDigest.getInstance("SHA-256")
      .digest(norm.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    val tbl = s"graft_snap_${hex}_snap_0"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(
      s"""CREATE TABLE $tbl (id BIGINT) USING PARQUET
         |CLUSTERED BY (id) SORTED BY (id) INTO 2 BUCKETS
         |LOCATION '$dirB'""".stripMargin)
    val e = intercept[IllegalStateException] { snaps.read() }
    assert(e.getMessage.contains("location"), e.getMessage)
    // stale entry at the SAME location but a DIFFERENT bucket spec (store
    // externally recreated, old catalog entry surviving): Spark would
    // trust the stale bucket metadata over files hashed into another
    // bucket count — must fail loud, not silently mis-join
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(
      s"""CREATE TABLE $tbl (id BIGINT) USING PARQUET
         |CLUSTERED BY (id) SORTED BY (id) INTO 8 BUCKETS
         |LOCATION '${dirA.resolve("snap-0")}'""".stripMargin)
    val eb = intercept[IllegalStateException] { snaps.read() }
    assert(eb.getMessage.contains("bucket count"), eb.getMessage)
    // same location and bucket count, different schema: same refusal
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(
      s"""CREATE TABLE $tbl (id BIGINT, extra STRING) USING PARQUET
         |CLUSTERED BY (id) SORTED BY (id) INTO 2 BUCKETS
         |LOCATION '${dirA.resolve("snap-0")}'""".stripMargin)
    val es = intercept[IllegalStateException] { snaps.read() }
    assert(es.getMessage.contains("schema"), es.getMessage)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("init is idempotent and yields an empty typed table") {
    val st = freshStore()
    st.init()
    assert(st.current().count() == 0)
    // parquet round-trips drop non-null flags; compare names + types
    assert(st.current().schema.map(f => (f.name, f.dataType)) ==
      Item.schema.map(f => (f.name, f.dataType)))
    assert(st.latestId().isEmpty)
  }

  test("merge applies reference column asymmetry and refreshes retrieved") {
    val st = freshStore()
    st.merge(normalized(
      1L -> """{"id":1,"type":"story","by":"alice","time":50,"score":10,"title":"t1"}"""))
    // re-fetch: score now null in payload (keeps old), title present (overwrites? no: coalesce) —
    // descendants is an overwrite column and updates
    st.merge(Item.normalize(
      Seq(1L -> """{"id":1,"type":"story","time":50,"descendants":5}""").toDF("id", "body"),
      lit(200L)))
    val r = st.current().collect().head
    assert(r.getAs[String]("author") == "alice")   // coalesce kept
    assert(r.getAs[Long]("score") == 10L)          // coalesce kept
    assert(r.getAs[Long]("descendants") == 5L)     // overwrite applied
    assert(r.getAs[Long]("retrieved") == 200L)     // always refreshed
  }

  test("tombstone: deleted item never reaches merge, old row survives") {
    val st = freshStore()
    st.merge(normalized(1L -> """{"id":1,"type":"comment","by":"bob","time":60}"""))
    // re-crawl returns null body → normalize drops it → store unchanged
    st.merge(normalized(1L -> null))
    assert(st.current().count() == 1)
    assert(st.latestId().contains(1L))
  }

  test("recrawlIds applies the age window and maturity cutoff") {
    val st = freshStore()
    st.merge(normalized(
      // retrieved=100 for all; ages: 40 (young), 5_000_000 (old)
      1L -> """{"id":1,"type":"story","time":60}""",
      2L -> """{"id":2,"type":"story","time":-4999900}"""))
    val now = 100L + 15L * 86400L
    val young = st.recrawlIds(days = 1, onlyMature = false, now = now)
      .as[Long].collect().toSet
    assert(young == Set(1L)) // age 40s ≤ 1 day; id 2 far older
    val mature = st.recrawlIds(days = 1, onlyMature = true, now = 100L)
      .as[Long].collect().toSet
    assert(mature.isEmpty) // nothing is 14 days old yet relative to now=100
  }

  test("merge garbage-collects the superseded snapshot") {
    val dir = Files.createTempDirectory("graft-store-gc")
    val st = new ItemStore(spark, dir.toString)
    st.init()
    (1 to 4).foreach { i =>
      st.merge(normalized(
        i.toLong -> s"""{"id":$i,"type":"comment","time":${i * 10}}"""))
    }
    val snaps = Files.list(dir).iterator()
    val snapDirs = scala.jdk.CollectionConverters.IteratorHasAsScala(snaps)
      .asScala.map(_.getFileName.toString).filter(_.startsWith("snap-")).toSeq
    assert(snapDirs.size == 1, s"stale snapshots retained: $snapDirs")
    assert(st.current().count() == 4)
  }

  test("bucketed store: second merge plans with no Exchange on the store side") {
    import org.apache.spark.sql.execution.ExplainMode
    val dir = Files.createTempDirectory("graft-store-bucketed").toString
    val st = new ItemStore(spark, dir, buckets = 4)
    st.init()
    st.merge(normalized(
      1L -> """{"id":1,"type":"story","by":"a","time":10}""",
      2L -> """{"id":2,"type":"story","by":"b","time":20}"""))
    // the second merge joins the BUCKETED store snapshot against the batch:
    // the store side must scan bucketed (no Exchange above it); only the
    // incoming batch may shuffle
    val batch2 = normalized(3L -> """{"id":3,"type":"story","by":"c","time":30}""")
    val merged = graft.operators.Merge.upsert(st.current(), batch2, "id",
      st.coalesceCols, st.overwriteCols, precedenceCols = Seq("retrieved"))
    val plan = merged.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("Bucketed: true"), s"store scan not bucketed:\n$plan")
    // exactly the batch-side Exchange: 0 would mean the counter went
    // vacuous (a full-outer equi-join must shuffle the unbucketed batch),
    // 2+ would mean the store side shuffled too
    val exchanges = graft.PlanChecks.shuffleExchanges(plan)
    assert(exchanges == 1, s"expected exactly the batch-side Exchange:\n$plan")
    // and the store semantics are unchanged through the bucketed layout
    st.merge(batch2)
    assert(st.current().count() == 3)
    assert(st.latestId().contains(3L))
    // a fresh-session analog: drop the catalog entry, read() must re-register
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_snap_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    assert(st.current().count() == 3)
  }

  test("bucket spec mismatch fails loud instead of corrupting joins") {
    val dir = Files.createTempDirectory("graft-store-spec").toString
    val st4 = new ItemStore(spark, dir, buckets = 4)
    st4.init()
    st4.merge(normalized(1L -> """{"id":1,"type":"story","time":10}"""))
    // different bucket count: Spark would trust the declared bucketing and
    // silently mis-join files hashed into 4 buckets — must throw instead
    val e8 = intercept[IllegalStateException] {
      new ItemStore(spark, dir, buckets = 8).current().count()
    }
    assert(e8.getMessage.contains("bucket"))
    // unbucketed open of a bucketed store: same hazard, same refusal
    intercept[IllegalStateException] { new ItemStore(spark, dir).current() }
    // bucketed open of an unbucketed store: files are not bucketed at all
    val plainDir = Files.createTempDirectory("graft-store-plain").toString
    val plain = new ItemStore(spark, plainDir)
    plain.init()
    intercept[IllegalStateException] {
      new ItemStore(spark, plainDir, buckets = 4).current()
    }
    // the matching spec still reads fine
    assert(st4.current().count() == 1)
  }

  test("init sweeps orphan directories left by a crashed write") {
    val dir = Files.createTempDirectory("graft-store-orphan")
    val st = new ItemStore(spark, dir.toString)
    st.init()
    st.merge(normalized(1L -> """{"id":1,"type":"story","time":10}"""))
    // simulate a crash between snapshot write and manifest commit
    val orphanSnap = dir.resolve("snap-99999")
    val orphanDelta = dir.resolve("delta-99999")
    Files.createDirectories(orphanSnap)
    Files.write(orphanSnap.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    Files.createDirectories(orphanDelta)
    new ItemStore(spark, dir.toString).init()
    assert(!Files.exists(orphanSnap) && !Files.exists(orphanDelta))
    assert(st.current().count() == 1) // live snapshot untouched
  }

  test("livestream runner on a bucketed store keeps merges Exchange-free") {
    import org.apache.spark.sql.execution.ExplainMode
    val dir = Files.createTempDirectory("graft-store-ls-bucketed").toString
    val st = new ItemStore(spark, dir, buckets = 4)
    val items = (1L to 9L).map(i =>
      i -> s"""{"id":$i,"type":"comment","by":"u$i","time":${i * 10}}""").toMap
    // commitPeriod 2 → five micro-batch merges, five snapshot swaps
    val n = LivestreamRunner.run(spark, st, new FakeFetcher(items, maxId = 9),
      maxItems = 9, commitPeriod = 2, sleep = _ => (), now = () => 500L)
    assert(n == 9)
    assert(st.current().count() == 9)
    assert(st.latestId().contains(9L))
    // superseded generations must not accumulate in the catalog: exactly one
    // live snapshot table for this store root after five swaps
    val prefix = "graft_snap_" + java.security.MessageDigest
      .getInstance("SHA-256")
      .digest(java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    val tables = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
    assert(tables.length == 1, s"stale snapshot tables: ${tables.mkString(",")}")
    // and the NEXT merge, five generations in, still scans the store
    // bucketed with at most the batch-side Exchange
    val batch = normalized(10L -> """{"id":10,"type":"comment","time":100}""")
    val merged = graft.operators.Merge.upsert(st.current(), batch, "id",
      st.coalesceCols, st.overwriteCols, precedenceCols = Seq("retrieved"))
    val plan = merged.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("Bucketed: true"), s"store scan not bucketed:\n$plan")
    assert(graft.PlanChecks.shuffleExchanges(plan) == 1,
      s"expected exactly the batch-side Exchange:\n$plan")
    // resume + replay through the runner path stays idempotent on buckets
    LivestreamRunner.run(spark, st,
      new FakeFetcher(items + (10L ->
        """{"id":10,"type":"comment","by":"u10","time":100}"""), maxId = 10),
      maxItems = 1, commitPeriod = 2, sleep = _ => (), now = () => 600L)
    assert(st.current().count() == 10)
    assert(st.latestId().contains(10L))
  }

  private def dirBytes(p: java.nio.file.Path): Long = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(p)
    try s.iterator().asScala.filter(Files.isRegularFile(_))
      .map(Files.size).sum
    finally s.close()
  }

  test("delta-mode merge writes O(batch) per commit, not O(store)") {
    val dir = Files.createTempDirectory("graft-store-delta")
    val st = new ItemStore(spark, dir.toString, compactEvery = 100)
    st.init()
    // seed a "large" store state: one 60-row batch
    st.merge(Item.normalize((1L to 60L).map(i =>
      i -> s"""{"id":$i,"type":"comment","by":"u$i","time":${i * 10}}""")
      .toDF("id", "body"), lit(100L)))
    def entries() = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(d => d.startsWith("snap-") || d.startsWith("delta-")).toSet
      finally s.close()
    }
    val before = entries()
    val baseBytes = before.map(d => dirBytes(dir.resolve(d))).sum
    // five 1-row merges: each must add EXACTLY one delta directory and
    // leave every pre-existing directory byte-identical (no rewrite)
    (61L to 65L).foreach { i =>
      val snapshot = entries()
      val snapshotBytes = snapshot.map(d => d -> dirBytes(dir.resolve(d))).toMap
      st.merge(normalized(i -> s"""{"id":$i,"type":"comment","time":${i * 10}}"""))
      val now = entries()
      val added = now -- snapshot
      assert(added.size == 1 && added.head.startsWith("delta-"),
        s"expected one new delta dir, got $added")
      snapshot.foreach { d =>
        assert(dirBytes(dir.resolve(d)) == snapshotBytes(d),
          s"pre-existing dir $d was rewritten")
      }
      // a 1-row delta must be far smaller than the accumulated base
      assert(dirBytes(dir.resolve(added.head)) < baseBytes,
        "delta write is not O(batch)")
    }
    assert(st.current().count() == 65)
    assert(st.latestId().contains(65L))
  }

  test("delta-mode store matches replace-mode semantics exactly") {
    val deltaSt = new ItemStore(spark,
      Files.createTempDirectory("graft-store-dsem").toString, compactEvery = 100)
    val fullSt = freshStore()
    deltaSt.init()
    val batches = Seq(
      Seq(1L -> """{"id":1,"type":"story","by":"alice","time":50,"score":10,"title":"t1"}""",
        2L -> """{"id":2,"type":"comment","by":"bob","time":60,"text":"hi"}"""),
      // id 1 re-crawled: score/author null (coalesce keeps), descendants
      // appears (overwrite applies); id 3 new
      Seq(1L -> """{"id":1,"type":"story","time":50,"descendants":5}""",
        3L -> """{"id":3,"type":"comment","by":"eve","time":70}"""),
      // id 1 again: author returns with a NEW value (latest non-null wins),
      // descendants null-out is impossible (overwrite via absent field →
      // null overwrites!) — exactly the asymmetry worth pinning across 3 deltas
      Seq(1L -> """{"id":1,"type":"story","by":"alice2","time":50}"""))
    batches.zipWithIndex.foreach { case (b, i) =>
      val n = Item.normalize(b.toDF("id", "body"), lit(100L + i))
      deltaSt.merge(n); fullSt.merge(n)
    }
    def asMap(st: ItemStore) = st.current().collect()
      .map(r => r.getAs[Long]("id") -> r.toSeq).toMap
    assert(asMap(deltaSt) == asMap(fullSt))
    // replay the last batch: both stay idempotent and equal
    val replay = Item.normalize(batches.last.toDF("id", "body"), lit(102L))
    deltaSt.merge(replay); fullSt.merge(replay)
    assert(asMap(deltaSt) == asMap(fullSt))
  }

  test("delta log compacts to one snapshot at compactEvery, preserving rows") {
    val dir = Files.createTempDirectory("graft-store-compact")
    val st = new ItemStore(spark, dir.toString, compactEvery = 3)
    st.init()
    (1 to 7).foreach { i =>
      st.merge(normalized(
        i.toLong -> s"""{"id":$i,"type":"comment","time":${i * 10}}"""))
    }
    // 7 merges at compactEvery=3: compactions at merge 3 and 6, then one
    // trailing delta — manifest holds one base + one delta, old dirs GC'd
    import scala.jdk.CollectionConverters._
    val listing = Files.list(dir)
    val dirs = try listing.iterator().asScala.map(_.getFileName.toString)
      .filter(d => d.startsWith("snap-") || d.startsWith("delta-")).toList
    finally listing.close()
    assert(dirs.count(_.startsWith("snap-")) == 1, s"stale bases: $dirs")
    assert(dirs.count(_.startsWith("delta-")) == 1, s"deltas not GC'd: $dirs")
    assert(st.current().count() == 7)
    assert(st.latestId().contains(7L))
  }

  test("bucketed delta store: merge-on-read keeps the base scan Exchange-free") {
    import org.apache.spark.sql.execution.ExplainMode
    val dir = Files.createTempDirectory("graft-store-bdelta").toString
    val st = new ItemStore(spark, dir, buckets = 4, compactEvery = 100)
    st.init()
    st.merge(normalized(
      1L -> """{"id":1,"type":"story","by":"a","time":10}""",
      2L -> """{"id":2,"type":"story","by":"b","time":20}"""))
    st.merge(normalized(3L -> """{"id":3,"type":"story","by":"c","time":30}"""))
    // current() = upsert(bucketed base, folded deltas): the base must scan
    // bucketed with no Exchange above it; only the (tiny) delta fold and
    // its join alignment may shuffle
    val plan = st.current().queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("Bucketed: true"), s"base scan not bucketed:\n$plan")
    assert(graft.PlanChecks.shuffleExchanges(plan) <= 2,
      s"store side shuffled:\n$plan")
    assert(st.current().count() == 3)
    assert(st.latestId().contains(3L))
  }

  test("livestream runner over a delta-log store drains and compacts") {
    val dir = Files.createTempDirectory("graft-store-ls-delta").toString
    val st = new ItemStore(spark, dir, compactEvery = 3)
    val items = (1L to 9L).map(i =>
      i -> s"""{"id":$i,"type":"comment","by":"u$i","time":${i * 10}}""").toMap
    val n = LivestreamRunner.run(spark, st, new FakeFetcher(items, maxId = 9),
      maxItems = 9, commitPeriod = 2, sleep = _ => (), now = () => 500L)
    assert(n == 9)
    assert(st.current().count() == 9)
    assert(st.latestId().contains(9L))
    // resume across a fresh instance (manifest is the durable truth)
    val st2 = new ItemStore(spark, dir, compactEvery = 3)
    LivestreamRunner.run(spark, st2,
      new FakeFetcher(items + (10L ->
        """{"id":10,"type":"comment","by":"u10","time":100}"""), maxId = 10),
      maxItems = 1, commitPeriod = 2, sleep = _ => (), now = () => 600L)
    assert(st2.current().count() == 10)
  }

  test("livestream runner drains batches into the store idempotently") {
    val st = freshStore()
    val items = (1L to 7L).map(i =>
      i -> s"""{"id":$i,"type":"comment","by":"u$i","time":${i * 10}}""").toMap
    val f = new FakeFetcher(items, maxId = 7)
    val n = LivestreamRunner.run(spark, st, f, maxItems = 7, commitPeriod = 3,
      sleep = _ => (), now = () => 500L)
    assert(n == 7)
    assert(st.current().count() == 7)
    assert(st.latestId().contains(7L))
    // resume: no new items → runner picks up from latest+1; publish 8
    val f2 = new FakeFetcher(items + (8L ->
      """{"id":8,"type":"comment","by":"u8","time":80}"""), maxId = 8)
    LivestreamRunner.run(spark, st, f2, maxItems = 1, commitPeriod = 3,
      sleep = _ => (), now = () => 600L)
    assert(st.current().count() == 8)
  }
}
