package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Z-order layout: interleave arithmetic, and the skip-ability contract
  * measured on the files themselves (per-file min/max — what a parquet
  * footer-pruning reader consults). */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (hand-computed cases)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(a, b): bit i of a -> 2i, bit i of b -> 2i+1
    // (3, 5) = a:011 b:101 -> z bits: 100111 = 39
    assert(out == Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("zValue is injective on the bucket grid") {
    val n = 64
    val grid = (0 until n).flatMap(a => (0 until n).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val distinct = grid.select(Layout.zValue(col("a"), col("b"), bits = 6))
      .distinct().count()
    assert(distinct == n.toLong * n)
  }

  test("z-order bounds file overlap on BOTH dimensions; single-dim sort " +
    "degrades to full scans on the second") {
    // two roughly independent uniform dims of the lineitem fixture
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey")
    val lo = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    val (okLo, okHi) = (lo.getLong(0).toDouble, lo.getLong(1).toDouble)
    val (pkLo, pkHi) = (lo.getLong(2).toDouble, lo.getLong(3).toDouble)
    // a GRID-ALIGNED 1/8 slab ([2/8, 3/8) of the domain): Morton locality
    // is hierarchical, so aligned slabs are the clean contract — an
    // arbitrary slab decomposes into at most two aligned ones, doubling
    // the constant, never breaking the bound
    def slab(a: Double, b: Double): (Double, Double) =
      (a + (b - a) * 2 / 8, a + (b - a) * 3 / 8)
    val (q1Lo, q1Hi) = slab(okLo, okHi)
    val (q2Lo, q2Hi) = slab(pkLo, pkHi)

    val zDir = Files.createTempDirectory("graft-zorder").toString
    val sDir = Files.createTempDirectory("graft-sorted").toString
    Layout.writeZOrdered(li, "l_orderkey", "l_partkey", zDir, nFiles = 16)
    Layout.writeSorted(li, "l_orderkey", sDir, nFiles = 16)

    val zStats = Layout.fileStats(spark, zDir, Seq("l_orderkey", "l_partkey"))
      .localCheckpoint(true)
    val sStats = Layout.fileStats(spark, sDir, Seq("l_orderkey", "l_partkey"))
      .localCheckpoint(true)
    assert(zStats.count() == 16 && sStats.count() == 16)

    // layouts preserve the data
    assert(spark.read.parquet(zDir).count() == li.count())

    val zOk = Layout.overlapFraction(zStats, "l_orderkey", q1Lo, q1Hi)
    val zPk = Layout.overlapFraction(zStats, "l_partkey", q2Lo, q2Hi)
    val sOk = Layout.overlapFraction(sStats, "l_orderkey", q1Lo, q1Hi)
    val sPk = Layout.overlapFraction(sStats, "l_partkey", q2Lo, q2Hi)
    info(f"1/8-slab overlap: zorder ok=$zOk%.3f pk=$zPk%.3f | " +
      f"sorted ok=$sOk%.3f pk=$sPk%.3f")

    // single-dim sort: first dim prunes brilliantly, second reads ~all
    assert(sOk <= 0.25, s"sorted layout should prune its own dim ($sOk)")
    assert(sPk >= 0.9, s"fixture surprise: sorted layout prunes dim 2 ($sPk)")
    // z-order: BOTH dims bounded below the full scan — the contract
    assert(zOk <= 0.7, s"z-order dim-1 overlap too high ($zOk)")
    assert(zPk <= 0.7, s"z-order dim-2 overlap too high ($zPk)")
    // and the second dim strictly beats the sorted baseline's full scan
    assert(zPk < sPk, s"z-order dim-2 ($zPk) not better than sorted ($sPk)")
  }

  test("three-dim z-order: every dim keeps bounded overlap (shared " +
    "locality budget), second/third dims beat the sorted baseline") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val dir3 = Files.createTempDirectory("graft-z3").toString
    Layout.writeZOrderedN(li, cols, dir3, nFiles = 16)
    val stats = Layout.fileStats(spark, dir3, cols).localCheckpoint(true)
    assert(spark.read.parquet(dir3).count() == li.count())
    cols.foreach { c =>
      val r = li.agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
        .head()
      val (lo, hi) = (r.getDouble(0), r.getDouble(1))
      // aligned 1/8 slab; with 16 files over 3 dims each dim only gets
      // ~16^(1/3) files' worth of pruning — the shared-budget trade —
      // but every dim must still prune SOMETHING (< 1.0)
      val ov = Layout.overlapFraction(stats, c,
        lo + (hi - lo) * 2 / 8, lo + (hi - lo) * 3 / 8)
      info(f"$c overlap $ov%.3f")
      assert(ov <= 0.8, s"$c: 3-dim z-order pruned nothing ($ov)")
    }
  }

  test("quantile calibration keeps locality on a heavy-tailed dimension " +
    "where equi-width collapses") {
    // 90% of `b` mass in [0, 100), 10% five orders of magnitude out:
    // equi-width scaling maps ALL the dense mass to bucket 0, so the
    // interleave carries no b-information and dense-range queries read
    // everything; equi-depth cuts keep ~equal mass per bucket
    val rows = (0 until 4096).map { i =>
      val a = (i * 2654435761L) % 10000
      val b = if (i % 10 == 0) 1000000L + i * 997L else (i % 100).toLong
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val wDir = Files.createTempDirectory("graft-zw").toString
    val qDir = Files.createTempDirectory("graft-zq").toString
    Layout.writeZOrdered(df, "a", "b", wDir, nFiles = 16)
    Layout.writeZOrderedByQuantile(df, "a", "b", qDir, nFiles = 16)
    assert(spark.read.parquet(qDir).count() == rows.length)
    val wStats = Layout.fileStats(spark, wDir, Seq("a", "b"))
      .localCheckpoint(true)
    val qStats = Layout.fileStats(spark, qDir, Seq("a", "b"))
      .localCheckpoint(true)
    // dense-range query: b in [10, 20] — ~10% of the rows
    val wOv = Layout.overlapFraction(wStats, "b", 10, 20)
    val qOv = Layout.overlapFraction(qStats, "b", 10, 20)
    info(f"dense-slab overlap: equi-width $wOv%.3f equi-depth $qOv%.3f")
    assert(wOv >= 0.9,
      s"fixture surprise: equi-width pruned the heavy-tailed dim ($wOv)")
    assert(qOv <= 0.75, s"equi-depth overlap too high ($qOv)")
    assert(qOv < wOv)
  }

  test("z-order calibration fails LOUD on empty input and all-null dims, " +
    "naming the dimension") {
    val dir = Files.createTempDirectory("graft-zempty").toString
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val e1 = intercept[IllegalArgumentException] {
      Layout.writeZOrdered(empty, "a", "b", dir, nFiles = 4)
    }
    assert(e1.getMessage.contains("'a'"), e1.getMessage)
    val allNullB = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("a", "b")
    val e2 = intercept[IllegalArgumentException] {
      Layout.writeZOrdered(allNullB, "a", "b", dir, nFiles = 4)
    }
    assert(e2.getMessage.contains("'b'"), e2.getMessage)
  }
}
