package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Packing
import graft.pipeline.Forget

/** In-place pack-stream deletion ([[PackForget]]): only files holding a
  * deleted member are rewritten, the mask is shape-stable (pad spans,
  * −1 identities, offsets byte-equal), retry is a no-op, the crash
  * window heals, and the cascade wires it end to end. */
class PackForgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Sep = 99L
  private val Pad = 100L

  private def listFiles(dir: String): Map[String, Long] = {
    val s = Files.walk(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
    } finally s.close()
  }

  /** 16 docs, 2 shards, budget 8 → several multi-member packs. */
  private def writePacks(dir: String): Unit = {
    val enc = (1L to 16L).map { d =>
      (d, Seq(d * 10, d * 10 + 1), d % 2, d)
    }.toDF("doc_id", "token_ids", "shard", "pos")
    Packing.packTokenStreams(enc, "shard", "pos", "token_ids",
      budget = 8L, sepId = Sep, docIdCol = Some("doc_id"))
      .repartitionByRange(4, col("pack_id"))
      .write.parquet(dir)
  }

  test("only the touched file is rewritten; mask is shape-stable; " +
    "retry is a no-op; fully-masked dataset reads held 0") {
    val dir = Files.createTempDirectory("graft-pforget").toString + "/packs"
    writePacks(dir)
    val before = listFiles(dir)
    val origAll = spark.read.parquet(dir)
      .select("pack_id", "token_ids", "n_tokens", "doc_offsets", "doc_ids")
      .orderBy("pack_id")
      .as[(Long, Seq[Long], Long, Seq[Long], Seq[Long])].collect()
    val victim = 5L
    val homePack = origAll.find(_._5.contains(victim)).get
    assert(PackForget.held(spark, dir, Seq(victim)) == 1L)

    val r = PackForget.forget(spark, dir, Seq(victim), Pad)
    assert(r.filesTouched == 1L && r.membersMasked == 1L, s"$r")
    assert(r.tokensMasked == 3L, s"$r") // 2 tokens + separator
    assert(PackForget.held(spark, dir, Seq(victim)) == 0L)

    // bystander FILES untouched (path + mtime)
    val after = listFiles(dir)
    assert(before.keySet.intersect(after.keySet).size == before.size - 1)
    before.keySet.intersect(after.keySet)
      .foreach(f => assert(before(f) == after(f), s"$f rewritten"))

    // shape-stable content: every untouched pack identical; the touched
    // pack differs ONLY in the masked span and identity slot
    val now = spark.read.parquet(dir)
      .select("pack_id", "token_ids", "n_tokens", "doc_offsets", "doc_ids")
      .orderBy("pack_id")
      .as[(Long, Seq[Long], Long, Seq[Long], Seq[Long])].collect()
    assert(now.length == origAll.length)
    origAll.zip(now).foreach { case (o, n) =>
      assert(o._1 == n._1 && o._3 == n._3 && o._4 == n._4,
        s"shape shifted in pack ${o._1}")
      if (o._5.contains(victim)) {
        val k = o._5.indexOf(victim)
        val s0 = o._4(k)
        val e0 = if (k + 1 < o._4.length) o._4(k + 1) else o._3
        n._2.zipWithIndex.foreach { case (t, i) =>
          if (i >= s0 && i < e0) assert(t == Pad, s"pos $i not padded")
          else assert(t == o._2(i), s"pos $i changed")
        }
        assert(n._5(k) == -1L && n._5.patch(k, Nil, 1) == o._5.patch(k, Nil, 1))
      } else assert(o == n, s"bystander pack ${o._1} changed")
    }
    assert(homePack._5.contains(victim)) // sanity: the victim was packed

    // retry: masked identities are gone from doc_ids → nothing touched
    assert(PackForget.forget(spark, dir, Seq(victim), Pad)
      == PackForget.Report(0L, 0L, 0L))

    // crash window: copy a rewritten file back next to its replacement;
    // the next call heals (stale original dropped)
    val replacement = after.keySet.diff(before.keySet).head
    assert(replacement.endsWith(".forget.parquet"))
    val stale = Paths.get(replacement.stripSuffix(".forget.parquet")
      + ".parquet")
    Files.copy(Paths.get(replacement), stale)
    PackForget.held(spark, dir, Seq(victim))
    assert(!Files.exists(stale) && Files.exists(Paths.get(replacement)))

    // missing dataset fails loud; over-ceiling fails loud
    val e1 = intercept[IllegalArgumentException] {
      PackForget.forget(spark, "/nonexistent/graft-pk", Seq(1L), Pad)
    }
    assert(e1.getMessage.contains("nothing to forget"))
  }

  test("cascade + verify wire the pack leg end to end") {
    val dir = Files.createTempDirectory("graft-pfcas").toString + "/packs"
    writePacks(dir)
    val dead = Seq(3L, 7L)
    val pre = Forget.verify(spark, dead,
      packs = Some(Forget.PackTarget(dir, Pad)))
    assert(pre == Seq(Forget.Receipt("pack_ids_held", 2L)), s"$pre")
    val receipts = Forget.cascade(spark, dead,
      packs = Some(Forget.PackTarget(dir, Pad)))
      .map(r => r.component -> r.removed).toMap
    assert(receipts("pack_members_masked") == 2L, s"$receipts")
    assert(receipts("pack_files") >= 1L, s"$receipts")
    val post = Forget.verify(spark, dead,
      packs = Some(Forget.PackTarget(dir, Pad)))
    assert(post == Seq(Forget.Receipt("pack_ids_held", 0L)), s"$post")
  }
}
