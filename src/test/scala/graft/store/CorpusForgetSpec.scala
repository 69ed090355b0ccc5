package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** O(touched files) corpus deletion ([[CorpusForget]]): only files
  * containing deleted rows are rewritten (byte-identical bystanders),
  * a file whose every row died disappears, the surviving content equals
  * the filtered corpus, and the crash window (old + replacement both
  * present) HEALS on the next call. */
class CorpusForgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

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

  test("only the touched file is rewritten; empty files vanish; content " +
    "equals the filtered corpus; the crash window heals") {
    val dir = Files.createTempDirectory("graft-cforget").toString + "/data"
    // 4 range-partitioned files over ids 0..99 (id-clustered layout —
    // the regime the touched-file count claim is about)
    spark.range(0, 100).select(col("id"), (col("id") * 7).as("v"))
      .repartitionByRange(4, col("id"))
      .write.parquet(dir)
    val before = listFiles(dir)
    assert(before.size == 4)

    // delete three ids from ONE file's range
    assert(CorpusForget.held(spark, dir, "id", Seq(10L, 11L, 12L)) == 3L)
    val r = CorpusForget.forget(spark, dir, "id", Seq(10L, 11L, 12L))
    assert(r == CorpusForget.Report(1L, 3L), s"$r")
    assert(CorpusForget.held(spark, dir, "id", Seq(10L, 11L, 12L)) == 0L)
    val after = listFiles(dir)
    // three bystander files byte-untouched (same path, same mtime); the
    // touched one replaced by its deterministic .forget twin
    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.size == 3)
    untouched.foreach(f => assert(before(f) == after(f), s"$f rewritten"))
    assert(after.keySet.diff(before.keySet).toSeq match {
      case Seq(nf) => nf.endsWith(".forget.parquet")
      case other => fail(s"unexpected new files: $other")
    })
    val got = spark.read.parquet(dir).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(got == (0L until 100L).filterNot(Seq(10L, 11L, 12L).contains)
      .map(i => (i, i * 7)))

    // crash window: resurrect the original file next to its replacement
    val touchedOld = before.keySet.diff(after.keySet).head
    val replacement = after.keySet.diff(before.keySet).head
    // rebuild the "old" file: its full original range 0..24
    val tmp = Files.createTempDirectory("graft-cforget-old").toString
    spark.range(0, 25).select(col("id"), (col("id") * 7).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(
      _.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(part, Paths.get(touchedOld))
    assert(spark.read.parquet(dir).count() == 122) // duplicate window
    // any later call heals first: the stale original is dropped
    assert(CorpusForget.held(spark, dir, "id", Seq(10L)) == 0L)
    assert(spark.read.parquet(dir).count() == 97)
    assert(!Files.exists(Paths.get(touchedOld)) &&
      Files.exists(Paths.get(replacement)))

    // a file whose every row dies disappears without a replacement
    val r2 = CorpusForget.forget(spark, dir, "id", (25L until 50L).toSeq)
    assert(r2.filesTouched == 1L && r2.rowsRemoved == 25L, s"$r2")
    assert(listFiles(dir).size == 3)
    assert(spark.read.parquet(dir).count() == 72)

    // idempotent retry: nothing left to touch
    assert(CorpusForget.forget(spark, dir, "id", Seq(10L, 30L))
      == CorpusForget.Report(0L, 0L))
    // missing dataset fails loud
    val e = intercept[IllegalArgumentException] {
      CorpusForget.forget(spark, "/nonexistent/graft-x", "id", Seq(1L))
    }
    assert(e.getMessage.contains("nothing to forget"))

    // BROADCAST probe shape (list past MaxInListIds): same semantics —
    // the list carries two present ids among thousands of absent ones
    val bigList = Seq(60L, 61L) ++
      (1000000L until (1000000L + ClaimRetraction.MaxInListIds + 7))
    assert(bigList.size > ClaimRetraction.MaxInListIds)
    assert(CorpusForget.held(spark, dir, "id", bigList) == 2L)
    val r3 = CorpusForget.forget(spark, dir, "id", bigList)
    assert(r3.rowsRemoved == 2L, s"$r3")
    assert(CorpusForget.held(spark, dir, "id", bigList) == 0L)

    // FULLY-FORGOTTEN corpus: kill every remaining row — readers must
    // report 0 (not throw on schema inference over a bare _SUCCESS) and
    // a retry is a clean no-op
    val everything = (0L until 100L).toSeq
    CorpusForget.forget(spark, dir, "id", everything)
    assert(listFiles(dir).isEmpty)
    assert(CorpusForget.held(spark, dir, "id", Seq(5L)) == 0L)
    assert(CorpusForget.forget(spark, dir, "id", Seq(5L))
      == CorpusForget.Report(0L, 0L))

    // no staging residue anywhere under the dataset
    val stray = {
      val s = Files.walk(Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith(".graft-forget-stage-"))
          .toList
      } finally s.close()
    }
    assert(stray.isEmpty, s"$stray")
  }

  test("probe shapes agree: among/excluding give identical rows via " +
    "in-list and broadcast join") {
    val df = spark.range(0, 500).select(col("id"), (col("id") % 7).as("v"))
    val smallList = Seq(3L, 141L, 499L, 9999L)
    val bigList = smallList ++
      (2000000L until (2000000L + ClaimRetraction.MaxInListIds)).toSeq
    val amongSmall = ClaimRetraction.among(df, col("id"), smallList)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val amongBig = ClaimRetraction.among(df, col("id"), bigList)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(amongSmall == Seq((3L, 3L), (141L, 1L), (499L, 2L)))
    assert(amongBig == amongSmall)
    val exSmall = ClaimRetraction.excluding(df, col("id"), smallList)
      .count()
    val exBig = ClaimRetraction.excluding(df, col("id"), bigList).count()
    assert(exSmall == 497L && exBig == 497L)
  }
}
