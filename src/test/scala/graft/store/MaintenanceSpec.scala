package graft.store

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The maintenance plan/execute pair: health is a listing property
  * (zero parquet bytes read to decide), a worn store draws `compact`,
  * executing it clears the debt and the re-plan reads `none`, and every
  * misconfiguration fails loud instead of no-opping. */
class MaintenanceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshStore(nParts: Int, rows: Long = 40L): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-maint").toString
    (0L until rows).map(i => (i, s"payload-$i")).toDF("id", "payload")
      .repartition(nParts).write.mode("overwrite").parquet(dir)
    dir
  }

  private def wear(dir: String, chainDepths: Seq[Int]): Unit = {
    val parts = ParquetSurgery.dataFiles(dir).sortBy(_.toString)
    assert(parts.size >= chainDepths.size)
    parts.zip(chainDepths).foreach { case (p, d) =>
      if (d > 0) {
        val base = p.getFileName.toString.stripSuffix(".parquet")
        Files.move(p,
          p.getParent.resolve(base + (".forget" * d) + ".parquet"))
        ()
      }
    }
  }

  test("describe reads health from the listing: fresh store clean, " +
    "worn store's chains and fragments counted") {
    val dir = freshStore(4)
    val h0 = Maintenance.describe(dir)
    assert(h0.files == 4L && h0.chained == 0L && h0.maxChain == 0)
    assert(h0.smallFiles == 4L, "test-scale parts sit under the 8 MiB bar")
    wear(dir, Seq(1, 3, 0, 0))
    val h1 = Maintenance.describe(dir)
    assert(h1.files == 4L && h1.chained == 2L && h1.maxChain == 3)
  }

  test("plan names compact for chain debt, none for healthy; execute " +
    "clears it and the re-plan reads none") {
    import spark.implicits._
    val worn = freshStore(4)
    wear(worn, Seq(4, 0, 0, 0))
    val healthy = freshStore(4)
    val verdicts = Maintenance.plan(
      Seq("worn" -> worn, "healthy" -> healthy), maxChain = 4)
    assert(verdicts.map(v => v.name -> v.action) ==
      Seq("worn" -> "compact", "healthy" -> "none"))
    val done = Maintenance.execute(spark, verdicts)
    assert(done.map(_.action) == Seq("compact", "none"))
    val r = done.head.receipt.get
    assert(r.rows == 40L && r.chainedBefore == 1L)
    assert(done(1).receipt.isEmpty, "a none store must not be touched")
    // content identical, chain gone, verdict cleared
    assert(spark.read.parquet(worn).as[(Long, String)]
      .collect().sortBy(_._1).toSeq ==
      (0L until 40L).map(i => (i, s"payload-$i")))
    val re = Maintenance.plan(
      Seq("worn" -> worn, "healthy" -> healthy), maxChain = 4)
    assert(re.map(_.action) == Seq("none", "none"))
  }

  test("fragment rule: small files flag compact only past minFiles — " +
    "a fresh store of a few small parts is healthy") {
    val few = freshStore(4) // 4 tiny parts: under minFiles, stays none
    val many = freshStore(20) // 20 tiny parts: fragments dominate
    val vs = Maintenance.plan(Seq("few" -> few, "many" -> many),
      minFiles = 16L)
    assert(vs.map(v => v.name -> v.action) ==
      Seq("few" -> "none", "many" -> "compact"))
  }

  test("misconfigurations fail loud: duplicate store names, a typo'd " +
    "dir, an unknown action") {
    val dir = freshStore(2)
    val dup = intercept[IllegalArgumentException] {
      Maintenance.plan(Seq("s" -> dir, "s" -> dir))
    }
    assert(dup.getMessage.contains("s"))
    val typo = intercept[IllegalArgumentException] {
      Maintenance.plan(Seq("s" -> (dir + "-nope")))
    }
    assert(typo.getMessage.contains("-nope"))
    val unk = intercept[IllegalArgumentException] {
      Maintenance.execute(spark, Seq(
        Maintenance.Verdict("s", dir, "vacuum",
          Maintenance.describe(dir))))
    }
    assert(unk.getMessage.contains("vacuum"))
  }
}
