package graft.store

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Bpe, Unigram}

/** The denomination stamp: a token dataset's ids are tied to the exact
  * tokenizer artifact that minted them — stamp/read/require roundtrip,
  * loud mismatches, invisibility to the data scan, survival through
  * compaction, and hash sensitivity to every model field. */
class DenominationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hash64 is deterministic and part-boundary sensitive") {
    assert(Denomination.hash64(Seq("ab", "c")) ==
      Denomination.hash64(Seq("ab", "c")))
    assert(Denomination.hash64(Seq("ab", "c")) !=
      Denomination.hash64(Seq("a", "bc")))
    assert(Denomination.hash64(Seq("ab")) !=
      Denomination.hash64(Seq("ab", "")))
  }

  test("stamp/read/require roundtrip; restamp overwrites; mismatches " +
    "and missing stamps fail loud naming the remedy") {
    val dir = Files.createTempDirectory("graft-denom").toString
    val missing = intercept[IllegalArgumentException] {
      Denomination.require(dir, "unigram", 42L)
    }
    assert(missing.getMessage.contains("no denomination stamp"))
    Denomination.stamp(dir, "unigram", 42L)
    assert(Denomination.read(dir) == Some(("unigram", 42L)))
    Denomination.require(dir, "unigram", 42L) // passes
    val wrongAlgo = intercept[IllegalArgumentException] {
      Denomination.require(dir, "bpe", 42L)
    }
    assert(wrongAlgo.getMessage.contains("different tokenizer family"))
    val stale = intercept[IllegalArgumentException] {
      Denomination.require(dir, "unigram", 43L)
    }
    assert(stale.getMessage.contains("retrained"))
    Denomination.stamp(dir, "unigram", 43L) // the re-encode restamps
    Denomination.require(dir, "unigram", 43L)
  }

  test("the stamp is invisible to the data scan and survives " +
    "compaction") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-denom-data").toString
    (0L until 20L).map(i => (i, s"t$i")).toDF("id", "tok")
      .repartition(2).write.mode("overwrite").parquet(dir)
    Denomination.stamp(dir, "unigram", 7L)
    assert(spark.read.parquet(dir).count() == 20L)
    assert(ParquetSurgery.dataFiles(dir)
      .forall(_.getFileName.toString != Denomination.FileName))
    ParquetSurgery.compact(spark, dir)
    assert(Denomination.read(dir) == Some(("unigram", 7L)),
      "compaction must preserve the denomination stamp")
    assert(spark.read.parquet(dir).count() == 20L)
  }

  test("modelHash / tokenizerHash move with every field") {
    val m = Unigram.Model(Vector("a", "b", "ab"), Vector(3L, 2L, 1L),
      Vector(10L, 11L, 12L), Bpe.PreTok.Whitespace)
    assert(Unigram.modelHash(m) == Unigram.modelHash(m))
    assert(Unigram.modelHash(m) !=
      Unigram.modelHash(m.copy(pieces = Vector("a", "b", "ba"))))
    assert(Unigram.modelHash(m) !=
      Unigram.modelHash(m.copy(counts = Vector(3L, 2L, 2L))))
    assert(Unigram.modelHash(m) !=
      Unigram.modelHash(m.copy(costs = Vector(10L, 11L, 13L))))
    assert(Unigram.modelHash(m) !=
      Unigram.modelHash(m.copy(preTok = Bpe.PreTok.CpClass)))
    val h = Bpe.tokenizerHash(Seq(("a", "b")), Seq("a", "b", "ab"))
    assert(h == Bpe.tokenizerHash(Seq(("a", "b")), Seq("a", "b", "ab")))
    assert(h != Bpe.tokenizerHash(Seq(("b", "a")), Seq("a", "b", "ab")))
    assert(h != Bpe.tokenizerHash(Seq(("a", "b")), Seq("a", "b", "ba")))
    assert(h != Bpe.tokenizerHash(Seq(("a", "b")), Seq("a", "b", "ab"),
      Bpe.PreTok.CpClass))
    // the two families can never collide by construction (algo tag)
    assert(Unigram.modelHash(m) != Bpe.tokenizerHash(Seq.empty,
      m.pieces))
  }

  test("a worn stamp file with junk lines still parses the valid " +
    "pairs; unparseable stamps read as None") {
    val dir = Files.createTempDirectory("graft-denom-junk").toString
    Files.write(Paths.get(dir, Denomination.FileName),
      "algo=bpe\nnote ignored\nhash=9\n".getBytes("UTF-8"))
    assert(Denomination.read(dir) == Some(("bpe", 9L)))
    Files.write(Paths.get(dir, Denomination.FileName),
      "algo=bpe\nhash=not-a-number\n".getBytes("UTF-8"))
    assert(Denomination.read(dir).isEmpty)
  }
}
