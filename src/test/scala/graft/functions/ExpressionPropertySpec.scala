package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property tests (ScalaCheck generators sampled under fixed
  * seeds, like MergePropertySpec): the one-pass signature expressions must
  * agree with compositions of the simpler primitives on ARBITRARY unicode
  * input — the Spark parity specs cover the real (ASCII) corpus; these
  * cover surrogate pairs, exotic whitespace, empty and blank strings. */
class ExpressionPropertySpec extends AnyFunSuite {

  // plain words plus unicode incl. an astral-plane emoji (surrogate pair)
  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.nonEmptyListOf(Gen.oneOf("λ", "ß", "中", "😀", "é", "Ω"))
      .map(_.mkString))
  private val textGen: Gen[String] = for {
    words <- Gen.listOf(wordGen)
    sep <- Gen.oneOf(" ", "  ", "\t", "\n", " \n ")
  } yield words.mkString(sep)

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(i.toLong))) ++ Seq(
      "", "   ", "one two", "a b c a b c a b c",
      // leading/trailing non-space whitespace: Java trim/split semantics
      // diverge from Spark/DuckDB here — these pin the jvmTokens fix
      "foo bar\n", "\tfoo bar baz", "a b c \n", " x\ty z\n\n", "\n", "\t\t")

  private def strings(a: ArrayData): Seq[String] =
    (0 until a.numElements()).map(i =>
      a.get(i, org.apache.spark.sql.types.StringType)
        .asInstanceOf[UTF8String].toString)

  test("minhash_sig == min over rehashed polyhash of each shingle") {
    samples(300).foreach { s =>
      val grams = strings(WordShingles.compute(s))
      val expected =
        if (grams.isEmpty) null
        else {
          val hs = grams.map(PolyHash.hash)
          (0 until MinHashSig.K).map { k =>
            hs.map(h =>
              (TextAnalysis.MinhashA(k) * h + TextAnalysis.MinhashB(k)) % TextAnalysis.P).min
          }
        }
      val got = Option(MinHashSig.compute(s))
        .map(a => (0 until MinHashSig.K).map(a.getLong)).orNull
      assert(got == expected, s"minhash mismatch on: ${s.take(60)}")
    }
  }

  test("simhash_sig == majority vote over per-instance affine-parity bits") {
    samples(300).foreach { s =>
      val toks = TextAnalysis.jvmTokens(s).toSeq // Spark-semantics tokenizer
      val hs = toks.map(PolyHash.hash)
      val total = hs.length
      var expected = 0L
      (0 until 64).foreach { j =>
        val votes = hs.map(h =>
          ((TextAnalysis.HplaneA(j) * h + TextAnalysis.HplaneB(j))
            % TextAnalysis.P) & 1L)
        if (votes.sum * 2 > total) expected |= 1L << j
      }
      assert(SimHashSig.compute(s) == expected, s"simhash mismatch on: ${s.take(60)}")
    }
  }

  test("word_shingle_set == first-occurrence distinct of word_shingles") {
    samples(300).foreach { s =>
      assert(strings(WordShingleSet.compute(s)) ==
        strings(WordShingles.compute(s)).distinct)
    }
  }

  test("lang_scores fields == StopHits per language, one pass") {
    samples(200).foreach { s =>
      val row = LangScores.compute(s)
      TextAnalysis.Stopwords.zipWithIndex.foreach { case ((_, words), k) =>
        val set = new java.util.HashSet[String]()
        words.foreach(set.add)
        assert(row.getLong(k) == StopHits.compute(s, set),
          s"lang_scores mismatch (lang #$k) on: ${s.take(60)}")
      }
    }
  }

  test("header parsers never throw on arbitrary bytes") {
    val byteGen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    (0 until 500).foreach { i =>
      byteGen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { bytes =>
        graft.multimodal.ImageHeader.parse(bytes) // must return, never throw
      }
    }
    // adversarial almost-valid prefixes
    Seq("RIFFxxxxWAVE", "BM", "GIF89a").foreach { p =>
      graft.multimodal.ImageHeader.parse(
        p.getBytes("ASCII") ++ Array.fill(20)(0x41.toByte))
    }
    graft.multimodal.ImageHeader.parse(
      Array(0xff, 0xd8, 0xff, 0x01, 0x00, 0x00).map(_.toByte)) // zero-len marker
    // crafted WAV chunk length near Int.MaxValue: must return None, not
    // wrap the cursor negative and crash
    val evil = "RIFF".getBytes("ASCII") ++ Array.fill(4)(0.toByte) ++
      "WAVE".getBytes("ASCII") ++ "junk".getBytes("ASCII") ++
      Array(0xf0, 0xff, 0xff, 0x7f).map(_.toByte) ++ Array.fill(30)(0x41.toByte)
    assert(graft.multimodal.ImageHeader.parse(evil).isEmpty)
    ()
  }
}
