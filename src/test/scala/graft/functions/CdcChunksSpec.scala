package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

/** Content-defined chunking ([[CdcChunks]] / [[Dedup.cdcChunks]]): the
  * boundary rule matches a brute-force replay, chunks tile the
  * document exactly, an INSERTION invalidates only the chunk it lands
  * in (the shift-robustness the fixed grids lack), and the dup-stats
  * rollup counts cross-document chunks exactly. */
class CdcChunksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 8
  private val B = 5

  /** Brute-force reference: boundary after token e (1-based) iff the
    * joined window [e-W+1, e] hashes ≡ 0 mod 2^B. */
  private def refChunks(text: String): Seq[(Int, Int, Long)] = {
    val toks = TextAnalysis.jvmTokens(text)
    val ends = (W to toks.length).filter { e =>
      PolyHash.hash(toks.slice(e - W, e).mkString(" ")) % (1L << B) == 0L
    }
    val bounds = (ends :+ toks.length).distinct
    bounds.zip(0 +: bounds.dropRight(1)).map { case (e, s) =>
      (s + 1, e - s, PolyHash.wideHash(toks.slice(s, e).mkString(" ")))
    }
  }

  private def opChunks(text: String): Seq[(Int, Int, Long)] = {
    val arr = CdcChunks.compute(text, W, B)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getLong(2))
    }
  }

  // a corpus-looking passage, long enough for several boundaries
  private val base = (1 to 400)
    .map(i => s"w${i % 37}x${(i * 31) % 101}").mkString(" ")

  test("chunks tile the document and match the brute-force boundary " +
    "rule bitwise") {
    val got = opChunks(base)
    assert(got == refChunks(base), "boundary/hash divergence")
    assert(got.length > 3, s"fixture produced ${got.length} chunks — " +
      "too few to exercise anything")
    // tiling: starts/lengths cover [1, L] without gaps or overlaps
    val toks = TextAnalysis.jvmTokens(base)
    assert(got.head._1 == 1 && got.map(_._2).sum == toks.length)
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._1 == a._1 + a._2, s"gap/overlap at $a -> $b")
    case _ => ()
    }
  }

  test("an insertion invalidates only the chunks it touches: every " +
    "other chunk keeps its identity (the fixed grids lose them all)") {
    val toks = TextAnalysis.jvmTokens(base)
    val mid = toks.length / 2
    val edited = (toks.take(mid) ++ Seq("INSERTED") ++ toks.drop(mid))
      .mkString(" ")
    val a = opChunks(base).map(_._3)
    val b = opChunks(edited).map(_._3)
    val shared = a.toSet.intersect(b.toSet).size
    // all but the edited chunk (and possibly its immediate neighbor,
    // if the insertion lands within W tokens of a boundary) survive
    assert(shared >= a.length - 2,
      s"CDC lost ${a.length - shared} of ${a.length} chunks to one edit")
    // the contrast: FIXED 32-token chunks lose every chunk after the
    // edit point
    def fixedHashes(ts: Seq[String]): Seq[Long] =
      ts.grouped(32).map(g => PolyHash.wideHash(g.mkString(" "))).toSeq
    val fa = fixedHashes(toks)
    val fb = fixedHashes(TextAnalysis.jvmTokens(edited))
    val fixedShared = fa.toSet.intersect(fb.toSet).size
    assert(fixedShared < shared,
      s"fixed grid kept $fixedShared >= CDC's $shared — fixture too easy")
  }

  test("rolling boundary hash is bitwise-identical to the per-position " +
    "recompute on random corpora, across window widths and masks") {
    def render(arr: org.apache.spark.sql.catalyst.util.ArrayData)
        : Seq[(Int, Int, Long)] =
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 3)
        (r.getInt(0), r.getInt(1), r.getLong(2))
      }
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "bb", "ccc", "xy1", "-", "世界", "😀", "e",
      "tok", "q9", "", "zz world")
    val corpora = (1 to 40).map { _ =>
      (0 until (1 + rnd.nextInt(600)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString(" ")
    } ++ Seq("", "one", "a  b\t c\n", base)
    for (text <- corpora; w <- Seq(1, 2, 3, 8, 13); b <- Seq(1, 4, 5)) {
      val fast = render(CdcChunks.compute(text, w, b))
      val slow = render(CdcChunks.computeReference(text, w, b))
      assert(fast == slow, s"divergence at w=$w b=$b on '${text.take(40)}'")
    }
  }

  test("short and empty documents are one whole-document chunk") {
    assert(opChunks("only three tokens") ==
      Seq((1, 3, PolyHash.wideHash("only three tokens"))))
    assert(opChunks("") == Seq((1, 1, PolyHash.wideHash(""))))
  }

  test("cdcDupStats: cross-document chunks count exactly; a unique doc " +
    "reads zero dup") {
    val shared = base // appears in docs 1 AND 2 (doc 2 shifted by an edit)
    val docs = Seq(
      (1L, shared),
      (2L, "PREFIXTOKEN " + shared),
      (3L, (1 to 120).map(i => s"unique$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.cdcDupStats(docs, "doc_id", "text", W, B)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // doc 3 shares nothing
    assert(out(3L)._3 == 0L && out(3L)._5 == 0L, s"${out(3L)}")
    // docs 1 and 2 share every chunk the edit didn't touch: most of
    // their tokens are dup (the shifted-boilerplate signal)
    assert(out(1L)._3 >= out(1L)._1 - 2, s"${out(1L)}")
    assert(out(1L)._5 > 800000L, s"doc 1 dup_ppm ${out(1L)._5}")
    assert(out(2L)._3 >= 1L && out(2L)._4 > 0L, s"${out(2L)}")
  }

  test("cdcPairs: star edges under the pre-collapse (m carriers cost " +
    "m-1 edges), partial overlap pairs at jaccard ~ 0, keep-one " +
    "composition collapses shifted copies") {
    val para = base // the shared paragraph
    val unique = (1 to 300).map(i => s"own$i").mkString(" ")
    val docs = (
      // 50 shifted copies of the same page: a viral pile
      (1L to 50L).map(i => (i, s"v$i " + para)) ++ Seq(
        // doc 100: mostly unique, ONE lifted paragraph from the pile
        (100L, unique + " " + para),
        // doc 200: fully unique
        (200L, (1 to 200).map(i => s"solo$i").mkString(" ")))
      ).toDF("doc_id", "text")
    val pairs = Dedup.cdcPairs(docs, "doc_id", "text", W, B)
      .localCheckpoint(true)
    val edges = pairs.select("a", "b").distinct()
      .as[(Long, Long)].collect().toSet
    // pre-collapse: PER CHUNK HASH, one min-id representative and one
    // edge per other carrier — never C(m,2). (A rep other than doc 1
    // can exist: a boundary coincidence in the doc-specific prefix
    // region yields a chunk carried by a SUBSET of the pile, whose own
    // min id represents it.)
    val byH = pairs.as[(Long, Long, Long)].collect()
      .groupBy(_._3).values
    byH.foreach { es =>
      val reps = es.map(_._1).distinct
      assert(reps.length == 1, s"multiple reps for one chunk: $reps")
      assert(es.forall(_._2 > reps.head),
        s"representative ${reps.head} is not the min carrier")
    }
    // every pile member shares the main para chunks with doc 1
    assert((2L to 50L).forall(i => edges.contains((1L, i))),
      "a pile member lost its star edge")
    assert(edges.contains((1L, 100L)),
      "partial overlap (one lifted paragraph) did not pair")
    assert(!edges.exists(e => e._1 == 200L || e._2 == 200L),
      "fully-unique doc paired")
    // linear in docs (+ a few prefix-coincidence subset chunks)
    assert(edges.size <= 60, s"superlinear edge set: ${edges.size}")
    // keep-one composition: one survivor of the connected pile+liftee
    val kept = Dedup.keepCanonical(
      docs.withColumn("q", org.apache.spark.sql.functions.lit(1L)),
      "doc_id", "q", pairs.select(
        org.apache.spark.sql.functions.col("a").as("id_a"),
        org.apache.spark.sql.functions.col("b").as("id_b")))
      .filter("kept").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 200L), s"$kept")
  }

  test("scrubCdcChunks: shared chunks die in EVERY carrier " +
    "(boilerplate policy); untouched docs stay byte-identical " +
    "including odd whitespace; token accounting is exact") {
    val odd = "keep\tme  exactly\n as-is three words"
    val docs = Seq(
      (1L, "v1 " + base),
      (2L, "v2 " + base),
      (3L, odd)
    ).toDF("doc_id", "text")
    val out = Dedup.scrubCdcChunks(docs, "doc_id", "text", W, B)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // untouched bystander: bytes preserved (tabs, double spaces, \n)
    assert(out(3L) == ((odd, 0L, 0L)), s"${out(3L)}")
    // both carriers lose the shared chunks — no copy survives
    Seq(1L, 2L).foreach { id =>
      val (clean, nRem, remTok) = out(id)
      assert(nRem > 0L && remTok > 0L, s"doc $id kept boilerplate")
      assert(clean.startsWith(s"v$id"),
        s"doc $id lost its unique prefix chunk: '$clean'")
      val total = TextAnalysis.jvmTokens(s"v$id " + base).length.toLong
      assert(TextAnalysis.jvmTokens(clean).length.toLong + remTok
        == total, s"doc $id token accounting")
    }
    // the shared tail is actually gone from both
    assert(!out(1L)._1.contains(base.takeRight(60)))
  }
}
