package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** BPE training ([[Bpe]]): the classic hand-computable example, the
  * train/apply parity that catches rank-order bugs, determinism, and the
  * corpus-scale piece-count path. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("the classic low/lower/newest vocabulary merges by hand") {
    // Sennrich et al.'s running example shape: frequencies force the
    // merge order deterministically
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = Bpe.trainFromVocab(vocab, numMerges = 4)
    // pair counts round 1: (e,s)=9 and (s,t)=9 and (t,</w>)=9 tie;
    // lexicographic tie-break picks (e,s); then (es,t)=9, (est,</w>)=9,
    // then (l,o)=7
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o")), s"got $merges")
    assert(Bpe.segment("newest", merges) == Vector("n", "e", "w", "est</w>"))
    assert(Bpe.segment("lowest", merges) == Vector("lo", "w", "est</w>"))
    assert(Bpe.segment("low", merges) == Vector("lo", "w", "</w>"))
  }

  test("apply reproduces training's own final segmentation (rank parity)") {
    val vocab = docs.select(org.apache.spark.sql.functions.explode(
        graft.functions.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toSeq
    val merges = Bpe.trainFromVocab(vocab, numMerges = 40)
    assert(merges.nonEmpty)
    // re-run the trainer but capture final segmentations by replaying its
    // merges through segment(): for EVERY vocab word, greedy-by-rank
    // application must land on the same pieces the training loop ended
    // with — equivalently, re-training on the already-segmented forms
    // makes no new merges inside any word's pieces
    vocab.foreach { case (w, _) =>
      val pieces = Bpe.segment(w, merges)
      assert(pieces.mkString == w + Bpe.EndOfWord,
        s"segmentation of '$w' lost characters: $pieces")
      // every piece must be buildable from the merge table (closure):
      // a piece is either a single initial symbol or the concatenation
      // produced by some merge
      val producible = merges.map { case (a, b) => a + b }.toSet
      pieces.foreach { p =>
        assert(p.codePointCount(0, p.length) == 1 || p == Bpe.EndOfWord ||
          producible(p), s"piece '$p' of '$w' not producible")
      }
    }
  }

  test("training is deterministic and monotone in merge count") {
    val vocab = Seq(("aab", 4L), ("aac", 3L), ("abab", 2L), ("bc", 7L))
    val m1 = Bpe.trainFromVocab(vocab, 6)
    val m2 = Bpe.trainFromVocab(vocab, 6)
    assert(m1 == m2)
    val m3 = Bpe.trainFromVocab(vocab, 3)
    assert(m1.take(3) == m3, "a shorter training is a prefix")
    // more merges never increase any word's piece count
    vocab.foreach { case (w, _) =>
      assert(Bpe.segment(w, m1).length <= Bpe.segment(w, m3).length)
    }
  }

  test("early stop: no pair at minPairCount leaves the table short") {
    val vocab = Seq(("ab", 1L), ("cd", 1L))
    assert(Bpe.trainFromVocab(vocab, 10, minPairCount = 2L).isEmpty)
  }

  test("train: the maxVocab cap binds deterministically and is invisible " +
      "when it does not bind") {
    // cap above the true vocab size → identical merges to the uncapped
    // legacy behavior (vocab order is irrelevant to trainFromVocab)
    val m1 = Bpe.train(docs, "text", numMerges = 12)
    val m2 = Bpe.train(docs, "text", numMerges = 12, maxVocab = Int.MaxValue)
    assert(m1 == m2)
    // a binding cap trains on exactly the top-M by (freq desc, word asc)
    val vocab = docs.select(org.apache.spark.sql.functions.explode(
        graft.functions.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toSeq
    val top = vocab.sortBy { case (w, f) => (-f, w) }.take(50)
    val capped = Bpe.train(docs, "text", numMerges = 12, maxVocab = 50)
    assert(capped == Bpe.trainFromVocab(top, numMerges = 12))
    // the minFreq floor drops the noise tail before the collect
    val floored = Bpe.train(docs, "text", numMerges = 12, minFreq = 3L)
    assert(floored ==
      Bpe.trainFromVocab(vocab.filter(_._2 >= 3L), numMerges = 12))
  }

  test("pieceCounts is lazy: no job runs and nothing collects at call time") {
    // the legacy implementation collected every DISTINCT corpus word to
    // the driver EAGERLY, inside the call — a driver bottleneck at scale.
    // Pin the fix: building the plan runs zero Spark jobs; all work (and
    // all segmentation) happens in executors at action time.
    val merges = Bpe.train(docs, "text", numMerges = 10)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val plan = Bpe.pieceCounts(docs, "doc_id", "text", merges)
      // the listener bus is async; the legacy collect() would have
      // BLOCKED on its job, so its start event is long since posted —
      // a short settle window is enough to catch any job
      Thread.sleep(500)
      assert(jobs.get() == 0,
        s"pieceCounts ran ${jobs.get()} job(s) before any action")
      assert(plan.columns.toSeq == Seq("doc_id", "n_words", "n_pieces"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("pieceCounts drops NULL-text documents, matching the explode form") {
    val merges = Seq(("a", "b"))
    val d = Seq((1L, "ab ab"), (3L, "xy")).toDF("doc_id", "text")
      .unionByName(Seq((2L, Option.empty[String])).toDF("doc_id", "text"))
    val out = Bpe.pieceCounts(d, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect()
      .map { case (k, v, p) => k -> ((v, p)) }.toMap
    assert(!out.contains(2L), "null-text doc must be absent")
    assert(out(1L) == ((2L, 4L))) // "ab" -> [ab, </w>] twice
    assert(out(3L) == ((1L, 3L))) // [x, y, </w>]
  }

  test("cpCompare is code-point (UTF-8 byte) order, not UTF-16 unit " +
    "order: a supplementary code point sorts ABOVE U+E000..U+FFFF") {
    val supp = new String(Character.toChars(0x10000)) // surrogate pair
    val bmp = "�"
    assert(Bpe.cpCompare(bmp, supp) < 0, "U+FFFD must sort below U+10000")
    // Java's UTF-16 compareTo gets this one backwards
    assert(bmp.compareTo(supp) > 0, "precondition: UTF-16 order differs")
    assert(Bpe.cpCompare("a", "ab") < 0 && Bpe.cpCompare("ab", "ab") == 0)
    assert(Seq("b", "a", "</w>").sorted(Bpe.cpOrder) ==
      Seq("</w>", "a", "b"))
  }

  test("alphabetOf: distinct initial symbols sorted by cpOrder; NULL " +
    "text contributes nothing; the end-of-word marker is present") {
    val d = Seq((1L, Some("ba ab")), (2L, Some("cb")), (3L, None))
      .toDF("doc_id", "text")
    assert(Bpe.alphabetOf(d, "text") == Seq("</w>", "a", "b", "c"))
  }

  test("vocabOf/vocabIds: alphabet ids 0..A-1 in cpOrder, merge products " +
    "A+r; collision resolves FIRST-WINS without renumbering later slots") {
    // merges (a,b)->'ab' and (ab,c)->'abc', plus a deliberate duplicate
    // product: (a,bc) would also yield 'abc' — ids must stay stable
    val alphabet = Seq("c", "a", "b", "</w>")
    val merges = Seq(("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc"))
    val vocab = Bpe.vocabOf(alphabet, merges)
    assert(vocab == IndexedSeq("</w>", "a", "b", "c", // sorted alphabet
      "ab", "bc", "abc", "abc")) // merge products, duplicate kept in place
    val ids = Bpe.vocabIds(vocab)
    assert(ids("a") == 1L && ids("ab") == 4L && ids("bc") == 5L)
    assert(ids("abc") == 6L, "first occurrence must win")
    assert(ids.size == 7, "the duplicate slot maps nowhere new")
  }

  test("encode: hand fixture — pieces match segment(), ids match the " +
    "stable vocabulary, n_tokens = |pieces|, NULL text absent, and a " +
    "frozen vocab missing the new text's alphabet yields unkId with " +
    "n_unk counting it") {
    val merges = Seq(("a", "b"), ("ab", "</w>"))
    val vocab = Bpe.vocabOf(Seq("a", "b", "x", "</w>"), merges)
    // vocab: </w>=0, a=1, b=2, x=3, ab=4, ab</w>=5
    val d = Seq((1L, Some("ab xab")), (2L, None), (3L, Some("q")))
      .toDF("doc_id", "text")
    val out = Bpe.encode(d, "doc_id", "text", merges, vocab)
      .as[(Long, Seq[String], Seq[Long], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(!out.contains(2L), "null-text doc must be absent")
    assert(out(1L) == ((Seq("ab</w>", "x", "ab</w>"), Seq(5L, 3L, 5L), 3L, 0L)))
    // 'q' is not in the frozen alphabet: its pieces miss the vocab
    assert(out(3L) == ((Seq("q", "</w>"), Seq(-1L, 0L), 2L, 1L)))
  }

  test("encode byte fallback: a frozen vocab with the byte pieces NEVER " +
    "emits unk — unknown pieces decompose to UTF-8 byte pieces (emoji, " +
    "CJK included), pieces/token_ids stay aligned, n_unk still counts; " +
    "failOnUnk fails loud without fallback") {
    val merges = Seq(("a", "b"), ("ab", "</w>"))
    val vocab = Bpe.vocabOf(Seq("a", "b", "x", "</w>"), merges,
      byteFallback = true)
    val ids = Bpe.vocabIds(vocab)
    // code points the training alphabet never saw: ASCII 'q', CJK, emoji
    val d = Seq((1L, "ab"), (3L, "q"), (4L, "世"), (5L, "😀"))
      .toDF("doc_id", "text")
    val out = Bpe.encode(d, "doc_id", "text", merges, vocab,
      byteFallback = true)
      .as[(Long, Seq[String], Seq[Long], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // no unk id anywhere, every id resolves in the vocab
    out.values.foreach { case (pieces, tids, n, _) =>
      assert(tids.forall(_ >= 0L), s"unk id leaked: $tids")
      assert(pieces.length == tids.length && n == tids.length)
      pieces.zip(tids).foreach { case (p, t) => assert(ids(p) == t) }
    }
    assert(out(1L)._4 == 0L, "in-vocab text has n_unk 0")
    // 'q' (1 byte) -> <0x71>; </w> is in vocab
    assert(out(3L)._1 == Seq("<0x71>", "</w>") && out(3L)._4 == 1L)
    // U+4E16 is 3 UTF-8 bytes: E4 B8 96
    assert(out(4L)._1 == Seq("<0xE4>", "<0xB8>", "<0x96>", "</w>"))
    // U+1F600 (emoji, supplementary) is 4 bytes: F0 9F 98 80
    assert(out(5L)._1 == Seq("<0xF0>", "<0x9F>", "<0x98>", "<0x80>", "</w>"))
    // failOnUnk without fallback: loud executor failure, not a -1 id
    val ex = intercept[org.apache.spark.SparkException] {
      Bpe.encode(d, "doc_id", "text", merges,
        Bpe.vocabOf(Seq("a", "b", "x", "</w>"), merges),
        failOnUnk = true).collect()
    }
    assert(ex.getMessage.contains("not in the frozen vocabulary") ||
      Option(ex.getCause).exists(_.getMessage
        .contains("not in the frozen vocabulary")))
    // byteFallback against a vocab WITHOUT byte pieces refuses at call time
    intercept[IllegalArgumentException] {
      Bpe.encode(d, "doc_id", "text", merges,
        Bpe.vocabOf(Seq("a", "b", "x", "</w>"), merges),
        byteFallback = true)
    }
  }

  test("trainFromVocab: incremental pair bookkeeping is bitwise the " +
    "full-recount reference, including cp-order ties and early stop") {
    val fixtures = Seq(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)),
      Seq(("aaaa", 3L), ("aaab", 2L), ("abab", 4L)),
      // cp-order tie: U+FF01 (BMP, high UTF-16 unit) vs U+10000
      // (supplementary) — UTF-16 unit order would pick the opposite
      Seq(("！z", 2L), ("𐀀z", 2L)),
      Seq(("solo", 1L)) // nothing reaches minPairCount = 2 -> empty
    )
    for (v <- fixtures; n <- Seq(0, 1, 3, 10, 50)) {
      val fast = Bpe.trainFromVocab(v, n)
      val slow = Bpe.trainFromVocabRecount(v, n)
      assert(fast == slow, s"divergence on $v at numMerges=$n")
    }
    // the tie itself resolves in CODE-POINT order (DuckDB's collation):
    // U+FF01 sorts below the supplementary U+10000, though its UTF-16
    // unit 0xFF01 sorts above the surrogate 0xD800
    assert(Bpe.trainFromVocab(fixtures(2), 2) ==
      Seq(("z", "</w>"), ("！", "z</w>")),
      "tied pair must resolve by code-point order, not UTF-16 units")
    // deterministic random fixtures: many words, overlapping pairs
    val rnd = new scala.util.Random(11)
    val alpha = "abcde"
    val randVocab = (0 until 300).map { _ =>
      (Seq.fill(1 + rnd.nextInt(8))(alpha(rnd.nextInt(5))).mkString,
        (1 + rnd.nextInt(9)).toLong)
    }.distinct
    for (n <- Seq(5, 25, 100)) {
      assert(Bpe.trainFromVocab(randVocab, n) ==
        Bpe.trainFromVocabRecount(randVocab, n),
        s"random-vocab divergence at numMerges=$n")
    }
  }

  test("encode rides the scan: zero shuffle exchanges in the plan, and " +
    "n_tokens agrees with pieceCounts' n_pieces on the corpus") {
    val merges = Bpe.train(docs, "text", numMerges = 30)
    val vocab = Bpe.vocabOf(Bpe.alphabetOf(docs, "text"), merges)
    val enc = Bpe.encode(docs, "doc_id", "text", merges, vocab)
    val plan = enc.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(graft.PlanChecks.shuffleExchanges(plan) == 0, plan)
    val nt = enc.select("doc_id", "n_tokens").as[(Long, Long)]
      .collect().toMap
    val pc = Bpe.pieceCounts(docs, "doc_id", "text", merges)
      .select("doc_id", "n_pieces").as[(Long, Long)].collect().toMap
    assert(nt == pc, "encode token counts must equal pieceCounts")
    // no unk ids on the training corpus itself: its alphabet built them
    val unk = enc.select(org.apache.spark.sql.functions.explode(
      col("token_ids")).as("t")).filter(col("t") < 0).count()
    assert(unk == 0L, s"$unk unknown ids on the vocab's own corpus")
  }

  test("tokenizer persistence: save/load roundtrips merges in rank " +
    "order and vocab in id order; an encode under the LOADED artifact " +
    "is bitwise the trained one's") {
    val merges = Bpe.train(docs, "text", numMerges = 30)
    val vocab = Bpe.vocabOf(Bpe.alphabetOf(docs, "text"), merges)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.saveTokenizer(spark, dir, merges, vocab)
    val (m2, v2, p2) = Bpe.loadTokenizer(spark, dir)
    assert(m2 == merges, "merge order must survive the roundtrip")
    assert(v2 == vocab, "vocab ids must survive the roundtrip")
    assert(p2 == Bpe.PreTok.Whitespace)
    val a = Bpe.encode(docs, "doc_id", "text", merges, vocab)
      .select("doc_id", "token_ids").as[(Long, Seq[Long])].collect().toMap
    val b = Bpe.encode(docs, "doc_id", "text", m2, v2, preTok = p2)
      .select("doc_id", "token_ids").as[(Long, Seq[Long])].collect().toMap
    assert(a == b, "loaded tokenizer must encode bitwise-identically")
  }

  test("the artifact records its pre-tokenization policy: cp-class " +
    "roundtrips, legacy artifacts (no meta) load as whitespace, unknown " +
    "policies fail loud") {
    val rows = Seq((1L, "ab1 cd2")).toDF("doc_id", "text")
    val cp = Bpe.PreTok.CpClass
    val merges = Bpe.train(rows, "text", numMerges = 2, preTok = cp)
    val vocab = Bpe.vocabOf(Bpe.alphabetOf(rows, "text", cp), merges)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-pt").toString
    Bpe.saveTokenizer(spark, dir, merges, vocab, preTok = cp)
    val (_, _, p) = Bpe.loadTokenizer(spark, dir)
    assert(p == cp, s"policy lost in roundtrip: $p")
    // a round-13 artifact has no meta table — it was trained under the
    // whitespace split and must load as such
    val legacy = java.nio.file.Files.createTempDirectory("graft-bpe-leg")
    Bpe.saveTokenizer(spark, legacy.toString, merges, vocab)
    def rmMeta(d: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      val meta = d.resolve("meta")
      java.nio.file.Files.walk(meta).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    rmMeta(legacy)
    assert(Bpe.loadTokenizer(spark, legacy.toString)._3 ==
      Bpe.PreTok.Whitespace)
    // forward compat is a loud failure, never the wrong split
    intercept[IllegalStateException] {
      Bpe.PreTok.fromName("bytelevel")
    }
  }

  test("pieceCounts: corpus-scale counts agree with per-word segmentation") {
    val merges = Bpe.train(docs, "text", numMerges = 30)
    val out = Bpe.pieceCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect()
      .map { case (id, w, p) => id -> ((w, p)) }.toMap
    // brute force twin over collected text
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    rows.foreach { case (id, text) =>
      val ws = graft.functions.TextAnalysis.jvmTokens(text)
      val want = (ws.length.toLong,
        ws.map(w => Bpe.segment(w, merges).length.toLong).sum)
      assert(out(id) == want, s"doc $id: ${out(id)} != $want")
    }
    // merges actually compress: pieces < chars+1 per word on average
    val (_, totalPieces) = out.values.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val naive = rows.map(_._2).map(t =>
      graft.functions.TextAnalysis.jvmTokens(t)
        .map(w => w.codePointCount(0, w.length).toLong + 1L).sum).sum
    assert(totalPieces < naive, "training produced no compression")
  }

  test("decode ∘ encode = whitespace-normalized identity on the corpus, " +
    "including planted CJK/emoji words that exist only as byte pieces") {
    val planted = docs
      .filter(col("doc_id") % 7 === 0 && col("text").isNotNull)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        org.apache.spark.sql.functions.concat(col("text"),
          org.apache.spark.sql.functions.lit(" 世界 😀tok")).as("text"))
    val corpus = docs.select("doc_id", "text").unionAll(planted)
      .localCheckpoint(true)
    val merges = Bpe.train(docs, "text", numMerges = 30)
    val vocab = Bpe.vocabOf(Bpe.alphabetOf(docs, "text"), merges,
      byteFallback = true)
    val enc = Bpe.encode(corpus, "doc_id", "text", merges, vocab,
      byteFallback = true)
    val out = Bpe.decode(enc, "doc_id", "token_ids", vocab)
      .as[(Long, String, Long)].collect()
    val want = corpus.filter(col("text").isNotNull)
      .as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> graft.functions.TextAnalysis.jvmTokens(t).mkString(" ")
      }.toMap
    assert(out.length == want.size)
    out.foreach { case (id, text, nInv) =>
      assert(nInv == 0L, s"doc $id: $nInv invalid sequences")
      assert(text == want(id), s"doc $id roundtrip: '$text' != '${want(id)}'")
    }
  }

  test("decode: literal </w> CHARACTERS in text do not fabricate word " +
    "boundaries (boundaries resolve per piece, not by string replace)") {
    val rows = Seq((1L, "a</w>b c"), (2L, "x</w>")).toDF("doc_id", "text")
    val alpha = Bpe.alphabetOf(rows, "text")
    val vocab = Bpe.vocabOf(alpha, Seq.empty)
    val enc = Bpe.encode(rows, "doc_id", "text", Seq.empty, vocab)
    val out = Bpe.decode(enc, "doc_id", "token_ids", vocab)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(out == Map(1L -> "a</w>b c", 2L -> "x</w>"), s"got $out")
  }

  test("decode: invalid UTF-8 byte runs — replacement + n_invalid by " +
    "default, fail-loud on policy; out-of-range ids always fail loud") {
    val vocab = Bpe.vocabOf(Seq("a", Bpe.EndOfWord), Seq.empty,
      byteFallback = true)
    val ids = Bpe.vocabIds(vocab)
    val lone80 = ids("<0x80>") // a lone continuation byte: malformed
    val aId = ids("a")
    val eow = ids(Bpe.EndOfWord)
    val (text, nInv) = Bpe.decodeTokens(Seq(aId, lone80, eow), vocab)
    assert(text == "a�" && nInv == 1L, s"got ('$text', $nInv)")
    intercept[IllegalStateException] {
      Bpe.decodeTokens(Seq(lone80), vocab, failOnInvalid = true)
    }
    // a well-formed multi-byte run still reassembles exactly
    val bytes = "世".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val runIds = bytes.map(b => ids(f"<0x${b & 0xff}%02X>")).toSeq
    assert(Bpe.decodeTokens(runIds :+ eow, vocab) == (("世", 0L)))
    // unk / separator ids cannot decode — fail loud, never garbage
    intercept[IllegalArgumentException] {
      Bpe.decodeTokens(Seq(-1L), vocab)
    }
    intercept[IllegalArgumentException] {
      Bpe.decodeTokens(Seq(vocab.length.toLong), vocab)
    }
  }

  test("cp-class pre-tokenization: runs split exactly like the column/" +
    "oracle twin, CJK merges are learned INSIDE runs, and pieces/char " +
    "drops measurably below the byte-fallback floor") {
    val cp = Bpe.PreTok.CpClass
    // JVM split vs the column twin on the traps: mixed runs, empty
    // trailing token (kept by whitespace, dropped by cp-class), CJK+digit
    val tricky = Seq("v7世界算法9!", "foo bar\n", "  ", "a1b2", "世界 x")
    val colSplit = tricky.toDF("text")
      .select(org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.explode_outer(
          cp.wordsCol(org.apache.spark.sql.functions.col("text")))
          .as("w"))
      .as[(String, String)].collect().groupBy(_._1)
      .map { case (t, ws) => t -> ws.map(_._2).filter(_ != null).toSeq }
    tricky.foreach { t =>
      assert(colSplit(t) == cp.jvmSplit(t).toSeq,
        s"'$t': column ${colSplit(t)} != jvm ${cp.jvmSplit(t).toSeq}")
    }
    assert(cp.jvmSplit("v7世界算法9!").toSeq ==
      Seq("v", "7", "世界算法", "9", "!"))

    // the mixed-script corpus: the CJK phrase rides INSIDE unique
    // whitespace words — under the whitespace policy each is one
    // frequency-1 word that the production `minFreq` floor filters
    // BEFORE its pairs can count (at web scale distinct sentence-words
    // are unbounded; the floor is what keeps the driver table bounded),
    // so the trainer never sees the script run. CpClass separates the
    // run, which accumulates corpus frequency and survives the floor.
    val mixed = (0 until 200)
      .map(i => (i.toLong, s"doc$i shared text v${i}世界算法$i!"))
      .toDF("doc_id", "text").localCheckpoint(true)
    // (a) the byte-fallback floor: whitespace policy, vocabulary frozen
    // on a CJK-free corpus — the q131 regime every CJK word pays forever
    val cjkFree = (0 until 200)
      .map(i => (i.toLong, s"doc$i shared text v$i!"))
      .toDF("doc_id", "text").localCheckpoint(true)
    val mergesWs = Bpe.train(cjkFree, "text", numMerges = 60, minFreq = 2L)
    val vocabWs = Bpe.vocabOf(Bpe.alphabetOf(cjkFree, "text"), mergesWs,
      byteFallback = true)
    // (b) cp-class policy trained on the mixed corpus itself
    val mergesCp = Bpe.train(mixed, "text", numMerges = 60, minFreq = 2L,
      preTok = cp)
    val vocabCp = Bpe.vocabOf(Bpe.alphabetOf(mixed, "text", cp), mergesCp)
    // CJK merges ARE learned inside the run (both sides of some merge
    // are ideographs — impossible under whitespace at the same floor,
    // where every CJK-bearing word is frequency-1 and filtered)
    def cjk(s: String): Boolean = s.codePoints().toArray
      .forall(c => c >= 0x4E00 && c <= 0x9FFF)
    assert(mergesCp.exists(m => cjk(m._1) && cjk(m._2)),
      s"no in-run CJK merge learned: $mergesCp")
    val wsOnly = Bpe.train(mixed, "text", numMerges = 60, minFreq = 2L)
    assert(!wsOnly.exists(m => cjk(m._1) && cjk(m._2)),
      "fixture check: whitespace policy at the same minFreq floor must " +
        "NOT learn in-run CJK merges")
    // pieces/char on the CJK phrase: byte fallback pays 3 byte pieces
    // per character (+ the word marker); cp-class reads it as a learned
    // run — measurably under one piece per character
    val probe = Seq((1L, "世界算法")).toDF("doc_id", "text")
    val floor = Bpe.encode(probe, "doc_id", "text", mergesWs, vocabWs,
      byteFallback = true)
      .select("n_tokens").as[Long].head() / 4.0
    val learned = Bpe.encode(probe, "doc_id", "text", mergesCp, vocabCp,
      preTok = cp)
      .select("n_tokens").as[Long].head() / 4.0
    assert(floor >= 3.0, s"byte-fallback floor: $floor pieces/char")
    assert(learned < 1.0,
      s"cp-class pieces/char $learned not below 1 (floor $floor)")
  }

  test("splitPack/decodePack: a pack stream splits on the separator " +
    "into member documents and decodes each for inspection") {
    val rows = Seq((1L, "the cat"), (2L, "sat")).toDF("doc_id", "text")
    val merges = Seq.empty[Bpe.Merge]
    val vocab = Bpe.vocabOf(Bpe.alphabetOf(rows, "text"), merges)
    val enc = Bpe.encode(rows, "doc_id", "text", merges, vocab)
      .withColumn("_shard", org.apache.spark.sql.functions.lit(0L))
    val sep = vocab.length.toLong
    val pack = graft.operators.Packing.packTokenStreams(enc, "_shard",
      "doc_id", "token_ids", budget = 1000L, sepId = sep)
      .select("token_ids").as[Seq[Long]].head()
    val docsOut = Bpe.decodePack(pack, vocab.toIndexedSeq, sep)
    assert(docsOut == Seq(("the cat", 0L), ("sat", 0L)), s"got $docsOut")
    // a truncated (separator-less tail) stream surfaces the tail
    assert(Bpe.splitPack(Seq(1L, 9L, 2L), 9L) == Seq(Seq(1L), Seq(2L)))
  }

  test("fertility: exact per-group scaled integers; a no-merge script " +
    "slice reads the one-piece-per-char ceiling while the trained slice " +
    "compresses below it") {
    // 'en': one 8-char word repeated enough to learn full-word merges;
    // 'zh': unique CJK-bearing words — whitespace training learns
    // nothing inside them (each is freq-1)
    val corpus = (
      (0L until 8L).map(i => (i, "windmill windmill windmill", "en")) ++
        Seq((100L, "你好世界", "zh"), (101L, "算法模型", "zh"))
      ).toDF("doc_id", "text", "lang")
    val merges = Bpe.train(corpus, "text", numMerges = 40)
    val out = Bpe.fertility(corpus, "doc_id", "text", "lang", merges)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // en: 8 docs x 3 words x 1 piece (full-word merge) = 24 pieces over
    // 8 x 26 chars -> 24*1000 div 208 = 115 pieces/kchar; 1000 milli/word
    assert(out("en") == ((8L, 24L, 24L, 208L, 115L, 1000L)), s"$out")
    // zh: no merges learned inside freq-1 CJK words -> chars+marker
    // pieces: 2 docs x (4+1) = 10 pieces over 8 chars -> 1250/kchar
    assert(out("zh") == ((2L, 2L, 10L, 8L, 1250L, 5000L)), s"$out")
  }

  test("trainAndAlphabet: the fused one-pass result equals the unfused " +
    "train + alphabetOf pair on every path (driver shortcut, minFreq " +
    "floor fallback, maxVocab cap fallback, cp-class policy)") {
    val d = docs
    // common path: cap not binding, no floor -> driver-derived alphabet
    val (m1, a1) = Bpe.trainAndAlphabet(d, "text", numMerges = 25)
    assert(m1 == Bpe.train(d, "text", numMerges = 25))
    assert(a1 == Bpe.alphabetOf(d, "text"))
    val cp = Bpe.PreTok.CpClass
    val (m2, a2) = Bpe.trainAndAlphabet(d, "text", numMerges = 10,
      preTok = cp)
    assert(m2 == Bpe.train(d, "text", numMerges = 10, preTok = cp))
    assert(a2 == Bpe.alphabetOf(d, "text", cp))
    // fallback paths: a minFreq floor and a binding cap both force the
    // distributed alphabet -- which must STILL be the full corpus
    // alphabet, never the filtered/capped table's symbols
    val (m3, a3) = Bpe.trainAndAlphabet(d, "text", numMerges = 10,
      minFreq = 3L)
    assert(m3 == Bpe.train(d, "text", numMerges = 10, minFreq = 3L))
    assert(a3 == Bpe.alphabetOf(d, "text"))
    val (m4, a4) = Bpe.trainAndAlphabet(d, "text", numMerges = 10,
      maxVocab = 50)
    assert(m4 == Bpe.train(d, "text", numMerges = 10, maxVocab = 50))
    assert(a4 == Bpe.alphabetOf(d, "text"))
  }

  test("encode emitPieces=false: pieces column dropped, every other " +
    "column bitwise identical, under the plain and byte-fallback " +
    "policies") {
    val d = docs
    val (merges, alpha) = Bpe.trainAndAlphabet(d, "text", numMerges = 20)
    val vocab = Bpe.vocabOf(alpha, merges)
    val vocabBf = Bpe.vocabOf(alpha, merges, byteFallback = true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().toSeq
    val full = Bpe.encode(d, "doc_id", "text", merges, vocab)
    val slim = Bpe.encode(d, "doc_id", "text", merges, vocab,
      emitPieces = false)
    assert(slim.columns.toSeq ==
      Seq("doc_id", "token_ids", "n_tokens", "n_unk"))
    assert(rows(slim) == rows(full.drop("pieces")))
    val fullBf = Bpe.encode(d, "doc_id", "text", merges, vocabBf,
      byteFallback = true)
    val slimBf = Bpe.encode(d, "doc_id", "text", merges, vocabBf,
      byteFallback = true, emitPieces = false)
    assert(rows(slimBf) == rows(fullBf.drop("pieces")))
  }

  test("encode word memo: repeated occurrences replay the per-word " +
    "encoding bitwise (unk and byte-fallback branches included) and " +
    "the output is partition-layout invariant") {
    // the memo caches the fully ENCODED word per task, so (a) a word
    // repeated N times must emit exactly N copies of its single-
    // occurrence encoding, and (b) different task layouts (different
    // memo populations) must not change a single byte
    val (merges, alpha) = Bpe.trainAndAlphabet(docs, "text", numMerges = 20)
    val vocab = Bpe.vocabOf(alpha, merges)
    val vocabBf = Bpe.vocabOf(alpha, merges, byteFallback = true)
    // χ is outside the corpus alphabet: unk under the plain policy,
    // byte pieces under fallback
    val rep = Seq((1L, "low low low χq χq"), (2L, "low χq"),
      (3L, "low"), (4L, "χq")).toDF("doc_id", "text")
    for ((bf, voc) <- Seq((false, vocab), (true, vocabBf))) {
      val out = Bpe.encode(rep, "doc_id", "text", merges, voc,
        byteFallback = bf)
        .orderBy("doc_id").collect()
      def enc(i: Int) = (out(i).getSeq[String](1), out(i).getSeq[Long](2),
        out(i).getLong(3), out(i).getLong(4))
      val (lowP, lowT, _, lowU) = enc(2)
      val (unkP, unkT, _, unkU) = enc(3)
      // repeated doc = 3× low ++ 2× χq, unk counts additive
      assert(enc(0)._1 == lowP ++ lowP ++ lowP ++ unkP ++ unkP)
      assert(enc(0)._2 == lowT ++ lowT ++ lowT ++ unkT ++ unkT)
      assert(enc(0)._4 == 3 * lowU + 2 * unkU, s"bf=$bf n_unk")
      assert(enc(1)._1 == lowP ++ unkP && enc(1)._2 == lowT ++ unkT)
      // layout invariance: 1 task vs many tasks, same bytes
      val one = Bpe.encode(rep.repartition(1), "doc_id", "text", merges,
        voc, byteFallback = bf).orderBy("doc_id").collect().toSeq
      val many = Bpe.encode(rep.repartition(7), "doc_id", "text", merges,
        voc, byteFallback = bf).orderBy("doc_id").collect().toSeq
      assert(one == many && one == out.toSeq, s"bf=$bf layout variance")
    }
  }
}
