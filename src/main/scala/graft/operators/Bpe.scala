package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.TextAnalysis
import graft.functions.TextAnalysis.tokens

/** BPE tokenizer TRAINING over the corpus — the vocabulary-construction
  * step of a pretraining pipeline (q37 counts tokens with a fixed
  * BPE-ish rule; this learns the merge table itself, Sennrich et al.
  * 2016, arXiv 1508.07909).
  *
  * Decomposition is the standard one (and the same shape as the IVF
  * codebooks): the CORPUS pass is distributed — one in-scan tokenize +
  * one aggregation to the word-frequency table — and the merge loop runs
  * on the DRIVER over that table. The table is vocab-sized, not
  * corpus-sized, and the collect is BOUNDED BY CONSTRUCTION: words below
  * `minFreq` are filtered in the aggregation and at most `maxVocab` rows
  * reach the driver (highest-frequency first, word-lexicographic
  * tie-break), so a web corpus's unbounded noise tail (typos, URLs,
  * code) can never land on the driver. Production tokenizer trainers
  * are built exactly this way: distributed pre-tokenization, a frequency
  * floor, in-memory merges.
  *
  * Applying the trained table never touches the driver at all: the merge
  * table (O(numMerges), small) broadcasts, each executor segments the
  * words it scans with a per-partition memo keyed by distinct word (word
  * frequencies are Zipfian, so the memo hit-rate is high), and only the
  * per-document (id, n_words, n_pieces) rows shuffle — the corpus text
  * crosses no exchange and NO action collects O(distinct-words) rows
  * anywhere (BpeSpec pins both the laziness and the parity).
  *
  * Determinism contract (specs pin it): pair selection is by highest
  * count, ties broken by the lexicographically SMALLEST (left, right)
  * pair; words segment to characters plus a terminal `</w>` marker, so
  * suffix pieces are distinct from prefix pieces. Training stops early
  * when no pair occurs at least `minPairCount` times.
  */
object Bpe {

  type Merge = (String, String)

  /** PRE-TOKENIZATION policy — how text becomes the "words" the trainer
    * counts and the encoder segments. [[PreTok.Whitespace]] (the default
    * everywhere, and what every existing oracle replays) treats each
    * whitespace token as one word; [[PreTok.CpClass]] further splits
    * every whitespace token into maximal CODE-POINT-CLASS runs —
    * letters (`\p{L}+`), numbers (`\p{N}+`), everything else
    * (`[^\p{L}\p{N}]+`) — the GPT-2-style pre-split. The multilingual
    * rationale: under whitespace, a CJK sentence (no spaces) is ONE
    * word, so each distinct sentence lands in the frequency table once
    * (below any sane `minFreq`) and the trainer never learns merges
    * inside script runs — then under a frozen vocabulary every unseen
    * CJK "word" byte-fallback-encodes at ~3 pieces per character
    * forever. CpClass separates the letter run from adjoining
    * digits/punctuation, so recurring runs accumulate frequency and
    * merges are learned INSIDE them (spec-pinned: pieces/char drops
    * measurably vs the byte-fallback floor on a planted mixed-script
    * corpus).
    *
    * Both sides of every policy are exact cross-engine twins: the JVM
    * split and the column/oracle split share one regex (`\p{L}`/`\p{N}`
    * are the same Unicode general categories in java.util.regex and
    * DuckDB's RE2), and the empty token — whitespace keeps `""`
    * (`"foo \n"` tokenizes `[foo, ""]`), CpClass drops it (no run
    * matches in an empty string) — agrees by construction.
    *
    * DETOKENIZATION caveat: the end-of-word marker lands after every
    * CpClass RUN, so [[decodeTokens]] under a CpClass-trained
    * vocabulary reconstructs the run-split normal form ("ab1" decodes
    * "ab 1") — the boundary information GPT-2 keeps via byte-level
    * space prefixes is traded here for the oracle-replayable marker
    * scheme. Exact decode roundtrips are the Whitespace policy's
    * contract (q134). */
  sealed trait PreTok extends Serializable {
    private[graft] def jvmSplit(s: String): Array[String]
    private[graft] def wordsCol(text: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column
  }

  object PreTok {
    /** Stable artifact name per policy ([[Bpe.saveTokenizer]] records
      * it; [[Bpe.loadTokenizer]] resolves it back). */
    def nameOf(p: PreTok): String = p match {
      case Whitespace => "whitespace"
      case CpClass => "cpclass"
    }

    /** Inverse of [[nameOf]] — fails loud on an unknown policy name (an
      * artifact from a newer engine must not silently load under the
      * wrong split). */
    def fromName(name: String): PreTok = name match {
      case "whitespace" => Whitespace
      case "cpclass" => CpClass
      case other => throw new IllegalStateException(
        s"unknown pre-tokenization policy '$other' in tokenizer " +
          "artifact — written by a newer engine? refusing to encode " +
          "under the wrong split")
    }

    /** One word per whitespace token (the [[TextAnalysis.jvmTokens]] /
      * `tokens` twin pair) — the default policy. */
    case object Whitespace extends PreTok {
      private[graft] def jvmSplit(s: String): Array[String] =
        TextAnalysis.jvmTokens(s)
      private[graft] def wordsCol(text: org.apache.spark.sql.Column)
          : org.apache.spark.sql.Column = tokens(text)
    }

    /** GPT-2-style code-point-class runs within whitespace tokens. */
    case object CpClass extends PreTok {
      /** The shared run regex — identical semantics in java.util.regex
        * (JVM split), Spark's codegen'd regexp_extract_all (column
        * split) and DuckDB's RE2 (oracle split). */
      val RunRe: String = "[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}]+"
      @transient private lazy val pat =
        java.util.regex.Pattern.compile(RunRe)
      private[graft] def jvmSplit(s: String): Array[String] = {
        val out = mutable.ArrayBuffer.empty[String]
        TextAnalysis.jvmTokens(s).foreach { w =>
          if (!w.isEmpty) {
            val m = pat.matcher(w)
            while (m.find()) out += m.group()
          }
        }
        out.toArray
      }
      private[graft] def wordsCol(text: org.apache.spark.sql.Column)
          : org.apache.spark.sql.Column =
        flatten(transform(tokens(text),
          w => regexp_extract_all(w, lit(RunRe), lit(0))))
    }
  }

  /** Default cap on the word-frequency rows `train` may collect. 4M
    * entries ≈ a few hundred MB of driver heap at web-scale word lengths
    * — far above any real tokenizer vocabulary (GPT-2: 50k merges), far
    * below a web corpus's distinct-word count. */
  val DefaultMaxVocab: Int = 1 << 22

  /** Per-partition cap on the word → piece-count memo in [[pieceCounts]].
    * Past it, segmentation still happens (per occurrence), it just stops
    * caching — memory stays bounded regardless of partition vocabulary. */
  val MemoCap: Int = 1 << 20

  /** End-of-word marker appended as a separate initial symbol. */
  val EndOfWord = "</w>"

  /** Segment a word into its initial symbols: characters (by code point)
    * plus the end-of-word marker. Shared with [[Unigram]] — the two
    * tokenizer families agree on the word model by construction. */
  private[graft] def initial(word: String): Vector[String] = {
    val cps = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      cps += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    (cps :+ EndOfWord).toVector
  }

  /** Apply an ordered merge list to one word — repeatedly merge the
    * EARLIEST-ranked mergeable pair (standard BPE application). */
  def segment(word: String, merges: Seq[Merge]): Vector[String] =
    segmentRanked(word, merges.zipWithIndex.toMap)

  /** [[segment]] against a prebuilt rank map — the executor-side form,
    * so the map builds once per partition, not once per word. */
  def segmentRanked(word: String, rank: Map[Merge, Int]): Vector[String] = {
    var syms = initial(word)
    var done = false
    while (!done && syms.length >= 2) {
      var best = -1
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (best == -1 || r < best) { best = r; bestAt = i }
        }
        i += 1
      }
      if (best == -1) done = true
      else {
        val merged = syms(bestAt) + syms(bestAt + 1)
        syms = (syms.take(bestAt) :+ merged) ++ syms.drop(bestAt + 2)
      }
    }
    syms
  }

  /** The distributed corpus pass: (word, frequency) over `preTok`'s
    * words of `textCol` (whitespace tokens by default). */
  def wordFrequencies(docs: DataFrame, textCol: String,
                      preTok: PreTok = PreTok.Whitespace): DataFrame =
    docs.select(explode(preTok.wordsCol(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `numMerges` BPE merges from the word-frequency table. The
    * corpus is touched exactly once, by [[wordFrequencies]]'s
    * aggregation; the driver sees at most `maxVocab` rows (top by
    * frequency, word-ascending tie-break — a TakeOrdered, so each
    * partition ships only its own top-k) after the `minFreq` floor.
    * Training is vocab-ORDER-independent (pair counts are summed over
    * the whole table; ties break on the pair, not the word), so when the
    * cap does not bind the merges are identical to an uncapped train. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L, minFreq: Long = 1L,
            maxVocab: Int = DefaultMaxVocab,
            preTok: PreTok = PreTok.Whitespace): Seq[Merge] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(maxVocab > 0, "maxVocab must be > 0")
    val vocab = collectedVocab(docs, textCol, minFreq, maxVocab, preTok)
    trainFromVocab(vocab.toIndexedSeq, numMerges, minPairCount)
  }

  /** The shared collected-vocab step of [[train]] / [[trainAndAlphabet]]:
    * word-frequency aggregation → `minFreq` floor → (freq DESC, word ASC)
    * total order → `maxVocab` cap → driver collect. ONE definition so the
    * two trainer entry points can never drift (a future tie-break or cap
    * change applied to only one would silently fork the vocabularies). */
  private def collectedVocab(docs: DataFrame, textCol: String,
                             minFreq: Long, maxVocab: Int,
                             preTok: PreTok): Array[(String, Long)] =
    wordFrequencies(docs, textCol, preTok)
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

  /** [[train]] and [[alphabetOf]] from ONE corpus pass — the fused form
    * for the (ubiquitous) caller that needs both the merge table and the
    * alphabet to build a [[vocabOf]] vocabulary. Separately they cost
    * two full corpus scans (word-frequency aggregation + the alphabet's
    * tokenize-and-distinct); the alphabet, however, is a pure function
    * of the DISTINCT-WORD SET — `initial(word)` symbols over distinct
    * words — which the training collect already holds whenever the
    * `maxVocab` cap did not bind and no `minFreq` floor filtered words
    * out. In that (overwhelmingly common) case the alphabet derives on
    * the driver from the collected table at zero extra cost; otherwise
    * the exact distributed [[alphabetOf]] runs as before (the cap
    * binding means >maxVocab distinct words — the regime where the
    * corpus-scan alphabet is the only correct source).
    *
    * Exactness: identical to the unfused pair by construction — the
    * word-frequency table's words are `preTok.wordsCol` tokens and
    * [[alphabetOf]] tokenizes with `preTok.jvmSplit`, the spec-pinned
    * bitwise twin pair every oracle row already relies on. */
  def trainAndAlphabet(docs: DataFrame, textCol: String, numMerges: Int,
                       minPairCount: Long = 2L, minFreq: Long = 1L,
                       maxVocab: Int = DefaultMaxVocab,
                       preTok: PreTok = PreTok.Whitespace)
      : (Seq[Merge], Seq[String]) = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(maxVocab > 0, "maxVocab must be > 0")
    val vocab = collectedVocab(docs, textCol, minFreq, maxVocab, preTok)
    val alphabet =
      if (minFreq <= 1L && vocab.length < maxVocab) {
        val seen = mutable.HashSet.empty[String]
        vocab.foreach { case (w, _) => initial(w).foreach(seen += _) }
        seen.toIndexedSeq.sorted(cpOrder)
      } else alphabetOf(docs, textCol, preTok)
    (trainFromVocab(vocab.toIndexedSeq, numMerges, minPairCount), alphabet)
  }

  /** The merge loop itself, pure and testable: greedy highest-count pair,
    * code-point-lexicographic tie-break ([[cpOrder]] — DuckDB's binary
    * collation, so the oracle's `ORDER BY a, b` replays the pick even
    * for tied pairs involving supplementary code points), early stop
    * under `minPairCount`.
    *
    * INCREMENTAL bookkeeping (the classic trainer optimization): pair
    * counts are built once, then each round updates counts only for the
    * words that actually CONTAIN the merged pair (tracked by an
    * occurrence index), with a lazy-invalidation max-heap serving the
    * argmax — per-round cost is O(affected-word symbols + log-heap), not
    * O(all corpus-vocab symbols), which at 50k merges × 4M words is the
    * difference between minutes and a multi-hour driver loop. Merges are
    * bitwise-identical to the full-recount reference
    * ([[trainFromVocabRecount]], spec-pinned). */
  def trainFromVocab(vocab: Seq[(String, Long)], numMerges: Int,
                     minPairCount: Long = 2L): Seq[Merge] = {
    val syms = vocab.map { case (w, _) => initial(w).toArray }.toArray
    val freqs = vocab.map(_._2).toArray
    val counts = mutable.HashMap.empty[Merge, Long]
    val occur = mutable.HashMap.empty[Merge, mutable.ArrayBuffer[Int]]
    // max-heap: highest count first, ties to the cp-SMALLEST (left,
    // right); entries are lazily invalidated (valid iff stored count ==
    // current count — every count change pushes a fresh entry)
    val entryOrd = new Ordering[(Long, Merge)] {
      def compare(x: (Long, Merge), y: (Long, Merge)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = cpCompare(y._2._1, x._2._1)
          if (a != 0) a else cpCompare(y._2._2, x._2._2)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, Merge)](entryOrd)
    // batch-apply a word's pair-count delta: -f on its old adjacencies,
    // +f on its new ones, one heap push per net-changed pair
    def applyDeltas(deltas: mutable.HashMap[Merge, Long]): Unit =
      deltas.foreach { case (p, d) =>
        if (d != 0L) {
          val c = counts.getOrElse(p, 0L) + d
          if (c <= 0L) counts.remove(p)
          else {
            counts(p) = c
            heap.enqueue((c, p))
          }
        }
      }
    def addWord(deltas: mutable.HashMap[Merge, Long], wi: Int,
                sign: Long): Unit = {
      val s = syms(wi)
      val f = freqs(wi) * sign
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        deltas(p) = deltas.getOrElse(p, 0L) + f
        if (sign > 0L)
          occur.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += wi
        i += 1
      }
    }
    val init = mutable.HashMap.empty[Merge, Long]
    var wi = 0
    while (wi < syms.length) { addWord(init, wi, 1L); wi += 1 }
    applyDeltas(init)

    val merges = mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    var exhausted = false
    while (rounds < numMerges && !exhausted) {
      // pop to the first VALID entry — the true argmax, since every
      // pair's latest count has an entry and stale ones rank no lower
      var best: Merge = null
      while (best == null && !exhausted) {
        if (heap.isEmpty) exhausted = true
        else {
          val (c, p) = heap.dequeue()
          if (counts.getOrElse(p, 0L) == c) {
            if (c >= minPairCount) best = p
            else exhausted = true
          }
        }
      }
      if (!exhausted && best != null) {
        merges += best
        // best stays selectable later if new occurrences arise: its
        // count fell to 0 here (L2R application leaves no adjacency),
        // and future rewrites push fresh entries
        counts.remove(best)
        val affected = occur.remove(best).getOrElse(mutable.ArrayBuffer.empty)
        val seen = mutable.HashSet.empty[Int]
        val deltas = mutable.HashMap.empty[Merge, Long]
        affected.foreach { i =>
          if (seen.add(i)) {
            val s = syms(i)
            var has = false
            var j = 0
            while (!has && j < s.length - 1) {
              has = s(j) == best._1 && s(j + 1) == best._2
              j += 1
            }
            if (has) {
              addWord(deltas, i, -1L)
              val out = mutable.ArrayBuffer.empty[String]
              var k = 0
              while (k < s.length) {
                if (k < s.length - 1 &&
                    s(k) == best._1 && s(k + 1) == best._2) {
                  out += s(k) + s(k + 1); k += 2
                } else { out += s(k); k += 1 }
              }
              syms(i) = out.toArray
              addWord(deltas, i, 1L)
            }
          }
        }
        deltas.remove(best) // removed above; its own -delta is settled
        applyDeltas(deltas)
      }
      rounds += 1
    }
    merges.toSeq
  }

  /** The full-recount reference trainer — the pre-optimization loop kept
    * as the parity oracle for [[trainFromVocab]] (recounts ALL pairs
    * every round; O(rounds × corpus-vocab symbols), driver-side). Same
    * determinism contract, including the [[cpOrder]] tie-break. */
  private[graft] def trainFromVocabRecount(vocab: Seq[(String, Long)],
                                           numMerges: Int,
                                           minPairCount: Long = 2L): Seq[Merge] = {
    var words: Seq[(Vector[String], Long)] =
      vocab.map { case (w, f) => (initial(w), f) }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    var exhausted = false
    while (rounds < numMerges && !exhausted) {
      val counts = mutable.Map.empty[Merge, Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      val eligible = counts.filter(_._2 >= minPairCount)
      if (eligible.isEmpty) exhausted = true
      else {
        var best: Merge = null
        var bc = 0L
        eligible.foreach { case (p, c) =>
          if (best == null || c > bc || (c == bc && {
            val ca = cpCompare(p._1, best._1)
            ca < 0 || (ca == 0 && cpCompare(p._2, best._2) < 0)
          })) { best = p; bc = c }
        }
        merges += best
        words = words.map { case (syms, f) =>
          val out = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 &&
                syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toVector, f)
        }
      }
      rounds += 1
    }
    merges.toSeq
  }

  /** Codepoint-lexicographic string comparison — identical to DuckDB's
    * binary (UTF-8 byte order) VARCHAR collation, which Java's UTF-16
    * `compareTo` is NOT: a supplementary code point (surrogate pair,
    * U+10000+) compares BELOW U+E000..U+FFFF under UTF-16 unit order but
    * ABOVE under code-point order. Vocabulary ids are assigned in this
    * order so the oracle's `ORDER BY piece` replays them exactly. */
  private[graft] def cpCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** [[cpCompare]] as an Ordering. */
  val cpOrder: Ordering[String] = (x: String, y: String) => cpCompare(x, y)

  /** The corpus ALPHABET: every distinct initial symbol (code point or
    * the end-of-word marker) across the whitespace tokens of `textCol`.
    * Distributed with a per-partition distinct set — bounded by the
    * charset, not the vocabulary (a partition's set holds single code
    * points plus `</w>`, ≤ ~1.1M entries worst-case, typically tiny) —
    * then a distinct whose exchange carries only per-partition-distinct
    * symbols. Returned sorted by [[cpOrder]] (the id-assignment order).
    * NULL-text rows contribute nothing. */
  def alphabetOf(docs: DataFrame, textCol: String,
                 preTok: PreTok = PreTok.Whitespace): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol).cast("string")).na.drop()
      .as[String]
      .mapPartitions { it =>
        val seen = mutable.HashSet.empty[String]
        it.foreach { t =>
          preTok.jvmSplit(t).foreach(w => initial(w).foreach(seen += _))
        }
        seen.iterator
      }
      .distinct()
      .collect()
      .sorted(cpOrder)
      .toSeq
  }

  /** The 256 byte pieces backing [[encode]]'s byte-level fallback —
    * SentencePiece's convention (`<0x00>`..`<0xFF>`): synthetic piece
    * strings that can never collide with a real piece (real alphabet
    * symbols are single code points or `</w>`; merge products
    * concatenate them). */
  val ByteSymbols: IndexedSeq[String] =
    (0 until 256).map(b => f"<0x$b%02X>")

  /** A piece's byte-level decomposition: its UTF-8 bytes as
    * [[ByteSymbols]] pieces. Total — every string decomposes, so an
    * encoder whose vocabulary carries the byte pieces can NEVER emit
    * unk on any input. */
  def byteFallbackPieces(piece: String): Seq[String] =
    piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .toSeq.map(b => ByteSymbols(b & 0xff))

  /** The PIECE VOCABULARY under a trained merge list: ids `0..A-1` for
    * the alphabet in [[cpOrder]], id `A + r` for merge `r`'s product
    * (0-based rank). Ids are STABLE, never compacted: a product string
    * that collides with an earlier piece (possible — two merge paths can
    * build the same string) resolves to the EARLIER id via [[vocabIds]]'
    * first-wins map while its own slot stays allocated, so adding merges
    * never renumbers existing pieces (the property a trainer's embedding
    * table depends on).
    *
    * `byteFallback = true` folds the 256 [[ByteSymbols]] into the
    * alphabet (same [[cpOrder]] id assignment — they are ordinary
    * pieces, so the oracle's `ORDER BY piece` replays the ids), making
    * the vocabulary TOTAL: [[encode]] can decompose any out-of-alphabet
    * piece to byte pieces instead of emitting unk. */
  def vocabOf(alphabet: Seq[String], merges: Seq[Merge],
              byteFallback: Boolean = false): IndexedSeq[String] = {
    val alpha =
      if (byteFallback) (alphabet ++ ByteSymbols).distinct else alphabet
    (alpha.sorted(cpOrder) ++ merges.map(m => m._1 + m._2)).toIndexedSeq
  }

  /** piece → id, first occurrence wins (see [[vocabOf]]). */
  def vocabIds(vocab: Seq[String]): Map[String, Long] =
    vocab.iterator.zipWithIndex
      .foldLeft(Map.empty[String, Long]) { case (m, (p, i)) =>
        if (m.contains(p)) m else m + (p -> i.toLong)
      }

  /** Per-document BPE ENCODING — the operator that turns text into the
    * unit a training run consumes: (idCol, pieces, token_ids, n_tokens,
    * n_unk), one output row per non-NULL-text input row, token ids
    * against [[vocabOf]]'s stable id space.
    *
    * A piece absent from `vocab` — only possible when encoding NEW text
    * under a frozen vocabulary whose alphabet misses some of its code
    * points (at crawl scale a certainty: one emoji) — resolves by
    * policy, strictest first:
    *  - `byteFallback = true` (requires the [[ByteSymbols]] pieces in
    *    `vocab`, see [[vocabOf]]): the piece decomposes to its UTF-8
    *    byte pieces — encoding is TOTAL, unk is unrepresentable, and
    *    `pieces`/`token_ids` stay position-aligned (the byte pieces
    *    replace the unknown piece in both).
    *  - `failOnUnk = true`: the encode job fails loud (an
    *    IllegalStateException naming the piece) instead of shipping a
    *    poisoned id into a trainer.
    *  - otherwise: the piece keeps its slot and `unkId` rides
    *    `token_ids` — and `n_unk` counts it, so a funnel can gate on
    *    `n_unk > 0` instead of discovering −1 in an embedding lookup.
    * `n_unk` counts out-of-vocabulary pieces under EVERY policy (with
    * fallback it counts byte-decomposed pieces), so the column is the
    * frozen-tokenizer drift telemetry either way.
    *
    * Scale shape is [[pieceCounts]]': the merge-rank map and the id map
    * broadcast (O(numMerges + |vocab|), driver artifacts by
    * construction), each scan task tokenizes with the exact
    * [[TextAnalysis.jvmTokens]] twin and segments through a
    * per-partition memo capped at [[MemoCap]] distinct words, and the
    * output rides the scan — the corpus text crosses no exchange and the
    * driver collects nothing. The `pieces` column exists for audit
    * joins; because the encoder is an OPAQUE mapPartitions, Catalyst
    * cannot prune it for a consumer that selects only `token_ids` (the
    * piece strings would still be built and serialized row by row) —
    * such callers pass `emitPieces = false`, which drops the column from
    * the output schema and skips constructing the strings entirely.
    * Token ids, counts and every unk policy are bitwise unaffected. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge], vocab: Seq[String],
             unkId: Long = -1L, byteFallback: Boolean = false,
             failOnUnk: Boolean = false,
             preTok: PreTok = PreTok.Whitespace,
             emitPieces: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    if (byteFallback) {
      val vs = vocab.toSet
      require(ByteSymbols.forall(vs.contains),
        "byteFallback requires the 256 byte pieces in the vocabulary — " +
          "build it with vocabOf(alphabet, merges, byteFallback = true)")
    }
    val rankB = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val idsB = spark.sparkContext.broadcast(vocabIds(vocab))
    val idField = docs.schema(docs.schema.fieldIndex(idCol))
    val piecesField = StructField("pieces",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false))
    val outSchema = StructType(Seq(idField) ++
      (if (emitPieces) Seq(piecesField) else Nil) ++ Seq(
      StructField("token_ids",
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)),
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_unk", LongType, nullable = false)))
    docs.select(col(idCol), col(textCol).cast("string"))
      .mapPartitions { rows =>
        val rank = rankB.value
        val ids = idsB.value
        // memo per DISTINCT word: the fully ENCODED form (ids + piece
        // strings + unk count), not just the segmentation — Zipfian
        // corpora repeat words heavily, so the per-piece vocabulary
        // lookups and fallback branches run once per distinct word per
        // task instead of once per occurrence; the per-occurrence work
        // is two array appends (bitwise the per-piece replay,
        // parity spec-pinned)
        val memo = new java.util.HashMap[String, EncodedWord](1 << 12)
        rows.flatMap { r =>
          if (r.isNullAt(1)) None
          else {
            val toks = preTok.jvmSplit(r.getString(1))
            val pieces =
              if (emitPieces) mutable.ArrayBuffer.empty[String] else null
            val tids = mutable.ArrayBuffer.empty[Long]
            var nUnk = 0L
            var i = 0
            while (i < toks.length) {
              val w = toks(i)
              var e = memo.get(w)
              if (e == null) {
                e = encodeSegmented(segmentRanked(w, rank), ids, unkId,
                  byteFallback, failOnUnk, emitPieces, "BPE encode")
                if (memo.size < MemoCap) memo.put(w, e)
              }
              tids ++= e.tids
              if (emitPieces) pieces ++= e.pieces
              nUnk += e.nUnk
              i += 1
            }
            Some(
              if (emitPieces)
                Row(r.get(0), pieces.toSeq, tids.toSeq,
                  tids.length.toLong, nUnk)
              else Row(r.get(0), tids.toSeq, tids.length.toLong, nUnk))
          }
        }
      }(Encoders.row(outSchema))
  }

  /** A word's fully ENCODED form — the per-distinct-word memo entry of
    * [[encode]] / [[Unigram.encode]] / [[Unigram.encodeSampled]]:
    * vocabulary ids, the piece strings that produced them (null when
    * the caller skips pieces), and the word's unknown-piece count. */
  private[graft] final class EncodedWord(val tids: Array[Long],
                                         val pieces: Array[String],
                                         val nUnk: Long)

  /** Map one segmented word to its [[EncodedWord]] under the shared
    * unk/byte-fallback policy — the per-piece block all three encoders
    * formerly ran per OCCURRENCE, now run once per distinct word (the
    * memo above). `what` names the caller in the failOnUnk message
    * (exact legacy texts: "BPE encode", "unigram encode",
    * "unigram encodeSampled"). */
  private[graft] def encodeSegmented(segd: Seq[String],
                                     ids: Map[String, Long], unkId: Long,
                                     byteFallback: Boolean,
                                     failOnUnk: Boolean,
                                     emitPieces: Boolean,
                                     what: String): EncodedWord = {
    val pieces =
      if (emitPieces) new mutable.ArrayBuffer[String](segd.length) else null
    val tids = new mutable.ArrayBuffer[Long](segd.length)
    var nUnk = 0L
    segd.foreach { pc =>
      ids.get(pc) match {
        case Some(v) =>
          if (emitPieces) pieces += pc
          tids += v
        case None =>
          nUnk += 1
          if (byteFallback) byteFallbackPieces(pc).foreach { bp =>
            if (emitPieces) pieces += bp
            tids += ids(bp)
          }
          else if (failOnUnk) throw new IllegalStateException(
            s"$what: piece '$pc' is not in the frozen vocabulary " +
              "(failOnUnk policy; enable byteFallback for total encoding)")
          else {
            if (emitPieces) pieces += pc
            tids += unkId
          }
      }
    }
    new EncodedWord(tids.toArray,
      if (emitPieces) pieces.toArray else null, nUnk)
  }

  /** Reverse byte-symbol lookup for [[decodeTokens]]: `<0xNN>` → NN. */
  private val ByteSymbolValue: Map[String, Int] =
    ByteSymbols.zipWithIndex.toMap

  /** DETOKENIZE one id sequence — [[encode]]'s inverse: ids → pieces →
    * text, with `<0xNN>` byte-piece RUNS reassembled as UTF-8. Returns
    * (text, n_invalid).
    *
    * Inverse contract (the roundtrip spec pins it): `decodeTokens ∘
    * encode` reproduces the WHITESPACE-NORMALIZED text — the token list
    * joined by single spaces (`jvmTokens(text).mkString(" ")`, exactly
    * DuckDB's `array_to_string(string_split_regex(trim(text),'\s+'),' ')`)
    * — because the `</w>` marker records word boundaries, not which
    * whitespace drew them. Word boundaries are resolved PER PIECE (a
    * piece that IS or ENDS WITH the marker closes a word), never by
    * string-replacing the concatenation, so literal `<`,`/`,`w`,`>`
    * characters in the corpus cannot fabricate boundaries. The one
    * irreducible ambiguity is [[vocabOf]]'s documented first-wins
    * collision: a merge product SPELLED exactly like the marker (or like
    * a `<0xNN>` symbol under byte fallback) aliases that piece's id and
    * decodes as it — the price of a string-keyed vocabulary, absent
    * until a trainer actually learns those merges.
    *
    * Invalid byte sequences (a byte-piece run that is not valid UTF-8 —
    * possible in hand-built or corrupted streams, never produced by
    * [[encode]]'s own byte decomposition): each malformed sequence
    * becomes one U+FFFD replacement and counts in `n_invalid`, or fails
    * loud under `failOnInvalid`. Ids outside `[0, |vocab|)` — an unk id
    * or a pack separator — ALWAYS fail loud: gate on `n_unk` upstream
    * and split pack streams on `sepId` ([[decodePack]]) first. */
  def decodeTokens(ids: Seq[Long], vocab: IndexedSeq[String],
                   failOnInvalid: Boolean = false): (String, Long) = {
    val sb = new java.lang.StringBuilder
    val run = new java.io.ByteArrayOutputStream
    var nInvalid = 0L
    def flushRun(): Unit = if (run.size > 0) {
      val arr = run.toByteArray
      run.reset()
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val in = java.nio.ByteBuffer.wrap(arr)
      // ≤ 1 char out per byte in (replacements consume ≥ 1 byte too)
      val out = java.nio.CharBuffer.allocate(arr.length)
      var done = false
      while (!done) {
        val r = dec.decode(in, out, true)
        if (r.isMalformed || r.isUnmappable) {
          if (failOnInvalid) throw new IllegalStateException(
            s"BPE decode: byte-piece run is not valid UTF-8 at byte " +
              s"offset ${in.position()} (failOnInvalid policy)")
          nInvalid += 1
          out.put('�')
          in.position(in.position() + r.length)
        } else {
          dec.flush(out)
          done = true
        }
      }
      out.flip()
      sb.append(out)
    }
    ids.foreach { id =>
      require(id >= 0L && id < vocab.length,
        s"token id $id is outside the vocabulary [0, ${vocab.length}) — " +
          "an unk id (or a pack-stream separator) cannot decode; gate on " +
          "n_unk upstream, or split the stream on sepId (decodePack) first")
      val piece = vocab(id.toInt)
      ByteSymbolValue.get(piece) match {
        case Some(b) => run.write(b)
        case None =>
          flushRun()
          if (piece == EndOfWord) sb.append(' ')
          else if (piece.endsWith(EndOfWord)) {
            sb.append(piece, 0, piece.length - EndOfWord.length)
            sb.append(' ')
          } else sb.append(piece)
      }
    }
    flushRun()
    // the FINAL token's boundary marker draws no space in the
    // space-joined normal form — drop exactly one trailing space
    if (sb.length > 0 && sb.charAt(sb.length - 1) == ' ')
      sb.setLength(sb.length - 1)
    (sb.toString, nInvalid)
  }

  /** Per-document DETOKENIZATION over a frame of id sequences — the
    * first tool anyone reaches for when debugging a training corpus:
    * (idCol, text, n_invalid), one row per input row, text per
    * [[decodeTokens]]' contract (the whitespace-normalized inverse).
    * NULL id sequences pass through as NULL text (the encode side never
    * emits them, but a left-joined loader artifact can).
    *
    * Scale shape mirrors [[encode]]: the vocabulary broadcasts (a
    * tokenizer-sized driver artifact by construction), decoding rides
    * the scan, and nothing collects — the ids cross no exchange. */
  def decode(encoded: DataFrame, idCol: String, idsCol: String,
             vocab: Seq[String],
             failOnInvalid: Boolean = false): DataFrame = {
    val spark = encoded.sparkSession
    val vocabB = spark.sparkContext.broadcast(vocab.toIndexedSeq)
    val idField = encoded.schema(encoded.schema.fieldIndex(idCol))
    val outSchema = StructType(Seq(
      idField,
      StructField("text", org.apache.spark.sql.types.StringType),
      StructField("n_invalid", LongType, nullable = false)))
    encoded.select(col(idCol), col(idsCol))
      .mapPartitions { rows =>
        val v = vocabB.value
        rows.map { r =>
          if (r.isNullAt(1)) Row(r.get(0), null, 0L)
          else {
            val (text, nInv) =
              decodeTokens(r.getSeq[Long](1), v, failOnInvalid)
            Row(r.get(0), text, nInv)
          }
        }
      }(Encoders.row(outSchema))
  }

  /** Split one PACK token stream ([[Packing.packTokenStreams]]'s
    * `token_ids`) on its separator id back into member-document id
    * sequences. Every document in a pack ends with `sepId` by
    * construction, so a well-formed stream ends with one and yields
    * exactly `n_docs` sequences; a trailing unterminated run (a
    * truncated stream) is returned too rather than silently dropped. */
  def splitPack(ids: Seq[Long], sepId: Long): Seq[Seq[Long]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val cur = scala.collection.mutable.ArrayBuffer.empty[Long]
    ids.foreach { id =>
      if (id == sepId) { out += cur.toSeq; cur.clear() }
      else cur += id
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  /** Decode one pack row for HUMAN INSPECTION — [[splitPack]] +
    * [[decodeTokens]] per member document: Seq of (text, n_invalid) in
    * pack order. Driver-side by design (a pack is ~budget ids). */
  def decodePack(ids: Seq[Long], vocab: IndexedSeq[String], sepId: Long,
                 failOnInvalid: Boolean = false): Seq[(String, Long)] =
    splitPack(ids, sepId).map(decodeTokens(_, vocab, failOnInvalid))

  /** Persist a trained tokenizer (ordered merges + the stable-id
    * vocabulary + the PRE-TOKENIZATION POLICY) as parquet tables under
    * `dir` — the FROZEN artifact a deployment ships to every encode job
    * (and to the trainer's embedding-table build): `merges` (rank,
    * left, right), `vocab` (vid, piece), `meta` (key, value — records
    * `pretok`). Ids are positions in [[vocabOf]]'s sequence, so the
    * roundtrip preserves first-wins collision semantics exactly. The
    * policy is PART of the artifact because encoding under a different
    * split than the trainer's silently produces different tokens —
    * exactly the class of drift a frozen artifact exists to prevent. */
  /** The tokenizer's 64-bit denomination ([[graft.store.Denomination]]
    * — [[Unigram.modelHash]]'s BPE twin): merges in rank order, vocab
    * in id order, the pre-tokenization policy. Any drift in any of
    * them changes the hash. */
  def tokenizerHash(merges: Seq[Merge], vocab: Seq[String],
                    preTok: PreTok = PreTok.Whitespace): Long =
    graft.store.Denomination.hash64(
      Iterator("bpe", PreTok.nameOf(preTok)) ++
        merges.iterator.flatMap { case (a, b) => Iterator(a, b) } ++
        vocab.iterator)

  def saveTokenizer(spark: org.apache.spark.sql.SparkSession, dir: String,
                    merges: Seq[Merge], vocab: Seq[String],
                    preTok: PreTok = PreTok.Whitespace): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/merges")
    vocab.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("vid", "piece")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/vocab")
    Seq(("pretok", PreTok.nameOf(preTok)))
      .toDF("key", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a [[saveTokenizer]] artifact: (merges in rank order, vocab in
    * id order, pre-tokenization policy). Artifacts written before the
    * policy existed (no `meta` table) load as [[PreTok.Whitespace]] —
    * the split they were trained under; an UNKNOWN recorded policy
    * fails loud ([[PreTok.fromName]]). All tables are tokenizer-sized
    * driver artifacts by construction. */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession,
                    dir: String): (Seq[Merge], IndexedSeq[String], PreTok) = {
    val merges = spark.read.parquet(s"$dir/merges")
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = spark.read.parquet(s"$dir/vocab")
      .orderBy("vid").collect().map(_.getString(1)).toIndexedSeq
    val preTok =
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "meta")))
        PreTok.Whitespace
      else spark.read.parquet(s"$dir/meta").collect()
        .collectFirst { case r if r.getString(0) == "pretok" =>
          PreTok.fromName(r.getString(1))
        }.getOrElse(PreTok.Whitespace)
    (merges, vocab, preTok)
  }

  /** Per-document piece counts under a trained merge table, computed
    * entirely in executors: the merge-rank map (O(numMerges)) broadcasts,
    * each scan task tokenizes with [[TextAnalysis.jvmTokens]] (the exact
    * twin of the [[tokens]] column, BpeSpec pins parity) and segments
    * through a per-partition memo capped at [[MemoCap]] distinct words,
    * and only (id, n_words, n_pieces) rows reach the final aggregation.
    * The corpus text crosses no exchange; the driver collects NOTHING —
    * unlike [[train]] there is no vocab-sized table here at all.
    * Output: (idCol, n_words, n_pieces) — n_pieces includes each word's
    * end-of-word marker piece (so an unmergeable 1-char word still
    * counts ≥ 1... its chars + marker may have merged to a single
    * piece). Documents with a NULL `textCol` are absent from the output,
    * matching the previous explode-based form. */
  def pieceCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge],
                  preTok: PreTok = PreTok.Whitespace): DataFrame = {
    val spark = docs.sparkSession
    val rankB = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val idField = docs.schema(docs.schema.fieldIndex(idCol))
    val outSchema = StructType(Seq(
      idField,
      StructField("n_words", LongType, nullable = false),
      StructField("n_pieces", LongType, nullable = false)))
    val perDoc = docs.select(col(idCol), col(textCol).cast("string"))
      .mapPartitions { rows =>
        val rank = rankB.value
        val memo = new java.util.HashMap[String, java.lang.Long](1 << 12)
        rows.flatMap { r =>
          if (r.isNullAt(1)) None
          else {
            val toks = preTok.jvmSplit(r.getString(1))
            var pieces = 0L
            var i = 0
            while (i < toks.length) {
              val w = toks(i)
              var p = memo.get(w)
              if (p == null) {
                p = java.lang.Long.valueOf(
                  segmentRanked(w, rank).length.toLong)
                if (memo.size < MemoCap) memo.put(w, p)
              }
              pieces += p.longValue
              i += 1
            }
            Some(Row(r.get(0), toks.length.toLong, pieces))
          }
        }
      }(Encoders.row(outSchema))
    perDoc.groupBy(col(idCol))
      .agg(sum("n_words").as("n_words"), sum("n_pieces").as("n_pieces"))
  }

  /** Tokenizer FERTILITY by group — the number tokenizer teams watch
    * per language: how many pieces the frozen merge table spends per
    * 1000 characters (and per word, in milli) of each `groupCol`
    * slice. A language pinned at the one-piece-per-char ceiling
    * (≈1000+/kchar plus the end-of-word marker overhead — what a
    * whitespace-trained table does to CJK, since every CJK-bearing
    * word is unique and learns no merges; each of those pieces then
    * costs ~3 byte-fallback ids at encode time) is the signal to
    * retrain with [[PreTok.CpClass]] — the q136 fix, here as a
    * monitored number instead of a planted spec. Exact integer
    * arithmetic throughout (scaled div, no floats), so the report is
    * oracle-checkable bit for bit.
    *
    * Output: (groupCol, n_docs, n_words, n_pieces, n_chars,
    * pieces_per_kchar, pieces_per_word_milli). NULL-text documents are
    * absent (the [[pieceCounts]] contract). Scale shape: rides
    * [[pieceCounts]]'s in-scan segmentation (text crosses no exchange);
    * one groupBy on the bounded group key. */
  def fertility(docs: DataFrame, idCol: String, textCol: String,
                groupCol: String, merges: Seq[Merge],
                preTok: PreTok = PreTok.Whitespace): DataFrame = {
    val pc = pieceCounts(docs, idCol, textCol, merges, preTok)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(groupCol),
        length(col(textCol)).cast("long").as("_fr_chars"))
      .join(pc, Seq(idCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_pieces").as("n_pieces"),
        sum("_fr_chars").as("n_chars"))
      .withColumn("pieces_per_kchar",
        expr("n_pieces * 1000L div n_chars"))
      .withColumn("pieces_per_word_milli",
        expr("n_pieces * 1000L div n_words"))
  }
}
