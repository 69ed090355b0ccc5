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
    * plus the end-of-word marker. */
  private def initial(word: String): Vector[String] = {
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

  /** The distributed corpus pass: (word, frequency) over the whitespace
    * tokens of `textCol`. */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
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
            maxVocab: Int = DefaultMaxVocab): Seq[Merge] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(maxVocab > 0, "maxVocab must be > 0")
    val vocab = wordFrequencies(docs, textCol)
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromVocab(vocab.toIndexedSeq, numMerges, minPairCount)
  }

  /** The merge loop itself, pure and testable: greedy highest-count pair,
    * lexicographic tie-break, early stop under `minPairCount`. */
  def trainFromVocab(vocab: Seq[(String, Long)], numMerges: Int,
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
        val best = eligible.minBy { case ((a, b), c) => (-c, a, b) }._1
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
  def alphabetOf(docs: DataFrame, textCol: String): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol).cast("string")).na.drop()
      .as[String]
      .mapPartitions { it =>
        val seen = mutable.HashSet.empty[String]
        it.foreach { t =>
          TextAnalysis.jvmTokens(t).foreach(w => initial(w).foreach(seen += _))
        }
        seen.iterator
      }
      .distinct()
      .collect()
      .sorted(cpOrder)
      .toSeq
  }

  /** The PIECE VOCABULARY under a trained merge list: ids `0..A-1` for
    * the alphabet in [[cpOrder]], id `A + r` for merge `r`'s product
    * (0-based rank). Ids are STABLE, never compacted: a product string
    * that collides with an earlier piece (possible — two merge paths can
    * build the same string) resolves to the EARLIER id via [[vocabIds]]'
    * first-wins map while its own slot stays allocated, so adding merges
    * never renumbers existing pieces (the property a trainer's embedding
    * table depends on). */
  def vocabOf(alphabet: Seq[String], merges: Seq[Merge]): IndexedSeq[String] =
    (alphabet.sorted(cpOrder) ++ merges.map(m => m._1 + m._2)).toIndexedSeq

  /** piece → id, first occurrence wins (see [[vocabOf]]). */
  def vocabIds(vocab: Seq[String]): Map[String, Long] =
    vocab.iterator.zipWithIndex
      .foldLeft(Map.empty[String, Long]) { case (m, (p, i)) =>
        if (m.contains(p)) m else m + (p -> i.toLong)
      }

  /** Per-document BPE ENCODING — the operator that turns text into the
    * unit a training run consumes: (idCol, pieces, token_ids, n_tokens),
    * one output row per non-NULL-text input row, token ids against
    * [[vocabOf]]'s stable id space (pieces absent from `vocab` — only
    * possible when encoding NEW text under a frozen vocabulary whose
    * alphabet misses some of its code points — get `unkId`).
    *
    * Scale shape is [[pieceCounts]]': the merge-rank map and the id map
    * broadcast (O(numMerges + |vocab|), driver artifacts by
    * construction), each scan task tokenizes with the exact
    * [[TextAnalysis.jvmTokens]] twin and segments through a
    * per-partition memo capped at [[MemoCap]] distinct words, and the
    * output rides the scan — the corpus text crosses no exchange and the
    * driver collects nothing. The `pieces` column exists for audit
    * joins; a loader that selects only `token_ids` prunes it at the
    * scan. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge], vocab: Seq[String],
             unkId: Long = -1L): DataFrame = {
    val spark = docs.sparkSession
    val rankB = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val idsB = spark.sparkContext.broadcast(vocabIds(vocab))
    val idField = docs.schema(docs.schema.fieldIndex(idCol))
    val outSchema = StructType(Seq(
      idField,
      StructField("pieces",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = false)),
      StructField("token_ids",
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)),
      StructField("n_tokens", LongType, nullable = false)))
    docs.select(col(idCol), col(textCol).cast("string"))
      .mapPartitions { rows =>
        val rank = rankB.value
        val ids = idsB.value
        val memo = new java.util.HashMap[String, Array[String]](1 << 12)
        rows.flatMap { r =>
          if (r.isNullAt(1)) None
          else {
            val toks = TextAnalysis.jvmTokens(r.getString(1))
            val pieces = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < toks.length) {
              val w = toks(i)
              var p = memo.get(w)
              if (p == null) {
                p = segmentRanked(w, rank).toArray
                if (memo.size < MemoCap) memo.put(w, p)
              }
              pieces ++= p
              i += 1
            }
            val tids = pieces.map(pc => ids.getOrElse(pc, unkId))
            Some(Row(r.get(0), pieces.toSeq, tids.toSeq,
              pieces.length.toLong))
          }
        }
      }(Encoders.row(outSchema))
  }

  /** Persist a trained tokenizer (ordered merges + the stable-id
    * vocabulary) as two parquet tables under `dir` — the FROZEN artifact
    * a deployment ships to every encode job (and to the trainer's
    * embedding-table build): `merges` (rank, left, right) and `vocab`
    * (vid, piece). Ids are positions in [[vocabOf]]'s sequence, so the
    * roundtrip preserves first-wins collision semantics exactly. */
  def saveTokenizer(spark: org.apache.spark.sql.SparkSession, dir: String,
                    merges: Seq[Merge], vocab: Seq[String]): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/merges")
    vocab.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("vid", "piece")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** Load a [[saveTokenizer]] artifact: (merges in rank order, vocab in
    * id order). Both tables are tokenizer-sized driver artifacts by
    * construction. */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession,
                    dir: String): (Seq[Merge], IndexedSeq[String]) = {
    val merges = spark.read.parquet(s"$dir/merges")
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = spark.read.parquet(s"$dir/vocab")
      .orderBy("vid").collect().map(_.getString(1)).toIndexedSeq
    (merges, vocab)
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
                  merges: Seq[Merge]): DataFrame = {
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
            val toks = TextAnalysis.jvmTokens(r.getString(1))
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
}
