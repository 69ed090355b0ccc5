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
