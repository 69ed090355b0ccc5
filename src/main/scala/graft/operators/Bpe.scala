package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis.tokens

/** BPE tokenizer TRAINING over the corpus — the vocabulary-construction
  * step of a pretraining pipeline (q37 counts tokens with a fixed
  * BPE-ish rule; this learns the merge table itself, Sennrich et al.
  * 2016, arXiv 1508.07909).
  *
  * Decomposition is the standard one (and the same shape as the IVF
  * codebooks): the CORPUS pass is distributed — one in-scan tokenize +
  * one aggregation to the word-frequency table — and the merge loop runs
  * on the DRIVER over that table, which is vocab-sized, not corpus-sized
  * (production tokenizer trainers are built exactly this way: distributed
  * pre-tokenization, in-memory merges). Applying the trained table is
  * again corpus-scale Spark: every DISTINCT word segments once on the
  * driver (the segmentation of a word depends only on the word), the
  * word → piece-count map broadcasts, and the per-document counts are an
  * explode + broadcast-join + sum — the corpus text never shuffles.
  *
  * Determinism contract (specs pin it): pair selection is by highest
  * count, ties broken by the lexicographically SMALLEST (left, right)
  * pair; words segment to characters plus a terminal `</w>` marker, so
  * suffix pieces are distinct from prefix pieces. Training stops early
  * when no pair occurs at least `minPairCount` times.
  */
object Bpe {

  type Merge = (String, String)

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
  def segment(word: String, merges: Seq[Merge]): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
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

  /** Train `numMerges` BPE merges from the collected word-frequency
    * table. Driver memory is O(vocab); the corpus was touched exactly
    * once, by [[wordFrequencies]]'s aggregation. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val vocab = wordFrequencies(docs, textCol).collect()
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

  /** Per-document piece counts under a trained merge table: every
    * DISTINCT corpus word segments once on the driver, the
    * word → piece-count map broadcasts, and the corpus pays one explode +
    * broadcast join + sum. Output: (idCol, n_words, n_pieces) — n_pieces
    * includes each word's end-of-word marker piece (so an unmergeable
    * 1-char word still counts ≥ 1... its chars + marker may have merged
    * to a single piece). */
  def pieceCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(tokens(col(textCol))).as("word"))
      .distinct().as[String].collect()
    val pieceOf = words.map(w => (w, segment(w, merges).length.toLong)).toSeq
    val local = spark.createDataFrame(pieceOf).toDF("word", "_pieces")
    docs.select(col(idCol), explode(tokens(col(textCol))).as("word"))
      .join(broadcast(local), "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum(col("_pieces")).as("n_pieces"))
  }
}
