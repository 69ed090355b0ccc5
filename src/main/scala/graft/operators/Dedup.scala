package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis._

/** Document deduplication suite for the training-data pipeline: exact
  * (normalized-hash groupBy), n-gram Jaccard with blocking, MinHash+LSH
  * (shingle → signature → band → bucket-join → exact verify), and SimHash
  * signatures. Everything is deterministic arithmetic on Catalyst built-ins,
  * so each stage has a DuckDB oracle twin.
  *
  * Scale notes (the 100 TB story):
  *  - exact dedup is one hash-aggregate shuffle on the normalized key — at
  *    scale, group on a 64-bit hash of the text, not the text itself, so the
  *    shuffle carries 8-byte keys (`exactGroups` keeps the text key only
  *    because the oracle needs string equality semantics).
  *  - n-gram Jaccard's all-pairs join is quadratic; `blockCols` (here:
  *    source) stands in for any honest blocking policy. MinHash/LSH is the
  *    scale path: linear in corpus size, pairs only form inside equal
  *    4-row band buckets.
  *  - the final exact-verify join only touches LSH candidates, so its cost
  *    is proportional to the (tiny) candidate set, not n².
  */
object Dedup {

  /** Normalization for exact dedup: lowercase, strip non-alphanumerics,
    * collapse whitespace. */
  def normalized(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Exact duplicate groups over the normalized text: canonical id = min id,
    * plus the copy count. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(normalized(col(textCol)).as("norm_text"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select("canonical_id", "n_copies")

  /** (id, g) distinct word-3-gram shingles per document.
    *
    * The token array is let-bound via a 1-element `transform` wrapper: a
    * naive `transform(sequence(...), i => concat(toks[i], ...))` re-evaluates
    * the regex split for every element_at reference (3 splits per gram —
    * observed 5× slowdown at sf0.1), because CollapseProject inlines the
    * projection into each consumer. Binding `t` as a lambda variable
    * evaluates the split exactly once per document.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
               extraCols: Seq[String] = Nil): DataFrame = {
    val grams = element_at(
      transform(array(tokens(col(textCol))), t =>
        when(size(t) >= 3,
          transform(sequence(lit(0), size(t) - 3),
            i => concat_ws(" ", element_at(t, i + 1),
              element_at(t, i + 2), element_at(t, i + 3))))
        .otherwise(array().cast("array<string>"))), 1)
    docs
      .select((col(idCol).as("id") +: extraCols.map(col)) :+ explode(grams).as("g"): _*)
      .distinct()
  }

  /** All-pairs n-gram Jaccard within blocks: pairs with jaccard ≥ threshold.
    * Output: id_a, id_b, common, sz_a, sz_b, jaccard. The threshold compare
    * is exact integer arithmetic (common·1000 ≥ t·(union)); the reported
    * jaccard double derives from the same integers.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], thresholdMilli: Int): DataFrame = {
    // the shingle set feeds three consumers (both join sides + sizes):
    // materialize once instead of re-exploding the corpus three times
    val sh = shingles(docs, idCol, textCol, blockCols)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = sh.as("a")
    val b = sh.as("b")
    val joinCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.g") === col("b.g") && col("a.id") < col("b.id"))(_ && _)
    val inter = a.join(b, joinCond)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .filter(col("common") * 1000 >= lit(thresholdMilli) * (col("sz_a") + col("sz_b") - col("common")))
      .select(col("id_a"), col("id_b"), col("common"), col("sz_a"), col("sz_b"),
        (col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common"))).as("jaccard"))
  }

  /** 16-function MinHash signature per document over hashed shingles:
    * sig_k = min over shingles of (a_k·H(g) + b_k) mod P. One shuffle
    * (groupBy id) computes all 16 mins as parallel aggregates — no
    * per-function pass, no explode of the hash family.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = shingles(docs, idCol, textCol)
      .withColumn("h", strHash(col("g")))
    val aggs = (0 until 16).map(k => min(rehash(col("h"), k)).as(s"sig_$k"))
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash LSH near-dup pairs: band the 16-value signature into 4 bands of
    * 4 rows; candidates share any full band; candidates are then exactly
    * verified with n-gram Jaccard ≥ threshold.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   thresholdMilli: Int): DataFrame = {
    // one materialized shingle set serves signature building, candidate
    // verification (both sides) and size counting — 4 consumers, 1 explode
    val sh = shingles(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = {
      val hashed = sh.withColumn("h", strHash(col("g")))
      val aggs = (0 until 16).map(k => min(rehash(col("h"), k)).as(s"sig_$k"))
      hashed.groupBy("id").agg(aggs.head, aggs.tail: _*)
    }
    val bands = (0 until 4).map { bnd =>
      sig.select(col("id"), lit(bnd).as("band"),
        concat_ws(",", (0 until 4).map(r => col(s"sig_${bnd * 4 + r}")): _*).as("bkey"))
    }.reduce(_ unionAll _)
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    // exact verify restricted to candidates
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = cand
      .join(sh.select(col("id").as("id_a"), col("g")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("g")), Seq("id_b", "g"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .filter(col("common") * 1000 >= lit(thresholdMilli) * (col("sz_a") + col("sz_b") - col("common")))
      .select(col("id_a"), col("id_b"), col("common"), col("sz_a"), col("sz_b"),
        (col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common"))).as("jaccard"))
  }

  /** 32-bit SimHash per document: bit j of the signature is set iff the
    * count-weighted majority of token hashes has bit j set. All 32 bit-sums
    * are parallel aggregates in a single groupBy — bit-parallel, no
    * 64-rows-per-token explode.
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("cnt"))
      .withColumn("h", strHash(col("w")))
    val bitSums = (0 until 32).map(j =>
      sum(shiftright(col("h"), j) % 2 * col("cnt")).as(s"b_$j"))
    val grouped = tok.groupBy("id")
      .agg(bitSums.head, (bitSums.tail :+ sum(col("cnt")).as("total")): _*)
    val sig = (0 until 32).map(j =>
      when(col(s"b_$j") * 2 > col("total"), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    grouped.select(col("id"), sig.as("simhash"))
  }
}
