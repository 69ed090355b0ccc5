package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** Micro-benchmark for the BPE trainer's incremental pair bookkeeping:
  * times [[Bpe.trainFromVocab]] (incremental) against
  * [[Bpe.trainFromVocabRecount]] (the full-recount reference) on the
  * REAL word-frequency table of a test-data documents corpus, and
  * asserts the two merge lists are bitwise identical.
  *
  * Usage: scripts/run.sh graft.tools.BpeTrainBench <sfDir> [nMerges]
  * (recount is additionally timed at min(nMerges, 1000) — its
  * O(rounds × symbols) cost makes the full count impractical, which is
  * the point being measured). */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nMerges = if (args.length > 1) args(1).toInt else 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    val corpusVocab = Bpe.wordFrequencies(docs, "text")
      .orderBy(org.apache.spark.sql.functions.col("freq").desc,
        org.apache.spark.sql.functions.col("word").asc)
      .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    // the synthetic test corpus holds ~31 distinct words — far too small
    // to exercise a trainer (real web vocabularies run 10^5-10^7 words),
    // so below a floor we measure on a deterministic Zipf-weighted
    // random vocabulary of web-like size instead
    val vocab =
      if (corpusVocab.size >= 50000) corpusVocab
      else {
        val rnd = new java.util.Random(1)
        val n = 200000
        println(s"corpus vocab ${corpusVocab.size} words — measuring on " +
          s"a synthetic $n-word Zipf vocabulary instead")
        (0 until n).map { i =>
          val len = 2 + rnd.nextInt(11)
          val w = new String(Array.fill(len)(('a' + rnd.nextInt(26)).toChar))
          (w, math.max(1L, (n.toLong * 10) / (i + 1))) // Zipf-ish
        }.distinct.toIndexedSeq
      }
    val symbols = vocab.iterator.map(_._1.length + 1).sum
    println(s"vocab: ${vocab.size} words, ~$symbols symbols")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val nSlow = math.min(nMerges, 1000)
    val (slow, tSlow) = time(Bpe.trainFromVocabRecount(vocab, nSlow))
    val (fastAtSlow, tFastAtSlow) = time(Bpe.trainFromVocab(vocab, nSlow))
    require(slow == fastAtSlow, "merge divergence at the comparison count")
    val (_, tFast) = time(Bpe.trainFromVocab(vocab, nMerges))
    println(f"recount@$nSlow: $tSlow%.2f s | incremental@$nSlow: " +
      f"$tFastAtSlow%.2f s (${tSlow / tFastAtSlow}%.1fx) | " +
      f"incremental@$nMerges: $tFast%.2f s")
    spark.stop()
  }
}
