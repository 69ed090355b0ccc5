package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Dedup

/** Parity: the one-pass codegen'd signature/shingle-set expressions must be
  * bitwise-identical to the composed built-ins pipelines they replace. */
class MinHashSigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("minhash_sig equals the explode+groupBy composed pipeline on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val composed = Dedup.minhashSignatures(docs, "doc_id", "text")
    val exprSide = docs
      .select(col("doc_id").as("id"), MinHashSig(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id") +: (0 until MinHashSig.K).map(k =>
        col("sig").getItem(k).as(s"sig_$k")): _*)
    assert(composed.count() > 0)
    assert(exprSide.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(exprSide).count() == 0)
  }

  test("minhash_sig is NULL for docs with fewer than 3 tokens") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      "SELECT minhash_sig('one two') IS NULL, minhash_sig('one two three') IS NULL").head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("simhash_sig equals the explode+groupBy composed pipeline on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val composed = Dedup.simhashSignaturesPortable(docs, "doc_id", "text")
    val exprSide = Dedup.simhashSignatures(docs, "doc_id", "text")
    assert(composed.count() > 0)
    assert(exprSide.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(exprSide).count() == 0)
  }

  test("hyperplane_bucket equals the composed 8-fold HOF form on real vectors") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("vecd", graft.operators.Similarity.vecD(col("embedding")))
    val diff = emb.select(
      HyperplaneBucket(col("vecd")).as("a"),
      graft.operators.Similarity.hyperplaneBucketPortable(col("vecd")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
    val distinctBuckets = emb.select(HyperplaneBucket(col("vecd"))).distinct().count()
    assert(distinctBuckets > 1) // hashes actually spread the corpus
  }

  test("native expressions match portable forms on adversarial whitespace") {
    import spark.implicits._
    // leading/trailing tabs & newlines: Java trim/split diverge from
    // Spark/DuckDB tokenization here — jvmTokens must not
    val docs = Seq((1L, "foo bar baz\n"), (2L, "\tfoo bar baz qux"),
      (3L, "a b c \n"), (4L, " x\ty z w\n\n"), (5L, "\n"), (6L, "plain one two three"))
      .toDF("doc_id", "text")
    val simN = Dedup.simhashSignatures(docs, "doc_id", "text")
    val simP = Dedup.simhashSignaturesPortable(docs, "doc_id", "text")
    assert(simN.exceptAll(simP).count() == 0 && simP.exceptAll(simN).count() == 0)
    val mhN = docs.select(col("doc_id").as("id"), MinHashSig(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id") +: (0 until MinHashSig.K).map(k =>
        col("sig").getItem(k).as(s"sig_$k")): _*)
    val mhP = Dedup.minhashSignatures(docs, "doc_id", "text")
    assert(mhN.exceptAll(mhP).count() == 0 && mhP.exceptAll(mhN).count() == 0)
  }

  test("hyperplane_bucket with a null element matches the portable form (0)") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      "SELECT hyperplane_bucket(array(1.0d, CAST(NULL AS DOUBLE), 3.0d))").head
    assert(r.getLong(0) == 0L) // composed form: all projections NULL -> no bit set
  }

  test("word_shingle_set equals distinct(word_shingles) as a set, per doc") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val viaSet = docs.select(col("doc_id"),
      explode(WordShingleSet(col("text"))).as("g"))
    val viaDistinct = docs.select(col("doc_id"),
      explode(WordShingles(col("text"))).as("g")).distinct()
    assert(viaSet.count() == viaDistinct.count()) // set => already duplicate-free
    assert(viaSet.exceptAll(viaDistinct).count() == 0)
    assert(viaDistinct.exceptAll(viaSet).count() == 0)
  }
}
