package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Near-duplicate dedup under continuous ingestion: each micro-batch is
  * filtered against a persistent MinHash band-bucket index, then claims its
  * buckets (the `foreachBatch` body of a streaming dedup pipeline — exact
  * streaming dedup is [[StreamDedup]]; this is the LSH analog).
  *
  * Semantics (deterministic, transitive): a document is DROPPED iff any of
  * its 4 band buckets is already claimed by the store, or a smaller-id
  * document in the same batch shares one of its buckets. ALL incoming
  * documents claim their buckets — including dropped ones — so chains of
  * near-dups collapse to the earliest representative (same policy as
  * offline LSH dedup keeping the min-id doc per cluster).
  *
  * Scale: the filter is one broadcast/shuffle semi-join of (id, 4 band
  * keys) against the bucket index — the corpus text never re-processes;
  * signatures come from the codegen'd [[graft.functions.MinHashSig]] in
  * the scan. The bucket snapshot is the same atomic pointer-swap pattern
  * as [[graft.store.ItemStore]]; at 100 TB the index becomes a key-value
  * table bucketed by band key, the join logic unchanged.
  */
final class IncrementalDedup(spark: SparkSession, root: String) {

  private val rootPath: Path = Paths.get(root)
  private val pointer: Path = rootPath.resolve("current")
  // claimant id makes the filter idempotent under micro-batch REPLAY: a
  // bucket claimed by YOURSELF is not a duplicate, so a re-run of the same
  // batch after a crash between claim-commit and downstream write keeps
  // the same rows instead of dropping everything
  private val schema = StructType(Seq(
    StructField("bkey", StringType, nullable = false),
    StructField("claimant", org.apache.spark.sql.types.LongType, nullable = false)))

  def init(): Unit = {
    Files.createDirectories(rootPath)
    if (!Files.exists(pointer)) {
      val snap = rootPath.resolve("snap-0").toString
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(snap)
      commitPointer("snap-0")
    }
  }

  def buckets(): DataFrame =
    spark.read.schema(schema).parquet(currentSnapDir)

  /** (id, bkey) band-bucket keys per document: band index prefixed onto the
    * 4-row signature slice, same banding as [[graft.operators.Dedup
    * .minhashPairs]]. Docs with < 3 tokens have no signature and pass
    * through undeduplicated (no shingles → nothing to collide on). */
  private def bandKeys(batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.MinHashSig.ensureRegistered(batch.sparkSession)
    batch
      .select(col(idCol).as("id"), graft.functions.MinHashSig(col(textCol)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), explode(array((0 until 4).map { bnd =>
        concat_ws(",", lit(bnd) +:
          (0 until 4).map(r => col("sig").getItem(bnd * 4 + r)): _*)
      }: _*)).as("bkey"))
  }

  /** Filters `batch` to its novel documents and claims all of the batch's
    * buckets in a new snapshot. Returns the kept rows (original columns). */
  def filterAndClaim(batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val previous = new String(Files.readAllBytes(pointer)).trim
    val bands = bandKeys(batch, idCol, textCol).localCheckpoint(true)
    // dropped: bucket already claimed by SOMEONE ELSE in the store…
    val storeDup = bands.join(buckets(), "bkey")
      .filter(col("claimant") =!= col("id")).select("id")
    // …or a smaller id in this batch shares the bucket
    val batchMin = bands.groupBy("bkey").agg(min(col("id")).as("min_id"))
    val batchDup = bands.join(batchMin, "bkey")
      .filter(col("id") > col("min_id")).select("id")
    val dropIds = storeDup.unionAll(batchDup).distinct()
    val kept = batch.join(dropIds.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      .localCheckpoint(true) // materialize BEFORE the snapshot advances
    // claim: unclaimed buckets get the batch's min id; existing claims win
    // (first-writer-wins keeps replays stable)
    val newClaims = bands.groupBy("bkey").agg(min(col("id")).as("claimant"))
      .join(buckets(), Seq("bkey"), "left_anti")
    val newBuckets = buckets().unionAll(newClaims)
    val snap = s"snap-${System.nanoTime()}"
    newBuckets.write.mode("overwrite").parquet(rootPath.resolve(snap).toString)
    commitPointer(snap)
    deleteRecursively(rootPath.resolve(previous))
    kept
  }

  private def currentSnapDir: String =
    rootPath.resolve(new String(Files.readAllBytes(pointer)).trim).toString

  private def commitPointer(snap: String): Unit = {
    val tmp = rootPath.resolve("current.tmp")
    Files.write(tmp, snap.getBytes)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
}
