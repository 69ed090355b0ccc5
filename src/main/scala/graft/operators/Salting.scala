package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (the
  * 100 TB reality: one hot key can pin an entire stage on one task).
  *
  * `saltedJoin` splits each hot key's rows across `r` sub-partitions by
  * salting the skewed side with a deterministic hash of a row-identifying
  * expression, and replicating the small side r times — the join key
  * becomes (key, salt), so the hot key fans out over r tasks. AQE's skew
  * join handles moderate skew automatically; explicit salting is the tool
  * when a single key exceeds what any one task can hold.
  */
object Salting {

  /** @param skewed  the large, skew-keyed side
    * @param small   the side cheap enough to replicate r times
    * @param key     equi-join key column name (present both sides)
    * @param saltBy  row-identifying expression on `skewed` (e.g. its
    *                primary key) — salted deterministically, so the same
    *                row always lands in the same sub-partition
    * @param r       fan-out factor
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 saltBy: Column, r: Int): DataFrame = {
    val saltedBig = skewed.withColumn("_salt", pmod(hash(saltBy), lit(r)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(r - 1))))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** The measured hot-key set of `small`. Fast path (hotMin > partition
    * count): ONE bounded job — a per-partition count pass emits only
    * locally-repeated keys (floor 2) and the driver merges the partials,
    * no aggregation exchange, no broadcast build. The floor is sound by
    * pigeonhole (a key with global count ≥ hotMin must repeat within some
    * partition), and the driver threshold `hotMin − nPart` absorbs the
    * ≤ 1-per-partition undercount the floor can hide — every truly-hot
    * key is caught, and the only slack is keys in [hotMin − nPart,
    * hotMin) salting unnecessarily. That slack is free: salting changes
    * placement, never pairing. Collect size is bounded BY DATA: every
    * emitted partial repeats locally, so partials ≤ |small| / 2 in the
    * adversarial worst case and ≈ the few genuinely heavy keys in the
    * skew-tail reality this operator exists for.
    *
    * When hotMin ≤ nPart the pigeonhole argument collapses (a hot key
    * can land once per partition and never repeat locally) and a floor
    * of 1 would collect every distinct key in every partition — the full
    * small side, bounded only by partitioning. That regime uses the
    * exact distributed aggregation instead: one exchange, and the
    * collect is ≤ |small| / hotMin keys by counting — bounded by data,
    * never by partition count. */
  private[operators] def hotKeys(small: DataFrame, key: String,
                                 hotMin: Long): Seq[Any] = {
    val rdd = small.select(col(key)).rdd
    val nPart = rdd.getNumPartitions
    if (hotMin <= nPart) {
      small.filter(col(key).isNotNull)
        .groupBy(col(key)).agg(count(lit(1)).as("_c"))
        .filter(col("_c") >= hotMin)
        .select(col(key)).collect().map(_.get(0)).toSeq
    } else {
      val partials = rdd.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[Any, Long]
        it.foreach { row =>
          val k = row.get(0)
          if (k != null) m.update(k, m.getOrElse(k, 0L) + 1L)
        }
        m.iterator.filter(_._2 >= 2L)
      }.collect()
      val sums = scala.collection.mutable.HashMap.empty[Any, Long]
      partials.foreach { case (k, c) =>
        sums.update(k, sums.getOrElse(k, 0L) + c)
      }
      val thr = math.max(1L, hotMin - nPart)
      sums.iterator.filter(_._2 >= thr).map(_._1).toSeq
    }
  }

  /** [[saltedJoin]] that salts ONLY the measured hot keys — the 100 TB
    * shape when the small side is merely modest: full replication costs
    * `r × |small|` exchange rows for a tail of keys that never needed the
    * fan-out. [[hotKeys]] finds the hot set in one bounded job; hot keys
    * salt `r` ways, every other key keeps salt 0 with NO replication.
    * The hot set rides into both sides as an `InSet` predicate evaluated
    * in-scan — no aggregation exchange, no broadcast tag joins. The join
    * strategy is pinned shuffle-hash: if either side were broadcastable
    * the salt would be pointless (broadcast joins have no per-key
    * placement), and the planner's pre-explode stats undercount exploded
    * sides anyway.
    *
    * Same contract as [[saltedJoin]]: placement changes, pairing never
    * does — each (skewed, small) row pair meets exactly once, whatever
    * the hot classification decided.
    */
  def hotSaltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                    saltBy: Column, r: Int, hotMin: Long): DataFrame = {
    val hot = hotKeys(small, key, hotMin)
    val isHot: Column =
      if (hot.isEmpty) lit(false) else col(key).isInCollection(hot)
    saltAndJoin(skewed, small, Seq(key), isHot, saltBy, r)
  }

  /** Checkpoint `small` AND measure its hot keys in ONE job — the
    * fusion [[graft.operators.Decontaminate]]'s Bloom path already uses
    * for its sketch build (`checkpointGramsWithSketch`): the RDD
    * localCheckpoint is LAZY, so the hot-key partials pass doubles as
    * the materialization action, where the eager DataFrame checkpoint
    * followed by [[hotKeys]] costs two sequential jobs over the same
    * rows. Fast regime only (hotMin > partitions — the pigeonhole
    * partials bound); the exact regime keeps its own aggregation job,
    * whose exchange cannot ride a checkpoint pass anyway. Returns the
    * checkpointed frame + the hot set for [[hotSaltedJoinWith]]. */
  def checkpointWithHotKeys(small: DataFrame, keyCol: String,
                            hotMin: Long): (DataFrame, Seq[Any]) = {
    val schema = small.schema
    val idx = schema.fieldIndex(keyCol)
    val rdd = small.rdd
    rdd.localCheckpoint()
    val nPart = rdd.getNumPartitions
    val df = small.sparkSession.createDataFrame(rdd, schema)
    if (hotMin <= nPart) {
      // exact regime: first action below materializes the checkpoint
      (df, hotKeys(df, keyCol, hotMin))
    } else {
      val partials = rdd.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[Any, Long]
        it.foreach { row =>
          val k = row.get(idx)
          if (k != null) m.update(k, m.getOrElse(k, 0L) + 1L)
        }
        m.iterator.filter(_._2 >= 2L)
      }.collect() // one job: checkpoint materialization + partials
      val sums = scala.collection.mutable.HashMap.empty[Any, Long]
      partials.foreach { case (k, c) =>
        sums.update(k, sums.getOrElse(k, 0L) + c)
      }
      val thr = math.max(1L, hotMin - nPart)
      (df, sums.iterator.filter(_._2 >= thr).map(_._1).toSeq)
    }
  }

  /** [[hotSaltedJoin]]/[[hotSaltedJoinKeys]] with a PRE-MEASURED hot set
    * (from [[checkpointWithHotKeys]]): same fold, same InSet predicate,
    * same pairing contract — only the measurement job is gone. */
  def hotSaltedJoinWith(skewed: DataFrame, small: DataFrame,
                        keys: Seq[String], hot: Seq[Any], saltBy: Column,
                        r: Int): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val folded: Column =
      if (keys.size == 1) col(keys.head) else xxhash64(keys.map(col): _*)
    val isHot: Column =
      if (hot.isEmpty) lit(false) else folded.isInCollection(hot)
    saltAndJoin(skewed, small, keys, isHot, saltBy, r)
  }

  /** [[hotSaltedJoin]] over a COMPOSITE equi-join key — the shape the
    * 93-bit hash-width escalation needs (SCALE.md): an escalated gram
    * join keys on the `(h62, h41)` column PAIR, and the single-column
    * machinery above cannot express it.
    *
    * Hot classification folds the composite key into one 64-bit
    * `xxhash64` column and reuses the single-column [[hotKeys]] regimes
    * verbatim — the SAME deterministic fold evaluates in-scan on both
    * sides, so classification is consistent wherever a row lands. The
    * fold is placement-only arithmetic: a 64-bit collision can merge two
    * composite keys' counts and promote a cold key into the hot set
    * (needless salting — placement changes, pairing never does), but can
    * never DEMOTE a truly hot key (counts only merge upward), so the
    * skew guarantee survives the fold. The join itself still matches on
    * the exact composite columns; the fold never touches pairing.
    *
    * Same contract as [[saltedJoin]]: each (skewed, small) row pair
    * meets exactly once, whatever the hot classification decided. */
  def hotSaltedJoinKeys(skewed: DataFrame, small: DataFrame,
                        keys: Seq[String], saltBy: Column, r: Int,
                        hotMin: Long): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val folded: Column = xxhash64(keys.map(col): _*)
    val hot = hotKeys(small.select(folded.as("_hk")), "_hk", hotMin)
    val isHot: Column =
      if (hot.isEmpty) lit(false) else folded.isInCollection(hot)
    saltAndJoin(skewed, small, keys, isHot, saltBy, r)
  }

  /** Shared salted-join body: hot rows of `skewed` salt `r` ways on
    * `saltBy`, hot rows of `small` replicate `r` ways, cold rows keep
    * salt 0 with no replication; shuffle-hash pinned (a broadcast join
    * has no per-key placement, so the salt would be pointless). */
  private def saltAndJoin(skewed: DataFrame, small: DataFrame,
                          keys: Seq[String], isHot: Column,
                          saltBy: Column, r: Int): DataFrame = {
    val saltedBig = skewed
      .withColumn("_salt",
        when(isHot, pmod(hash(saltBy), lit(r))).otherwise(lit(0)))
      .hint("shuffle_hash")
    val replicated = small
      .withColumn("_salt",
        explode(when(isHot, sequence(lit(0), lit(r - 1)))
          .otherwise(array(lit(0)))))
      .hint("shuffle_hash")
    saltedBig.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
