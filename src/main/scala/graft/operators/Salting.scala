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

  /** [[saltedJoin]] that salts ONLY the measured hot keys — the 100 TB
    * shape when the small side is merely modest: full replication costs
    * `r × |small|` exchange rows for a tail of keys that never needed the
    * fan-out. One cheap partial-aggregated count over the small side finds
    * the keys with ≥ `hotMin` rows (bounded by |small| / hotMin — tiny by
    * construction, so it broadcasts); hot keys salt `r` ways, every other
    * key keeps salt 0 with NO replication. The join strategy is pinned
    * shuffle-hash: if either side were broadcastable the salt would be
    * pointless (broadcast joins have no per-key placement), and the
    * planner's pre-explode stats undercount exploded sides anyway.
    *
    * Same contract as [[saltedJoin]]: placement changes, pairing never
    * does — each (skewed, small) row pair meets exactly once.
    */
  def hotSaltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                    saltBy: Column, r: Int, hotMin: Long): DataFrame = {
    // The hot set feeds BOTH tag joins from one logical subtree — the two
    // broadcast builds are identical, so ReuseExchange materializes the
    // agg once. Callers pass a `small` whose lineage is cheap to re-read
    // (e.g. already checkpointed); an eager checkpoint here would add a
    // sequential job to every call for a set bounded by |small| / hotMin.
    val hot = small.groupBy(col(key)).agg(count(lit(1)).as("_hc"))
      .filter(col("_hc") >= hotMin).select(col(key).as("_hk"))
    val saltedBig = skewed
      .join(broadcast(hot), col(key) === col("_hk"), "left")
      .withColumn("_salt",
        when(col("_hk").isNotNull, pmod(hash(saltBy), lit(r))).otherwise(lit(0)))
      .drop("_hk")
      .hint("shuffle_hash")
    val replicated = small
      .join(broadcast(hot), col(key) === col("_hk"), "left")
      .withColumn("_salts",
        when(col("_hk").isNotNull, sequence(lit(0), lit(r - 1)))
          .otherwise(array(lit(0))))
      .withColumn("_salt", explode(col("_salts")))
      .drop("_salts", "_hk")
      .hint("shuffle_hash")
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
