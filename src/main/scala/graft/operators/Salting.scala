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
}
