package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One named, oracle-checkable query: the Spark plan plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string the
  * driver runs as the correctness oracle. `oracle = None` → the driver
  * records a weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Exact-integer money/quantity columns for float-free oracle compares:
    * inputs have fixed decimal precision, so `round(x * 10^s)` is the true
    * scaled integer and SUMs over it are exact in both Spark and DuckDB
    * (the DuckDB twin is `CAST(ROUND(x * 10^s, 0) AS BIGINT)`).
    */
  def scaled(c: Column, s: Int): Column = round(c * math.pow(10, s), 0).cast("long")
  def cents(c: Column): Column = scaled(c, 2)
}
