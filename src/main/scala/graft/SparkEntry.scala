package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{queries => qry}
import graft.queries.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query implementations live in `graft.queries.*` modules, one per operator
  * family; each module exposes `all: Seq[Q]` pairing the Spark plan with its
  * DuckDB oracle SQL. This object is just the flat registry the driver reads.
  */
object SparkEntry {

  private def modules: Seq[Q] =
    qry.Relational.all ++ qry.Hierarchy.all ++ qry.Events.all ++
      qry.Advanced.all ++ qry.TextQ.all ++ qry.VectorQ.all ++
      qry.BpeQ.all ++ qry.UnigramQ.all ++ qry.StoreQ.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qry.Relational.q04.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
