package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Merge
import Q.{cents, scaled}

/** Core relational operator surface (SURVEY.md §2.2-2.6): projection/filter
  * pushdown, point lookup, hash aggregation, broadcast star join, top-k,
  * window ranking, semi/anti joins, the full-outer upsert merge (S7/J2/P7)
  * and set operations.
  *
  * Determinism discipline for the DuckDB oracle: every query ends in a
  * total-order ORDER BY; money sums are exact scaled integers (see
  * [[Q.cents]]); derived ratios are computed from those exact integers with
  * an identical arithmetic expression in both dialects so IEEE doubles match
  * bitwise; timestamps are only ever output as DATE.
  */
object Relational {

  /** q01: TPC-H Q1-shaped pricing summary — partial (map-side) + final hash
    * aggregation, the bread-and-butter agg path (SURVEY.md A1/A2 family).
    * Scale note: groupBy on 2 low-cardinality keys → tiny shuffle; all the
    * work is the map-side partial agg, which scales linearly with input.
    */
  val q01 = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_c,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_disc_c4,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000, 0) AS BIGINT)) AS BIGINT) AS sum_charge_c6,
      |  COUNT(*) AS n,
      |  CAST(sum_qty_c AS DOUBLE) / 100.0 / n AS avg_qty
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_base_c"),
        sum(scaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)).as("sum_disc_c4"),
        sum(scaled(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6)).as("sum_charge_c6"),
        count(lit(1)).as("n"))
      .withColumn("avg_qty", col("sum_qty_c").cast("double") / 100.0 / col("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q02: selective scan — arithmetic predicates + narrow projection, all of
    * which must reach the parquet reader (PushedFilters / ReadSchema). The
    * 100 TB story IS this query: scan-dominated, zero shuffle.
    */
  val q02 = Q(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT) AS rev_c4
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01 00:00:00").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"),
        scaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("rev_c4"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q03: point lookup on the key (SURVEY.md P1, `select_item`
    * hnarchive.py:280-283) — parquet min/max + dictionary pushdown stands in
    * for the reference's B-tree index.
    */
  val q03 = Q(
    "q03_point_lookup",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS totalprice_c,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey = 42
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_orderkey") === 42)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("totalprice_c"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  /** q04: star join orders→customer→nation→region + group agg. The dimension
    * tables are broadcast (nation/region are tiny at any scale; customer at
    * 100 TB is a shuffle join the AQE planner handles) so the fact table
    * never shuffles for the dims.
    */
  val q04 = Q(
    "q04_star_join_revenue",
    """SELECT n_name,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_c,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    val nation = broadcast(Tables.nation(s, dir))
    val region = broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE"))
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(cents(col("o_totalprice"))).as("revenue_c"),
           count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  /** q05: top-k (SURVEY.md O1, `ORDER BY … DESC LIMIT 1` hnarchive.py:286
    * generalized) — Catalyst plans TakeOrderedAndProject: per-partition
    * top-10 then a k-sized merge on the driver, never a full sort.
    */
  val q05 = Q(
    "q05_topk_orders",
    """SELECT o_orderkey,
      |  CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS totalprice_c,
      |  o_orderstatus
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("totalprice_c"),
        col("o_orderstatus"))
  }

  /** q06: within-group ranking (SURVEY.md O2 — siblings ordered by time) as
    * the idiomatic Window.partitionBy().orderBy(); lag() supplies the
    * inter-event gap. One shuffle on the partition key, which is exactly the
    * reference's "children of one parent" grouping.
    */
  val q06 = Q(
    "q06_window_rank",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      |  CAST(date_diff('day', LAG(CAST(l_shipdate AS DATE)) OVER w,
      |                 CAST(l_shipdate AS DATE)) AS BIGINT) AS gap_days
      |FROM lineitem
      |WHERE l_orderkey % 97 = 0
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber)
      |ORDER BY l_orderkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 97 === 0)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("gap_days",
        datediff(col("l_shipdate").cast("date"),
                 lag(col("l_shipdate").cast("date"), 1).over(w)).cast("long"))
      .select("l_orderkey", "l_linenumber", "rn", "gap_days")
      .orderBy("l_orderkey", "rn")
  }

  /** q07: semi join (SURVEY.md J1 — the upsert's existence probe, set-based).
    * left_semi never materializes the probe side's columns → half the
    * shuffle of an inner join + dedup.
    */
  val q07 = Q(
    "q07_semi_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders) AND c_acctbal > 0
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir).filter(col("c_acctbal") > 0)
    val orderCust = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
    cust.join(orderCust, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** q08: anti join (SURVEY.md J5 — "expected EXCEPT stored", the general
    * form of the reference's id-gap catch-up).
    */
  val q08 = Q(
    "q08_anti_join",
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val orderCust = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
    cust.join(orderCust, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q09: the upsert merge itself (SURVEY.md S7 = J2 full-outer + P7
    * per-column coalesce; reference `insert_item` hnarchive.py:203-253).
    * Incoming batch = every 3rd order with a NULL status (coalesce keeps the
    * stored one) and a changed price (overwrite wins), plus brand-new keys
    * (insert path). o_orderstatus is a "coalesce" column, o_totalprice an
    * "overwrite" column — mirroring the reference's column asymmetry.
    */
  val q09 = Q(
    "q09_upsert_merge",
    """WITH incoming AS (
      |  SELECT o_orderkey, CAST(NULL AS VARCHAR) AS o_orderstatus,
      |         o_totalprice + 1000.0 AS o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, 'N', 555.55
      |  FROM orders WHERE o_orderkey % 1000 = 0
      |)
      |SELECT COALESCE(i.o_orderkey, s.o_orderkey) AS o_orderkey,
      |       COALESCE(i.o_orderstatus, s.o_orderstatus) AS o_orderstatus,
      |       CAST(ROUND(CASE WHEN i.o_orderkey IS NOT NULL
      |                       THEN i.o_totalprice ELSE s.o_totalprice END * 100, 0)
      |            AS BIGINT) AS totalprice_c
      |FROM orders s FULL OUTER JOIN incoming i ON s.o_orderkey = i.o_orderkey
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val stored = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val updates = stored
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"),
        lit(null).cast("string").as("o_orderstatus"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"))
    val inserts = stored
      .filter(col("o_orderkey") % 1000 === 0)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"),
        lit(555.55).as("o_totalprice"))
    val merged = Merge.upsert(stored, updates.unionAll(inserts), "o_orderkey",
      coalesceCols = Seq("o_orderstatus"), overwriteCols = Seq("o_totalprice"))
    merged
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("totalprice_c"))
      .orderBy("o_orderkey")
  }

  /** q10: set operations (SURVEY.md §2.6): (BUILDING ∩ open-order customers)
    * ∪ negative-balance customers, minus customers with a finished order.
    * Spark union() is UNION ALL → explicit distinct() to match SQL UNION.
    */
  val q10 = Q(
    "q10_set_ops",
    """SELECT c_custkey FROM (
      |  (
      |    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |     INTERSECT
      |     SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |    UNION
      |    SELECT c_custkey FROM customer WHERE c_acctbal < 0
      |  )
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val orders = Tables.orders(s, dir)
    val building = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val open = orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    val negative = cust.filter(col("c_acctbal") < 0).select("c_custkey")
    val finished = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey"))
    building.intersect(open)
      .union(negative).distinct()
      .except(finished)
      .orderBy("c_custkey")
  }

  /** q54: two-dimension star join — lineitem fact against the part and
    * supplier(→nation) dimensions, discounted revenue per (brand, nation).
    * Dimensions broadcast; the fact table never shuffles for them, only
    * for the final two-key aggregate. Exercises the part/supplier tables
    * (every driver-generated table is now under the oracle gate). */
  val q54 = Q(
    "q54_brand_supplier_revenue",
    """SELECT p_brand, n_name,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_c4,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_size <= 15
      |GROUP BY p_brand, n_name
      |ORDER BY p_brand, n_name""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val part = broadcast(Tables.part(s, dir).filter(col("p_size") <= 15))
    val supp = broadcast(Tables.supplier(s, dir))
    val nation = broadcast(Tables.nation(s, dir))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy("p_brand", "n_name")
      .agg(sum(scaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
        .as("revenue_c4"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand", "n_name")
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q54)
}
