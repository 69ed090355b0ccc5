package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsofJoin
import Q.cents

/** Advanced relational surface: as-of join, ROLLUP grouping sets, pivot,
  * distinct aggregates, and id-gap detection (the honest general form of
  * the reference's `update` catch-up — SURVEY.md §2.6/J5).
  */
object Advanced {

  /** q18: backward as-of join — each purchase enriched with the user's most
    * recent prior-or-equal click (union + one window shuffle, no range
    * join). Integer epoch seconds for cross-engine precision safety. */
  val q18 = Q(
    "q18_asof_join",
    """WITH ev AS (SELECT event_id, user_id,
      |                   CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type
      |            FROM events),
      |u AS (
      |  SELECT user_id, sec, event_id, 1 AS side,
      |         CAST(NULL AS BIGINT) AS r_event, CAST(NULL AS BIGINT) AS r_sec
      |  FROM ev WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, sec, event_id, 0, event_id, sec
      |  FROM ev WHERE event_type = 'click'
      |),
      |c AS (SELECT user_id, sec, event_id, side,
      |             last_value(r_event IGNORE NULLS) OVER w AS click_id,
      |             last_value(r_sec IGNORE NULLS) OVER w AS click_sec
      |      FROM u
      |      WINDOW w AS (PARTITION BY user_id ORDER BY sec, side, event_id
      |                   ROWS UNBOUNDED PRECEDING))
      |SELECT event_id, user_id, sec, click_id, sec - click_sec AS gap_sec
      |FROM c WHERE side = 1
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("sec"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "sec")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec"),
        col("event_id"), col("event_id").as("click_id"), col("sec").as("click_sec"))
    AsofJoin.backward(purchases, clicks, keyCol = "user_id", tsCol = "sec",
      leftTieCol = "event_id", rightTieCol = "event_id",
      payloadCols = Seq("click_id", "click_sec"))
      .select(col("event_id"), col("user_id"), col("sec"),
        col("asof_click_id").as("click_id"),
        (col("sec") - col("asof_click_sec")).as("gap_sec"))
      .orderBy("event_id")
  }

  /** q19: ROLLUP over (status, priority) — hierarchical grouping sets with
    * subtotals and a grand total in one pass. */
  val q19 = Q(
    "q19_rollup",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_c
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("rev_c"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** q28: pivot — daily event counts, one column per event type (explicit
    * value list keeps the plan single-pass; conditional-agg equivalent in
    * the oracle). */
  val q28 = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Q(
      "q28_pivot",
      s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         |${types.map(t => s"       COUNT(*) FILTER (event_type = '$t') AS $t").mkString(",\n")}
         |FROM events
         |GROUP BY 1
         |ORDER BY day""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
        .orderBy("day")
    }
  }

  /** q29: distinct aggregates — exact COUNT(DISTINCT) alongside plain
    * aggregates (the approx_count_distinct/HLL twin is exercised in
    * ScalaTest; sketch internals differ across engines so it cannot be
    * hash-oracled). */
  val q29 = Q(
    "q29_distinct_agg",
    """SELECT event_type,
      |       COUNT(DISTINCT user_id) AS users,
      |       COUNT(*) AS n,
      |       MIN(user_id) AS u_min, MAX(user_id) AS u_max
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("n"),
        min(col("user_id")).as("u_min"), max(col("user_id")).as("u_max"))
      .orderBy("event_type")
  }

  /** q34: id-gap detection — expected \ stored anti-join over a generated
    * id range (SURVEY.md J5/§2.6: the set-difference the reference's
    * `update` never does, causing its documented missed-id gaps). */
  val q34 = Q(
    "q34_gap_detect",
    """WITH stored AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0),
      |expected AS (SELECT unnest(generate_series(0, (SELECT MAX(o_orderkey) FROM orders))) AS id)
      |SELECT id FROM expected
      |WHERE NOT EXISTS (SELECT 1 FROM stored WHERE o_orderkey = id)
      |ORDER BY id""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val stored = orders.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey").as("id"))
    val maxKey = orders.agg(max(col("o_orderkey"))).head().getLong(0)
    s.range(0, maxKey + 1).toDF("id")
      .join(stored, Seq("id"), "left_anti")
      .orderBy("id")
  }

  /** q36: exact interpolated percentiles per group — Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition
    * (validated bitwise at round(6)). */
  val q36 = Q(
    "q36_percentiles",
    """SELECT event_type,
      |       ROUND(quantile_cont(value, 0.5), 6) AS p50,
      |       ROUND(quantile_cont(value, 0.9), 6) AS p90,
      |       ROUND(quantile_cont(value, 0.99), 6) AS p99
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy("event_type")
  }

  /** q37: BPE-ish regex token counting next to whitespace counting — the
    * token-budget estimator of a training-data pipeline. The pattern avoids
    * lookahead so Java (Spark) and RE2 (DuckDB) agree. */
  val q37 = {
    val pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"
    Q(
      "q37_bpe_token_count",
      s"""SELECT lang,
         |       CAST(SUM(len(regexp_extract_all(text, '$pat'))) AS BIGINT) AS bpe_tokens,
         |       CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS ws_tokens,
         |       CAST(SUM(len(regexp_extract_all(text, '$pat'))) AS DOUBLE)
         |         / SUM(len(string_split_regex(trim(text), '\\s+'))) AS ratio
         |FROM documents
         |GROUP BY lang
         |ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          sum(size(regexp_extract_all(col("text"), lit(pat), lit(0)))).as("bpe_tokens"),
          sum(graft.functions.TokenStats(col("text")).getField("n_tokens")).as("ws_tokens"))
        .withColumn("ratio",
          col("bpe_tokens").cast("double") / col("ws_tokens"))
        .orderBy("lang")
    }
  }

  /** q38: RANGE-framed running window — trailing-7-day spend per customer
    * over integer epoch days (value-based frame, not row-based: days with
    * no orders still age out of the window). */
  val q38 = Q(
    "q38_running_range_window",
    """SELECT o_custkey, day, totalprice_c,
      |       CAST(SUM(totalprice_c) OVER (
      |         PARTITION BY o_custkey ORDER BY day
      |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing7_c
      |FROM (
      |  SELECT o_custkey,
      |         CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
      |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS totalprice_c
      |  FROM orders
      |  WHERE o_custkey % 50 = 0
      |  GROUP BY 1, 2
      |)
      |ORDER BY o_custkey, day""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(s, dir)
      .filter(col("o_custkey") % 50 === 0)
      .groupBy(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("totalprice_c"))
    val w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-6, 0)
    daily
      .withColumn("trailing7_c", sum(col("totalprice_c")).over(w))
      .orderBy("o_custkey", "day")
  }

  /** q39: argmax aggregates — per customer, the order carrying the maximum
    * price (`max_by` / `arg_max`), with a composite key making the argmax
    * unique so both engines agree on ties. */
  val q39 = Q(
    "q39_argmax",
    """SELECT o_custkey,
      |       arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) * 10000000 + o_orderkey)
      |         AS top_order,
      |       CAST(MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS top_price_c
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val rank = cents(col("o_totalprice")) * 10000000L + col("o_orderkey")
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(max_by(col("o_orderkey"), rank).as("top_order"),
        max(cents(col("o_totalprice"))).as("top_price_c"))
      .orderBy("o_custkey")
  }

  /** q42: fixed-width histogram — 20 bins of width 25 over the value range,
    * open-ended top bin (floor arithmetic; identical IEEE ops both sides). */
  val q42 = Q(
    "q42_histogram",
    """SELECT LEAST(CAST(FLOOR(value / 25.0) AS BIGINT), CAST(19 AS BIGINT)) AS bucket,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_c
      |FROM events
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(least(floor(col("value") / 25.0).cast("long"), lit(19L)).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
      .orderBy("bucket")
  }

  /** q43: column profile (long form) — row count, null count, distinct
    * count per column: the data-quality sweep a pipeline runs before
    * training ingestion. */
  val q43 = {
    val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority")
    Q(
      "q43_profile",
      cols.map(c =>
        s"""SELECT '$c' AS col, COUNT(*) AS n,
           |       COUNT(*) - COUNT($c) AS nulls,
           |       COUNT(DISTINCT $c) AS n_distinct
           |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col")) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      cols.map { c =>
        orders.agg(count(lit(1)).as("n"),
          (count(lit(1)) - count(col(c))).as("nulls"),
          countDistinct(col(c)).as("n_distinct"))
          .select(lit(c).as("col"), col("n"), col("nulls"), col("n_distinct"))
      }.reduce(_ unionAll _).orderBy("col")
    }
  }

  /** q44: edit-distance similarity — exact integer Levenshtein over blocked
    * document-prefix pairs (unit costs; identical definition both engines). */
  val q44 = Q(
    "q44_levenshtein",
    """WITH d AS (SELECT doc_id, substr(text, 1, 60) AS s FROM documents
      |           WHERE doc_id % 200 = 0)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir)
      .filter(col("doc_id") % 200 === 0)
      .select(col("doc_id"), substring(col("text"), 1, 60).as("s"))
    d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        levenshtein(col("a.s"), col("b.s")).cast("long").as("dist"))
      .orderBy("id_a", "id_b")
  }

  /** q45: CUBE grouping sets — all four aggregation granularities of
    * (status, priority) in one pass. */
  val q45 = Q(
    "q45_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  val all: Seq[Q] =
    Seq(q18, q19, q28, q29, q34, q36, q37, q38, q39, q42, q43, q44, q45)
}
