package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFuncs
import graft.operators.Sessionize
import Q.cents

/** Event-stream batch queries (SURVEY.md §2.8 batch twins + §2.7 scalar
  * functions): time-bucketed rollups, JSON extraction, gap sessionization,
  * strftime-parity formatting, and the derived-age theta filter that drives
  * the reference's re-crawl policy.
  *
  * Timestamp discipline: events.ts is nanosecond parquet which Spark reads
  * at microsecond precision — so oracle-compared values only ever derive
  * from `date_trunc`/whole seconds, never raw sub-second values.
  */
object Events {

  /** q12: tumbling-window rollup (batch twin of the Structured Streaming
    * windowed agg): per hour × event_type counts and value sums. */
  val q12 = Q(
    "q12_hourly_rollup",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |       event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_c
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
      .orderBy("hour", "event_type")
  }

  /** q13: semi-structured extraction (SURVEY.md F8 `from_json` family):
    * pull `props.$.k`, cast, aggregate. */
  val q13 = Q(
    "q13_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_c
      |FROM events
      |GROUP BY k
      |ORDER BY k""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
      .orderBy("k")
  }

  /** q14: gap sessionization (30-min gap) → per-user session count and
    * total events. Integer epoch seconds keep both engines precision-proof. */
  val q14 = Q(
    "q14_sessionize",
    """WITH x AS (
      |  SELECT user_id, event_id,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events
      |), flagged AS (
      |  SELECT user_id,
      |         CASE WHEN LAG(sec) OVER w IS NULL
      |                OR sec - LAG(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
      |  FROM x
      |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
      |)
      |SELECT user_id,
      |       CAST(SUM(new_s) AS BIGINT) AS n_sessions,
      |       COUNT(*) AS n_events
      |FROM flagged
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
    Sessionize.assign(ev, "user_id", col("sec"), col("event_id"), 1800L)
      .groupBy("user_id")
      .agg((max(col("session_id")) + 1).as("n_sessions"),
           count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** q15: strftime parity (SURVEY.md F2, `%Y %b %d %H:%M:%S` with English
    * month abbreviations) + F6/F7 string templating. */
  val q15 = Q(
    "q15_ts_format",
    """SELECT event_id,
      |       strftime(ts, '%Y %b %d %H:%M:%S') AS fmt,
      |       'https://news.ycombinator.com/item?id=' || CAST(event_id AS VARCHAR) AS url,
      |       CAST(user_id AS VARCHAR) || ' points' AS label
      |FROM events
      |WHERE event_id % 101 = 0
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(col("event_id") % 101 === 0)
      .select(col("event_id"),
        TextFuncs.hnTimestamp(col("ts")).as("fmt"),
        TextFuncs.itemUrl(col("event_id")).as("url"),
        TextFuncs.scoreLabel(col("user_id")).as("label"))
      .orderBy("event_id")
  }

  /** q16: `_fix_ptags` (SURVEY.md F1) over the document corpus. */
  val q16 = Q(
    "q16_fix_ptags",
    """SELECT doc_id,
      |       '<p>' || regexp_replace(text, '<p>', '</p><p>', 'g') || '</p>' AS html
      |FROM documents
      |WHERE doc_id % 7 = 0
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), TextFuncs.fixPtags(col("text")).as("html"))
      .orderBy("doc_id")
  }

  /** q17: theta filter on a derived column (SURVEY.md P4 — the
    * `retrieved - time <= d` re-crawl window): ship delay ≤ 7 days for
    * recent orders, computed through a key join. */
  val q17 = Q(
    "q17_derived_age_filter",
    """SELECT l_orderkey, l_linenumber,
      |       CAST(date_diff('day', CAST(o_orderdate AS DATE),
      |                      CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_delay_days
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE date_diff('day', CAST(o_orderdate AS DATE),
      |                CAST(l_shipdate AS DATE)) <= 7
      |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
    val delay = datediff(col("l_shipdate").cast("date"),
                         col("o_orderdate").cast("date"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(delay <= 7)
      .select(col("l_orderkey"), col("l_linenumber"),
        delay.cast("long").as("ship_delay_days"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q50: conversion funnel — per user, the first view, the first click
    * strictly after it, the first purchase strictly after that; counts per
    * stage. Each stage is one aggregate + one join keyed on user_id (all
    * three stages reuse the same key partitioning; no windows, no
    * per-user explode). Timestamps are compared, never output — both
    * engines truncate the nanos parquet to microseconds identically. */
  val q50 = Q(
    "q50_funnel",
    """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t_buy
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
      |SELECT stage, n_users FROM (
      |  SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
      |  UNION ALL
      |  SELECT 'click', CAST(COUNT(*) AS BIGINT) FROM c
      |  UNION ALL
      |  SELECT 'purchase', CAST(COUNT(*) AS BIGINT) FROM p)
      |ORDER BY stage""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    def firstAfter(tpe: String, prev: org.apache.spark.sql.DataFrame,
                   prevCol: String, outCol: String) =
      ev.filter(col("event_type") === tpe)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevCol))
        .groupBy("user_id").agg(min(col("ts")).as(outCol))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = firstAfter("click", v, "t_view", "t_click")
    val p = firstAfter("purchase", c, "t_click", "t_buy")
    val count = (df: org.apache.spark.sql.DataFrame, stage: String) =>
      df.agg(count_distinct(col("user_id")).as("n_users"))
        .select(lit(stage).as("stage"), col("n_users"))
    count(v, "view").unionAll(count(c, "click")).unionAll(count(p, "purchase"))
      .orderBy("stage")
  }

  /** q52: weekly cohort retention — users grouped by the week of their
    * first signup, counted as active in each later week they produced any
    * event. Week index = floor(days-since-epoch-start / 7) — FLOOR, not
    * truncation, on both sides: DuckDB `//` floors, and Spark `div`
    * truncates toward zero, so the two diverge on any event before the
    * 2024-01-01 epoch (e.g. day -3: div → 0, floor → -1). No date_trunc —
    * engine week-start conventions can differ; integer floor can't.
    */
  val q52 = Q(
    "q52_retention_cohorts",
    """WITH wk AS (SELECT user_id, event_type,
      |                   CAST(date_diff('day', DATE '2024-01-01',
      |                                  CAST(ts AS DATE)) AS BIGINT) // 7 AS w
      |            FROM events),
      |su AS (SELECT user_id, MIN(w) AS cohort FROM wk
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |act AS (SELECT DISTINCT user_id, w FROM wk)
      |SELECT cohort, (w - cohort) AS week_offset,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
      |FROM act JOIN su USING (user_id)
      |WHERE w >= cohort
      |GROUP BY cohort, week_offset
      |ORDER BY cohort, week_offset""".stripMargin) { (s, dir) =>
    val wk = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        expr("floor(datediff(CAST(ts AS DATE), DATE '2024-01-01') / 7)").as("w"))
    val su = wk.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("w")).as("cohort"))
    val act = wk.select("user_id", "w").distinct()
    act.join(su, "user_id")
      .filter(col("w") >= col("cohort"))
      .groupBy(col("cohort"), (col("w") - col("cohort")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .orderBy("cohort", "week_offset")
  }

  val all: Seq[Q] = Seq(q12, q13, q14, q15, q16, q17, q50, q52)
}
