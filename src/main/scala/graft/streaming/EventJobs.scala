package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-ready event transforms (SURVEY.md §2.8). Each takes
  * a plain DataFrame so the same logical plan runs in batch (the oracle
  * path, q12-q14) and under `readStream` (tests drive it with a file source
  * + memory sink). Watermarks bound state; they're no-ops in batch.
  */
object EventJobs {

  /** Tumbling 1-hour window rollup with a 1-hour watermark — the streaming
    * twin of q12. Output: window struct, event_type, n, value_sum. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))

  /** Per-user running event count via stateless projection + windowed count
    * (used to smoke the append-mode path). */
  def typeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Built-in gap session windows (`session_window`) — the streaming-native
    * twin of [[graft.operators.Sessionize]]; state closes when a key's gap
    * exceeds `gap`. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Session windows over the ITEM feed: event-time is the item's `time`
    * (unix seconds), the session key its `author` — "a user's posting
    * burst", the item-stream analog of [[sessionCounts]]. In append mode a
    * session row emits exactly once, when the watermark passes its close —
    * what lets [[SessionPipeline]] sink sessions as immutable deltas.
    * Output: (author, session_start, session_end, n_items), epoch seconds. */
  def itemSessions(items: DataFrame, gap: String = "30 minutes"): DataFrame =
    items
      .filter(col("author").isNotNull && col("time").isNotNull)
      .withColumn("ts", timestamp_seconds(col("time")))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("author"))
      .agg(count(lit(1)).as("n_items"))
      .select(col("author"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_items"))

  /** Windowed per-key activity counts over the normalized item feed —
    * tumbling event-time windows, watermark-finalized (append mode emits
    * a (window, key) count exactly once, when the watermark passes the
    * window end). The building block for trending-key analytics; pair
    * with a bounded per-window top-k in the sink
    * ([[graft.streaming.Trending]]). */
  def windowedKeyCounts(items: DataFrame, keyCol: String,
                        windowDur: String = "10 minutes",
                        watermark: String = "1 hour"): DataFrame =
    items
      .filter(col(keyCol).isNotNull && col("time").isNotNull)
      .withColumn("ts", timestamp_seconds(col("time")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        unix_timestamp(col("window.end")).as("window_end"),
        col("key"), col("n"))
}
