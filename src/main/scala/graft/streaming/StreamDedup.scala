package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful exact streaming dedup: first occurrence per key wins, later
  * arrivals are dropped — `flatMapGroupsWithState` with one boolean of
  * state per key (SURVEY.md north-star dedup under continuous ingestion;
  * the batch twin is `Dedup.exactGroups`).
  *
  * State is the scale knob: per-key footprint is a single marker, so 10^9
  * distinct keys ≈ tens of GB spread across the cluster's state store. Add
  * a timeout (e.g. `ProcessingTimeTimeout` + `setTimeoutDuration`) when the
  * key space is unbounded and duplicates only arrive near each other in
  * time.
  */
object StreamDedup {

  def firstPerKey[T: Encoder, K: Encoder](ds: Dataset[T])(key: T => K): Dataset[T] = {
    implicit val boolEnc: Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }
}
