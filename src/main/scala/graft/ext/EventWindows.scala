package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time window aggregates over the `events` stream table — the
  * batch forms of the standard streaming shapes (tumbling / sliding /
  * session). The same expressions bind unchanged to `readStream` +
  * `withWatermark` (see graft.streaming tests); batch forms are
  * oracle-checked against DuckDB `time_bucket` / gaps-and-islands SQL.
  *
  * Determinism note: `value` sums go through DECIMAL(18,6) so the
  * aggregate is exact and independent of partition merge order — a double
  * sum would hash-differ run-to-run (float addition is not associative);
  * the final cast back to double is identical in both engines.
  */
object EventWindows {

  private val exactSum =
    sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value")

  /** Tumbling 1-hour windows per event type. Map-side partial aggregation,
    * one shuffle on (window, event_type). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        exactSum)
      .select(
        col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("n_users"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Sliding 1-hour windows every 15 minutes (each event lands in 4
    * windows). The window explode is narrow; the shuffle key count grows
    * ×4 — the standard cost of overlap. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), exactSum)
      .select(
        col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Per-user session windows with a 4-hour inactivity gap. One shuffle on
    * user_id; session assembly is the sort-based session_window operator.
    * Session end = last event + gap (Spark semantics; the oracle mirrors
    * it with gaps-and-islands SQL). */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "4 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), exactSum)
      .select(
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Per-session ordered behavior sequences — the unit a sequential
    * recommender / behavior-cloning pipeline trains on: each (user,
    * session) becomes the chronological event-type sequence with its
    * digest (the registered query carries the md5 so the gate's payload
    * stays small; the sequence string itself is the same `concat_ws`).
    * Ties on ts break by event_id, so the sequence is deterministic.
    *
    * Scale: same single user-keyed shuffle as [[sessions]]; the sequence
    * assembly is an in-group sort of each session's own events (bounded
    * by session length, never corpus-global). */
  def sessionSequences(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "4 hours").as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        concat_ws(">",
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            s => s.getField("event_type"))).as("seq"))
      .select(
        col("w.start").as("session_start"), col("user_id"),
        col("n_events"), md5(col("seq")).as("seq_md5"))
      .orderBy("user_id", "session_start")
}
