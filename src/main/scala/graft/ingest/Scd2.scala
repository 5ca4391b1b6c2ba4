package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC → SCD Type-2 history: every change event becomes a validity
  * interval, so the table can be reconstructed AS OF any instant —
  * point-in-time queries, temporal joins, audit ("what did the row say
  * when the decision was made").
  *
  * [[CurrentState]] answers "what does the table look like NOW"; this is
  * the other half of the CDC contract the reference leaves on the floor:
  * Debezium delivers updates and deletes with rewrite semantics
  * (debezium-postgres-connector.config.json:18) and every event carries
  * `source.ts_ms` (event_processor.py:33), which is exactly the
  * ingredient list for a bitemporal-lite history table — yet the
  * reference's creates-only feed (strategy.py:16–17) can never answer
  * "state at time T".
  *
  * Semantics (per primary key, events ordered by `(tsCol, tieBreak)`
  * ascending):
  *  - a `c`/`u` event OPENS a version valid from its timestamp;
  *  - the NEXT event on the same key (any op) CLOSES it — `valid_to` =
  *    that event's timestamp, half-open `[from, to)`;
  *  - a `d` event closes the prior version and opens nothing (tombstones
  *    never appear as versions);
  *  - the newest non-delete version has `valid_to` NULL → `is_current`.
  *
  * Timestamp ties collapse to zero-width `[t, t)` intervals for all but
  * the tie's last event — `stateAt(t)` therefore sees exactly the
  * latest-wins winner [[CurrentState]] would pick, and
  * `stateAt(max ts) ≡ currentState` (pinned by Scd2Spec).
  *
  * Scale posture: ONE hash exchange on the key columns and one
  * per-partition sort; the replay-dedup `lag` guard and the interval
  * `lead` share the same window spec, so Catalyst plans a single
  * Exchange+Sort (no second shuffle — the dedup filter preserves both
  * partitioning and order). History is strictly append-friendly at
  * 100 TB: new CDC batches only ever close the currently-open interval
  * of keys they touch, so an incremental maintenance pass (the
  * [[CurrentState.runCurrentStateTable]] fold shape) rewrites only
  * touched keys.
  */
object Scd2 {

  /** The SCD2 interval table. Input rows that are exact replays (same
    * key + timestamp + tie-break) are dropped before intervals are cut —
    * at-least-once CDC delivery must not mint duplicate zero-width
    * versions (the BucketedSink reader rule, applied at the source). */
  def history(
      cdc: DataFrame,
      pkCols: Seq[String],
      tsCol: String = "__source_ts_ms",
      opCol: String = "__op",
      tieBreak: Seq[String] = Seq("id")): DataFrame = {
    val order: Seq[Column] =
      col(tsCol).asc +: tieBreak.map(col(_).asc)
    val w = Window.partitionBy(pkCols.map(col): _*).orderBy(order: _*)
    val verKey = struct(col(tsCol) +: tieBreak.map(col): _*)
    cdc
      .withColumn("__replay", lag(verKey, 1).over(w))
      // exact replay of the previous event (identical version key) —
      // drop; the filter keeps the window's partitioning AND ordering,
      // so the lead below reuses the same Exchange+Sort
      .where(col("__replay").isNull || col("__replay") =!= verKey)
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .where(col(opCol) =!= "d")
      .drop("__replay")
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(tsCol, "valid_from")
  }

  /** Point-in-time reconstruction: the rows live at instant `at`
    * (half-open interval semantics, `valid_from <= at < valid_to`).
    * `at` may be any Column — a literal, or a broadcast scalar computed
    * from the data (the `cdc_state_at` query derives the corpus
    * mid-time that way). A filter, not a shuffle: at 100 TB this prunes
    * against interval min/max file stats when history is stored sorted
    * by `valid_from`. */
  def stateAt(history: DataFrame, at: Column): DataFrame =
    history.where(
      col("valid_from") <= at &&
        (col("valid_to").isNull || col("valid_to") > at))
}
