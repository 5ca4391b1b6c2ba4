package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of (temporal) join: enrich each left row with the
  * latest right row whose time is ≤ the left row's time, per key — the
  * operator behind "state as of event time" queries (market data, feature
  * stores, attribution). Spark has no built-in; the composed form here is
  * the canonical scale shape:
  *
  *   union(left, right) tagged by side
  *     → ONE shuffle on the join keys
  *     → sort within partition by (time, side)
  *     → running `last(right_payload, ignoreNulls)` window
  *     → keep left rows
  *
  * i.e. cost = one exchange + one sort, identical asymptotics to a
  * sort-merge join, with no per-key driver logic and no range explosion.
  * Right rows sort BEFORE left rows at equal times (side 0 < 1), giving
  * inclusive `right.time <= left.time` semantics — the same contract as
  * DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND l.t >= r.t`, which
  * the oracle uses.
  *
  * Requirement: `right` must be unique per (keys, rightTime) — pre-reduce
  * duplicates (e.g. `groupBy(keys, t).agg(max(...))`) or the filled value
  * at a tied timestamp is undefined.
  */
object AsOfJoin {

  /** @param payload right-side columns carried onto matching left rows,
    *                emitted as `prefix + name` (null when no right row
    *                precedes the left row). */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val keyCols = keys.map(col)
    val rPayload = struct(payload.map(col): _*)
    // SQL join semantics: a NULL key never matches (null = null is not
    // true) — but Window.partitionBy groups nulls together, so null-key
    // right rows must be dropped or they would enrich null-key left rows
    val r = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols ++ Seq(
          col(rightTime).as("__t"),
          rPayload.as("__r"),
          lit(0).as("__side")): _*)
    val rType = r.schema("__r").dataType
    val lType = StructType(left.schema.fields)
    val l = left.select(
      keyCols ++ Seq(
        col(leftTime).as("__t"),
        lit(null).cast(rType).as("__r"),
        lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__l")): _*)
    val unioned = l.unionByName(r.withColumn("__l", lit(null).cast(lType)))
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*") +:
        payload.map(p => col(s"__asof.$p").as(prefix + p)): _*)
  }
}
