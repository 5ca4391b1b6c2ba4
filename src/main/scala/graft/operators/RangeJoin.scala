package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join: each point row joined to
  * the interval rows containing it, per key. Spark's native plan for a
  * `t >= lo AND t < hi` condition is a broadcast-nested-loop — quadratic
  * and undistributable once neither side broadcasts. The scale shape here
  * is the standard binning rewrite:
  *
  *   intervals explode to the fixed-width buckets they overlap
  *     → points map to their single bucket
  *     → EQUI-join on (keys, bucket)   ← shuffle-hash/sort-merge, not BNL
  *     → exact containment filter
  *
  * Cost: one shuffle each side; candidate fan-out is bounded by
  * interval_span / bucketWidth + 1 per interval. Pick `bucketMs` near the
  * typical interval length so most intervals cover O(1) buckets.
  *
  * Intervals are half-open `[lo, hi)`. A point matching several intervals
  * yields several rows (exactly-one is the caller's invariant to arrange,
  * e.g. non-overlapping session windows).
  */
object RangeJoin {

  /** @param payload interval-side columns carried onto matching points
    *                (emitted under their own names — alias beforehand on
    *                collision with point columns). */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      t: String,
      lo: String,
      hi: String,
      payload: Seq[String],
      bucketMs: Long): DataFrame = {
    val keyCols = keys.map(col)
    val iv = intervals.select(
      keyCols ++ payload.map(col) ++ Seq(
        unix_millis(col(lo)).as("__lo"),
        unix_millis(col(hi)).as("__hi")): _*)
      .withColumn("__bucket",
        explode(sequence(
          floor(col("__lo") / bucketMs),
          // hi is exclusive: the last covered bucket holds hi - 1ms
          floor((col("__hi") - 1) / bucketMs))))
    val pt = points
      .withColumn("__t", unix_millis(col(t)))
      .withColumn("__bucket", floor(col("__t") / bucketMs))
    pt.join(iv, keys :+ "__bucket")
      .where(col("__t") >= col("__lo") && col("__t") < col("__hi"))
      .drop("__t", "__lo", "__hi", "__bucket")
  }
}
