package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles without per-group buffers — the histogram
  * (value-count) method:
  *
  *   1. `groupBy(group, value).count()` — the full-data pass, completely
  *      parallel with map-side partials; output is one row per DISTINCT
  *      (group, value), typically orders of magnitude smaller.
  *   2. a cumulative-count window over the distinct-value table locates
  *      the order statistics ⌊p(n−1)⌋ / ⌈p(n−1)⌉ per group; linear
  *      interpolation between them reproduces `percentile` /
  *      `quantile_cont` semantics exactly.
  *
  * Spark's built-in exact `percentile` buffers every (value → count) of a
  * group inside ONE aggregation buffer and sorts it on a single thread at
  * finalize — with few groups the whole dataset funnels through a handful
  * of reducers. Here the only per-group serial work is the running sum
  * over distinct values (step 2), which is O(distinct), not O(rows), and
  * carries no wide buffers.
  */
object DistributedQuantiles {

  /** One output row per group: the requested quantiles as `p<percent>`
    * columns (e.g. p50, p95) plus `n`. */
  def exactQuantiles(
      df: DataFrame,
      group: String,
      value: String,
      ps: Seq[Double]): DataFrame = {
    val counts = df
      // percentile/quantile_cont ignore NULLs; without this filter they
      // would sort first and shift every order statistic
      .where(col(value).isNotNull)
      .groupBy(col(group), col(value).cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val byV = Window.partitionBy(group).orderBy("v")
    val whole = Window.partitionBy(group)
    // row covers global (group-ordered) positions [cum_start, cum_end)
    val cum = counts
      .withColumn("cum_end", sum("c").over(byV))
      .withColumn("cum_start", col("cum_end") - col("c"))
      .withColumn("n", sum("c").over(whole))

    def at(pos: Column): Column =
      max(when(col("cum_start") <= pos && pos < col("cum_end"), col("v")))

    val qCols = ps.map { p =>
      val t = lit(p) * (col("n") - 1) // row-local; n is constant per group
      val lower = at(floor(t))
      val upper = at(ceil(t))
      val tAgg = lit(p) * (max(col("n")) - 1)
      val frac = tAgg - floor(tAgg)
      // (1-d)*lower + d*upper — the exact Percentile/quantile_cont form
      (lower * (lit(1.0) - frac) + upper * frac)
        .as(s"p${(p * 100).round}")
    }
    cum
      .groupBy(group)
      .agg(qCols.head, qCols.tail :+ max(col("n")).as("n"): _*)
  }
}
