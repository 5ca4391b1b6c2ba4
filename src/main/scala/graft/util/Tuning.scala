package graft.util

import org.apache.spark.sql.SparkSession

/** The recommended cluster-scale session configuration, in one audited
  * place. Everything the engine needs semantically is declared in the
  * plans themselves (broadcast hints, repartitioning, bucketing); these
  * runtime knobs are the ones whose DEFAULTS are tuned for mid-size
  * clusters and deserve explicit values on a 1000-executor / 100 TB
  * deployment. The local test/bench/verify mains deliberately do NOT
  * apply them all — thresholds that pay off against TB-scale scans are
  * pure overhead against MB-scale fixtures, and [[RuntimeFilterSpec]]
  * pins both sides of that line.
  */
object Tuning {

  /** Runtime row-level join pruning: let the optimizer build a bloom
    * filter over the SELECTIVE (filtered, creation) side of a shuffle
    * join and push `might_contain(key)` into the other side's scan, so
    * fact rows that cannot join are dropped before the exchange. The
    * defaults gate injection on a ≥ 10 GB application-side scan — right
    * for production, never reached by local fixtures, which is why the
    * capability is pinned by a plan spec rather than left to faith.
    * `thresholdBytes` lowers the application-side gate (0 = always
    * consider; production should keep a multi-GB floor so tiny joins
    * don't pay the filter build). */
  def enableRuntimeBloomPruning(spark: SparkSession,
    thresholdBytes: Long = 10L << 30): Unit = {
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      thresholdBytes.toString)
  }

  /** The full scale profile: AQE with skew-join splitting and partition
    * coalescing (runtime re-planning against real statistics — the
    * engine's salting/bucketing handles the KNOWN skews, AQE catches the
    * ones data drift invents), plus runtime bloom pruning at its
    * production threshold. Shuffle partition count is left to the
    * deployment (cores × 2–3 at cluster scale); the local mains pin 32. */
  def applyScaleProfile(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    enableRuntimeBloomPruning(spark)
  }
}
