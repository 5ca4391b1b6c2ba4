package graft.plans

import graft.SparkSuite
import graft.util.Tuning
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Tuning.enableRuntimeBloomPruning):
  * with the scale profile on, a selective dimension filter must inject a
  * `might_contain` predicate into the fact side of a shuffle join — row-
  * level pruning BEFORE the exchange, the 100 TB join shape. With
  * production defaults, the tiny local scan must stay below the
  * injection threshold (the guard that keeps small joins from paying the
  * filter build). */
class RuntimeFilterSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private val bloomEnabledKey =
    "spark.sql.optimizer.runtime.bloomFilter.enabled"
  private val bloomThresholdKey =
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
  private val broadcastKey = "spark.sql.autoBroadcastJoinThreshold"

  /** The canonical injectable join: big fact (lineitem) shuffle-joined to
    * a selectively-filtered dim (part), broadcast disabled so the join
    * actually shuffles (a broadcast join already prunes at the hash
    * table; runtime filters exist for the joins too big to broadcast).
    * ONE definition — the plan pins and the result check must exercise
    * the same query. */
  private def factDim(): DataFrame = {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val p = spark.read.parquet(s"$d/part.parquet")
      .where(col("p_brand") === "Brand#1")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(sum("l_quantity").as("qty"))
  }

  private def factDimRows(): Seq[(String, Double)] =
    factDim().orderBy("p_brand")
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1)))

  /** Save the named confs, run the body (which may set them however it
    * likes, including through Tuning), and RESTORE — never unset-only,
    * which would clobber a pre-existing value; the session is JVM-shared
    * across suites. */
  private def withSavedConfs(keys: String*)(body: => Unit): Unit = {
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("scale profile injects bloom_filter_might_contain into the fact side") {
    withSavedConfs(broadcastKey, bloomEnabledKey, bloomThresholdKey) {
      spark.conf.set(broadcastKey, "-1")
      Tuning.enableRuntimeBloomPruning(spark, thresholdBytes = 0L)
      val plan = factDim().queryExecution.optimizedPlan.toString
      // prints as might_contain(scalar-subquery […], xxhash64(l_partkey…))
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(plan.contains("bloom_filter_agg"),
        s"no bloom filter aggregate on the creation side:\n$plan")
    }
  }

  test("production threshold keeps tiny joins filter-free") {
    withSavedConfs(broadcastKey, bloomEnabledKey, bloomThresholdKey) {
      spark.conf.set(broadcastKey, "-1")
      Tuning.enableRuntimeBloomPruning(spark) // default 10 GB gate
      val plan = factDim().queryExecution.optimizedPlan.toString
      assert(!plan.contains("might_contain"),
        s"bloom filter injected below the scan-size gate:\n$plan")
    }
  }

  test("pruned result equals the unpruned result") {
    val expected = factDimRows()
    withSavedConfs(broadcastKey, bloomEnabledKey, bloomThresholdKey) {
      spark.conf.set(broadcastKey, "-1")
      Tuning.enableRuntimeBloomPruning(spark, thresholdBytes = 0L)
      assert(factDimRows() === expected)
    }
  }
}
