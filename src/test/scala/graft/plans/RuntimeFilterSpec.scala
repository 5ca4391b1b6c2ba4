package graft.plans

import graft.SparkSuite
import graft.util.Tuning
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Tuning.enableRuntimeBloomPruning):
  * with the scale profile on, a selective dimension filter must inject a
  * `bloom_filter_might_contain` predicate into the fact side of a shuffle
  * join — row-level pruning BEFORE the exchange, the 100 TB join shape.
  * With production defaults, the tiny local scan must stay below the
  * injection threshold (the guard that keeps small joins from paying the
  * filter build). */
class RuntimeFilterSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  /** The canonical injectable join: big fact (lineitem) shuffle-joined to
    * a selectively-filtered dim (part), broadcast disabled so the join
    * actually shuffles (a broadcast join already prunes at the hash
    * table; runtime filters exist for the joins too big to broadcast). */
  private def factDimPlan(): String = {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val p = spark.read.parquet(s"$d/part.parquet")
      .where(col("p_brand") === "Brand#1")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(sum("l_quantity").as("qty"))
      .queryExecution.optimizedPlan.toString
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("scale profile injects bloom_filter_might_contain into the fact side") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      Tuning.enableRuntimeBloomPruning(spark, thresholdBytes = 0L)
      try {
        val plan = factDimPlan()
        // prints as might_contain(scalar-subquery […], xxhash64(l_partkey…))
        assert(plan.contains("might_contain"),
          s"no runtime bloom filter injected:\n$plan")
        assert(plan.contains("bloom_filter_agg"),
          s"no bloom filter aggregate on the creation side:\n$plan")
      } finally spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("production threshold keeps tiny joins filter-free") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      Tuning.enableRuntimeBloomPruning(spark) // default 10 GB gate
      try {
        val plan = factDimPlan()
        assert(!plan.contains("might_contain"),
          s"bloom filter injected below the scan-size gate:\n$plan")
      } finally spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("pruned result equals the unpruned result") {
    val expected = factDimRows()
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      Tuning.enableRuntimeBloomPruning(spark, thresholdBytes = 0L)
      try assert(factDimRows() === expected)
      finally spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  private def factDimRows(): Seq[(String, Double)] = {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val p = spark.read.parquet(s"$d/part.parquet")
      .where(col("p_brand") === "Brand#1")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(sum("l_quantity").as("qty"))
      .orderBy("p_brand")
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1)))
  }
}
