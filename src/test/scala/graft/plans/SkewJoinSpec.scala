package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** AQE skew-join splitting (the other half of Tuning.applyScaleProfile):
  * the engine's plans salt the KNOWN hot keys explicitly
  * (feed_topk_per_user_salted); AQE is the net under the ones data drift
  * invents. This pins that the profile's confs actually split a skewed
  * shuffle-join partition at runtime — `skew=true` in the finalized
  * adaptive plan — so the claim in Tuning's scaladoc is executable, not
  * faith. */
class SkewJoinSpec extends SparkSuite {

  private def withSavedConfs(keys: String*)(body: => Unit): Unit = {
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a shuffle join (skew=true)") {
    import spark.implicits._
    withSavedConfs(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled") {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // fixture-scale thresholds: a real cluster keeps the defaults
      // (256 MB partitions); the GEOMETRY of the check is identical
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 90% of the fact rides one key (with a payload wide enough that
      // the skewed shuffle partition clears the lowered byte thresholds);
      // the dim is uniform
      val fact = spark.range(0, 60000)
        .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id") % 100)
          .as("k"),
          concat(lit("payload-"), col("id"), lit("-"),
            md5(col("id").cast("string"))).as("payload"))
      val dim = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      // max(payload) keeps the wide incompressible column ALIVE through
      // the join shuffle (count alone lets column pruning strip it, and
      // a partition of identical 8-byte keys compresses below any
      // realistic skew threshold)
      val joined = fact.join(dim, "k").groupBy("name")
        .agg(count(lit(1)).as("n"), max("payload").as("p"))

      val rows = joined.collect() // finalize the adaptive plan
      assert(rows.map(_.getLong(1)).sum === 60000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$plan")
    }
  }
}
