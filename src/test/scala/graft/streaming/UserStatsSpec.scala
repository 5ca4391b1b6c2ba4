package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Custom streaming state (`mapGroupsWithState`): counters accumulate
  * across micro-batches per key. */
class UserStatsSpec extends SparkSuite {

  import spark.implicits._

  private def like(id: Long, user: String, ts: Long) =
    s"""{"id":$id,"shard_id":3,"liked_by":"$user","__op":"c","__table":"likes","__source_ts_ms":$ts,"__source_table":"likes"}"""

  test("per-user state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = tmpDir("user_stats_ckpt")
    val out = tmpDir("user_stats_out")
    // EventTimeTimeout (not ProcessingTimeTimeout) keeps AvailableNow
    // drains terminable: wall-clock timers force Spark to reconstruct a
    // batch every cycle, so a drain would never reach a quiet point.
    def run(): Unit = {
      val q = StreamingIngest.userStats(
          StreamingIngest.activityStream(mem.toDF()))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserStat], _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    mem.addData(like(1, "7", 1000), like(2, "7", 2000), like(3, "8", 1500))
    run()
    mem.addData(like(4, "7", 3000)) // second run: state restored from ckpt
    run()

    val rows = spark.read.parquet(out)
      .collect()
      .map(r => (r.getAs[String]("user_id"),
        r.getAs[Long]("n_activities"), r.getAs[Long]("latest_ts_ms")))
    // update mode: last emission per user wins
    val latest = rows.groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
    assert(latest("7") === (("7", 3L, 3000L))) // 2 from batch 1 + 1 from batch 2
    assert(latest("8") === (("8", 1L, 1500L)))
  }
}
