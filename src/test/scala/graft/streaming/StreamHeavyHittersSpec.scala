package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Sharded streaming Misra–Gries: the batch sketch's contracts (no
  * overcount, per-bucket undercount band, guaranteed survivors present)
  * hold for the final state across micro-batches and checkpoint
  * restarts, and state stays bounded at buckets × k. */
class StreamHeavyHittersSpec extends SparkSuite {

  import spark.implicits._

  private val K = 4
  private val Buckets = 4

  // planted stream: "heavy" 40%, "warm" 20%, tail of 30 cold keys
  private def slice(from: Int, until: Int): Seq[String] =
    (from until until).map { i =>
      if (i % 5 < 2) "heavy"
      else if (i % 5 == 2) "warm"
      else s"cold_${i % 30}"
    }

  private def finalSummary(out: String): Map[String, Long] = {
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("version"),
        r.getAs[String]("key"), r.getAs[Long]("est")))
    // update-mode sinks retain stale snapshots: keep max version per bucket
    val lastVersion = rows.groupBy(_._1).map { case (b, rs) =>
      b -> rs.map(_._2).max
    }
    rows.filter { case (b, v, _, _) => v == lastVersion(b) }
      .map { case (_, _, k, e) => k -> e }.toMap
  }

  test("contracts hold across micro-batches and a checkpointed restart") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = tmpDir("shh_ckpt")
    val out = tmpDir("shh_out")
    def run(): Unit = {
      val q = StreamHeavyHitters.streamSummary(mem.toDF(), K, Buckets)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[HHRow],
           _: Long) => batch.write.mode("append").parquet(out)
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val all = slice(0, 900)
    mem.addData(slice(0, 300): _*)
    run()
    mem.addData(slice(300, 900): _*) // state restored from checkpoint
    run()

    val summary = finalSummary(out)
    val exact = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = all.size.toLong

    // state bound: the sketch is its own eviction policy
    assert(summary.size <= Buckets * K,
      s"${summary.size} counters > buckets($Buckets) × k($K)")
    // no overcount, ever
    summary.foreach { case (k, est) =>
      assert(est <= exact(k), s"overcount on $k: $est > ${exact(k)}")
    }
    // per-key undercount band via the global bound N/(k+1)
    summary.foreach { case (k, est) =>
      assert(exact(k) - est <= n / (K + 1),
        s"undercount on $k: ${exact(k) - est} > ${n / (K + 1)}")
    }
    // guaranteed survivors: heavy (360) and warm (180) clear N/(k+1)=180
    assert(summary.contains("heavy"))
    assert(summary.contains("warm"))
  }

  test("mgFold matches the batch operator's update rule") {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    StreamHeavyHitters.mgFold(counters,
      Iterator("a", "a", "b", "c", "d"), k = 2)
    // a:2, b:1 resident when c arrives → decrement-all (a:1, b dropped),
    // then d arrives with room (a + free slot) → d:1
    assert(counters.toMap === Map("a" -> 1L, "d" -> 1L))
  }
}
