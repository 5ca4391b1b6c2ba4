package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming window semantics with watermark: tumbling agg emits finalized
  * windows; late events beyond the watermark are dropped. */
class WindowStreamSpec extends SparkSuite {

  import spark.implicits._

  // 1700000400000 is 5-minute aligned, so min 0-4 share one tumbling window
  private def ts(min: Int) = new java.sql.Timestamp(1700000400000L + min * 60000L)

  test("watermarked tumbling window drops late data, keeps on-time data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .format("memory").queryName("win_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // batch 1: two events in window [0,5), advance event time to min 30
    mem.addData((ts(1), "click", 1.0), (ts(3), "click", 1.0), (ts(30), "view", 1.0))
    q.processAllAvailable()
    // batch 2: a LATE click at min 2 — watermark is 30-10=20 > window end 5
    mem.addData((ts(2), "click", 1.0))
    q.processAllAvailable()
    // batch 3: advance time far so window [30,35) also finalizes
    mem.addData((ts(60), "view", 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("win_out")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ws").getTime,
        r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
    // the finalized [0,5) click window holds exactly the 2 on-time events;
    // the late third click was dropped by the watermark
    val clickWindows = out.filter(_._2 == "click")
    assert(clickWindows === Set((1700000400000L, "click", 2L)))
  }
}
