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

  test("session sequences bind to a watermarked stream: finalized sessions " +
      "emit their ordered event-type digest") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    // the batch operator's aggregation expressions, bound to a stream with
    // a watermark + session_window — the §2.9 "same plan, streaming
    // source" contract for the round-5 sequence operator
    val agg = mem.toDF().toDF("ts", "user_id", "event_id", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        concat_ws(">",
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            s => s.getField("event_type"))).as("seq"))
      .select(col("user_id"), col("n_events"), md5(col("seq")).as("seq_md5"))
    val q = agg.writeStream
      .format("memory").queryName("seq_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def md5Of(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    // user 7: click@1, view@2 (one session); then far-future event closes it
    mem.addData((ts(1), 7L, 1L, "click"), (ts(2), 7L, 2L, "view"))
    q.processAllAvailable()
    mem.addData((ts(60), 7L, 3L, "purchase")) // advances watermark past session
    q.processAllAvailable()
    mem.addData((ts(120), 8L, 4L, "click"))   // closes user 7's second session
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("seq_out")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events"), r.getAs[String]("seq_md5"))).toSet
    assert(rows.contains((7L, 2L, md5Of("click>view"))),
      s"finalized first session must carry the ordered digest; got $rows")
    assert(rows.contains((7L, 1L, md5Of("purchase"))))
  }

  test("drift monitor's weekly counts bind to a watermarked stream: " +
      "Monday-aligned 7-day windows reproduce date_trunc('week') exactly") {
    implicit val sqlCtx = spark.sqlContext
    // the drift monitor's (week, type) count matrix as a streaming agg:
    // date_trunc is not a watermark-evictable window, but a 7-day
    // tumbling window with a 4-day startTime offset IS Monday-aligned
    // (epoch day 0 = Thursday), so window.start == date_trunc('week')
    // for every ts after 1970-01-05 — the §2.9 same-plan binding for
    // driftWeekly's shuffle stage, with bounded per-window state
    val fx = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts"), col("event_type"))
    val batchCounts = fx
      .groupBy(date_trunc("week", col("ts")).as("week"), col("event_type"))
      .agg(count(lit(1)).as("nwt"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
      .toSet
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "1 hour")
      .groupBy(
        window(col("ts"), "7 days", "7 days", "4 days").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("nwt"))
      .select(col("w.start").as("week"), col("event_type"), col("nwt"))
    val q = agg.writeStream
      .format("memory").queryName("drift_counts")
      .outputMode("complete")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    fx.collect().grouped(2000).foreach { chunk =>
      mem.addData(chunk.map(r =>
        (r.getTimestamp(0), r.getString(1))).toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("drift_counts")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed === batchCounts,
      "streamed weekly counts must equal the batch date_trunc counts")
  }
}
