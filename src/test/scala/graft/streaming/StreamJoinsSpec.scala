package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join: clicks inside the horizon attach to the
  * purchase; older clicks and other users don't. */
case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long)

class StreamJoinsSpec extends SparkSuite {

  import spark.implicits._

  private def ev(uid: Long, minute: Long, id: Long) =
    Ev(uid, new java.sql.Timestamp(minute * 60 * 1000), id)

  test("clicks within the horizon join; stale and cross-user clicks do not") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val out = tmpDir("sj_out")
    val ckpt = tmpDir("sj_ckpt")

    clicks.addData(
      ev(1, 10, 101), // 50 min before purchase → in horizon
      ev(1, 58, 102), // 2 min before → in horizon
      ev(1, 61, 103), // AFTER the purchase → excluded
      ev(2, 59, 104)) // other user → excluded
    purchases.addData(ev(1, 60, 900))

    val q = StreamJoins
      .purchaseAttribution(clicks.toDF(), purchases.toDF(), horizon = "1 hour")
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id")))
      .toSet
    assert(got === Set((900L, 101L), (900L, 102L)))
  }

  test("same plan runs as a plain batch interval join") {
    val clicks = Seq(ev(1, 10, 101), ev(1, 61, 103)).toDF()
    val purchases = Seq(ev(1, 60, 900)).toDF()
    val got = StreamJoins.purchaseAttribution(clicks, purchases)
      .collect().map(_.getAs[Long]("click_id")).toSet
    assert(got === Set(101L))
  }
}
