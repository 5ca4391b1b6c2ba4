package graft.sinks

import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.SparkSuite
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** K1 layout + A2 observability: the materialized activity table and the
  * observe() ingest counter (≙ reference connection_state.py:8-9,
  * event_processor.py:73-74 — mapped to Spark-native metrics, not the
  * reference's unreliable per-poll counter, SURVEY.md §2.10 item 5). */
class ActivitySinkSpec extends SparkSuite {

  test("materialized write emits the observed ingest metric (A2)") {
    @volatile var observed: Long = -1L
    val latch = new CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val m = qe.observedMetrics.get("graft_ingest")
        m.foreach { row => observed = row.getAs[Long]("events_written"); latch.countDown() }
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val table = ActivitySink.materialized(spark, "/root/testdata/sf0.001")
      val n = table.count()
      assert(latch.await(30, TimeUnit.SECONDS), "observe metric never arrived")
      assert(observed === n, s"observed $observed != materialized rows $n")
    } finally spark.listenerManager.unregister(listener)
  }

  test("materialized table has the clustering layout and prunes by bucket") {
    val table = ActivitySink.materialized(spark, "/root/testdata/sf0.001")
    assert(table.columns.contains("user_bucket"))
    // bucket column is consistent with the partitioning function
    import org.apache.spark.sql.functions._
    val bad = table.where(
      col("user_bucket") =!= pmod(hash(col("user_id")), lit(ActivitySink.defaultBuckets)))
    assert(bad.count() === 0)
    // bucketsOf covers every row of the keys it is given
    val keys = table.select("user_id").distinct().limit(5)
    val buckets = ActivitySink.bucketsOf(keys)
    val covered = table
      .join(keys, Seq("user_id"), "left_semi")
      .where(!col("user_bucket").isin(buckets: _*))
    assert(covered.count() === 0)
  }
}
