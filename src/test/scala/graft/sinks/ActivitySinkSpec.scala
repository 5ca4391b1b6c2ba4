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

  test("compact restores one-file-per-bucket and GCs batch markers") {
    import org.apache.spark.sql.functions._
    val path = tmpDir("graft_compact") + "/activity"
    val activity = ActivitySink.materialized(spark, "/root/testdata/sf0.001")
      .drop("user_bucket")
    // two appends ⇒ ≥ 2 files in every non-empty bucket dir, plus markers
    ActivitySink.appendBatch(activity, path, buckets = 8)
    ActivitySink.appendBatch(activity, path, buckets = 8)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/_batches"))
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_batches/0"), true).close()

    def bucketFiles(): Map[String, Int] = fs
      .listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("user_bucket="))
      .map(d => d.getPath.getName ->
        fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet")))
      .toMap

    assert(bucketFiles().values.forall(_ >= 2))
    val before = spark.read.parquet(path)
      .orderBy("activity_type", "activity_pk").collect()

    ActivitySink.compact(spark, path, buckets = 8)

    val files = bucketFiles()
    assert(files.nonEmpty && files.values.forall(_ === 1),
      s"expected one file per bucket, got $files")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_batches")))
    val after = spark.read.parquet(path)
      .orderBy("activity_type", "activity_pk").collect()
    assert(after.toSeq === before.toSeq) // identical reads
    // pruning still works: bucket column consistent with the hash
    val bad = spark.read.parquet(path).where(
      col("user_bucket") =!= pmod(hash(col("user_id")), lit(8)))
    assert(bad.count() === 0)
  }
}
