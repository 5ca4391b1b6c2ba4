package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming connected-components twin (VERDICT r11 item 6): the
  * incremental star-edge fold must label the follow graph IDENTICALLY to
  * the batch operator, across micro-batch splits, component-merging
  * bridge edges, and foreachBatch replays. */
class StreamComponentsSpec extends SparkSuite {

  import spark.implicits._

  private def labelsAt(path: String): Set[(Long, Long)] =
    StreamComponents.readComponents(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("folding the fixture follow stream in thirds reproduces the " +
      "batch labels exactly; re-folding a batch is a no-op (replay " +
      "idempotence)") {
    val fx = graft.ingest.CdcEnvelope.admitted(
      graft.sources.CdcSource.followers(
        graft.sources.CdcSource.events(spark, "/root/testdata/sf0.001")))
    val batchLabels = graft.serve.GraphStats.followComponents(fx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val path = tmpDir("graft_streamcc") + "/labels"
    (0 to 2).foreach { i =>
      StreamComponents.foldBatch(fx.where(col("id") % 3 === i), path)
    }
    assert(labelsAt(path) === batchLabels)
    // exactly-once posture: a foreachBatch retry re-merges edges the
    // star set already spans — labels must not move
    StreamComponents.foldBatch(fx.where(col("id") % 3 === 1), path)
    assert(labelsAt(path) === batchLabels)
    // crash window between the swap's renames: the table left only at
    // __old must be healed by the next fold, NOT treated as an empty
    // graph (which a replayed empty batch would silently re-label from)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(path + "__old")))
    StreamComponents.foldBatch(fx.limit(0), path)
    assert(labelsAt(path) === batchLabels,
      "a post-crash fold must restore the prior labels from __old")
  }

  test("streaming query maintains the table; a later bridge edge merges " +
      "two existing components to the global min label") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    val path = tmpDir("graft_streamcc2") + "/labels"
    val ckpt = tmpDir("graft_streamcc2_ckpt")
    def run() = StreamComponents.runComponentsTable(
      mem.toDF().toDF("id", "follower_id", "following_id", "__op"),
      path, ckpt).awaitTermination()

    // two components; a self-loop and a non-create must be ignored
    // (the batch operator's creates-only, no-self-loop contract)
    mem.addData((1L, "1", "2", "c"), (2L, "10", "11", "c"),
      (3L, "5", "5", "c"), (4L, "7", "8", "u"))
    run()
    assert(labelsAt(path) ===
      Set((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)))

    // bridge: merges {1,2} and {10,11} → everyone labels to min id 1
    mem.addData((5L, "2", "10", "c"))
    run()
    assert(labelsAt(path) ===
      Set((1L, 1L), (2L, 1L), (10L, 1L), (11L, 1L)))
  }
}
