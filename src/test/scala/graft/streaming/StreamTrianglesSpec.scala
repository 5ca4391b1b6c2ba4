package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming triangle maintenance: the T1/T2/T3 delta decomposition must
  * reproduce the batch operator's per-vertex counts exactly across
  * micro-batch splits, each delta case planted individually, plus replay
  * idempotence. */
class StreamTrianglesSpec extends SparkSuite {

  import spark.implicits._

  private def statsAt(path: String): Set[(Long, Long, Long)] =
    StreamTriangles.readTriangles(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def cdc(edges: (Long, Long)*) =
    edges.toSeq.map { case (a, b) => (a.toString, b.toString, "c") }
      .toDF("follower_id", "following_id", "__op")

  test("each delta case lands exactly once: T1 (one new edge), T2 (two " +
      "new at a center), T3 (all-new), and a replayed fold is a no-op") {
    val path = tmpDir("graft_streamtri") + "/state"
    // batch 1: path 1-2, 1-3 — no triangle yet
    StreamTriangles.foldBatch(cdc((1L, 2L), (1L, 3L)), path)
    assert(statsAt(path) === Set((1L, 2L, 0L), (2L, 1L, 0L), (3L, 1L, 0L)))
    // batch 2 — T1: new edge (2,3) closes the old wedge at 1
    StreamTriangles.foldBatch(cdc((2L, 3L)), path)
    assert(statsAt(path) === Set((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L)))
    // batch 3 — T2: new edges (8,2) and (8,3) close over OLD (2,3);
    // also T3: 10-11, 10-12, 11-12 arrive together, entirely new
    StreamTriangles.foldBatch(
      cdc((8L, 2L), (8L, 3L), (10L, 11L), (10L, 12L), (11L, 12L)), path)
    val afterB3 = statsAt(path)
    assert(afterB3 === Set(
      (1L, 2L, 1L), (2L, 3L, 2L), (3L, 3L, 2L), (8L, 2L, 1L),
      (10L, 2L, 1L), (11L, 2L, 1L), (12L, 2L, 1L)))
    // replay batch 3 verbatim: every edge already present → no change
    StreamTriangles.foldBatch(
      cdc((8L, 2L), (8L, 3L), (10L, 11L), (10L, 12L), (11L, 12L)), path)
    assert(statsAt(path) === afterB3)
  }

  test("folding the fixture follow stream in thirds reproduces the " +
      "batch operator's counts exactly") {
    val fx = graft.ingest.CdcEnvelope.admitted(
      graft.sources.CdcSource.followers(
        graft.sources.CdcSource.events(spark, "/root/testdata/sf0.001")))
    val batch = graft.serve.GraphStats.triangles(fx)
      .collect()
      .map(r => (r.getString(0).toLong, r.getLong(1), r.getLong(2))).toSet
    val path = tmpDir("graft_streamtri_fx") + "/state"
    (0 to 2).foreach { i =>
      StreamTriangles.foldBatch(fx.where(col("id") % 3 === i), path)
    }
    assert(statsAt(path) === batch)
  }

  test("streaming query drives the fold end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, String)]
    val path = tmpDir("graft_streamtri2") + "/state"
    val ckpt = tmpDir("graft_streamtri2_ckpt")
    def run() = StreamTriangles.runTrianglesTable(
      mem.toDF().toDF("follower_id", "following_id", "__op"),
      path, ckpt).awaitTermination()
    mem.addData(("1", "2", "c"), ("1", "3", "c"))
    run()
    mem.addData(("2", "3", "c"))
    run()
    assert(statsAt(path) === Set((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L)))
  }
}
