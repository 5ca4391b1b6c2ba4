package graft.sinks

import graft.SparkSuite
import graft.ext.Layout
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming z-layout maintenance: appended batches must stay findable
  * through the partition-pruned read path (including rows that drift
  * past the frozen normalization bounds — the clamp contract), replays
  * must not duplicate, and compaction must restore one file per cell
  * without changing the table's contents. */
class LayoutSinkSpec extends SparkSuite {
  import spark.implicits._

  test("appends keep the pruned read exact; clamp, replay, compact") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("zlayout_sink")
    val base = Seq.tabulate(1000)(i =>
      ((i % 100).toLong, (i % 50).toLong, i.toLong)).toDF("x", "y", "pay")
    Layout.writeClustered(base, dir, "x", "y", cellBits = 4)

    val mem = MemoryStream[(Long, Long, Long)]
    val ckpt = tmpDir("zlayout_sink_ckpt")
    def run(): Unit = LayoutSink.run(
      mem.toDF().toDF("x", "y", "pay"), dir, ckpt).awaitTermination()

    // batch 1: in-range; batch 2: BEYOND the frozen bounds (x_hi=99,
    // y_hi=49) — must clamp into the edge cells, not vanish or throw
    mem.addData((10L, 10L, 10000L))
    run()
    mem.addData((500L, 200L, 10001L), (7L, 7L, 10002L))
    run()

    // a predicate past the bounds still finds the clamped row
    val far = LayoutSink.readPruned(spark, dir, "pay",
      Some((450L, 600L)), None).select("pay").as[Long].collect()
    assert(far.toSet === Set(10001L))

    // the unconstrained read sees base + all three appends, exactly once
    def allPays(): Seq[Long] = LayoutSink.readPruned(spark, dir, "pay",
      None, None).select("pay").as[Long].collect().toSeq.sorted
    val expected = (0L until 1000L) ++ Seq(10000L, 10001L, 10002L)
    assert(allPays() === expected)

    // an uncommitted-marker retry re-appends files; read-side dedup on
    // the deterministic key keeps the table exactly-once
    LayoutSink.appendBatch(
      Seq((7L, 7L, 10002L)).toDF("x", "y", "pay"), dir)
    assert(allPays() === expected)

    // compaction folds the duplicate file away and restores one file
    // per cell; contents unchanged
    LayoutSink.compact(spark, dir, "pay")
    assert(allPays() === expected)
    val filesPerCell = new java.io.File(s"$dir/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("zcell="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(filesPerCell.nonEmpty && filesPerCell.forall(_ === 1),
      s"expected one file per cell, got ${filesPerCell.mkString(",")}")
    // and a plain full-scan (no dedup) agrees: the physical duplicate
    // really is gone, not just masked by the reader
    assert(spark.read.parquet(s"$dir/data")
      .select("pay").as[Long].collect().toSeq.sorted === expected)
  }
}
