package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Count–Min sketch: matrix shape and conservation, one-sided error,
  * degenerate-width saturation, the power-of-two width guard, and the
  * batch-function-IS-the-streaming-twin property. */
class CountMinSpec extends SparkSuite {

  import spark.implicits._

  private def keysDf(ks: String*) = ks.toDF("cm_key")

  test("matrix conservation: every row sums to N; estimates never " +
      "undercount and are exact when the width has room") {
    val ks = Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq("c", "d", "e")
    val sk = CountMin.sketch(keysDf(ks: _*), width = 64, depth = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // each occurrence lands exactly once per row
    (0 until 4).foreach { r =>
      assert(sk.filter(_._1 == r).map(_._3).sum === ks.length.toLong, s"row $r")
    }
    assert(sk.forall(c => c._2 >= 0 && c._2 < 64))
    val chk = CountMin.cmCheck(keysDf(ks: _*), width = 64, depth = 4)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(chk("a")._1 === 10L && chk("b")._1 === 5L)
    assert(chk.values.forall(_._3), "no_undercount must hold everywhere")
    assert(chk.values.forall(_._4), "within_band must hold everywhere")
    // 5 keys in 4×64 cells: no full-depth collision — estimates exact
    assert(chk.values.forall(v => v._2 === v._1), "est exact at this width")
  }

  test("width 1 saturates every cell to N — the contracts still hold " +
      "(no_undercount trivially, within_band by the 2N slack)") {
    val ks = Seq.fill(7)("x") ++ Seq.fill(3)("y")
    val chk = CountMin.cmCheck(keysDf(ks: _*), width = 1, depth = 4)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(chk("x") === ((7L, 10L, true, true)))
    assert(chk("y") === ((3L, 10L, true, true)))
  }

  test("non-power-of-two width is rejected (the signed/unsigned residue " +
      "equivalence precondition)") {
    intercept[IllegalArgumentException] {
      CountMin.sketch(keysDf("a"), width = 500)
    }
    intercept[IllegalArgumentException] {
      CountMin.cmCheck(keysDf("a"), width = 0)
    }
  }

  test("the batch sketch function IS the streaming sketch: complete-mode " +
      "cells over replayed micro-batches equal the batch matrix") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = CountMin.sketch(mem.toDF().toDF("cm_key"), width = 64, depth = 4)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cm_cells").start()
    try {
      mem.addData("a", "b", "a")
      q.processAllAvailable()
      mem.addData("c", "a", "b")
      q.processAllAvailable()
      val streamed = spark.table("cm_cells")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      val batch = CountMin
        .sketch(keysDf("a", "b", "a", "c", "a", "b"), width = 64, depth = 4)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
