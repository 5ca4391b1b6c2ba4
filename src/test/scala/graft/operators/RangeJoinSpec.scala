package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join semantics, including bucket-boundary
  * spanning intervals and half-open edges. */
class RangeJoinSpec extends SparkSuite {

  import spark.implicits._

  private def ts(minute: Long) = new java.sql.Timestamp(minute * 60 * 1000)

  test("points match containing intervals across bucket boundaries; hi is exclusive") {
    val intervals = Seq(
      (1L, ts(0), ts(100), "ivA"),    // spans two 1-hour buckets
      (1L, ts(100), ts(130), "ivB"),  // starts exactly at A's end
      (2L, ts(0), ts(50), "ivC"))
      .toDF("k", "lo", "hi", "name")
    val points = Seq(
      (1L, ts(5), 1L),    // in A
      (1L, ts(99), 2L),   // in A (last minute)
      (1L, ts(100), 3L),  // hi-exclusive: NOT in A, in B
      (1L, ts(130), 4L),  // beyond B → no match
      (2L, ts(10), 5L),   // in C
      (3L, ts(10), 6L))   // no intervals for key 3
      .toDF("k", "t", "pid")

    val got = RangeJoin.pointInInterval(
        points, intervals, keys = Seq("k"), t = "t", lo = "lo", hi = "hi",
        payload = Seq("name"), bucketMs = 60L * 60 * 1000)
      .select("pid", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(got === Set((1L, "ivA"), (2L, "ivA"), (3L, "ivB"), (5L, "ivC")))
  }

  test("DistributedQuantiles ignores nulls like percentile does") {
    import org.apache.spark.sql.functions.expr
    val df = Seq(
      ("a", Option(1.0)), ("a", Option(2.0)), ("a", Option(3.0)),
      ("a", Option.empty[Double]))
      .toDF("g", "x")
    val dist = DistributedQuantiles.exactQuantiles(df, "g", "x", Seq(0.5))
      .collect().head
    assert(dist.getAs[Double]("p50") === 2.0)
    assert(dist.getAs[Long]("n") === 3L)
    val builtin = df.groupBy("g")
      .agg(expr("percentile(x, 0.5)").as("p50"))
      .collect().head.getAs[Double]("p50")
    assert(builtin === 2.0)
  }

  test("overlapping intervals each yield a row") {
    val intervals = Seq((1L, ts(0), ts(60), "x"), (1L, ts(30), ts(90), "y"))
      .toDF("k", "lo", "hi", "name")
    val points = Seq((1L, ts(45), 1L)).toDF("k", "t", "pid")
    val got = RangeJoin.pointInInterval(
        points, intervals, Seq("k"), "t", "lo", "hi", Seq("name"),
        bucketMs = 60L * 60 * 1000)
      .select("name").collect().map(_.getString(0)).toSet
    assert(got === Set("x", "y"))
  }
}
