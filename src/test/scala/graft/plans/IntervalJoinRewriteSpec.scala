package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The injected optimizer rule turns a pure interval join (no equality
  * conjunct → natively a BroadcastNestedLoopJoin) into a bucketed
  * equi-join, without changing results. Uses a sibling session (same
  * SparkContext) with GraftExtensions installed — never stops the
  * shared context. */
class IntervalJoinRewriteSpec extends SparkSuite {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    spark // force the shared session first so the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(
      SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate())
    finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  private def ts(minute: Long) = new java.sql.Timestamp(minute * 60000L)

  test("pure interval join plans as equi-join and keeps exact semantics") {
    withExtendedSession { s2 =>
      import s2.implicits._
      val points = Seq((ts(5), 1L), (ts(65), 2L), (ts(100), 3L), (ts(200), 4L))
        .toDF("t", "pid")
      val intervals = Seq(
        (ts(0), ts(70), 10L),    // spans two 1h buckets; catches pids 1, 2
        (ts(100), ts(101), 20L), // catches pid 3 (hi-exclusive upper)
        (ts(150), ts(150), 30L)) // degenerate hi <= lo → matches nothing
        .toDF("lo", "hi", "ivid")

      val joined = points.join(intervals,
        col("t") >= col("lo") && col("t") < col("hi"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      assert(!plan.contains("CartesianProduct"))

      val got = joined.select("pid", "ivid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 10L), (2L, 10L), (3L, 20L)))
    }
  }

  test("joins with an equality conjunct are left alone") {
    withExtendedSession { s2 =>
      import s2.implicits._
      val a = Seq((1L, ts(5))).toDF("k", "t")
      val b = Seq((1L, ts(0), ts(10))).toDF("k", "lo", "hi")
      val joined = a.join(b,
        a("k") === b("k") && col("t") >= col("lo") && col("t") < col("hi"))
      // 3 conjuncts → not a pure interval join; native planning applies
      assert(joined.count() === 1L)
      assert(!joined.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
    }
  }
}
