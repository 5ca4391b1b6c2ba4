package graft

import graft.SparkSuite

/** Plan-shape regression tests: the scale properties PLANS.md claims are
  * asserted against the actual physical plans, so a refactor that
  * silently degrades a broadcast to a nested loop (or loses pushdown)
  * fails CI rather than the 100 TB deployment. */
class PlanShapeSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, d)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q5_nation_revenue: dimensions broadcast, no nested loop") {
    val p = plan("q5_nation_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q1_pricing_summary: filters/columns reach the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("Scan parquet"))
    assert(p.contains("ReadSchema"))
    // partial-then-final aggregation (map-side combine before the shuffle)
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }

  test("sim_topk: top-k limit pushed below the window exchange") {
    val p = plan("sim_topk")
    assert(p.contains("WindowGroupLimit"))
  }

  test("feed_page: semi-join on broadcast followee list") {
    val p = plan("feed_page")
    assert(p.contains("LeftSemi"))
    assert(p.contains("BroadcastExchange"))
  }

  test("events_session_attribution: range join plans as equi-join, not BNL") {
    val p = plan("events_session_attribution")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("near_dup_jaccard: band join is an equi-join; no cartesian anywhere") {
    val p = plan("near_dup_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("cdc adapter branch: event-type filter is pushed to the scan") {
    val p = plan("cdc_adapter_likes")
    assert(p.contains("PushedFilters"))
    assert(p.contains("event_type"))
  }

  test("pack_windows: no single-partition global window anywhere") {
    // the naive global cumsum plans an `Exchange SinglePartition` — the
    // one shape that cannot scale; the range-partitioned prefix sum must
    // never reintroduce it
    val p = plan("pack_windows")
    assert(!p.contains("SinglePartition"), "global-window collapse detected")
    assert(p.contains("Window"), "per-partition running sum is a Window")
  }

  test("near_dup_containment: prefix-filter join is an equi-join, not BNL") {
    val p = plan("near_dup_containment")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("quality_repetition: both aggregates are map-side combined") {
    val p = plan("quality_repetition")
    assert(!p.contains("CartesianProduct"))
    // two-level aggregation, each with partial + final
    assert("HashAggregate".r.findAllIn(p).length >= 4 ||
      "ObjectHashAggregate".r.findAllIn(p).length >= 2, p.take(400))
  }
}
