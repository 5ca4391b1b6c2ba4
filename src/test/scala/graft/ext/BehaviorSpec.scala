package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics of the behavior-analytics tier on hand-built event logs:
  * cohort anchoring, funnel ordering/windowing, calendar zero-fill, and
  * the ISO day-of-week convention. */
class BehaviorSpec extends SparkSuite {

  private def ev(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), lit(1.0).as("value"))
  }

  test("cohortRetention anchors users at first-activity week") {
    // u1 active weeks 0 and 2 (Mondays 2024-01-01 / 2024-01-15);
    // u2 first seen week 1, active weeks 1 and 2.
    val df = Behavior.cohortRetention(ev(
      (1L, "2024-01-02 10:00:00", "view"),
      (1L, "2024-01-16 10:00:00", "view"),
      (2L, "2024-01-09 10:00:00", "view"),
      (2L, "2024-01-17 10:00:00", "view")))
    val got = df.collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1), r.getLong(2)))
    assert(got.toSet === Set(
      ("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("funnel requires strict stage order within the step window") {
    // u1 converts fully; u2 clicked BEFORE viewing (order violation);
    // u3's view is 25h after signup (outside the 24h window).
    val df = Behavior.funnel(ev(
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-01 01:00:00", "view"),
      (1L, "2024-01-01 02:00:00", "click"),
      (2L, "2024-01-01 00:00:00", "signup"),
      (2L, "2024-01-01 00:30:00", "click"),
      (2L, "2024-01-01 01:00:00", "view"),
      (3L, "2024-01-01 00:00:00", "signup"),
      (3L, "2024-01-02 01:00:00", "view")),
      Seq("signup", "view", "click"))
    val r = df.collect().head
    assert(r.getAs[Long]("n_signup") === 3L)
    assert(r.getAs[Long]("n_view") === 2L) // u1, u2 (u3 outside window)
    // u2's click precedes its earliest view, so only u1 converts.
    assert(r.getAs[Long]("n_click") === 1L)
  }

  test("gapFillDaily zero-fills missing (type, day) cells over the full span") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-04 10:00:00", "view"),
      (2L, "2024-01-02 10:00:00", "click"))
    // src keeps only 'view' rows → click gets a fully zero-filled series.
    val df = Behavior.gapFillDaily(events, events.where(col("event_type") === "view"))
    val got = df.collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10), r.getLong(2)))
    assert(got.length === 8) // 2 types × 4 days (01..04)
    assert(got.count(_._3 == 0L) === 6)
    assert(got.contains(("view", "2024-01-01", 1L)))
    assert(got.contains(("view", "2024-01-03", 0L)))
    assert(got.contains(("click", "2024-01-02", 0L)))
  }

  test("dailyAnomalies flags the planted spike day and nothing else") {
    // 10 quiet days with 2 events each, one day with 20 → only the spike
    // exceeds 2 sample stddevs; the constant 'other' series (sd = 0)
    // produces no anomalies at all
    val rows = (1 to 10).flatMap { d =>
      val day = f"2024-01-$d%02d 10:00:00"
      Seq((1L, day, "click"), (2L, day, "click"), (3L, day, "other"))
    } ++ (1 to 20).map(i => (i.toLong, "2024-01-11 10:00:00", "click")) ++
      Seq((4L, "2024-01-11 10:00:00", "other"))
    val got = Behavior.dailyAnomalies(ev(rows: _*)).collect()
    assert(got.length === 1)
    assert(got.head.getAs[String]("event_type") === "click")
    assert(got.head.getAs[Long]("n") === 20L)
    assert(got.head.getAs[Double]("z_r") > 2.0)
  }

  test("dowHourProfile maps Monday→1 and Sunday→7 (ISO)") {
    // 2024-01-01 is a Monday; 2024-01-07 is a Sunday.
    val df = Behavior.dowHourProfile(ev(
      (1L, "2024-01-01 05:00:00", "view"),
      (2L, "2024-01-07 23:00:00", "view")))
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet === Set((1, 5, 1L), (7, 23, 1L)))
  }

  test("eventTransitions: per-user steps only, probabilities normalize " +
      "within each prev type, event_id breaks timestamp ties") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (1L, 2L, "2024-01-01 10:01:00", "click"),
      (1L, 3L, "2024-01-01 10:02:00", "view"),
      (1L, 4L, "2024-01-01 10:02:00", "purchase"), // ties on ts: id order
      (2L, 5L, "2024-01-01 11:00:00", "view"),
      (2L, 6L, "2024-01-01 11:01:00", "click"))
      .toDF("user_id", "event_id", "ts_s", "event_type")
      .select(col("user_id"), col("event_id"),
        to_timestamp(col("ts_s")).as("ts"), col("event_type"))
    val got = Behavior.eventTransitions(events).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type"),
        r.getAs[Long]("n"), r.getAs[Double]("p_r"))).toSet
    // u1: view→click, click→view, view→purchase (tie resolved by id);
    // u2: view→click; u1's trailing purchase never chains into u2
    assert(got === Set(
      ("view", "click", 2L, 0.666667),
      ("view", "purchase", 1L, 0.333333),
      ("click", "view", 1L, 1.0)))
  }
}
