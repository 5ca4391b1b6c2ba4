package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-behavior analytics over the `events` stream table: weekly retention
  * cohorts, ordered conversion funnels, and calendar gap-filling. These are
  * the serving-side analytics a feed system (reference: main.py:136–189's
  * read path) grows into once activity is materialized — none exist in the
  * reference; they are north-star extensions over the same event model.
  *
  * Scale posture (100 TB): every helper is one-or-two shuffles on keys the
  * activity table is already bucketed by (`user_id`), with map-side partial
  * aggregation; calendar/dimension spines are tiny by construction and
  * broadcast. No collect, no per-row UDFs.
  */
object Behavior {

  /** Weekly retention cohorts: users grouped by first-activity week, then
    * counted at each week offset they remain active.
    *
    * Plan: one shuffle on user_id for the cohort anchor; one shuffle on
    * (user_id, week) for the distinct-activity set; the join back is on
    * user_id so the anchor exchange is reused. The final (cohort, offset)
    * rollup is tiny (weeks², not rows).
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val first = events
      .groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cohort_week"))
    val active = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    active
      .join(first, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(to_date(col("week")), to_date(col("cohort_week"))) / 7)
          .cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Ordered conversion funnel: stage i counts users whose earliest
    * stage-i event falls strictly after their stage-(i-1) time and within
    * `maxStep` of it. Returns a single row `n_<stage1>, n_<stage2>, …`.
    *
    * Plan: one shuffle on user_id per stage (each stage's candidate set
    * only shrinks); the per-stage anchor frame is one row per surviving
    * user, so the joins are skew-free. Counts are assembled by
    * cross-joining single-row aggregates — no driver-side actions.
    */
  def funnel(events: DataFrame, stages: Seq[String],
             maxStep: String = "INTERVAL 24 HOURS"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select("user_id", "ts", "event_type")
    val step = expr(maxStep)

    val head = ev.where(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    val stageTimes = stages.tail.scanLeft(head) { (prev, stage) =>
      val anchor = prev.select(col("user_id").as("a_user"), col("t").as("a_t"))
      ev.where(col("event_type") === stage)
        .join(anchor,
          col("user_id") === col("a_user") &&
            col("ts") > col("a_t") && col("ts") <= col("a_t") + step)
        .groupBy("user_id").agg(min("ts").as("t"))
    }

    stageTimes.zip(stages)
      .map { case (df, s) => df.agg(count(lit(1)).as(s"n_$s")) }
      .reduce(_.crossJoin(_))
  }

  /** Daily event counts per type over a dense calendar spine: days with no
    * qualifying events appear with n = 0 (resample/gap-fill). `src` may be
    * pre-filtered; the spine always spans the full `events` time range.
    *
    * Plan: counts aggregate first (shuffle on (type, day) — low
    * cardinality), then join onto the spine. The spine is
    * days × event-types — tiny at any data scale — so it cross-joins and
    * broadcast-joins for free; the 100 TB cost stays in the one count
    * aggregation.
    */
  def gapFillDaily(events: DataFrame, src: DataFrame): DataFrame = {
    val counts = src
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val cal = events
      .agg(date_trunc("day", min("ts")).as("d0"),
        date_trunc("day", max("ts")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY")))
        .as("day"))
    events.select("event_type").distinct()
      .crossJoin(cal)
      .join(broadcast(counts), Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("event_type", "day")
  }

  /** Day-of-week × hour activity profile (dow 1=Monday … 7=Sunday, matching
    * DuckDB's isodow so the oracle compares directly). One map-side-combined
    * shuffle on a 168-key space; the DECIMAL sum keeps the aggregate exact
    * across partition merge orders. */
  def dowHourProfile(events: DataFrame): DataFrame =
    events
      .groupBy(
        (expr("weekday(ts)") + 1).cast("int").as("dow"),
        hour(col("ts")).cast("int").as("hr"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 4)
          .as("sum_value"))
      .orderBy("dow", "hr")
}
