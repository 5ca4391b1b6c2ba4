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
    * Plan — ONE wide shuffle total (VERDICT r3 item 4; the previous form
    * paid two shuffle-joins per stage): all events of funnel types are
    * partitioned by `user_id` once, then the per-stage earliest-qualifying
    * times are a cascade of conditional window-minima over that same
    * partitioning (`min(when(type = sᵢ AND ts ∈ (tᵢ₋₁, tᵢ₋₁+step]))`) —
    * k Window operators, zero extra exchanges. The per-user reduction
    * reuses the window partitioning (no exchange), and the final rollup is
    * a single-row aggregate. k-stage funnel cost ≈ one repartition of the
    * stage-typed events, independent of k.
    */
  def funnel(events: DataFrame, stages: Seq[String],
             maxStep: String = "INTERVAL 24 HOURS"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val step = expr(maxStep)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val ev = events
      .select("user_id", "ts", "event_type")
      .where(col("event_type").isin(stages: _*))

    val withTimes = stages.zipWithIndex.foldLeft(ev) { case (df, (stage, i)) =>
      val qualifies =
        if (i == 0) col("event_type") === stage
        else col("event_type") === stage &&
          col("ts") > col(s"t_${i - 1}") &&
          col("ts") <= col(s"t_${i - 1}") + step
      df.withColumn(s"t_$i", min(when(qualifies, col("ts"))).over(w))
    }

    val perUser = withTimes.groupBy("user_id").agg(
      first(col("t_0")).as("t_0"),
      stages.indices.tail.map(i => first(col(s"t_$i")).as(s"t_$i")): _*)
    perUser.agg(
      count(col("t_0")).as(s"n_${stages.head}"),
      stages.indices.tail.map(i => count(col(s"t_$i")).as(s"n_${stages(i)}")): _*)
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

  /** Daily volume anomalies per event type: days whose count deviates
    * from the type's mean by ≥ `z` sample standard deviations — the
    * standard pipeline-health monitor over an activity stream (drops =
    * ingest breakage, spikes = abuse/backfill).
    *
    * Plan: one map-side-combined shuffle to (type, day) counts; the
    * per-type moments frame is |types| rows and broadcasts back. The
    * filter compares the ROUNDED z-score so the two engines' last-ulp
    * `stddev_samp` differences cannot flip membership at the threshold.
    * Constant series (sd = 0) produce no anomalies by definition. */
  def dailyAnomalies(events: DataFrame, z: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(avg("n").as("mean_n"), stddev_samp("n").as("sd_n"))
    daily.join(broadcast(stats), "event_type")
      .withColumn("z_r",
        when(col("sd_n") > 0,
          round((col("n") - col("mean_n")) / col("sd_n"), 4)))
      .where(abs(col("z_r")) >= z)
      .select(col("event_type"), col("day"), col("n"), col("z_r"))
      .orderBy("event_type", "day")
  }

  /** Weekly event-type distribution DRIFT: add-half-smoothed
    * KL(week's distribution ‖ the overall distribution) per ISO week —
    * the drift monitor a data pipeline runs per ingest window to catch
    * a source whose mix shifted (an instrumentation change, a bot wave)
    * before it poisons downstream training mixes. Same portability
    * discipline as [[Lm.sourceLmDivergence]]: per-term doubles cast to
    * DECIMAL(28,18) so the sum is order-free, result rounded to 6 dp.
    * Scale: one map-side-combined count on (week, type) — the shuffle
    * never exceeds weeks × types keys — then broadcast folds of the
    * type marginals (types-sized) and the single-row total. */
  def driftWeekly(events: DataFrame): DataFrame = {
    val wt = events
      .groupBy(date_trunc("week", col("ts")).as("week"), col("event_type"))
      .agg(count(lit(1)).as("nwt"))
    val wk = wt.groupBy("week").agg(sum("nwt").as("nw"))
    val ty = wt.groupBy("event_type").agg(sum("nwt").as("nt"))
    val tot = ty.agg(sum("nt").as("n_total"), count(lit(1)).as("n_types"))
    val p = (col("nwt") + lit(0.5)) /
      (col("nw") + (col("n_types") + lit(1)) * lit(0.5))
    val q = (col("nt") + lit(0.5)) /
      (col("n_total") + (col("n_types") + lit(1)) * lit(0.5))
    // the FULL week × type grid, not just observed pairs: a type with
    // ZERO events in a week — a vanished source, exactly the drift this
    // monitor exists to catch — must still contribute its smoothed term
    // 0.5/(nw + …)·ln(p/q), which an observed-pairs join would drop.
    // The grid is weeks × types rows (both marginals bounded); the type
    // side broadcasts.
    wk.crossJoin(broadcast(ty))
      .join(wt, Seq("week", "event_type"), "left")
      .withColumn("nwt", coalesce(col("nwt"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("week"), col("nw"),
        (p * (log(p) - log(q))).cast("decimal(28,18)").as("term"))
      .groupBy("week")
      .agg(max("nw").as("n_events"),
        round(sum("term").cast("double"), 6).as("kl_r"))
      .orderBy("week")
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

  /** Behavioral similarity search: top-k most similar users by cosine
    * over the 7-dim ISO-day-of-week activity-count profile — the
    * similarity tier applied to BEHAVIOR instead of embeddings
    * (time-pattern user matching: same weekday rhythm ⇒ high cosine
    * regardless of total volume). Integer counts make the vectors exact
    * doubles, so the codegen [[Similarity.cosine]] matches the DuckDB
    * 7-term dot product bit-for-bit.
    *
    * Scale: one map-side-combined groupBy builds the profile (7 longs per
    * user); queries broadcast against it exactly as [[Similarity
    * .cosineTopK]] broadcasts its query vectors — corpus scanned once,
    * ranked per query with a WindowGroupLimit-able top-k. */
  def similarUsers(events: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val vecs = events
      .groupBy("user_id")
      .agg(array((1 to 7).map(d =>
        sum(when((expr("weekday(ts)") + 1) === d, 1L).otherwise(0L))
          .cast("double")): _*).as("v"))
    val queries = vecs.where(col("user_id") < numQueries)
      .select(col("user_id").as("q_id"), col("v").as("q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("user_id"))
    vecs
      .join(broadcast(queries), col("user_id") =!= col("q_id"))
      .withColumn("sim", Similarity.cosine(col("q"), col("v")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("int").as("rnk"),
        col("user_id").as("neighbor_id"), round(col("sim"), 6).as("sim_r"))
      .orderBy("q_id", "rnk")
  }

  /** First-order Markov transition matrix over per-user event-type
    * sequences: for each observed (prev → next) step, the count and the
    * conditional probability P(next | prev) — the behavioral-model view
    * (next-event prediction, anomaly scoring) of the same sequences
    * [[EventWindows]] sessionizes. Ordering inside a user is (ts,
    * event_id) — event_id breaks timestamp ties deterministically.
    *
    * Scale: one user-keyed window pass (the activity table's own
    * bucketing key) + two tiny aggregates over the |event-types|²
    * matrix. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("prev_type").agg(sum("n").as("total"))
    counts.join(totals, "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("p_r"))
      .orderBy("prev_type", "next_type")
  }
}
