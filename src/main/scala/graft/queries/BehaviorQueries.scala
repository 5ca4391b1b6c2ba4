package graft.queries

import graft.ext.Behavior
import graft.sources.CdcSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered queries for the user-behavior analytics tier
  * ([[graft.ext.Behavior]]): retention cohorts, conversion funnels,
  * calendar gap-fill, and day-of-week/hour profiles over the `events`
  * table. These extend the reference's activity model (main.py:136–189
  * reads a per-user activity stream; these are the aggregate views a
  * production feed grows on top of it).
  *
  * Cross-engine conventions (established rounds 1–2):
  *  - DuckDB `date_trunc` returns DATE → cast `::TIMESTAMP` to match
  *    Spark's `date_trunc` output type;
  *  - double sums go through DECIMAL(18,6) before the final DOUBLE cast;
  *  - every computed column is aliased identically in both engines.
  */
object BehaviorQueries {

  type Q = (SparkSession, String) => DataFrame

  private def events(s: SparkSession, d: String) = CdcSource.events(s, d)

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Weekly retention cohorts (cohort = first-activity week).
    ("events_retention_cohort",
      (s: SparkSession, d: String) => Behavior.cohortRetention(events(s, d)),
      Some("""WITH first AS (
  SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort_week
  FROM events GROUP BY user_id),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS week
  FROM events)
SELECT cohort_week,
       (date_diff('day', cohort_week::DATE, week::DATE) // 7)::INT AS week_offset,
       count(DISTINCT active.user_id) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Ordered 4-stage conversion funnel with a 24h step window.
    ("events_funnel",
      (s: SparkSession, d: String) =>
        Behavior.funnel(events(s, d), Seq("signup", "view", "click", "purchase")),
      Some("""WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 a ON e.user_id = a.user_id
    AND e.ts > a.t AND e.ts <= a.t + INTERVAL 24 HOURS
  WHERE e.event_type = 'view' GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 a ON e.user_id = a.user_id
    AND e.ts > a.t AND e.ts <= a.t + INTERVAL 24 HOURS
  WHERE e.event_type = 'click' GROUP BY 1),
s4 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s3 a ON e.user_id = a.user_id
    AND e.ts > a.t AND e.ts <= a.t + INTERVAL 24 HOURS
  WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT (SELECT count(*) FROM s1) AS n_signup,
       (SELECT count(*) FROM s2) AS n_view,
       (SELECT count(*) FROM s3) AS n_click,
       (SELECT count(*) FROM s4) AS n_purchase""")),

    // Dense daily calendar of high-value events (value > 200): days with
    // no qualifying event appear with n = 0 (resample/gap-fill).
    ("events_gapfill_daily",
      (s: SparkSession, d: String) => {
        val ev = events(s, d)
        Behavior.gapFillDaily(ev, ev.where(col("value") > 200))
      },
      Some("""WITH counts AS (
  SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day, count(*) AS n
  FROM events WHERE value > 200 GROUP BY 1, 2),
cal AS (
  SELECT unnest(generate_series(date_trunc('day', min(ts))::TIMESTAMP,
                                date_trunc('day', max(ts))::TIMESTAMP,
                                INTERVAL 1 DAY)) AS day
  FROM events),
types AS (SELECT DISTINCT event_type FROM events)
SELECT t.event_type, c.day, coalesce(n, 0) AS n
FROM types t CROSS JOIN cal c
LEFT JOIN counts USING (event_type, day)
ORDER BY event_type, day""")),

    // Daily per-type volume anomalies at |z| >= 2 sample stddevs. The
    // filter compares the ROUNDED z so last-ulp stddev differences
    // between engines cannot flip membership at the threshold.
    ("events_daily_anomaly",
      (s: SparkSession, d: String) => Behavior.dailyAnomalies(events(s, d)),
      Some("""WITH d AS (
  SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type, avg(n) AS mean_n, stddev_samp(n) AS sd_n
  FROM d GROUP BY 1)
SELECT d.event_type, d.day, d.n,
       round((d.n - s.mean_n) / s.sd_n, 4) AS z_r
FROM d JOIN s USING (event_type)
WHERE s.sd_n > 0 AND abs(round((d.n - s.mean_n) / s.sd_n, 4)) >= 2.0
ORDER BY event_type, day""")),

    // Day-of-week × hour activity profile (dow 1=Monday … 7=Sunday).
    ("events_dow_profile",
      (s: SparkSession, d: String) => Behavior.dowHourProfile(events(s, d)),
      Some("""SELECT isodow(ts)::INT AS dow, hour(ts)::INT AS hr,
       count(*) AS n,
       round((sum(value::DECIMAL(18,6)))::DOUBLE, 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Behavioral similarity search: top-5 users by cosine over the 7-dim
    // ISO-dow activity profile — time-pattern user matching.
    ("events_similar_users",
      (s: SparkSession, d: String) => Behavior.similarUsers(events(s, d)),
      Some {
        def dot(a: String, b: String) =
          (1 to 7).map(i => s"$a[$i]*$b[$i]").mkString(" + ")
        s"""WITH v AS (SELECT user_id,
         [${(1 to 7).map(dw =>
           s"sum(CASE WHEN isodow(ts) = $dw THEN 1 ELSE 0 END)::DOUBLE")
           .mkString(", ")}] AS v
       FROM events GROUP BY user_id),
n AS (SELECT user_id, v, sqrt(${dot("v", "v")}) AS nrm FROM v),
q AS (SELECT user_id AS q_id, v AS qv, nrm AS qn FROM n WHERE user_id < 10),
sc AS (SELECT q.q_id, n.user_id, (${dot("qv", "v")}) / (q.qn * n.nrm) AS sim
       FROM q JOIN n ON n.user_id <> q.q_id),
r AS (SELECT q_id, user_id AS neighbor_id, round(sim, 6) AS sim_r,
             row_number() OVER (PARTITION BY q_id
               ORDER BY sim DESC, user_id) AS rnk
      FROM sc)
SELECT q_id, rnk::INT AS rnk, neighbor_id, sim_r FROM r WHERE rnk <= 5
ORDER BY q_id, rnk"""
      }),

    // First-order Markov transitions over per-user event sequences:
    // P(next event type | current), (ts, event_id)-ordered.
    ("events_markov",
      (s: SparkSession, d: String) => Behavior.eventTransitions(events(s, d)),
      Some("""WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS prev_type
  FROM events),
c AS (SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
      FROM s WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type),
t AS (SELECT prev_type, sum(n)::BIGINT AS total FROM c GROUP BY prev_type)
SELECT c.prev_type, c.next_type, c.n,
       round(c.n::DOUBLE / t.total, 6) AS p_r
FROM c JOIN t ON c.prev_type = t.prev_type
ORDER BY c.prev_type, c.next_type"""))
  )

  val queries: Map[String, Q] =
    defs.map { case (n, q, _) => n -> q }.toMap

  val oracleSql: Map[String, String] =
    defs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
