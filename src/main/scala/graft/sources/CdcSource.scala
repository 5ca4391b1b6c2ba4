package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CDC-event derivation from the `events` fixture.
  *
  * The environment has no Kafka/Debezium (SURVEY.md §7), so for oracle-checked
  * batch parity we derive the four flattened CDC branches (likes, comments,
  * shards, followers — reference debezium-postgres-connector.config.json:12)
  * from `events.parquet` with pure arithmetic: every derivation here has an
  * exact ANSI-SQL twin in [[graft.queries.OracleCte]] so DuckDB computes the
  * identical input. Streaming ingest uses the same envelope via
  * MemoryStream JSON (graft.streaming).
  *
  * Mapping: each `event_type` feeds one source table; `__op` cycles c/c/…/u/d
  * on `event_id % 10` (8:1:1) so the F3 creates-only gate is actually
  * exercised; `__source_ts_ms` is the event's epoch-millis.
  */
object CdcSource {

  /** `__op` derivation: 80% creates, 10% updates, 10% deletes. */
  private val op =
    when(col("event_id") % 10 < 8, "c")
      .when(col("event_id") % 10 === 8, "u")
      .otherwise("d")

  private def base(events: DataFrame, eventType: String, table: String) =
    events
      .where(col("event_type") === eventType)
      .withColumn("__op", op)
      .withColumn("__table", lit(table))
      .withColumn("__source_ts_ms", unix_millis(col("ts")))
      .withColumn("__source_table", lit(table))
      .withColumn("__deleted",
        when(col("__op") === "d", "true").otherwise("false"))

  /** likes <- 'click' events. */
  def likes(events: DataFrame): DataFrame =
    base(events, "click", "likes").select(
      col("event_id").as("id"),
      (col("event_id") % 997).as("shard_id"),
      col("user_id").cast("string").as("liked_by"),
      col("__op"), col("__table"), col("__source_ts_ms"),
      col("__source_table"), col("__deleted"))

  /** comments <- 'view' events. */
  def comments(events: DataFrame): DataFrame =
    base(events, "view", "comments").select(
      col("event_id").as("id"),
      concat(lit("msg "), col("event_id")).as("message"),
      col("user_id").cast("string").as("user_id"),
      (col("event_id") % 997).as("shard_id"),
      col("__op"), col("__table"), col("__source_ts_ms"),
      col("__source_table"), col("__deleted"))

  /** shards <- 'signup' events. Enum columns cycle deterministically over
    * the reference's enum domains (postgres-init.sql:1-3). */
  def shards(events: DataFrame): DataFrame =
    base(events, "signup", "shards").select(
      col("event_id").as("id"),
      concat(lit("Shard #"), col("event_id")).as("title"),
      col("user_id").cast("string").as("user_id"),
      when(col("event_id") % 3 === 0, "react")
        .when(col("event_id") % 3 === 1, "node")
        .otherwise("static").as("templateType"),
      when(col("event_id") % 2 === 0, "normal")
        .otherwise("collaboration").as("mode"),
      when(col("event_id") % 3 === 0, "public")
        .when(col("event_id") % 3 === 1, "private")
        .otherwise("forked").as("type"),
      col("__op"), col("__table"), col("__source_ts_ms"),
      col("__source_table"), col("__deleted"))

  /** followers <- 'purchase' events. `following_id` lands inside the live
    * user-id ring `[0, max(user_id)]` at every scale factor via a scalar
    * max — broadcast, never a shuffle. */
  def followers(events: DataFrame): DataFrame = {
    val ring = events.agg((max(col("user_id")) + 1).as("n_users"))
    base(events, "purchase", "followers")
      .crossJoin(broadcast(ring))
      .select(
        col("event_id").as("id"),
        col("user_id").cast("string").as("follower_id"),
        ((col("user_id") + 1 + col("event_id") % 7) % col("n_users"))
          .cast("string").as("following_id"),
        col("__op"), col("__table"), col("__source_ts_ms"),
        col("__source_table"), col("__deleted"))
  }

  /** Deterministic `users` dimension (reference postgres-init.sql:69–73:
    * id text PK, created_at, updated_at — an FK target the reference never
    * joins). Derived per user from their event span; user_ids divisible by
    * 20 are withheld to model dim rows missing at enrichment time (the FK
    * is in the OLTP store, but a dim extract can lag the activity stream),
    * so downstream joins must render null-safe. */
  def users(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("created_at"), max(col("ts")).as("updated_at"))
      .where(col("user_id") % 20 =!= 0)
      .select(col("user_id").cast("string").as("id"),
        col("created_at"), col("updated_at"))

  def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  def all(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ev = events(spark, dir)
    (likes(ev), comments(ev), shards(ev), followers(ev))
  }
}
