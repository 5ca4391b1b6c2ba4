package graft.queries

/** ANSI-SQL twins (DuckDB dialect) of the deterministic CDC derivation in
  * [[graft.sources.CdcSource]] and the adapter projections in
  * [[graft.ingest.Adapters]]. Every oracle-checked parity query prefixes
  * `WITH <cdc>` so DuckDB computes the identical inputs from the same
  * parquet fixtures.
  *
  * Keep this file and CdcSource/Adapters in lockstep — the driver's
  * correctness gate hash-compares their outputs.
  */
object OracleCte {

  /** All CDC + activity derivations as one CTE list (no leading WITH). */
  val cdc: String = """ev AS (
  SELECT event_id, ts, user_id, event_type, epoch_ms(ts) AS ts_ms,
         CASE WHEN event_id % 10 < 8 THEN 'c'
              WHEN event_id % 10 = 8 THEN 'u' ELSE 'd' END AS __op
  FROM events),
likes_cdc AS (
  SELECT event_id AS id, event_id % 997 AS shard_id,
         CAST(user_id AS VARCHAR) AS liked_by, ts_ms, __op
  FROM ev WHERE event_type = 'click'),
comments_cdc AS (
  SELECT event_id AS id, concat('msg ', event_id) AS message,
         CAST(user_id AS VARCHAR) AS user_id,
         event_id % 997 AS shard_id, ts_ms, __op
  FROM ev WHERE event_type = 'view'),
shards_cdc AS (
  SELECT event_id AS id, concat('Shard #', event_id) AS title,
         CAST(user_id AS VARCHAR) AS user_id,
         CASE WHEN event_id % 3 = 0 THEN 'react'
              WHEN event_id % 3 = 1 THEN 'node' ELSE 'static' END AS templateType,
         CASE WHEN event_id % 2 = 0 THEN 'normal' ELSE 'collaboration' END AS mode,
         CASE WHEN event_id % 3 = 0 THEN 'public'
              WHEN event_id % 3 = 1 THEN 'private' ELSE 'forked' END AS type,
         ts_ms, __op
  FROM ev WHERE event_type = 'signup'),
followers_cdc AS (
  SELECT event_id AS id, CAST(user_id AS VARCHAR) AS follower_id,
         CAST((user_id + 1 + event_id % 7)
              % (SELECT max(user_id) + 1 FROM events) AS VARCHAR) AS following_id,
         ts_ms, __op
  FROM ev WHERE event_type = 'purchase'),
act_likes AS (
  SELECT liked_by AS user_id, 'LIKE_SHARD' AS activity_type,
         make_timestamp(ts_ms * 1000) AS event_timestamp,
         CAST(shard_id AS VARCHAR) AS target_id, 'shard' AS target_type,
         'likes' AS md_source_table, CAST(id AS VARCHAR) AS md_primary_key_value,
         CAST(NULL AS VARCHAR) AS md_message, CAST(NULL AS VARCHAR) AS md_title,
         CAST(NULL AS VARCHAR) AS md_template_type, CAST(NULL AS VARCHAR) AS md_mode,
         CAST(NULL AS VARCHAR) AS md_type, id AS activity_pk
  FROM likes_cdc WHERE __op = 'c'),
act_comments AS (
  SELECT user_id, 'COMMENT_SHARD' AS activity_type,
         make_timestamp(ts_ms * 1000) AS event_timestamp,
         CAST(shard_id AS VARCHAR) AS target_id, 'shard' AS target_type,
         'comments' AS md_source_table, CAST(id AS VARCHAR) AS md_primary_key_value,
         message AS md_message, CAST(NULL AS VARCHAR) AS md_title,
         CAST(NULL AS VARCHAR) AS md_template_type, CAST(NULL AS VARCHAR) AS md_mode,
         CAST(NULL AS VARCHAR) AS md_type, id AS activity_pk
  FROM comments_cdc WHERE __op = 'c'),
act_shards AS (
  SELECT user_id, 'CREATE_SHARD' AS activity_type,
         make_timestamp(ts_ms * 1000) AS event_timestamp,
         CAST(id AS VARCHAR) AS target_id, 'shard' AS target_type,
         'shards' AS md_source_table, CAST(id AS VARCHAR) AS md_primary_key_value,
         CAST(NULL AS VARCHAR) AS md_message, title AS md_title,
         templateType AS md_template_type, mode AS md_mode,
         type AS md_type, id AS activity_pk
  FROM shards_cdc WHERE __op = 'c'),
act_follows AS (
  SELECT follower_id AS user_id, 'FOLLOW_USER' AS activity_type,
         make_timestamp(ts_ms * 1000) AS event_timestamp,
         following_id AS target_id, 'user' AS target_type,
         'followers' AS md_source_table, CAST(id AS VARCHAR) AS md_primary_key_value,
         CAST(NULL AS VARCHAR) AS md_message, CAST(NULL AS VARCHAR) AS md_title,
         CAST(NULL AS VARCHAR) AS md_template_type, CAST(NULL AS VARCHAR) AS md_mode,
         CAST(NULL AS VARCHAR) AS md_type, id AS activity_pk
  FROM followers_cdc WHERE __op = 'c'),
activity AS (
  SELECT * FROM act_likes UNION ALL SELECT * FROM act_comments
  UNION ALL SELECT * FROM act_shards UNION ALL SELECT * FROM act_follows)"""

  /** Wrap a SELECT with the shared CTEs. */
  def withCdc(select: String): String = s"WITH $cdc\n$select"

  /** [[withCdc]] with the chain declared RECURSIVE — DuckDB requires the
    * keyword on the WITH itself even when only a caller-appended CTE
    * recurses. A variant beats string-patching withCdc's output: a
    * `.replace("WITH ...")` at the call site silently no-ops if this
    * prefix ever changes, surfacing only as an opaque DuckDB parse error
    * at adjudication time. */
  def withCdcRecursive(select: String): String =
    s"WITH RECURSIVE $cdc\n$select"
}
