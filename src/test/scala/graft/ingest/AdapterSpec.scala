package graft.ingest

import graft.SparkSuite
import graft.model.Schemas
import org.apache.spark.sql.functions._

/** Column-level adapter expectations on the FIXTURES.md §2 representative
  * envelope rows (≙ reference strategy.py:21-135). */
class AdapterSpec extends SparkSuite {

  import spark.implicits._

  private def parsed(json: String, table: String) =
    CdcEnvelope.parseTable(Seq(json).toDF("value"), table)

  test("P1 likes → LIKE_SHARD activity") {
    val json =
      """{"id":7,"shard_id":3,"liked_by":"2","updated_at":null,
         |"created_at":"2025-07-11T10:00:00Z","__op":"c","__table":"likes",
         |"__source_ts_ms":1752228000000,"__source_table":"likes"}""".stripMargin.replace("\n", "")
    val out = Adapters.likes(CdcEnvelope.admitted(parsed(json, "likes"))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("user_id") === "2")
    assert(r.getAs[String]("activity_type") === "LIKE_SHARD")
    assert(r.getAs[String]("target_id") === "3")
    assert(r.getAs[String]("target_type") === "shard")
    assert(r.getAs[java.sql.Timestamp]("event_timestamp").getTime === 1752228000000L)
    val md = r.getAs[Map[String, String]]("metadata")
    assert(md("source_table") === "likes")
    assert(md("primary_key_value") === "7")
    assert(md("primary_key_field") === "id")
    assert(md("primary_key_type") === "integer")
  }

  test("P2 comments carries message in metadata") {
    val json =
      """{"id":4,"message":"nice shard!","user_id":"2","shard_id":3,
         |"updated_at":null,"created_at":"2025-07-11T10:01:00Z","__op":"c",
         |"__table":"comments","__source_ts_ms":1752228060000,
         |"__source_table":"comments"}""".stripMargin.replace("\n", "")
    val r = Adapters.comments(CdcEnvelope.admitted(parsed(json, "comments"))).collect().head
    assert(r.getAs[String]("activity_type") === "COMMENT_SHARD")
    assert(r.getAs[String]("target_id") === "3")
    assert(r.getAs[Map[String, String]]("metadata")("message") === "nice shard!")
  }

  test("P3 shards: target is the new shard itself; enum metadata kept") {
    val json =
      """{"id":6,"title":"My Sixth Shard","user_id":"2","templateType":"react",
         |"mode":"normal","type":"public","last_sync_timestamp":"2025-07-11T10:02:00Z",
         |"updated_at":null,"created_at":"2025-07-11T10:02:00Z","__op":"c",
         |"__table":"shards","__source_ts_ms":1752228120000,
         |"__source_table":"shards"}""".stripMargin.replace("\n", "")
    val r = Adapters.shards(CdcEnvelope.admitted(parsed(json, "shards"))).collect().head
    assert(r.getAs[String]("activity_type") === "CREATE_SHARD")
    assert(r.getAs[String]("target_id") === "6")
    val md = r.getAs[Map[String, String]]("metadata")
    assert(md("template_type") === "react")
    assert(md("mode") === "normal")
    assert(md("type") === "public")
    assert(md("title") === "My Sixth Shard")
  }

  test("P4 followers: activity attributed to the follower (asymmetry kept)") {
    val json =
      """{"id":2,"follower_id":"2","following_id":"1","updated_at":null,
         |"created_at":"2025-07-11T10:03:00Z","__op":"c","__table":"followers",
         |"__source_ts_ms":1752228180000,"__source_table":"followers"}""".stripMargin.replace("\n", "")
    val r = Adapters.followers(CdcEnvelope.admitted(parsed(json, "followers"))).collect().head
    assert(r.getAs[String]("user_id") === "2")       // the follower acts
    assert(r.getAs[String]("target_id") === "1")     // the followed is the target
    assert(r.getAs[String]("target_type") === "user")
    assert(r.getAs[String]("activity_type") === "FOLLOW_USER")
  }
}
