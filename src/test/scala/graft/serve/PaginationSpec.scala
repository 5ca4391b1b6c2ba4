package graft.serve

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pagination invariants (SURVEY.md §5 item 3): page disjointness,
  * concatenation-is-prefix, and keyset ≡ offset equivalence. */
class PaginationSpec extends SparkSuite {

  import spark.implicits._

  // 100 activities of 4 followees + 50 of others, deterministic times
  private lazy val activity = (1 to 150).map { i =>
    val uid = if (i <= 100) s"u${i % 4}" else s"x${i % 7}"
    (uid, "LIKE_SHARD", new java.sql.Timestamp(1700000000000L + i * 1000L),
      i.toString, "shard", i.toLong)
  }.toDF("user_id", "activity_type", "event_timestamp", "target_id",
    "target_type", "activity_pk")

  private lazy val followers = Seq(
    ("me", "u0"), ("me", "u1"), ("me", "u2"), ("me", "u3"))
    .toDF("follower_id", "following_id")

  test("pages are disjoint and concatenate to a prefix of the full order") {
    val full = FeedQueries.feedPage(activity, followers, "me", limit = 100)
      .collect().map(_.getAs[Long]("activity_pk")).toSeq
    val p1 = FeedQueries.feedPage(activity, followers, "me", limit = 30)
      .collect().map(_.getAs[Long]("activity_pk")).toSeq
    val p2 = FeedQueries.feedPage(activity, followers, "me", limit = 30, offset = 30)
      .collect().map(_.getAs[Long]("activity_pk")).toSeq
    assert(p1.toSet.intersect(p2.toSet).isEmpty)
    assert((p1 ++ p2) === full.take(60))
    assert(full === full.sortBy(-_)) // newest first == pk desc here
  }

  test("keyset page equals the offset page after the same cursor") {
    val offsetPage = FeedQueries.feedPage(activity, followers, "me",
      limit = 20, offset = 30).collect().map(_.getAs[Long]("activity_pk")).toSeq
    // cursor = last row of the first 30
    val cursorRow = FeedQueries.feedPage(activity, followers, "me", limit = 30)
      .collect().last
    val keysetPage = FeedQueries.feedPageAfter(activity, followers, "me",
      lastTsMillis = cursorRow.getAs[java.sql.Timestamp]("event_timestamp").getTime,
      lastPk = cursorRow.getAs[Long]("activity_pk"),
      limit = 20).collect().map(_.getAs[Long]("activity_pk")).toSeq
    assert(keysetPage === offsetPage)
  }

  test("only followees' activities appear") {
    val page = FeedQueries.feedPage(activity, followers, "me", limit = 200)
    assert(page.where(not(col("user_id").startsWith("u"))).count() === 0)
    assert(page.count() === 100)
  }

  test("topKPerUser returns exactly k newest per user") {
    val top = FeedQueries.topKPerUser(activity, k = 5)
    assert(top.groupBy("user_id").count().where(col("count") > 5).count() === 0)
    val u0 = top.where(col("user_id") === "u0")
      .orderBy(col("rn")).collect().map(_.getAs[Long]("activity_pk")).toSeq
    // newest 5 of u0's activities (pks ≡ 0 mod 4, up to 100)
    assert(u0 === Seq(100L, 96L, 92L, 88L, 84L))
  }
}
