package graft.serve

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The salted two-stage top-k must be result-identical to the plain
  * window — skew mitigation is a physical rewrite, not a semantic one. */
class SaltedTopKSpec extends SparkSuite {

  import spark.implicits._

  // one pathological hot user (1000 rows) + 50 normal users
  private lazy val activity = (
    (1 to 1000).map(i => ("hot", new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong)) ++
    (1 to 500).map(i => (s"u${i % 50}", new java.sql.Timestamp(1700000000000L + i * 977L), 10000L + i))
  ).toDF("user_id", "event_timestamp", "activity_pk")

  test("salted == unsalted for every k") {
    for (k <- Seq(1, 3, 10)) {
      val plain = FeedQueries.topKPerUser(activity, k)
        .select("user_id", "activity_pk", "rn")
        .orderBy("user_id", "rn").collect().toSeq
      val salted = FeedQueries.topKPerUserSalted(activity, k)
        .select("user_id", "activity_pk", "rn")
        .orderBy("user_id", "rn").collect().toSeq
      assert(salted === plain, s"k=$k mismatch")
    }
  }

  test("hot user still yields exactly k newest") {
    val top = FeedQueries.topKPerUserSalted(activity, k = 5)
      .where(col("user_id") === "hot")
      .orderBy(col("rn")).collect().map(_.getAs[Long]("activity_pk")).toSeq
    assert(top === Seq(1000L, 999L, 998L, 997L, 996L))
  }
}
