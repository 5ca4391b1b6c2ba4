package graft

/** The SQL facade: registered views answer the reference's flagship query
  * in pure SQL. */
class GraftSpec extends SparkSuite {

  test("registerViews exposes fixture, CDC, and activity views for SQL") {
    Graft.registerViews(spark, "/root/testdata/sf0.001")
    val page = spark.sql(
      """SELECT user_id, activity_type, event_timestamp
        |FROM user_activity
        |WHERE user_id IN (SELECT DISTINCT following_id FROM followers_cdc
        |                  WHERE __op = 'c' AND follower_id = '1')
        |ORDER BY event_timestamp DESC, activity_pk DESC
        |LIMIT 50""".stripMargin)
    assert(page.count() === 50)
    assert(spark.sql("SELECT count(*) FROM documents").collect().head.getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM likes_cdc WHERE __op = 'c'")
      .collect().head.getLong(0) > 0)
  }
}
