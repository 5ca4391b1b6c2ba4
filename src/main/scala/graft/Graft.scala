package graft

import graft.sinks.ActivitySink
import graft.sources.{CdcSource, Tables}
import org.apache.spark.sql.SparkSession

/** Library facade: one call exposes every engine table as a temp view so
  * users can work in pure SQL (optionally with [[GraftExtensions]]
  * installed for the native functions):
  *
  * {{{
  *   Graft.registerViews(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT * FROM user_activity WHERE user_id = '1' ORDER BY event_timestamp DESC LIMIT 50")
  * }}}
  */
object Graft {

  /** Register the fixture tables, the four CDC branches, and the derived
    * `user_activity` table (materialized K1 layout) as temp views. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Tables.all.foreach { name =>
      Tables(spark, dir, name).createOrReplaceTempView(name)
    }
    val ev = CdcSource.events(spark, dir)
    CdcSource.likes(ev).createOrReplaceTempView("likes_cdc")
    CdcSource.comments(ev).createOrReplaceTempView("comments_cdc")
    CdcSource.shards(ev).createOrReplaceTempView("shards_cdc")
    CdcSource.followers(ev).createOrReplaceTempView("followers_cdc")
    ActivitySink.materialized(spark, dir).createOrReplaceTempView("user_activity")
  }
}
