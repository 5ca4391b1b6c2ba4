package graft.expr

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** X1: lexicographic order of generated ids == chronological order;
  * uniqueness across rows. */
class TimeUuidSpec extends SparkSuite {

  import spark.implicits._

  test("timeuuid is unique and sorts chronologically") {
    val df = (1 to 1000).map(i => 1700000000000L + i * 7919L).toDF("ts_ms")
      .withColumn("id", TimeUuid.timeuuid(col("ts_ms")))
    val rows = df.collect().map(r => (r.getAs[Long]("ts_ms"), r.getAs[String]("id")))
    assert(rows.map(_._2).distinct.length === 1000)
    val sortedById = rows.sortBy(_._2).map(_._1).toSeq
    assert(sortedById === rows.map(_._1).sorted.toSeq)
  }

  test("null timestamp yields null id") {
    val df = Seq(Some(1700000000000L), None).toDF("ts_ms")
      .withColumn("id", TimeUuid.timeuuid(col("ts_ms")))
    assert(df.where(col("id").isNull).count() === 1)
  }
}
