package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader. All engine queries read the driver-provided
  * parquet fixtures (TESTDATA.md) — columnar scans with predicate pushdown
  * and column pruning, the Spark analog of the reference's storage layer. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
      // default. Read it as long nanos (legacy flag) and convert to a
      // microsecond TimestampType via integer division — `div` truncates
      // exactly like DuckDB's ns->us narrowing, so oracle SQL on the same
      // file sees identical instants.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
