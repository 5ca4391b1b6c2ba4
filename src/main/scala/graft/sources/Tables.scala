package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table loader. All engine queries read the driver-provided
  * parquet fixtures (TESTDATA.md) — columnar scans with predicate pushdown
  * and column pruning, the Spark analog of the reference's storage layer. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two physical generations: parquet
      // TIMESTAMP(NANOS) (which Spark 4 rejects at schema-read time unless
      // the legacy nanosAsLong flag is set — so set it BEFORE inference)
      // and plain timestamp[us]. Branch on the loaded dataType so both
      // generations resolve to identical TimestampType instants under the
      // UTC session, and a future fixture regeneration can't break the
      // read path again.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          // nanos-as-long generation: integer `div` truncates exactly like
          // DuckDB's ns->us narrowing, so oracle SQL on the same file sees
          // identical instants.
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // timestamp[us] generation loads as TIMESTAMP_NTZ; the UTC
          // session makes the cast to TimestampType instant-preserving.
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ =>
          raw // already TimestampType — use as-is
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
