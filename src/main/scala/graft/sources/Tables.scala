package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader. All engine queries read the driver-provided
  * parquet fixtures (TESTDATA.md) — columnar scans with predicate pushdown
  * and column pruning, the Spark analog of the reference's storage layer. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
