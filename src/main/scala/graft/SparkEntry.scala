package graft

import graft.queries.{AnalyticsQueries, BehaviorQueries, ExtQueries, ParityQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (the reference's feed page, SURVEY.md §3.3) on the
    * sf0.001 fixtures; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.queries("feed_page")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ LLM tier). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ExtQueries.queries ++ AnalyticsQueries.queries ++
      BehaviorQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ ExtQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      BehaviorQueries.oracleSql
}
