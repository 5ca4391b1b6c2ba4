package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling — the data-quality census (null rates, exact
  * cardinalities, ranges) a pipeline runs before trusting a new drop of
  * source data. The naive profiler scans once PER COLUMN (how ad-hoc
  * profiling scripts die at 100 TB); this plan computes every column's
  * statistics in ONE aggregate over ONE scan, then unpivots the single
  * result row into the per-column report with an in-plan explode —
  * no second pass, no driver loop over columns.
  *
  * The exact distinct counts expand the aggregate one grouping per column
  * (Spark rewrites multi-distinct aggregates through Expand — input rows
  * × (columns+1) flow into the partial aggregate, still one scan). That
  * is the deliberate exact-census trade; the sketch-based scale twin for
  * cardinality-only profiling is `text_distinct_approx`'s HLL pattern.
  *
  * Typed ranges: numerics profile as doubles, timestamps as epoch millis
  * (exact integers in a double — never a formatted string, so no
  * engine-specific rendering rides the compare), strings by min/max
  * binary collation. Each type's range lands in its own column pair;
  * the other pair is typed NULL.
  */
object Profile {

  /** Per-column profile of `df`: (column_name, n_rows, n_nulls,
    * n_distinct, min_num, max_num, min_str, max_str), one row per column,
    * ordered by column name. */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val nullNum = lit(null).cast(DoubleType)
    val nullStr = lit(null).cast(StringType)

    def ranges(f: StructField): (Column, Column, Column, Column) = {
      val c = col(f.name)
      f.dataType match {
        case _: NumericType =>
          (min(c).cast(DoubleType), max(c).cast(DoubleType),
            min(nullStr), max(nullStr))
        // parquet TIMESTAMP loads as NTZ or TZ depending on the writer's
        // isAdjustedToUTC flag — profile both through UTC epoch millis
        // (session timeZone is UTC everywhere in this repo, so the NTZ →
        // instant reading matches DuckDB's epoch_ms of the naive value)
        case TimestampType | TimestampNTZType =>
          (min(unix_millis(c.cast(TimestampType))).cast(DoubleType),
            max(unix_millis(c.cast(TimestampType))).cast(DoubleType),
            min(nullStr), max(nullStr))
        case DateType =>
          (min(datediff(c, lit("1970-01-01"))).cast(DoubleType),
            max(datediff(c, lit("1970-01-01"))).cast(DoubleType),
            min(nullStr), max(nullStr))
        case StringType =>
          (min(nullNum), max(nullNum), min(c), max(c))
        case _ =>
          (min(nullNum), max(nullNum), min(nullStr), max(nullStr))
      }
    }

    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: fields.flatMap { f =>
      val c = col(f.name)
      val (mn, mx, mns, mxs) = ranges(f)
      Seq(
        count(c).as(s"${f.name}__nn"),
        countDistinct(c).as(s"${f.name}__nd"),
        mn.as(s"${f.name}__min"), mx.as(s"${f.name}__max"),
        mns.as(s"${f.name}__mins"), mxs.as(s"${f.name}__maxs"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    val perCol = array(fields.map { f =>
      struct(
        lit(f.name).as("column_name"),
        (col("n_rows") - col(s"${f.name}__nn")).as("n_nulls"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__min").as("min_num"),
        col(s"${f.name}__max").as("max_num"),
        col(s"${f.name}__mins").as("min_str"),
        col(s"${f.name}__maxs").as("max_str"))
    }: _*)

    one.select(col("n_rows"), explode(perCol).as("p"))
      .select(col("p.column_name"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_num"), col("p.max_num"),
        col("p.min_str"), col("p.max_str"))
      .orderBy("column_name")
  }
}
