package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass-per-column table profiling — the data-quality census (null
  * rates, exact cardinalities, ranges) a pipeline runs before trusting a
  * new drop of source data.
  *
  * Plan shape (deliberate, measured): each column profiles through its
  * OWN two-phase hash aggregation — `groupBy(value).count` (map-side
  * combined, so the exchange carries the column's distinct values, not
  * its rows) folded by a single vocab-sized final aggregate — and the
  * per-column single-row results union. Three properties make this the
  * 100 TB shape rather than the tempting single `agg(countDistinct×N)`
  * pass:
  *
  *  - no row expansion: the multi-distinct rewrite runs every input row
  *    through an Expand × (columns+1) — a 7× row multiplier through the
  *    exchange on a 6-column table;
  *  - no corpus-sized SortAggregate: string min/max buffers are not
  *    hash-aggregable, so the single-pass plan degrades the WHOLE
  *    aggregate to SortAggregate over the expanded rows (measured 3.8 s
  *    vs 1.1 s at sf0.1 on `orders`); here strings fold over the
  *    already-distinct value frame;
  *  - columnar scans make the "extra" passes free in bytes: each
  *    per-column scan prunes to exactly one parquet column
  *    (ProfileSpec pins ReadSchema), so total bytes read equal the
  *    one-scan plan, and the independent stages schedule in parallel.
  *
  * Typed ranges: numerics profile as doubles, timestamps as UTC epoch
  * millis (exact integers in a double — never a formatted string, so no
  * engine-specific rendering rides the compare), strings by min/max
  * binary collation. Each type's range lands in its own column pair; the
  * other pair is typed NULL.
  */
object Profile {

  /** Per-column profile of `df`: (column_name, n_rows, n_nulls,
    * n_distinct, min_num, max_num, min_str, max_str), one row per column,
    * ordered by column name. */
  def profile(df: DataFrame): DataFrame = {
    val nullNum = lit(null).cast(DoubleType)
    val nullStr = lit(null).cast(StringType)

    val perCol = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      // min/max over the DISTINCT-value frame equal min/max over rows
      val (mn, mx, mns, mxs): (Column, Column, Column, Column) =
        f.dataType match {
          case _: NumericType =>
            (min(c).cast(DoubleType), max(c).cast(DoubleType),
              min(nullStr), max(nullStr))
          // parquet TIMESTAMP loads as NTZ or TZ depending on the
          // writer's isAdjustedToUTC flag — profile both through UTC
          // epoch millis (session timeZone is UTC everywhere here, so
          // the NTZ → instant reading matches DuckDB's epoch_ms)
          case TimestampType | TimestampNTZType =>
            (min(unix_millis(c.cast(TimestampType))).cast(DoubleType),
              max(unix_millis(c.cast(TimestampType))).cast(DoubleType),
              min(nullStr), max(nullStr))
          // dates share the epoch-millis convention (days × 86,400,000)
          // so DATE and TIMESTAMP ranges stay unit-comparable in one
          // profile and match the epoch_ms oracle idiom
          case DateType =>
            (min(datediff(c, lit("1970-01-01")).cast(LongType) * 86400000L)
              .cast(DoubleType),
              max(datediff(c, lit("1970-01-01")).cast(LongType) * 86400000L)
                .cast(DoubleType),
              min(nullStr), max(nullStr))
          case StringType =>
            (min(nullNum), max(nullNum), min(c), max(c))
          case _ =>
            (min(nullNum), max(nullNum), min(nullStr), max(nullStr))
        }
      df.select(c)
        .groupBy(c).agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum("cnt"), lit(0L)).as("n_rows"),
          coalesce(sum(when(c.isNull, col("cnt"))), lit(0L)).as("n_nulls"),
          count(c).as("n_distinct"),
          mn.as("min_num"), mx.as("max_num"),
          mns.as("min_str"), mxs.as("max_str"))
        .select(lit(f.name).as("column_name"), col("n_rows"),
          col("n_nulls"), col("n_distinct"), col("min_num"),
          col("max_num"), col("min_str"), col("max_str"))
    }
    perCol.reduce(_ unionByName _).orderBy("column_name")
  }

  /** Shuffle-skew diagnostic for a prospective groupBy/join key: the
    * group-size distribution in log2 buckets plus each bucket's heaviest
    * exemplar — the report that decides between a plain hash aggregate,
    * AQE skew splitting, and explicit salting (and tells you WHICH keys
    * to salt). Cost = the very aggregation being diagnosed (one two-phase
    * count on the key) plus a ≤64-row histogram fold — the right price
    * for a skew doctor. The bucket is `length(bin(n)) − 1` = ⌊log2 n⌋ in
    * PURE INTEGER form: no float log whose boundary rounding could
    * disagree between engines (DuckDB's `bin` matches Spark's, so the
    * oracle replays bit-exactly). Output: (bucket, n_keys, n_rows,
    * max_n, top_key) per occupied bucket, where top_key is the
    * lexicographically-smallest key attaining the bucket's max — the
    * exemplar you'd go look at. */
  def skewReport(keys: DataFrame): DataFrame = {
    val counts = graft.ext.Dedup.cached(
      keys.select(col(keys.columns.head).cast("string").as("key"))
        .where(col("key").isNotNull)
        .groupBy("key").agg(count(lit(1)).as("n")))
    val bucketed = counts
      .withColumn("bucket", (length(bin(col("n"))) - 1).cast("int"))
    val hist = bucketed.groupBy("bucket").agg(
      count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("max_n"))
    // ≤64 buckets: the exemplar join broadcasts the histogram side
    val top = bucketed
      .join(broadcast(hist.select(col("bucket"), col("max_n"))),
        Seq("bucket"))
      .where(col("n") === col("max_n"))
      .groupBy("bucket").agg(min(col("key")).as("top_key"))
    hist.join(top, Seq("bucket")).orderBy("bucket")
  }
}
