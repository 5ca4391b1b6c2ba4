package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General analytics queries over the relational fixtures — the join/agg/
  * window surface a user of the engine gets "for free" from Catalyst
  * (SURVEY.md §2.3: the reference's FK graph implies enrichment joins it
  * never executes; these exercise them at bench scale).
  *
  * Scale notes per query are inline; the common rules:
  *  - dimension tables are broadcast (region/nation/customer at any SF the
  *    dims stay << fact tables);
  *  - fact-fact joins shuffle on the join key once, with AQE sizing;
  *  - aggregates are map-side partial first;
  *  - double sums go through DECIMAL for cross-engine determinism.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private def dsum(c: String, alias: String) =
    sum(col(c).cast("decimal(18,6)")).cast("double").as(alias)

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Pricing summary over the largest fact table (shape of TPC-H Q1):
    // one map-side-combined shuffle on two low-cardinality keys.
    ("q1_pricing_summary",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
       (sum(l_quantity::DECIMAL(18,6)))::DOUBLE AS sum_qty,
       (sum(l_extendedprice::DECIMAL(18,6)))::DOUBLE AS sum_base_price,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""")),

    // Revenue by nation: 4-way join — two broadcast dims (nation,
    // customer region path) + one fact-fact shuffle join on orderkey.
    ("q5_nation_revenue",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val ord = t(s, d, "orders")
        val cust = t(s, d, "customer")
        val nat = t(s, d, "nation")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(dsum("l_extendedprice", "revenue"), count(lit(1)).as("n_items"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
       (sum(l_extendedprice::DECIMAL(18,6)))::DOUBLE AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name""")),

    // Top-5 orders per customer segment by value: join + ranking window
    // (one shuffle for the join, one for the window partition).
    ("q_top_orders_per_segment",
      (s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("c_mktsegment")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 5)
          .select("c_mktsegment", "rnk", "o_orderkey", "o_totalprice")
          .orderBy("c_mktsegment", "rnk")
      },
      Some("""SELECT c_mktsegment, rnk, o_orderkey, o_totalprice
FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                 ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders JOIN customer ON o_custkey = c_custkey)
WHERE rnk <= 5 ORDER BY c_mktsegment, rnk""")),

    // Supplier/part enrichment: broadcast both dims into the fact scan.
    ("q_part_supplier_stats",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .groupBy("p_brand", "s_nationkey")
          .agg(
            count(lit(1)).as("n_items"),
            dsum("l_quantity", "sum_qty"))
          .orderBy("p_brand", "s_nationkey"),
      Some("""SELECT p_brand, s_nationkey, count(*) AS n_items,
       (sum(l_quantity::DECIMAL(18,6)))::DOUBLE AS sum_qty
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand, s_nationkey ORDER BY p_brand, s_nationkey""")),

    // Anti-join: customers with no orders since mid-1997 (shuffle
    // left-anti on custkey; the date predicate pushes into the scan).
    ("q_customers_without_orders",
      (s: SparkSession, d: String) =>
        t(s, d, "customer")
          .join(
            t(s, d, "orders").where(col("o_orderdate") >= lit("1997-06-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment
FROM customer WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01')
ORDER BY c_custkey""")),

    // Hierarchical rollup: per (priority, status) + per priority + grand
    // total in one pass (Spark expands grouping sets map-side).
    ("q_orders_rollup",
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice", "sum_price"))
          .orderBy(col("o_orderpriority").asc_nulls_first,
            col("o_orderstatus").asc_nulls_first),
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       (sum(o_totalprice::DECIMAL(18,6)))::DOUBLE AS sum_price
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""")),

    // Exact quantiles per group (sort-based); rounded because Spark and
    // DuckDB use algebraically-equal but differently-rounded interpolation.
    ("q_price_quantiles",
      (s: SparkSession, d: String) =>
        // r19 note: deliberately NOT scanParallel'd - measured 2.95 -> 3.26 s
        // with a repartition: exact percentile's partial state is the full
        // value multiset, so 32 partial buffers cost more to merge than one
        // single-partition build at this SF
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Full cube over the two order dimensions (4 grouping sets in one
    // shuffle — Catalyst expands the cube map-side).
    ("q_orders_cube",
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .cube(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice", "sum_price"))
          .orderBy(col("o_orderpriority").asc_nulls_first,
            col("o_orderstatus").asc_nulls_first),
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       (sum(o_totalprice::DECIMAL(18,6)))::DOUBLE AS sum_price
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""")),

    // Cumulative/lag analytics window over the monthly rollup: running
    // revenue and month-over-month delta (ordered running fold over
    // unique month keys — deterministic in both engines).
    // The running sum and the lag delta stay in DECIMAL through the window
    // (cast to DOUBLE only on output): window-summing doubles drifts by
    // association order (DuckDB's segment tree vs Spark's running fold),
    // which breaks the exact hash compare after ~30 accumulated months.
    ("q_revenue_running",
      (s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("month")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val lagW = org.apache.spark.sql.expressions.Window.orderBy("month")
        t(s, d, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev_d"))
          .withColumn("cum_d", sum("rev_d").over(w))
          .withColumn("mom_d",
            col("rev_d") - coalesce(lag("rev_d", 1).over(lagW),
              lit(0).cast("decimal(28,6)")))
          .select(col("month"),
            col("rev_d").cast("double").as("revenue"),
            col("cum_d").cast("double").as("cum_revenue"),
            col("mom_d").cast("double").as("mom_delta"))
          .orderBy("month")
      },
      Some("""WITH m AS (
  SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
         sum(o_totalprice::DECIMAL(18,6)) AS rev_d
  FROM orders GROUP BY 1)
SELECT month, rev_d::DOUBLE AS revenue,
       (sum(rev_d) OVER (ORDER BY month
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS cum_revenue,
       (rev_d - coalesce(lag(rev_d, 1) OVER (ORDER BY month), 0))::DOUBLE AS mom_delta
FROM m ORDER BY month""")),

    // Set difference (EXCEPT): customers ordering in 1995 but not 1996.
    ("q_cust_churn_except",
      (s: SparkSession, d: String) => {
        val ord = t(s, d, "orders")
        def in(y: Int) = ord
          .where(year(col("o_orderdate")) === y)
          .select(col("o_custkey"))
        in(1995).except(in(1996)).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
ORDER BY o_custkey""")),

    // Pivot: per-user event-type counts as columns (explicit value list →
    // plan-time schema; one shuffle, conditional-count partials).
    ("q_event_type_pivot",
      (s: SparkSession, d: String) =>
        graft.sources.CdcSource.events(s, d)
          .where(col("user_id") < 50)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .count()
          .na.fill(0L)
          .orderBy("user_id"),
      Some("""SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
FROM events WHERE user_id < 50
GROUP BY user_id ORDER BY user_id""")),

    // Distributed-exact path for the same quantiles: histogram method —
    // the full-data pass is a parallel groupBy(value) count; only an
    // O(distinct) running sum is per-group serial. Same oracle as the
    // buffer-based exact query.
    ("q_price_quantiles_dist",
      (s: SparkSession, d: String) =>
        graft.operators.DistributedQuantiles
          .exactQuantiles(t(s, d, "lineitem"),
            group = "l_returnflag", value = "l_extendedprice",
            ps = Seq(0.5, 0.95))
          .select(col("l_returnflag"),
            round(col("p50"), 4).as("p50"),
            round(col("p95"), 4).as("p95"),
            col("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Scale path for the exact quantiles above: GK-sketch approx
    // percentiles are mergeable map-side partials, so parallelism is not
    // bounded by group count the way exact per-group selection is.
    // Sketch VALUES are engine-specific, but the GK guarantee is not:
    // the returned value is an actual element whose rank is within
    // ε·N = N/accuracy of the target rank. The registered form is
    // self-verifying (VERDICT r10 item 3): re-rank the sketch's answer
    // against the group (one broadcast join of the 3-row sketch output +
    // one counting pass) and pin the rank-bound and element-membership
    // booleans TRUE in the oracle (±1 row of slack absorbs floor
    // conventions). A regressed sketch — wrong merge, lost buffer,
    // interpolation bug — lands outside the band and turns the row red.
    ("q_price_quantiles_approx",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val eps = 1.0 / 10000
        val appx = li.groupBy("l_returnflag").agg(
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"),
          expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("p95"))
        def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
        def rankOk(q: Double, le: org.apache.spark.sql.Column,
            lt: org.apache.spark.sql.Column) =
          (le.cast("double") >= (lit(q) - eps) * col("n") - 1) &&
            (lt.cast("double") <= (lit(q) + eps) * col("n") + 1)
        li.join(broadcast(appx), Seq("l_returnflag"))
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            cnt(col("l_extendedprice") <= col("p50")).as("le50"),
            cnt(col("l_extendedprice") < col("p50")).as("lt50"),
            cnt(col("l_extendedprice") === col("p50")).as("eq50"),
            cnt(col("l_extendedprice") <= col("p95")).as("le95"),
            cnt(col("l_extendedprice") < col("p95")).as("lt95"),
            cnt(col("l_extendedprice") === col("p95")).as("eq95"))
          .select(col("l_returnflag"), col("n"),
            rankOk(0.5, col("le50"), col("lt50")).as("p50_rank_ok"),
            (col("eq50") >= 1).as("p50_is_member"),
            rankOk(0.95, col("le95"), col("lt95")).as("p95_rank_ok"),
            (col("eq95") >= 1).as("p95_is_member"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
       TRUE AS p50_rank_ok, TRUE AS p50_is_member,
       TRUE AS p95_rank_ok, TRUE AS p95_is_member
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Decile banding (ntile) with a deterministic total order.
    ("q_orders_ntile",
      (s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("decile", ntile(10).over(w))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_orders"),
            dsum("o_totalprice", "sum_price"))
          .orderBy("decile")
      },
      Some("""WITH r AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders)
SELECT decile, count(*) AS n_orders,
       (sum(o_totalprice::DECIMAL(18,6)))::DOUBLE AS sum_price
FROM r GROUP BY decile ORDER BY decile""")),

    // Monthly order volume: date-truncation rollup (one shuffle).
    ("q_orders_monthly",
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice", "sum_price"))
          .orderBy("month"),
      Some("""SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
       count(*) AS n_orders,
       (sum(o_totalprice::DECIMAL(18,6)))::DOUBLE AS sum_price
FROM orders GROUP BY 1 ORDER BY month""")),

    // Shipping-priority top-k (shape of TPC-H Q3): broadcast the customer
    // dim, shuffle-join the two facts on orderkey once, aggregate with
    // map-side partials, then a global top-10 (TakeOrderedAndProject — no
    // full sort at scale). Revenue goes through DECIMAL so the DESC order
    // and the LIMIT cut are bit-identical across engines.
    ("q3_shipping_priority",
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .where(col("c_mktsegment") === "BUILDING" &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"))
          .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
          .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
       (sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)))::DOUBLE AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""")),

    // Bivariate statistics per group: corr/covar/stddev are single-pass
    // co-moment aggregates (one map-side-combined shuffle on a 3-key
    // space). Both engines use numerically stable streaming merges;
    // rounding absorbs the sub-1e-9 merge-order noise.
    ("q_corr_stats",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
            round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       count(*) AS n
FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Deterministic ~20% stratified sample audit: membership is a pure
    // function of the key (first md5 hex byte < 0x33 ≈ 51/256), so the
    // sample is reproducible across engines, runs, and cluster sizes with
    // no RNG state — the same technique as train_val_split. Scan-only +
    // one tiny rollup; at 100 TB the filter runs map-side at full scan
    // throughput.
    ("q_stratified_sample",
      (s: SparkSession, d: String) =>
        t(s, d, "customer")
          .where(substring(md5(col("c_custkey").cast("string")), 1, 2) < "33")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_sample"),
            countDistinct("c_custkey").as("n_cust"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_sample,
       count(DISTINCT c_custkey) AS n_cust
FROM customer
WHERE substring(md5(c_custkey::VARCHAR), 1, 2) < '33'
GROUP BY 1 ORDER BY 1"""))
  )

  val queries: Map[String, Q] =
    defs.map { case (n, q, _) => n -> q }.toMap

  val oracleSql: Map[String, String] =
    defs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
