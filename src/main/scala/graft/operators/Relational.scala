package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

/** Relational operator inventory (SURVEY §2.B): projection/filter, joins of
  * every flavor, aggregation variants, window functions, sort/limit/top-k,
  * set ops. Each query is a declarative DataFrame plan — Catalyst handles
  * pushdown, pruning, join selection (broadcast for the constant-size dims),
  * and partial aggregation; nothing here hand-schedules execution.
  *
  * Scale notes are on each query: every plan shuffles at most on its natural
  * grouping/join keys and survives a 1000-executor, 100 TB scale-up.
  */
object Relational {

  /** Sum of a double column through an exact decimal accumulator — bit-equal
    * across engines and summation orders (see QueryDef.FloatNote). */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  /** Same for a per-row double product (4 fractional digits kept). */
  private def dsum4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")
  private def davg(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double") / count(c)

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: scan → partial agg (map-side combine)
    * → final agg on (returnflag, linestatus): 6 groups, no skew. The filter
    * is pushed to the parquet scan. */
  val q01 = QueryDef(
    "q01_pricing_summary",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  /** Predicate surface: =, <, >, IN, LIKE, IS NOT NULL, AND/OR/NOT — all
    * pushed to the scan (`PushedFilters`). */
  val q02 = QueryDef(
    "q02_filter_predicates",
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F")
        && col("o_orderpriority").like("1%")
        && col("o_totalprice") > 50000.0
        && !(col("o_custkey") === 0)
        && col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_orderstatus IN ('O','F') AND o_orderpriority LIKE '1%'
        AND o_totalprice > 50000.0 AND NOT (o_custkey = 0) AND o_orderdate IS NOT NULL
      ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q03
  /** TPC-H Q3-style: 3-way join then top-10 by revenue. customer⋈orders
    * shuffles on custkey, ⋈lineitem on orderkey; top-k is
    * TakeOrderedAndProject (no global sort materialization). */
  val q03 = QueryDef(
    "q03_top_revenue_orders",
    (s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(o("o_orderkey").as("o_orderkey"), o("o_orderdate").as("o_orderdate"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_orderdate,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey LIMIT 10"""))

  // ---------------------------------------------------------------- q04
  /** EXISTS → left-semi join (J1's dual): orders having a lineitem shipped
    * after the order date; count per priority. Semi join shuffles once on
    * orderkey and never duplicates left rows. */
  val q04 = QueryDef(
    "q04_priority_exists",
    (s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q05
  /** TPC-H Q5-style local-supplier revenue: 6-way join. region and nation
    * are O(1)-size dims → explicit broadcast (no shuffle for those joins);
    * the fact-side joins shuffle on their keys once each. */
  val q05 = QueryDef(
    "q05_revenue_by_nation",
    (s, d) => {
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  // ---------------------------------------------------------------- q06
  /** TPC-H Q6-style: tight scan-filter-agg; every predicate reaches the
    * parquet reader, result is a single row (no shuffle beyond 1-group agg). */
  val q06 = QueryDef(
    "q06_revenue_delta",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount") >= 0.02 && col("l_discount") <= 0.06
        && col("l_quantity") < 24.0)
      .agg(dsum4(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows")),
    Some("""SELECT
        CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24.0"""))

  // ---------------------------------------------------------------- q07
  /** Cross join (constant-size inputs only — 5×5; anything larger must go
    * through an equi/theta condition instead). */
  val q07 = QueryDef(
    "q07_cross_join_regions",
    (s, d) => {
      val r1 = Tables.region(s, d).select(col("r_name").as("a_name"))
      val r2 = Tables.region(s, d).select(col("r_name").as("b_name"))
      r1.crossJoin(r2).orderBy(col("a_name"), col("b_name"))
    },
    Some("""SELECT r1.r_name AS a_name, r2.r_name AS b_name
      FROM region r1 CROSS JOIN region r2 ORDER BY a_name, b_name"""))

  // ---------------------------------------------------------------- q08
  /** Left outer join preserving customers with no orders; COUNT(col) vs
    * COUNT(*) null semantics exercised. */
  val q08 = QueryDef(
    "q08_left_join_order_counts",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q09
  /** Full outer join of two pre-aggregated sides (customers vs suppliers
    * per nation). Aggregate-then-join keeps the shuffled data minimal. */
  val q09 = QueryDef(
    "q09_full_outer_nation",
    (s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val p = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(p, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    },
    Some("""SELECT COALESCE(c.nationkey, p.nationkey) AS nationkey,
        COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) p
      USING (nationkey)
      ORDER BY nationkey"""))

  // ---------------------------------------------------------------- q10
  /** Left-semi: customers that have at least one order. */
  val q10 = QueryDef(
    "q10_semi_join_customers",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name")).orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q11
  /** Left-anti (J1, the reference's dedup probe in algebraic form,
    * db.clj:100-104): customers with no orders. */
  val q11 = QueryDef(
    "q11_anti_join_customers",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")).orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q12
  /** Theta join: equi key + range band (ship within 60 days of order).
    * Planned as a sort-merge/hash join on the equi key with the range as a
    * post-join filter — the scalable shape for equi+range conditions. */
  val q12 = QueryDef(
    "q12_theta_join_ship_window",
    (s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey")
          && l("l_shipdate") >= o("o_orderdate")
          && l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q13
  /** Top-k per group via row_number window — the distributed top-k idiom
    * (one shuffle on the partition key; no global sort). */
  val q13 = QueryDef(
    "q13_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  // ---------------------------------------------------------------- q14
  /** Running totals (rows frame). The running sum goes through the decimal
    * accumulator so every prefix is engine-exact. */
  val q14 = QueryDef(
    "q14_running_totals",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double").as("running_total"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
        COUNT(*) OVER w AS running_n
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  // ---------------------------------------------------------------- q15
  /** lag/lead: previous/next order date per customer + day gap. */
  val q15 = QueryDef(
    "q15_lag_lead",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w).as("prev_date"),
          lead(col("o_orderdate"), 1).over(w).as("next_date"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long").as("gap_days"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        LAG(o_orderdate, 1) OVER w AS prev_date,
        LEAD(o_orderdate, 1) OVER w AS next_date,
        DATEDIFF('day', CAST(LAG(o_orderdate, 1) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  // ---------------------------------------------------------------- q16
  /** rank / dense_rank / ntile within market segment (deterministic
    * tie-break on custkey so ntile is engine-stable). */
  val q16 = QueryDef(
    "q16_rank_in_segment",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
    },
    Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
        RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, NTILE(4) OVER w AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, rnk, c_custkey"""))

  // ---------------------------------------------------------------- q17
  /** RANGE frame (peers by order date share the running value). */
  val q17 = QueryDef(
    "q17_range_frame",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double").as("range_total"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS range_total
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  // ---------------------------------------------------------------- q18
  /** GROUPING SETS with GROUPING() disambiguation. */
  val q18 = QueryDef(
    "q18_grouping_sets",
    (s, d) => Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty[Column]),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(GROUPING(l_returnflag) AS INT) AS g_rf, CAST(GROUPING(l_linestatus) AS INT) AS g_ls
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q19
  /** ROLLUP (flag → flag+status → grand total). */
  val q19 = QueryDef(
    "q19_rollup",
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n,
        CAST(GROUPING(l_returnflag) AS INT) AS g_rf, CAST(GROUPING(l_linestatus) AS INT) AS g_ls
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q20
  /** CUBE over (returnflag, linestatus). */
  val q20 = QueryDef(
    "q20_cube",
    (s, d) => Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(GROUPING(l_returnflag) AS INT) AS g_rf, CAST(GROUPING(l_linestatus) AS INT) AS g_ls
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q21
  /** Exact COUNT(DISTINCT) ×2 per group — Catalyst expands to a single
    * multi-distinct aggregate (Expand + two-phase agg), no extra pass. */
  val q21 = QueryDef(
    "q21_count_distinct",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q22
  /** Moment aggregates (stddev/variance) — rounded to 6 dp: both engines
    * compute the same statistic to ~1e-12 relative error; rounding removes
    * the summation-order noise. */
  val q22 = QueryDef(
    "q22_stats_agg",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
        ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
        MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q23
  /** Exact interpolated percentiles (A3/A4's percentile surface; the
    * approx_percentile variant is q24's no-oracle sibling).
    *
    * Scale-safe plan: Spark's `percentile()` aggregate buffers EVERY value
    * of a group in its agg buffer — OOM-class at 100 TB. This query instead
    * sorts each group once in a window (WindowExec's partition buffer is an
    * external, spilling row array), tags each value with its exact rank and
    * the group count, keeps only the ≤2 boundary rows per requested
    * percentile, and reassembles `v_lo + frac·(v_hi − v_lo)` — the same
    * interpolation formula `percentile()`/QUANTILE_CONT use — in a final
    * tiny aggregate. Memory per task is bounded by the sort spill threshold,
    * never by group cardinality. (Known trade-off: one task per group for
    * the sort, same as any exact per-group order statistic; the sort spills
    * rather than OOMs, and group count here is small and fixed.) */
  val q23 = QueryDef(
    "q23_percentiles",
    (s, d) => {
      val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p90" -> 0.9)
      val byG = Window.partitionBy(col("o_orderpriority"))
      val ranked = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice"))
        .select(col("o_orderpriority"), col("o_totalprice"),
          row_number().over(byG.orderBy(col("o_totalprice"))).as("rn"),
          count(lit(1)).over(byG).as("n"))
      // h_p = 1 + (n-1)·p; a row matters iff its rank is floor(h) or ceil(h)
      def h(p: Double): Column = lit(1.0) + (col("n") - 1) * p
      val needed = ranked.filter(
        ps.map { case (_, p) =>
          col("rn") === floor(h(p)) || col("rn") === ceil(h(p))
        }.reduce(_ || _))
      val aggs = ps.flatMap { case (nm, p) => Seq(
        max(when(col("rn") === floor(h(p)), col("o_totalprice"))).as(s"${nm}_lo"),
        max(when(col("rn") === ceil(h(p)), col("o_totalprice"))).as(s"${nm}_hi"),
        max(h(p) - floor(h(p))).as(s"${nm}_f"))
      }
      needed.groupBy(col("o_orderpriority")).agg(aggs.head, aggs.tail: _*)
        .select(col("o_orderpriority") +: ps.map { case (nm, _) =>
          round(col(s"${nm}_lo") +
            col(s"${nm}_f") * (col(s"${nm}_hi") - col(s"${nm}_lo")), 4).as(nm)
        }: _*)
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
        ROUND(QUANTILE_CONT(o_totalprice, 0.25), 4) AS p25,
        ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50,
        ROUND(QUANTILE_CONT(o_totalprice, 0.75), 4) AS p75,
        ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q24
  /** Sketch aggregates — approx_count_distinct (HLL++) and
    * approx_percentile (KLL-style) have no value-level cross-engine oracle,
    * so the query emits its own error-bound verdicts as booleans and the
    * oracle pins them TRUE: the HLL estimate is checked within 2% of the
    * exact distinct count, and the approximate p95 is checked for internal
    * consistency against the same sketch's p50 and the exact min/max
    * (strictly above the median, inside [min, max] — a garbage sketch
    * fails all three). The TRUE-RANK check (p95 lands at a real rank in
    * [0.93, 0.97]) inherently needs a second data pass, so it lives in
    * SketchSpec at spec scale; an earlier in-query version cost 3 full
    * passes + a join and 6× the wall time for no extra production signal.
    *
    * Plan-shape trap this query is built around: `count_distinct` must
    * NOT share an Aggregate with `percentile_approx`. Spark's
    * single-distinct rewrite keys the partial aggregate by
    * (group, distinct-col), so every non-distinct aggregate's partial
    * state — here a KLL-class sketch — is instantiated PER DISTINCT KEY
    * and then merged: one sketch per partkey (measured 17 s vs 0.9 s at
    * sf0.1). The sketches therefore aggregate in their own pure
    * partial+final pass, the exact distinct count in a second cheap
    * hash-agg pass over a 2-column scan, joined at |groups| rows. */
  val q24 = QueryDef(
    "q24_approx_sketches",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val sk = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("acd"),
          percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95)), lit(2500)).as("aps"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
      val cd = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_cd"))
      sk.join(broadcast(cd), "l_returnflag")
        .select(col("l_returnflag"),
          (abs(col("acd") - col("exact_cd")) <= col("exact_cd") * 0.02).as("acd_within_2pct"),
          (element_at(col("aps"), 2) > element_at(col("aps"), 1) &&
            element_at(col("aps"), 2) >= col("lo") &&
            element_at(col("aps"), 2) <= col("hi")).as("p95_bracket_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, TRUE AS acd_within_2pct, TRUE AS p95_bracket_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    doc = "HLL + approximate percentile, single-pass self-checking bounds; true-rank + tight bounds in SketchSpec")

  // ---------------------------------------------------------------- q25
  /** UNION ALL then aggregate. */
  val q25 = QueryDef(
    "q25_union_all",
    (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .unionByName(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey")),
    Some("""SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL SELECT s_nationkey AS nationkey FROM supplier) t
      GROUP BY nationkey ORDER BY nationkey"""))

  // ---------------------------------------------------------------- q26
  /** INTERSECT (set semantics). */
  val q26 = QueryDef(
    "q26_intersect",
    (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey")),
    Some("""SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  // ---------------------------------------------------------------- q27
  /** EXCEPT (J1's algebraic form). */
  val q27 = QueryDef(
    "q27_except",
    (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey")),
    Some("""SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  // ---------------------------------------------------------------- q28
  /** DISTINCT on a pair (J2). */
  val q28 = QueryDef(
    "q28_distinct_pairs",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_orderpriority")).distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority")),
    Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      ORDER BY o_orderstatus, o_orderpriority"""))

  // ---------------------------------------------------------------- q29
  /** Global top-k: planner emits TakeOrderedAndProject (heap per partition
    * + merge on driver) — no full sort at any scale. */
  val q29 = QueryDef(
    "q29_orderby_limit",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  // ---------------------------------------------------------------- q30
  /** The reference's only literal query shape (P1+P2+P3, db.clj:70-78):
    * SELECT id WHERE id IN (…) LIMIT n. */
  val q30 = QueryDef(
    "q30_in_list_probe",
    (s, d) => Tables.events(s, d)
      .filter(col("event_id").isin(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L)
        && col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id"))
      .limit(10000),
    Some("""SELECT event_id, event_type FROM events
      WHERE event_id IN (1,2,3,5,8,13,21,34,55,89)
        AND event_type IN ('click','view','purchase')
      ORDER BY event_id LIMIT 10000"""))

  // ---------------------------------------------------------------- q53
  /** As-of join (point-in-time lookup): each event enriched with the
    * customer's latest order at or before the event time. Right side is
    * deduped to one row per (custkey, orderdate) (max orderkey — a total
    * order) so both engines match deterministically. The DuckDB oracle is
    * its native ASOF LEFT JOIN; our implementation is AsOfJoin's
    * union+window form — one shuffle, no join operator at all. */
  val q53 = QueryDef(
    "q53_asof_join",
    (s, d) => {
      val e = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.join(e, o,
          key = "user_id", leftTs = "ts", rightTs = "o_orderdate",
          rightPayload = Seq("o_orderkey", "o_orderdate"))
        .select(col("event_id"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("event_id"))
    },
    Some("""WITH r AS (
        SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2)
      SELECT e.event_id, r.o_orderkey, r.o_orderdate
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
      ORDER BY event_id"""))

  // --------------------------------------------------------------- q254
  /** TPC-H Q8-shape national market share: of all PROMO-part revenue
    * bought by EUROPE customers in 1996-1997, what fraction was supplied
    * by NATION_7, per order year? The 6-way join tree is the classic
    * star-heavy shape: fact lineitem joins orders (shuffle on orderkey),
    * then every dimension — part (filtered before the join so the
    * build side is small), supplier, customer, nation ×2, region — is
    * broadcast. Both revenue sums ride ONE decimal-accumulator aggregate
    * (sum + conditional sum in the same pass, no self-join / no second
    * scan), and the share is a single double division of the two exact
    * sums — IEEE-identical across engines. At 100 TB: one fact-fact
    * shuffle (orderkey), everything else broadcast; AQE would pick the
    * same tree. */
  val q254 = QueryDef(
    "q254_market_share",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val p = Tables.part(s, d).filter(col("p_type") === "PROMO")
      val sup = Tables.supplier(s, d)
      val c = Tables.customer(s, d)
      val nS = Tables.nation(s, d).select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val nC = Tables.nation(s, d).select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nS), sup("s_nationkey") === col("sn_key"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(nC), c("c_nationkey") === col("cn_key"))
        .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
        .select(year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("vol"),
          col("supp_nation"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_7", col("vol")).otherwise(0.0)
            .cast(DecimalType(18, 4))).cast("double").as("nation_vol"),
          dsum4(col("vol")).as("total_vol"))
        .select(col("o_year"), col("nation_vol"), col("total_vol"),
          (col("nation_vol") / col("total_vol")).as("share"))
        .orderBy(col("o_year"))
    },
    Some("""SELECT year(o_orderdate) AS o_year,
        CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_7'
            THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(18,4)))
          AS DOUBLE) AS nation_vol,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
          AS DOUBLE) AS total_vol,
        CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_7'
            THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(18,4)))
          AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
          AS DOUBLE) AS share
      FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY year(o_orderdate) ORDER BY o_year"""),
    doc = "TPC-H Q8 market-share shape: 6-way star join, one fact shuffle + broadcast dims, both sums in one decimal-exact pass")

  // --------------------------------------------------------------- q255
  /** TPC-H Q9-shape product-line profit by supplier nation × year. The
    * corpus has no partsupp table, so supply cost is proxied by
    * 0.6 · p_retailprice · l_quantity (documented substitution — the
    * JOIN/AGG shape, which is what Q9 stresses, is unchanged: fact joins
    * two broadcast dims + orders on the shuffle key, then a two-level
    * group). Profit per line = revenue − cost, decimal-accumulated. */
  val q255 = QueryDef(
    "q255_nation_profit",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_type") === "STANDARD")
      val sup = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val o = Tables.orders(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            - lit(0.6) * col("p_retailprice") * col("l_quantity")).as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(dsum4(col("amount")).as("profit"), count(lit(1)).as("n_lines"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""SELECT n_name AS nation, year(o_orderdate) AS o_year,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
            - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS profit,
        COUNT(*) AS n_lines
      FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name, year(o_orderdate)
      ORDER BY nation, o_year DESC"""),
    doc = "TPC-H Q9 profit shape (supply cost proxied — no partsupp table): star join + two-level agg, decimal-exact")

  // --------------------------------------------------------------- q256
  /** TPC-H Q2-shape "best supplier per part": among suppliers that
    * actually shipped a given SMALL-size part, pick the one with the
    * highest account balance (tie → lowest suppkey), then report the
    * top 20 such (part, supplier) pairs by balance. The Q2 essence — a
    * correlated max subquery turned into a per-key argmax — is expressed
    * as ONE max_by aggregate over the distinct ship pairs instead of a
    * window sort or a self-join with a MAX subquery: one shuffle on
    * partkey, agg state O(parts). */
  val q256 = QueryDef(
    "q256_best_supplier",
    (s, d) => {
      val p = Tables.part(s, d).filter(col("p_size") <= 5)
      val pairs = Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_brand"), col("l_suppkey")).distinct()
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      pairs.groupBy(col("p_partkey"), col("p_brand"))
        .agg(max_by(struct(col("s_name"), col("s_acctbal")),
          struct(col("s_acctbal"), -col("s_suppkey"))).as("best"),
          count(lit(1)).as("n_suppliers"))
        .select(col("p_partkey"), col("p_brand"),
          col("best.s_name").as("s_name"), col("best.s_acctbal").as("s_acctbal"),
          col("n_suppliers"))
        .orderBy(col("s_acctbal").desc, col("p_partkey"))
        .limit(20)
    },
    Some("""WITH pairs AS (SELECT DISTINCT p_partkey, p_brand, l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey AND p_size <= 5),
      sp AS (SELECT p_partkey, p_brand, s_name, s_acctbal,
          row_number() OVER (PARTITION BY p_partkey
            ORDER BY s_acctbal DESC, l_suppkey) AS rn,
          count(*) OVER (PARTITION BY p_partkey) AS n_suppliers
        FROM pairs JOIN supplier ON l_suppkey = s_suppkey)
      SELECT p_partkey, p_brand, s_name, s_acctbal, CAST(n_suppliers AS BIGINT) AS n_suppliers
      FROM sp WHERE rn = 1
      ORDER BY s_acctbal DESC, p_partkey LIMIT 20"""),
    doc = "TPC-H Q2 shape: per-part best-supplier argmax via one max_by agg (no window sort, no correlated-MAX self-join)")

  val all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q28, q29, q30, q53,
    q254, q255, q256)
}
