package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Coverage tier: operators from SURVEY §2.B's "free from Catalyst" rows
  * that deserve their own named, oracle-checked query — the SQL entry
  * point, null ordering, batch sessionization, pivot, window extras,
  * higher-order functions, and explode/collect round-trips. */
object CoverageQueries {

  // ---------------------------------------------------------------- q55
  /** The spark.sql surface over registered temp views — proves the SQL
    * front-end sees the same tables/semantics as the DataFrame API. */
  val q55 = QueryDef(
    "q55_sql_surface",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""SELECT c_mktsegment, count(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""SELECT c_mktsegment, count(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // ---------------------------------------------------------------- q56
  /** NULLS FIRST ordering made observable through a LIMIT (the limit
    * decides which rows survive, so the hash pin actually checks the null
    * ordering, not just the multiset). */
  val q56 = QueryDef(
    "q56_null_ordering",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("O")).as("st"))
      .orderBy(col("st").asc_nulls_first, col("o_orderkey"))
      .limit(100),
    Some("""SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st
      FROM orders ORDER BY st NULLS FIRST, o_orderkey LIMIT 100"""))

  // ---------------------------------------------------------------- q57
  /** Batch sessionization (gap > 30 min ⇒ new session) — the relational
    * form of the streaming session window: lag + running sum of
    * session-start flags, then per-session aggregation. One shuffle on
    * the user key; the standard scalable sessionization plan. */
  val q57 = QueryDef(
    "q57_sessionize",
    (s, d) => {
      // µs on both sides: DuckDB's parquet reader coerces the ns
      // timestamps to µs, so the oracle cannot see sub-µs digits
      val gapUs = 30L * 60 * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      val flagged = Tables.events(s, d)
        .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"))
        .withColumn("new_sess",
          when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs
            || lag(col("ts_us"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      flagged.groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"))
        .orderBy(col("user_id"), col("sess_id"))
    },
    Some("""WITH t AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
          CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                 OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
      s AS (
        SELECT user_id, ts_us,
          CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        FROM t)
      SELECT user_id, sess_id, count(*) AS n_events,
        min(ts_us) AS start_us, max(ts_us) AS end_us
      FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id"""))

  // ---------------------------------------------------------------- q58
  /** Pivot (wide conditional aggregation): event counts per user bucket ×
    * event type; missing combinations coalesce to 0 to match the FILTER
    * formulation. */
  val q58 = QueryDef(
    "q58_pivot",
    (s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, d)
        .groupBy(pmod(col("user_id"), lit(10)).as("bucket"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("bucket") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("bucket"))
    },
    Some("""SELECT user_id % 10 AS bucket,
        count(*) FILTER (event_type = 'click') AS click,
        count(*) FILTER (event_type = 'error') AS error,
        count(*) FILTER (event_type = 'purchase') AS purchase,
        count(*) FILTER (event_type = 'signup') AS signup,
        count(*) FILTER (event_type = 'view') AS view
      FROM events GROUP BY 1 ORDER BY bucket"""))

  // ---------------------------------------------------------------- q59
  /** Window extras: percent_rank / cume_dist / first / last frames. */
  val q59 = QueryDef(
    "q59_window_extras",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          first(col("c_custkey")).over(wf).as("first_k"),
          last(col("c_custkey")).over(wf).as("last_k"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some("""SELECT c_mktsegment, c_custkey,
        round(percent_rank() OVER w, 6) AS pr,
        round(cume_dist() OVER w, 6) AS cd,
        first_value(c_custkey) OVER wf AS first_k,
        last_value(c_custkey) OVER wf AS last_k
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
        wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY c_mktsegment, c_custkey"""))

  // ---------------------------------------------------------------- q60
  /** Higher-order function surface: exists / forall / filter / transform
    * / aggregate over an array column, vs DuckDB list functions. */
  val q60 = QueryDef(
    "q60_hof_surface",
    (s, d) => {
      val words = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("doc_id"),
          exists(words, w => w === "the").as("has_the"),
          forall(words, w => length(w) < lit(20)).as("all_short"),
          size(filter(words, w => length(w) <= 4)).cast("long").as("n_short"),
          aggregate(transform(words, w => length(w).cast("long")), lit(0L), (a, x) => a + x).as("total_len"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      SELECT doc_id,
        len(list_filter(words, x -> x = 'the')) > 0 AS has_the,
        len(list_filter(words, x -> length(x) >= 20)) = 0 AS all_short,
        CAST(len(list_filter(words, x -> length(x) <= 4)) AS BIGINT) AS n_short,
        CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT) AS total_len
      FROM t ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q61
  /** Generator + re-aggregation round-trip: explode words, count, top-20
    * (deterministic tie-break), plus per-lang sorted distinct sources via
    * collect_set. */
  val q61 = QueryDef(
    "q61_explode_collect",
    (s, d) => Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20),
    Some("""SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word ORDER BY n DESC, word LIMIT 20"""))

  // ---------------------------------------------------------------- q62
  /** collect_set + array_sort (deterministic set aggregation). The sorted
    * set is exported CSV-serialized (concat_ws) so the driver's pandas
    * canonicalizer can hash it — array-typed output columns crash its
    * sort_values/factorize step. */
  val q62 = QueryDef(
    "q62_collect_set",
    (s, d) => Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(concat_ws(",", array_sort(collect_set(col("source")))).as("sources"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang")),
    Some("""SELECT lang,
        array_to_string(list_sort(list_distinct(list(source))), ',') AS sources,
        count(DISTINCT source) AS n_sources
      FROM documents GROUP BY lang ORDER BY lang"""))

  private def withViews(s: SparkSession, d: String): Unit = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    Tables.supplier(s, d).createOrReplaceTempView("supplier_v")
  }

  // ---------------------------------------------------------------- q66
  /** Scalar subquery: rows above the global average (Catalyst plans the
    * subquery as a one-row broadcast — no per-row re-evaluation). */
  val q66 = QueryDef(
    "q66_scalar_subquery",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT l_returnflag, count(*) AS n
        FROM lineitem_v
        WHERE l_extendedprice > (SELECT avg(l_extendedprice) FROM lineitem_v)
        GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag, count(*) AS n
      FROM lineitem
      WHERE l_extendedprice > (SELECT avg(l_extendedprice) FROM lineitem)
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q67
  /** Correlated EXISTS with an aggregate predicate (decorrelated by
    * Catalyst into a semi-join on the grouped subquery). */
  val q67 = QueryDef(
    "q67_correlated_exists",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT c_custkey, c_name FROM customer_v c
        WHERE EXISTS (
          SELECT 1 FROM orders_v o WHERE o.o_custkey = c.c_custkey
          GROUP BY o.o_custkey HAVING sum(o.o_totalprice) > 400000)
        ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey HAVING sum(o.o_totalprice) > 400000)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q68
  /** IN subquery over an aggregated derived table + HAVING. */
  val q68 = QueryDef(
    "q68_in_subquery",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT o_orderpriority, count(*) AS n
        FROM orders_v
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer_v WHERE c_acctbal > 9000)
        GROUP BY o_orderpriority
        HAVING count(*) > 5
        ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, count(*) AS n
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      GROUP BY o_orderpriority HAVING count(*) > 5
      ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q69
  /** NOT IN with null-safe handling (the classic three-valued-logic trap:
    * both engines must agree on NOT IN semantics over a non-null key). */
  val q69 = QueryDef(
    "q69_not_in_subquery",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT s_suppkey, s_name FROM supplier_v
        WHERE s_suppkey NOT IN (
          SELECT l_suppkey FROM lineitem_v WHERE l_quantity > 49)
        ORDER BY s_suppkey""")
    },
    Some("""SELECT s_suppkey, s_name FROM supplier
      WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
      ORDER BY s_suppkey"""))

  // ---------------------------------------------------------------- q70
  /** Date/time function breadth (year/quarter/month/day/dow/iso-week/
    * date_add/last_day) — dow offset reconciled (Spark 1=Sunday vs
    * DuckDB 0=Sunday). */
  val q70 = QueryDef(
    "q70_datetime_fns",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dd"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("woy"),
        date_add(col("o_orderdate"), 30).as("plus30"),
        last_day(col("o_orderdate")).as("eom"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS y,
        CAST(quarter(o_orderdate) AS INT) AS q,
        CAST(month(o_orderdate) AS INT) AS m,
        CAST(day(o_orderdate) AS INT) AS dd,
        CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        CAST(weekofyear(o_orderdate) AS INT) AS woy,
        CAST(o_orderdate AS DATE) + 30 AS plus30,
        last_day(CAST(o_orderdate AS DATE)) AS eom
      FROM orders ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q71
  /** String function breadth: case, replace, reverse, slicing, search,
    * padding — all codegen'd built-ins, all cross-checked. */
  val q71 = QueryDef(
    "q71_string_fns",
    (s, d) => Tables.customer(s, d)
      .select(col("c_custkey"),
        upper(col("c_name")).as("u"),
        lower(col("c_name")).as("l"),
        regexp_replace(col("c_name"), "Customer", "Cst").as("rep"),
        reverse(col("c_name")).as("rev"),
        substring(col("c_name"), 1, 5).as("left5"),
        instr(col("c_name"), "er").cast("long").as("pos"),
        lpad(col("c_custkey").cast("string"), 10, "*").as("pad"),
        length(col("c_name")).cast("long").as("len"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey,
        upper(c_name) AS u, lower(c_name) AS l,
        replace(c_name, 'Customer', 'Cst') AS rep,
        reverse(c_name) AS rev,
        substring(c_name, 1, 5) AS left5,
        CAST(strpos(c_name, 'er') AS BIGINT) AS pos,
        lpad(CAST(c_custkey AS VARCHAR), 10, '*') AS pad,
        CAST(length(c_name) AS BIGINT) AS len
      FROM customer ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q78
  /** MapType surface: str_to_map → map_keys/map_values/element_at/
    * map_concat, exported as sorted CSV strings (map iteration order is
    * engine-specific; sorted serialized projections are not, and the
    * driver's checker cannot hash raw array columns). */
  val q78 = QueryDef(
    "q78_map_surface",
    (s, d) => {
      val m = map_concat(
        str_to_map(concat(lit("type="), col("event_type"), lit(",uid="), col("user_id")),
          lit(","), lit("=")),
        map(lit("src"), lit("graft")))
      Tables.events(s, d)
        .select(col("event_id"),
          concat_ws(",", array_sort(map_keys(m))).as("ks"),
          concat_ws(",", array_sort(map_values(m))).as("vs"),
          element_at(m, "type").as("type_val"),
          size(m).cast("long").as("n_entries"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
        'src,type,uid' AS ks,
        array_to_string(list_sort(['graft', event_type, CAST(user_id AS VARCHAR)]), ',') AS vs,
        event_type AS type_val,
        CAST(3 AS BIGINT) AS n_entries
      FROM events ORDER BY event_id"""))

  // ---------------------------------------------------------------- q79
  /** Array function breadth: position/flatten/slice/repeat/sequence/
    * sort-desc (DuckDB list_position returns NULL for absent — coalesced
    * to Spark's 0). Array results are CSV-serialized so the driver's
    * checker can hash them; the separator only needs to agree between
    * engines, not be collision-free. */
  val q79 = QueryDef(
    "q79_array_fns",
    (s, d) => {
      val words = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_position(words, "the").as("pos_the"),
          size(flatten(array(words, words))).cast("long").as("n_flat"),
          concat_ws(",", slice(words, 1, 3)).as("first3"),
          concat_ws(",", array_repeat(element_at(words, 1), 2)).as("rep2"),
          concat_ws(",", transform(sequence(lit(1L), lit(5L)), _.cast("string"))).as("seq5"),
          concat_ws(",", sort_array(words, asc = false)).as("sorted_desc"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      SELECT doc_id,
        CAST(coalesce(list_position(words, 'the'), 0) AS BIGINT) AS pos_the,
        CAST(len(flatten([words, words])) AS BIGINT) AS n_flat,
        array_to_string(words[1:3], ',') AS first3,
        array_to_string([words[1], words[1]], ',') AS rep2,
        array_to_string(range(1, 6), ',') AS seq5,
        array_to_string(list_sort(words, 'DESC'), ',') AS sorted_desc
      FROM t ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q80
  /** Conditional + bitwise breadth: greatest/least, nullif/coalesce,
    * CASE, shifts, AND/OR/XOR. */
  val q80 = QueryDef(
    "q80_conditional_bitwise",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"),
        greatest(col("o_custkey"), col("o_orderkey"), lit(100L)).as("g"),
        least(col("o_custkey"), col("o_orderkey"), lit(100L)).as("l"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status"),
        when(col("o_totalprice") > 100000, "high")
          .when(col("o_totalprice") > 10000, "mid")
          .otherwise("low").as("band"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 1).as("shr"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("band255"),
        col("o_orderkey").bitwiseOR(lit(1L)).as("bor"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("bxor"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
        greatest(o_custkey, o_orderkey, 100) AS g,
        least(o_custkey, o_orderkey, 100) AS l,
        coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status,
        CASE WHEN o_totalprice > 100000 THEN 'high'
             WHEN o_totalprice > 10000 THEN 'mid' ELSE 'low' END AS band,
        o_orderkey << 2 AS shl,
        o_orderkey >> 1 AS shr,
        o_orderkey & 255 AS band255,
        o_orderkey | 1 AS bor,
        xor(o_orderkey, o_custkey) AS bxor
      FROM orders ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q81
  /** Regex function breadth: extract, match test, count, regex split —
    * RE2-compatible pattern subset so Java and DuckDB regex agree. */
  val q81 = QueryDef(
    "q81_regex_fns",
    (s, d) => Tables.customer(s, d)
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        col("c_name").rlike("0{2}").as("has_00"),
        size(split(col("c_name"), "[#0-9]+")).cast("long").as("n_parts"),
        regexp_count(col("c_name"), lit("0")).cast("long").as("n_zero"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey,
        regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        regexp_matches(c_name, '0{2}') AS has_00,
        CAST(len(regexp_split_to_array(c_name, '[#0-9]+')) AS BIGINT) AS n_parts,
        CAST(length(c_name) - length(replace(c_name, '0', '')) AS BIGINT) AS n_zero
      FROM customer ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q82
  /** Cast/coercion matrix: numeric truncation and widening, string
    * round-trips, timestamp→date — the implicit-conversion rules both
    * engines must share for every other query to be comparable. */
  val q82 = QueryDef(
    "q82_cast_matrix",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("long").as("price_long"),
        col("o_totalprice").cast("decimal(18,1)").cast("string").as("price_str"),
        col("o_orderkey").cast("string").cast("long").as("key_roundtrip"),
        col("o_orderdate").cast("date").as("odate"),
        col("o_orderkey").cast("double").as("key_dbl"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
        CAST(trunc(o_totalprice) AS BIGINT) AS price_long,
        CAST(CAST(o_totalprice AS DECIMAL(18,1)) AS VARCHAR) AS price_str,
        CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
        CAST(o_orderdate AS DATE) AS odate,
        CAST(o_orderkey AS DOUBLE) AS key_dbl
      FROM orders ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q83
  /** Numeric RANGE frame: running sum over a value-based window
    * (5000-wide price band), not a row-count frame. (The q103/q37
    * sort-before-compute cure does not apply: the window must run below
    * the differently-keyed output sort, so the sort's boundary sampling
    * re-executes it either way — measured identical; the simple form
    * stays.) */
  val q83 = QueryDef(
    "q83_numeric_range_frame",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-5000L, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_in_band"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
        COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
          RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_in_band
      FROM orders ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q84
  /** Selector aggregates: min_by/max_by (≙ DuckDB arg_min/arg_max) and
    * mode (explicit deterministic variant: smallest among the most
    * frequent, via count+window, since native mode() tie-breaks are
    * engine-specific). */
  val q84 = QueryDef(
    "q84_selector_aggs",
    (s, d) => {
      val base = Tables.orders(s, d).groupBy(col("o_orderpriority"))
        .agg(min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest_order"),
          max_by(col("o_orderkey"), col("o_totalprice")).as("priciest_order"))
      val mode = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("cnt").desc, col("o_orderstatus"))))
        .filter(col("rn") === 1)
        .select(col("o_orderpriority"), col("o_orderstatus").as("modal_status"))
      base.join(mode, "o_orderpriority").orderBy(col("o_orderpriority"))
    },
    Some("""WITH m AS (
        SELECT o_orderpriority, o_orderstatus AS modal_status,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY count(*) DESC, o_orderstatus) AS rn
        FROM orders GROUP BY o_orderpriority, o_orderstatus)
      SELECT b.o_orderpriority,
        arg_min(o_orderkey, o_totalprice) AS cheapest_order,
        arg_max(o_orderkey, o_totalprice) AS priciest_order,
        any_value(m.modal_status) AS modal_status
      FROM orders b JOIN m ON b.o_orderpriority = m.o_orderpriority AND m.rn = 1
      GROUP BY b.o_orderpriority ORDER BY b.o_orderpriority"""))

  // ---------------------------------------------------------------- q85
  /** Statistical aggregates: Pearson correlation + covariance (rounded —
    * both engines compute the same statistic to ~1e-12). */
  val q85 = QueryDef(
    "q85_corr_covar",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("r"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_s"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("cov_p"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
        round(corr(l_quantity, l_extendedprice), 6) AS r,
        round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_s,
        round(covar_pop(l_quantity, l_extendedprice), 4) AS cov_p
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q86
  /** Boolean aggregates: bool_and / bool_or. */
  val q86 = QueryDef(
    "q86_bool_aggs",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_totalprice") > 400000).as("any_over_400k"))
      .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
        bool_and(o_totalprice > 1000) AS all_over_1k,
        bool_or(o_totalprice > 400000) AS any_over_400k
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q87
  /** nth_value over a full-partition frame. */
  val q87 = QueryDef(
    "q87_nth_value",
    (s, d) => {
      val wf = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"),
          nth_value(col("c_custkey"), 2).over(wf).as("second_richest"),
          nth_value(col("c_custkey"), 5).over(wf).as("fifth_richest"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some("""SELECT c_mktsegment, c_custkey,
        nth_value(c_custkey, 2) OVER wf AS second_richest,
        nth_value(c_custkey, 5) OVER wf AS fifth_richest
      FROM customer
      WINDOW wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY c_mktsegment, c_custkey"""))

  // ---------------------------------------------------------------- q88
  /** Ordered string aggregation (listagg ≙ string_agg): deterministic via
    * explicit element sort before concatenation. */
  val q88 = QueryDef(
    "q88_string_agg",
    (s, d) => Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(concat_ws(",", array_sort(collect_set(col("source")))).as("sources_csv"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("lang")),
    Some("""SELECT lang,
        string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv,
        count(*) AS n_docs
      FROM documents GROUP BY lang ORDER BY lang"""))

  // ---------------------------------------------------------------- q97
  /** UNPIVOT (wide → long, the inverse of q58's pivot): per-nation
    * min/max/avg account balances melted into (nation, stat, value) rows.
    * Spark's `unpivot` is a Generate-style narrow op — no shuffle beyond
    * the feeding aggregate. */
  val q97 = QueryDef(
    "q97_unpivot",
    (s, d) => Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(min(col("c_acctbal")), 2).cast("double").as("min_bal"),
        round(max(col("c_acctbal")), 2).cast("double").as("max_bal"),
        // exact cents: Spark's decimal avg rounds HALF_UP where DuckDB's
        // AVG returns a double — a half-cent mean diverged at sf0.001.
        // Money is 2-decimal by construction, so cents are exact longs
        // and the truncating integer mean agrees everywhere.
        (expr("sum(cast(round(c_acctbal * 100, 0) as bigint)) div count(1)")
          .cast("double") / 100.0).as("avg_bal_cents"))
      .unpivot(Array(col("n_name")),
        Array(col("min_bal"), col("max_bal"), col("avg_bal_cents")), "stat", "value")
      .orderBy(col("n_name"), col("stat")),
    Some("""WITH agg AS (
        SELECT n_name,
          round(MIN(c_acctbal), 2)::DOUBLE AS min_bal,
          round(MAX(c_acctbal), 2)::DOUBLE AS max_bal,
          (CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
            // COUNT(*))::DOUBLE / 100.0 AS avg_bal_cents
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name)
      SELECT n_name, stat, value
      FROM agg UNPIVOT (value FOR stat IN (min_bal, max_bal, avg_bal_cents))
      ORDER BY n_name, stat"""))

  // ---------------------------------------------------------------- q98
  /** LATERAL correlated subquery (SQL-surface breadth): for each region,
    * the top-2 nations by total customer balance — a dependent top-k the
    * optimizer decorrelates into a window rank-limit, not a per-row
    * re-execution. */
  val q98 = QueryDef(
    "q98_lateral_topk",
    (s, d) => {
      Tables.region(s, d).createOrReplaceTempView("v_region")
      Tables.nation(s, d).createOrReplaceTempView("v_nation")
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      s.sql("""
        SELECT r.r_name, t.n_name, t.total_bal
        FROM v_region r,
        LATERAL (
          SELECT n.n_name,
            CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          FROM v_nation n JOIN v_customer c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY total_bal DESC, n.n_name
          LIMIT 2
        ) t
        ORDER BY r.r_name, t.total_bal DESC, t.n_name""")
    },
    Some("""SELECT r.r_name, t.n_name, t.total_bal
      FROM region r,
      LATERAL (
        SELECT n.n_name,
          CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY total_bal DESC, n.n_name
        LIMIT 2
      ) t
      ORDER BY r.r_name, t.total_bal DESC, t.n_name"""))

  // ---------------------------------------------------------------- q99
  /** Time-series gap fill: dense daily event counts with explicit zero
    * rows for missing (day × type) combinations. The dense scaffold is
    * `sequence(min_day, max_day)` exploded against the distinct type dim —
    * generated, not scanned; the left join pulls real counts onto it.
    * Scaffold size = days × types, independent of event volume. */
  val q99 = QueryDef(
    "q99_gap_fill",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("event_type"))
      val counts = e.groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("n"))
      val days = e.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val types = e.select(col("event_type")).distinct()
      days.crossJoin(types)
        .join(counts, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("day"), col("event_type"))
    },
    Some("""WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      counts AS (SELECT day, event_type, COUNT(*) AS n FROM e GROUP BY day, event_type),
      days AS (SELECT unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY))::DATE AS day FROM e),
      types AS (SELECT DISTINCT event_type FROM e)
      SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
      FROM days d CROSS JOIN types t
      LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
      ORDER BY d.day, t.event_type"""))

  // --------------------------------------------------------------- q128
  /** Multiset set operations — INTERSECT ALL / EXCEPT ALL keep duplicate
    * MULTIPLICITY (min / difference of per-value counts), unlike the
    * DISTINCT forms in q25-q28. Probe: order priorities of two customer
    * segments; priorities repeat heavily, so the ALL semantics visibly
    * diverge from DISTINCT. Both engines plan these as counted aggregates
    * (Spark: generate+agg rewrite), not joins — one shuffle each side. */
  val q128 = QueryDef(
    "q128_multiset_ops",
    (s, d) => {
      val o = Tables.orders(s, d)
      def seg(lo: Int, hi: Int) =
        o.filter(col("o_custkey") % 10 >= lo && col("o_custkey") % 10 <= hi)
          .select(col("o_orderpriority"))
      val a = seg(0, 4)
      val b = seg(3, 7)
      a.intersectAll(b).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_intersect"))
        .join(
          a.exceptAll(b).groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n_except")),
          Seq("o_orderpriority"), "full")
        .select(col("o_orderpriority"),
          coalesce(col("n_intersect"), lit(0L)).as("n_intersect"),
          coalesce(col("n_except"), lit(0L)).as("n_except"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH a AS (SELECT o_orderpriority FROM orders WHERE o_custkey % 10 BETWEEN 0 AND 4),
      b AS (SELECT o_orderpriority FROM orders WHERE o_custkey % 10 BETWEEN 3 AND 7),
      i AS (SELECT o_orderpriority, count(*) AS n_intersect
            FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1),
      e AS (SELECT o_orderpriority, count(*) AS n_except
            FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1)
      SELECT COALESCE(i.o_orderpriority, e.o_orderpriority) AS o_orderpriority,
        COALESCE(n_intersect, 0) AS n_intersect, COALESCE(n_except, 0) AS n_except
      FROM i FULL JOIN e ON i.o_orderpriority = e.o_orderpriority
      ORDER BY o_orderpriority"""),
    doc = "INTERSECT ALL / EXCEPT ALL multiplicity semantics vs the DISTINCT set ops")

  // --------------------------------------------------------------- q129
  /** Bitwise aggregates (bit_and / bit_or / bit_xor) — the flag-mask
    * rollup idiom (capability masks, bloom-ish unions, parity checks).
    * Integer-exact, order-free, map-side combinable: the canonical
    * "merge partial masks" 100 TB aggregation. Masks derive from order
    * keys so every group exercises non-trivial bit patterns. */
  val q129 = QueryDef(
    "q129_bitwise_agg",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderpriority"), (col("o_orderkey") % 256).as("mask"))
        .groupBy(col("o_orderpriority"))
        .agg(bit_and(col("mask")).as("mask_and"),
          bit_or(col("mask")).as("mask_or"),
          bit_xor(col("mask")).as("mask_xor"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
        bit_and(o_orderkey % 256) AS mask_and,
        bit_or(o_orderkey % 256) AS mask_or,
        bit_xor(o_orderkey % 256) AS mask_xor,
        count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    doc = "bit_and/bit_or/bit_xor mask rollups; order-free, partial-aggregable")

  // --------------------------------------------------------------- q137
  /** TIME-interval RANGE window frames — `RANGE BETWEEN INTERVAL '1' HOUR
    * PRECEDING AND CURRENT ROW` — the rolling-window-by-wall-clock shape
    * (rate limiting, rolling revenue, sliding SLO counters) that a ROWS
    * frame cannot express when event spacing is irregular. Complements
    * q83's NUMERIC range frame; only the SQL front-end can state interval
    * frames, so this rides the registered events view. floor(value*100)
    * keeps the windowed sum integer-exact (floor is deterministic on
    * doubles; a double->long CAST would round differently per engine).
    *
    * Scale shape: one shuffle on event_type, a spilling range-frame
    * window (frame bounds slide monotonically — each row evicts/admits
    * incrementally, no per-row rescan), then the output sort. */
  val q137 = QueryDef(
    "q137_time_range_frame",
    (s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events_v")
      s.sql("""SELECT event_id, event_type, ts,
          count(*) OVER w AS n_1h,
          CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
        FROM events_v
        WINDOW w AS (PARTITION BY event_type ORDER BY ts
                     RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")
    },
    Some("""SELECT event_id, event_type, ts,
        count(*) OVER w AS n_1h,
        CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""),
    doc = "rolling 1-hour interval RANGE frame per event_type; spilling incremental window")

  // --------------------------------------------------------------- q139
  /** Recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497): the classic
    * hierarchy-explosion + subtree-rollup workload (BOM explosion /
    * org-chart descendants) over a deterministic binary-tree hierarchy
    * (parent = doc_id DIV 2). Overlapping roots 1-7 prove each anchor row
    * recurses independently.
    *
    * Scale shape: each recursion level is a hash EQUI-join (child DIV 2 =
    * node) against the dimension — never an all-pairs step — and depth is
    * log2(n) levels. For data-driven graphs whose closure can explode,
    * q100's alternating-star CC remains the scalable form; this covers
    * the SQL-surface recursion contract itself. */
  val q139 = QueryDef(
    "q139_recursive_rollup",
    (s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("docs_v")
      s.sql("""WITH RECURSIVE tree AS (
          SELECT doc_id AS root, doc_id AS node FROM docs_v WHERE doc_id BETWEEN 1 AND 7
          UNION ALL
          SELECT t.root, d.doc_id FROM tree t
          JOIN docs_v d ON d.doc_id DIV 2 = t.node AND d.doc_id > 1)
        SELECT root, count(*) AS n_nodes, sum(c.n_chars) AS subtree_chars
        FROM tree JOIN docs_v c ON c.doc_id = tree.node
        GROUP BY root ORDER BY root""")
    },
    Some("""WITH RECURSIVE tree AS (
        SELECT doc_id AS root, doc_id AS node FROM documents WHERE doc_id BETWEEN 1 AND 7
        UNION ALL
        SELECT t.root, d.doc_id FROM tree t
        JOIN documents d ON d.doc_id // 2 = t.node AND d.doc_id > 1)
      SELECT root, count(*) AS n_nodes, CAST(sum(c.n_chars) AS BIGINT) AS subtree_chars
      FROM tree JOIN documents c ON c.doc_id = tree.node
      GROUP BY root ORDER BY root"""),
    doc = "WITH RECURSIVE hierarchy explosion + rollup; equi-join per level, log-depth")

  // --------------------------------------------------------------- q141
  /** Map higher-order functions — map_zip_with / map_filter /
    * map_entries / map_from_arrays — the last HOF family q78-q82 left
    * uncovered. Two per-doc maps (the 4 lexicographically-first distinct
    * words of each text half, keyed to their lengths) merge with
    * map_zip_with (sum, NULL-coalesced), then map_filter keeps keys
    * present in BOTH halves (v > len(k) ⇔ both sides contributed). The
    * oracle derives the identical result set-theoretically (sorted
    * half-intersection, value 2·len(k)) — an independent formulation, so
    * the map machinery is checked, not mirrored. Output is canonically
    * serialized (sorted k:v join) since map columns have no cross-engine
    * physical order. All per-row, shuffle-free except the output sort. */
  val q141 = QueryDef(
    "q141_map_hof",
    (s, d) => {
      val words = split(col("text"), " ")
      val half = (size(words) / 2).cast("int")
      def first4(c: Column) = slice(array_sort(array_distinct(c)), 1, 4)
      val d1 = first4(slice(words, lit(1), half))
      val d2 = first4(slice(words, half + 1, size(words) - half))
      Tables.documents(s, d)
        .select(col("doc_id"),
          map_from_arrays(d1, transform(d1, x => length(x))).as("m1"),
          map_from_arrays(d2, transform(d2, x => length(x))).as("m2"))
        .select(col("doc_id"),
          map_filter(
            map_zip_with(col("m1"), col("m2"),
              (_, a, b) => coalesce(a, lit(0)) + coalesce(b, lit(0))),
            (k, v) => v > length(k)).as("f"))
        .select(col("doc_id"), size(col("f")).cast("long").as("n_shared"),
          array_join(array_sort(transform(map_entries(col("f")),
            e => concat(e.getField("key"), lit(":"), e.getField("value").cast("string")))),
            ",").as("shared"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      h AS (SELECT doc_id,
          list_sort(list_distinct(words[1 : len(words)//2]))[1:4] AS d1,
          list_sort(list_distinct(words[len(words)//2+1 : len(words)]))[1:4] AS d2
        FROM w),
      k AS (SELECT doc_id, list_sort(list_intersect(d1, d2)) AS kept FROM h)
      SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_shared,
        coalesce(array_to_string(
          [x || ':' || CAST(2*length(x) AS VARCHAR) for x in kept], ','), '') AS shared
      FROM k ORDER BY doc_id"""),
    doc = "map_zip_with/map_filter/map_entries vs an independent set-theoretic oracle")

  // --------------------------------------------------------------- q142
  /** session_window() as a BATCH aggregation — the built-in gap-based
    * sessionizer (q61 builds sessions manually with windows; streaming
    * uses it in EventStream.sessionCounts; this covers the batch-SQL
    * form). Session end = last event + gap, Spark's contract, which the
    * oracle reproduces via the gaps-and-islands formulation — two
    * independent definitions that must agree on every boundary.
    *
    * Scale shape: session_window plans as a single user_id-partitioned
    * sort-aggregate — one shuffle, sessions never materialize as rows
    * until aggregation emits them. */
  val q142 = QueryDef(
    "q142_session_window_batch",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""WITH o AS (SELECT user_id, ts,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      f AS (SELECT user_id, ts,
          CAST(sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        FROM o)
      SELECT user_id, min(ts) AS session_start,
        max(ts) + INTERVAL 30 MINUTE AS session_end,
        count(*) AS n_events
      FROM f GROUP BY user_id, sid ORDER BY user_id, session_start"""),
    doc = "built-in batch session_window vs the gaps-and-islands oracle formulation")

  // --------------------------------------------------------------- q143
  /** Percent-of-parent rollup: each nation's revenue share within its
    * region and each region's share of the global total — the two-level
    * ratio report every BI layer builds. Shares divide exact decimal
    * sums cast to double (single IEEE division — deterministic), dims
    * broadcast, and the fact table aggregates once at the finest grain;
    * parent levels re-aggregate the small partials, never rescan. */
  val q143 = QueryDef(
    "q143_percent_of_parent",
    (s, d) => {
      val rev = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("nation_rev"))
      val byRegion = Window.partitionBy(col("r_name"))
      val global = BoundedWindow.over(col("r_name"))
      rev
        .select(col("r_name"), col("n_name"),
          col("nation_rev").cast("double").as("nation_rev"),
          sum(col("nation_rev")).over(byRegion).cast("double").as("region_rev"),
          sum(col("nation_rev")).over(global).cast("double").as("global_rev"))
        .select(col("r_name"), col("n_name"), col("nation_rev"),
          round(col("nation_rev") / col("region_rev"), 6).as("share_of_region"),
          round(col("region_rev") / col("global_rev"), 6).as("region_share_of_global"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""WITH rev AS (SELECT r_name, n_name,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS nation_rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name)
      SELECT r_name, n_name, CAST(nation_rev AS DOUBLE) AS nation_rev,
        round(CAST(nation_rev AS DOUBLE)
          / CAST(SUM(nation_rev) OVER (PARTITION BY r_name) AS DOUBLE), 6)
          AS share_of_region,
        round(CAST(SUM(nation_rev) OVER (PARTITION BY r_name) AS DOUBLE)
          / CAST(SUM(nation_rev) OVER () AS DOUBLE), 6)
          AS region_share_of_global
      FROM rev ORDER BY r_name, n_name"""),
    doc = "two-level revenue shares; decimal-exact sums, broadcast dims, single fact agg")

  // --------------------------------------------------------------- q144
  /** Contingency-table residuals: event_type × ISO weekday observed vs
    * independence-expected counts, with over/under-representation
    * flagged by the |O−E| > 3√E rule carried out in EXACT integer
    * algebra — (O·N − R·C)² > 9·R·C·N — so the verdict never touches a
    * float (q127's scaled-integer z-test, in two dimensions). The
    * residual square needs ~N⁴ headroom, so both sides compute in
    * DECIMAL(38,0) (Spark cast / DuckDB HUGEINT): exact to N ≈ 3·10⁹
    * total events vs the previous BIGINT ceiling of ~55k; past that the
    * remaining escape is splitting the comparison per q127's note.
    * Expected counts are display-rounded rationals. Weekday alignment
    * pinned: Spark weekday() is Mon=0, DuckDB isodow is Mon=1. */
  val q144 = QueryDef(
    "q144_contingency_residuals",
    (s, d) => {
      val cells = Tables.events(s, d)
        .select(col("event_type"), (weekday(col("ts")) + 1).cast("long").as("dow"))
        .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("o"))
      val r = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
      val c = cells.groupBy(col("dow")).agg(sum(col("o")).as("c"))
      val n = cells.agg(sum(col("o")).as("n"))
      cells.join(broadcast(r), "event_type").join(broadcast(c), "dow")
        .crossJoin(broadcast(n))
        .select(col("event_type"), col("dow"), col("o"),
          round(col("r").cast("double") * col("c") / col("n"), 4).as("e"),
          {
            val (oD, nD, rD, cD) = (col("o").cast("decimal(38,0)"),
              col("n").cast("decimal(38,0)"), col("r").cast("decimal(38,0)"),
              col("c").cast("decimal(38,0)"))
            ((oD * nD - rD * cD) * (oD * nD - rD * cD) > rD * cD * nD * 9)
              .as("flagged")
          })
        .orderBy(col("event_type"), col("dow"))
    },
    Some("""WITH cells AS (SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
          count(*) AS o FROM events GROUP BY 1, 2),
      rr AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY event_type),
      cc AS (SELECT dow, sum(o) AS c FROM cells GROUP BY dow),
      nn AS (SELECT sum(o) AS n FROM cells)
      SELECT event_type, dow, o,
        round(r::DOUBLE * c / n, 4) AS e,
        ((o::HUGEINT * n - r * c) * (o::HUGEINT * n - r * c)
          > 9::HUGEINT * r * c * n) AS flagged
      FROM cells JOIN rr USING (event_type) JOIN cc USING (dow) CROSS JOIN nn
      ORDER BY event_type, dow"""),
    doc = "type x weekday independence residuals; exact-integer 3-sigma verdicts")

  // --------------------------------------------------------------- q145
  /** Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    * match NULL dimension rows instead of vanishing — the "unknown"
    * bucket pattern for late-arriving dimension keys. Every seventh user
    * key becomes NULL; the broadcast dim carries an explicit NULL row. */
  val q145 = QueryDef(
    "q145_null_safe_join",
    (s, d) => {
      import s.implicits._
      val probe = Tables.events(s, d)
        .select(when(col("user_id") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("user_id") % 7).as("k"))
      val dim = (Seq((null.asInstanceOf[java.lang.Long], "unknown")) ++
        (1L to 6L).map(i => (java.lang.Long.valueOf(i), s"bucket$i")))
        .toDF("dk", "label")
      probe.join(broadcast(dim), col("k") <=> col("dk"))
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
        .orderBy(col("label"))
    },
    Some("""WITH probe AS (SELECT CASE WHEN user_id % 7 = 0 THEN NULL
            ELSE user_id % 7 END AS k FROM events),
      dim AS (SELECT NULL AS dk, 'unknown' AS label
        UNION ALL SELECT i, 'bucket' || CAST(i AS VARCHAR) FROM range(1, 7) t(i))
      SELECT label, count(*) AS n
      FROM probe JOIN dim ON k IS NOT DISTINCT FROM dk
      GROUP BY label ORDER BY label"""),
    doc = "<=> join semantics: NULL keys land in an explicit unknown dimension row")

  // --------------------------------------------------------------- q146
  /** Threshold-capped Levenshtein — the banded O(len·k) kernel q103's
    * scaladoc prescribes when a similarity floor exists: distances past
    * the cap return -1 without finishing the DP table. The oracle
    * computes the FULL distance and applies the cap arithmetically, so
    * the kernel's early-exit contract (exact at or below the cap, -1
    * above it — Spark returns the exact distance AT the threshold, -1
    * only past it, which is what the oracle's <= encoding checks) is
    * value-checked on every adjacent pair. */
  val q146 = QueryDef(
    "q146_capped_levenshtein",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      docs.as("a")
        .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          levenshtein(col("a.text"), col("b.text"), 120).as("dist_capped"))
        .orderBy(col("a_id"))
    },
    Some("""SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        CASE WHEN levenshtein(a.text, b.text) <= 120
             THEN levenshtein(a.text, b.text) ELSE -1 END AS dist_capped
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      ORDER BY a_id"""),
    doc = "banded levenshtein(l, r, k): exact at or below the cap, -1 above it")

  // --------------------------------------------------------------- q147
  /** IGNORE NULLS window navigation — last-observation-carried-forward
    * (LOCF): the value signal exists only on purchase events; every
    * event row carries the user's most recent (and first) purchase value
    * forward via last_value/first_value(…, ignoreNulls). This is the
    * sparse-signal forward-fill every sessionized feature pipeline needs
    * and a distinct null-handling surface from q13-q17/q59's window
    * coverage. One user_id window shuffle + output sort. */
  val q147 = QueryDef(
    "q147_ignore_nulls_locf",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          when(col("event_type") === "purchase", round(col("value"), 3)).as("pv"))
        .select(col("user_id"), col("event_id"),
          last(col("pv"), ignoreNulls = true).over(w).as("last_purchase_value"),
          first(col("pv"), ignoreNulls = true).over(w).as("first_purchase_value"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""WITH s AS (SELECT user_id, event_id, ts,
          CASE WHEN event_type = 'purchase' THEN round(value, 3) ELSE NULL END AS pv
        FROM events)
      SELECT user_id, event_id,
        last_value(pv IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value,
        first_value(pv IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_purchase_value
      FROM s ORDER BY user_id, event_id"""),
    doc = "IGNORE NULLS last/first_value forward-fill (LOCF) over sparse signals")

  // --------------------------------------------------------------- q159
  /** NTILE decile assignment + per-decile census — the equi-DEPTH
    * complement of q152's equi-width histogram (each bucket holds the
    * same row count; boundaries move with the data). (value, key)
    * ordering makes tile assignment deterministic; cents-rounded bounds
    * keep the min/max columns integer-exact. */
  val q159 = QueryDef(
    "q159_ntile_deciles",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_acctbal"),
          ntile(10).over(w).cast("long").as("decile"))
        .groupBy(col("c_mktsegment"), col("decile"))
        .agg(count(lit(1)).as("n"),
          min(round(col("c_acctbal") * 100)).cast("long").as("lo_cents"),
          max(round(col("c_acctbal") * 100)).cast("long").as("hi_cents"))
        .orderBy(col("c_mktsegment"), col("decile"))
    },
    Some("""WITH t AS (SELECT c_mktsegment, c_custkey, c_acctbal,
          ntile(10) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer)
      SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile, count(*) AS n,
        CAST(min(round(c_acctbal*100)) AS BIGINT) AS lo_cents,
        CAST(max(round(c_acctbal*100)) AS BIGINT) AS hi_cents
      FROM t GROUP BY c_mktsegment, decile ORDER BY c_mktsegment, decile"""),
    doc = "equi-depth deciles via ntile; integer-cent bucket bounds")

  // --------------------------------------------------------------- q160
  /** Cumulative-unique growth curve: daily new users (first-seen day)
    * and the running total of distinct users ever seen — THE adoption
    * chart, computed without any daily re-distinct: one groupBy collapses
    * each user to a first-seen day, a tiny per-day agg counts arrivals,
    * and a prefix sum over the bounded day dimension accumulates. At
    * 100 TB the only corpus-sized shuffle is the user-level min — the
    * cumulative pass runs over |days| rows. */
  val q160 = QueryDef(
    "q160_growth_curve",
    (s, d) => {
      val firsts = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
        .groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
      firsts.groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).as("new_users"))
        .select(col("day"), col("new_users"),
          sum(col("new_users"))
            .over(BoundedWindow.over(col("day")).orderBy(col("day"))).as("cumulative_users"))
        .orderBy(col("day"))
    },
    Some("""WITH firsts AS (SELECT user_id,
          CAST(min(date_trunc('day', ts)) AS DATE) AS first_day
        FROM events GROUP BY user_id),
      daily AS (SELECT first_day AS day, count(*) AS new_users
        FROM firsts GROUP BY first_day)
      SELECT day, new_users,
        CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cumulative_users
      FROM daily ORDER BY day"""),
    doc = "daily new + cumulative distinct users; one user-level shuffle, day-sized prefix sum")

  // --------------------------------------------------------------- q161
  /** String-function breadth II — translate, reverse, repeat, lpad,
    * split_part — the second tranche of the F12-class scalar surface
    * (q71 covered trim/case/substr/concat). Pure per-row projection. */
  val q161 = QueryDef(
    "q161_string_surface2",
    (s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("t"),
          lower(col("c_mktsegment")).as("ic"),
          reverse(col("c_mktsegment")).as("rev"),
          repeat(substring(col("c_mktsegment"), 1, 2), 2).as("rep"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("pad"),
          split_part(col("c_name"), lit("#"), lit(2)).as("name_num"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS t,
        lower(c_mktsegment) AS ic,
        reverse(c_mktsegment) AS rev,
        repeat(substr(c_mktsegment, 1, 2), 2) AS rep,
        lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
        split_part(c_name, '#', 2) AS name_num
      FROM customer ORDER BY c_custkey"""),
    doc = "translate/reverse/repeat/lpad/split_part scalar breadth")

  // --------------------------------------------------------------- q162
  /** Date-function breadth II — last_day, add_months (with month-end
    * clamping), date_add, datediff, quarter truncation — the calendar
    * arithmetic tranche beyond q70's formatting/truncation coverage.
    * Both engines clamp month addition at month ends, pinned by the
    * hash over every order date. */
  val q162 = QueryDef(
    "q162_date_surface2",
    (s, d) => {
      val dt = col("o_orderdate").cast("date")
      Tables.orders(s, d)
        .select(col("o_orderkey"), dt.as("d"),
          last_day(dt).as("month_end"),
          add_months(dt, 3).as("plus3m"),
          date_add(dt, 45).as("plus45d"),
          datediff(lit("1998-12-31").cast("date"), dt).cast("long").as("days_to_end"),
          date_trunc("quarter", dt).cast("date").as("qtr"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        last_day(CAST(o_orderdate AS DATE)) AS month_end,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE) AS plus45d,
        date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_end,
        CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr
      FROM orders ORDER BY o_orderkey"""),
    doc = "last_day/add_months/date_add/datediff/quarter calendar arithmetic")

  // --------------------------------------------------------------- q169
  /** dense_rank tie semantics made observable: top-3 RANKS (not rows)
    * of order-count buckets per priority, with the tie width at each
    * rank — the "keep everything tied at rank k" contract row_number
    * cannot express (q13's top-k drops ties arbitrarily; dense_rank
    * keeps them all and numbers ranks gaplessly). */
  val q169 = QueryDef(
    "q169_dense_rank_ties",
    (s, d) => {
      val r = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), (col("o_custkey") % 50).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("n").desc)
      r.withColumn("dr", dense_rank().over(w).cast("long"))
        .filter(col("dr") <= 3)
        .groupBy(col("o_orderpriority"), col("dr"))
        .agg(count(lit(1)).as("n_tied"), min(col("n")).as("n_orders"))
        .orderBy(col("o_orderpriority"), col("dr"))
    },
    Some("""WITH r AS (SELECT o_orderpriority, o_custkey % 50 AS bucket, count(*) AS n
        FROM orders GROUP BY 1, 2),
      rk AS (SELECT *, dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY n DESC) AS dr
        FROM r)
      SELECT o_orderpriority, CAST(dr AS BIGINT) AS dr, CAST(count(*) AS BIGINT) AS n_tied,
        CAST(min(n) AS BIGINT) AS n_orders
      FROM rk WHERE dr <= 3 GROUP BY 1, 2 ORDER BY 1, 2"""),
    doc = "gapless rank top-k keeping ALL ties; tie-width census per rank")

  // --------------------------------------------------------------- q170
  /** Explicit GROUPING SETS — arbitrary aggregation lattices beyond
    * q18-q20's rollup/cube prefixes: two 2-d cells that share one
    * dimension, a 1-d marginal, and the grand total, in one pass.
    * Catalyst expands the sets over a single shuffle (Expand + one
    * aggregate), which is exactly the 100 TB-friendly plan vs running
    * four separate aggregations over the fact table. */
  val q170 = QueryDef(
    "q170_grouping_sets",
    (s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"),
          col("l_quantity"))
        .createOrReplaceTempView("l_gs")
      s.sql("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
          COALESCE(l_linestatus, 'ALL') AS ls,
          COALESCE(CAST(ship_month AS STRING), 'ALL') AS ship_month,
          count(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM l_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag, ship_month),
                                (ship_month), ())
        ORDER BY rf, ls, ship_month""")
    },
    Some("""WITH l AS (SELECT l_returnflag, l_linestatus,
          CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month, l_quantity FROM lineitem)
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        COALESCE(l_linestatus, 'ALL') AS ls,
        COALESCE(CAST(ship_month AS VARCHAR), 'ALL') AS ship_month,
        count(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM l
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag, ship_month),
                              (ship_month), ())
      ORDER BY rf, ls, ship_month"""),
    doc = "arbitrary aggregation lattice in one Expand pass; beyond rollup/cube prefixes")

  // --------------------------------------------------------------- q178
  /** SQL-surface III: `GROUP BY ALL` (group by every non-aggregate
    * select item — the analyst shorthand both engines support) combined
    * with the per-aggregate `FILTER (WHERE ...)` clause (SQL:2003's
    * conditional aggregation — the declarative form of
    * sum(CASE WHEN ...)). Both run through spark.sql over the
    * registered views, proving the SQL front-end parses the modern
    * surface, not just the classic one; decimal accumulators keep the
    * money columns engine-exact. */
  val q178 = QueryDef(
    "q178_groupby_all_filter",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT l_returnflag, l_linestatus,
          count(*) AS n,
          count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_rev,
          CAST(min(l_shipdate) FILTER (WHERE l_quantity > 45) AS STRING) AS first_bulk_ship
        FROM lineitem_v
        GROUP BY ALL
        ORDER BY l_returnflag, l_linestatus""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
        count(*) AS n,
        count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
          FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_rev,
        CAST(min(l_shipdate) FILTER (WHERE l_quantity > 45) AS VARCHAR) AS first_bulk_ship
      FROM lineitem
      GROUP BY ALL
      ORDER BY l_returnflag, l_linestatus"""),
    doc = "GROUP BY ALL + per-aggregate FILTER clause through the SQL front-end")

  // ---------------------------------------------------------------- q195
  /** ANALYZE TABLE-equivalent column statistics in ONE pass — the numbers
    * a cost-based optimizer (and every capacity plan) runs on: per column,
    * non-null count, exact NDV, min/max, and mean serialized width. All 25
    * aggregates (5 columns × 5 stats) ride a single aggregation; Spark
    * plans the multi-distinct via one Expand (5× map-side row fan-out,
    * each carrying one column — the standard multi-distinct shape, no
    * second scan of the table). `stack` unpivots the 1-row result into the
    * per-column catalog layout. At 100 TB this is the pattern for stats
    * refresh after ingest: one pass, no joins, output KB-sized. NDV here
    * is exact (count_distinct through the Expand); q93's HLL form is the
    * sub-linear-memory alternative when 2^lgK buckets beat exact sets.
    * min/max are computed natively and cast to string for the uniform
    * catalog schema; avg_len is the mean string-serialized width (decimal
    * accumulator ⇒ engine-exact), guarded to NULL for an all-null column
    * (n_nonnull = 0) instead of dividing by zero — the same NULL DuckDB
    * produces from the NULL sum. */
  val q195 = QueryDef(
    "q195_column_stats",
    (s, d) => {
      def statsFor(c: String): Seq[Column] = Seq(
        count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"),
        when(count(col(c)) > 0,
          round(sum(length(col(c).cast("string"))
              .cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double")
            / count(col(c)), 6)).as(s"len_$c"))
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val aggd = Tables.documents(s, d)
        .agg(count(lit(1)).as("n_rows"), cols.flatMap(statsFor): _*)
      aggd.select(col("n_rows"), expr(s"""stack(${cols.length}, ${cols.map(c =>
          s"'$c', cnt_$c, ndv_$c, min_$c, max_$c, len_$c").mkString(", ")})
          AS (column_name, n_nonnull, ndv, min_value, max_value, avg_len)"""))
        .select(col("column_name"), col("n_rows"), col("n_nonnull"),
          col("ndv"), col("min_value"), col("max_value"), col("avg_len"))
        .orderBy(col("column_name"))
    },
    Some("""WITH s AS (SELECT
        (SELECT COUNT(*) FROM documents) AS n_rows, c.* FROM (
        SELECT 'doc_id' AS column_name, COUNT(doc_id) AS n_nonnull,
          COUNT(DISTINCT doc_id) AS ndv, CAST(MIN(doc_id) AS VARCHAR) AS min_value,
          CAST(MAX(doc_id) AS VARCHAR) AS max_value,
          round(CAST(SUM(CAST(length(CAST(doc_id AS VARCHAR)) AS DECIMAL(18,2))) AS DOUBLE)
            / COUNT(doc_id), 6) AS avg_len FROM documents
        UNION ALL
        SELECT 'text', COUNT(text), COUNT(DISTINCT text), CAST(MIN(text) AS VARCHAR),
          CAST(MAX(text) AS VARCHAR),
          round(CAST(SUM(CAST(length(text) AS DECIMAL(18,2))) AS DOUBLE) / COUNT(text), 6)
        FROM documents
        UNION ALL
        SELECT 'lang', COUNT(lang), COUNT(DISTINCT lang), CAST(MIN(lang) AS VARCHAR),
          CAST(MAX(lang) AS VARCHAR),
          round(CAST(SUM(CAST(length(lang) AS DECIMAL(18,2))) AS DOUBLE) / COUNT(lang), 6)
        FROM documents
        UNION ALL
        SELECT 'source', COUNT(source), COUNT(DISTINCT source), CAST(MIN(source) AS VARCHAR),
          CAST(MAX(source) AS VARCHAR),
          round(CAST(SUM(CAST(length(source) AS DECIMAL(18,2))) AS DOUBLE) / COUNT(source), 6)
        FROM documents
        UNION ALL
        SELECT 'n_chars', COUNT(n_chars), COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR),
          CAST(MAX(n_chars) AS VARCHAR),
          round(CAST(SUM(CAST(length(CAST(n_chars AS VARCHAR)) AS DECIMAL(18,2))) AS DOUBLE)
            / COUNT(n_chars), 6) FROM documents) c)
      SELECT column_name, n_rows, n_nonnull, ndv, min_value, max_value, avg_len
      FROM s ORDER BY column_name"""),
    doc = "one-pass ANALYZE: per-column count/NDV/min/max/width via a single multi-distinct aggregation + stack unpivot")

  // ---------------------------------------------------------------- q206
  /** Spark 4 VARIANT type surface: `parse_json` materializes the props
    * payload as a VARIANT (the binary semi-structured type — parsed once,
    * typed access without re-tokenizing), `variant_get` extracts a typed
    * path. The rollup proves the extraction round-trips numerically (the
    * DuckDB oracle re-extracts with its native JSON path machinery).
    * VARIANT is the engine answer to "dynamic-schema columns at scale":
    * parse cost paid once at ingest, columnar-pushable access after. */
  val q206 = QueryDef(
    "q206_variant_json",
    (s, d) => Tables.events(s, d)
      .select(expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .groupBy(pmod(col("k"), lit(10)).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("bucket")),
    Some("""SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS bucket,
        COUNT(*) AS n,
        CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
        MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
      FROM events GROUP BY 1 ORDER BY bucket"""),
    doc = "VARIANT ingest + typed path extraction (parse_json/variant_get) vs native JSON-path oracle")

  // ---------------------------------------------------------------- q207
  /** SQL pipe syntax (Spark 4's `|>` operator chain — SPARK-49555): the
    * linear FROM → WHERE → AGGREGATE → ORDER BY dataflow form of a
    * classic rollup, proving the pipe front-end plans identically to the
    * declarative SQL the oracle runs. Decimal accumulator keeps the
    * revenue sum engine-exact. */
  val q207 = QueryDef(
    "q207_pipe_syntax",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""FROM lineitem_v
        |> WHERE l_quantity > 10
        |> AGGREGATE COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem WHERE l_quantity > 10
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
    doc = "SQL pipe syntax (|> WHERE/AGGREGATE/ORDER BY) plans identically to the declarative form")

  // ---------------------------------------------------------------- q208
  /** Collation-aware grouping (Spark 4 collations): a case-mixed key
    * column groups under UTF8_LCASE so case variants merge WITHOUT a
    * lower() rewrite — the collation rides the type, so every comparison
    * (joins, sorts, distinct) inherits it. The mixed-case input is
    * derived deterministically (even event_ids upper-case their type);
    * output keys are normalized through cast-to-binary-collation lower()
    * so the representative is engine-stable, and min(original) pins that
    * both variants really landed in one group. */
  val q208 = QueryDef(
    "q208_collated_grouping",
    (s, d) => {
      val mixed = Tables.events(s, d).select(
        when(pmod(col("event_id"), lit(2)) === 0, upper(col("event_type")))
          .otherwise(col("event_type")).as("et"))
      mixed.groupBy(expr("collate(et, 'UTF8_LCASE')").as("k"))
        .agg(count(lit(1)).as("n"), min(col("et")).as("first_variant"))
        .select(lower(col("k")).cast("string").as("event_type_ci"),
          col("n"), col("first_variant"))
        .orderBy(col("event_type_ci"))
    },
    Some("""WITH mixed AS (SELECT CASE WHEN event_id % 2 = 0
          THEN upper(event_type) ELSE event_type END AS et FROM events)
      SELECT lower(et) AS event_type_ci, COUNT(*) AS n, MIN(et) AS first_variant
      FROM mixed GROUP BY lower(et) ORDER BY event_type_ci"""),
    doc = "UTF8_LCASE collated group-by merges case variants without rewrites; representative normalized for the oracle")

  // ---------------------------------------------------------------- q211
  /** Relative-rank window functions (percent_rank / cume_dist) — the two
    * distribution-position primitives not yet on the surface (rank/
    * dense_rank/ntile are q13-q17/q159): percent_rank = (rank−1)/(n−1)
    * and cume_dist = |rows ≤ current|/n, both pure rational functions of
    * exact integers, rounded at 6 dp for the hash. Grouped per returnflag
    * over the discount domain (25 distinct values → a bounded census
    * output, not a row-per-lineitem dump). */
  val q211 = QueryDef(
    "q211_relative_rank",
    (s, d) => {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_discount"))
      Tables.lineitem(s, d).select(col("l_returnflag"), col("l_discount"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .groupBy(col("l_returnflag"), col("l_discount"))
        .agg(count(lit(1)).as("n"),
          round(min(col("pr")), 6).as("percent_rank"),
          round(max(col("cd")), 6).as("cume_dist"))
        .orderBy(col("l_returnflag"), col("l_discount"))
    },
    Some("""WITH r AS (SELECT l_returnflag, l_discount,
          PERCENT_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_discount) AS pr,
          CUME_DIST() OVER (PARTITION BY l_returnflag ORDER BY l_discount) AS cd
        FROM lineitem)
      SELECT l_returnflag, l_discount, COUNT(*) AS n,
        round(MIN(pr), 6) AS percent_rank, round(MAX(cd), 6) AS cume_dist
      FROM r GROUP BY 1, 2 ORDER BY l_returnflag, l_discount"""),
    doc = "percent_rank + cume_dist distribution positions; exact-ratio windows, bounded census output")

  val all: Seq[QueryDef] = Seq(
    q55, q56, q57, q58, q59, q60, q61, q62, q66, q67, q68, q69, q70, q71,
    q78, q79, q80, q81, q82, q83, q84, q85, q86, q87, q88, q97, q98, q99,
    q128, q129, q137, q139, q141, q142, q143, q144, q145, q146, q147, q159, q160,
    q161, q162, q169, q170, q178, q195, q206, q207, q208, q211)
}
