package graft.etl

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.EventFunctions._

/** Oracle-checked queries exercising the reference's ingest ETL surface
  * (SURVEY §2.A F-series + the insert-data hot path, db.clj:146-173).
  *
  * Design: the F-series functions are deterministic scalar transforms, so
  * each query computes them in Spark and the DuckDB oracle states the
  * *expected* value independently (literals or native DuckDB date/json
  * functions) — a cross-engine pin of the exact semantics, not a tautology.
  *
  * `events.ts` arrives as epoch-nanos (`ts_ns`, see Tables.events); the
  * reference's world is epoch-millis, so queries derive `ms = ts_ns div 1e6`
  * first — integer division, exact at any magnitude.
  *
  * Every query here is a narrow projection over one table: no shuffle except
  * the final agg/sort, filters pushed to the scan, fully codegen'd — the
  * per-record parse cost is the scale story, and it is embarrassingly
  * parallel over input splits.
  */
object EtlQueries {

  private def msCol = expr("ts_ns div 1000000")

  // ---------------------------------------------------------------- q31
  /** F4 hour truncation (utils.clj:51-63) + A1 count: events per type per
    * hour, hour as epoch-seconds of the hour start — the SURVEY §7.2
    * flagship shape. */
  val q31 = QueryDef(
    "q31_events_hourly",
    (s, d) => Tables.events(s, d)
      .groupBy(hourStartEpoch(msCol).as("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hour_epoch"), col("event_type")),
    Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type"""))

  // ---------------------------------------------------------------- q32
  /** F2 epoch→day string (utils.clj:32-35) pinned against DuckDB strftime. */
  val q32 = QueryDef(
    "q32_events_daily",
    (s, d) => Tables.events(s, d)
      .groupBy(epochToDay(msCol).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("day")),
    Some("""SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1 ORDER BY day"""))

  // ---------------------------------------------------------------- q33
  /** F7/F13 JSON path probe (get_json_object ≙ cheshire parse + get):
    * extract props.k, aggregate per event_type. */
  val q33 = QueryDef(
    "q33_json_extract",
    (s, d) => Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(json_extract_string(props, '$.k')) AS n_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------- q34
  /** F10 URL codec round-trip (utils.clj:79-85): decode(encode(x)) = x,
    * pinned by the oracle stating the identity directly. */
  val q34 = QueryDef(
    "q34_url_roundtrip",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), urlDecode(urlEncode(col("text"))).as("roundtrip"))
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, text AS roundtrip FROM documents ORDER BY doc_id"))

  // ---------------------------------------------------------------- q35
  /** F11+F12 line-format round-trip (core.clj:153 / utils.clj:17-19):
    * "<56-digit-seq> <payload>" formatted then split at the fixed offsets. */
  val q35 = QueryDef(
    "q35_line_roundtrip",
    (s, d) => {
      val e = Tables.events(s, d)
      val line = formatLine(lpad(col("event_id").cast("string"), 56, "0"), col("props"))
      e.select(
          lineSeqNumber(line).as("seq"),
          linePayload(line).as("payload"))
        .orderBy(col("seq"))
    },
    Some("""SELECT lpad(CAST(event_id AS VARCHAR), 56, '0') AS seq,
        props AS payload
      FROM events ORDER BY seq"""))

  // ---------------------------------------------------------------- q36
  /** F9 cookie parsing (db.clj:136-144) — pins every edge the reference's
    * implementation has: "; " separator trim, %-decoding, '=' in value
    * (limit-2 split), and malformed %-sequence → NULL (try_url_decode). */
  val q36 = QueryDef(
    "q36_cookie_parse",
    (s, d) => {
      val e = Tables.events(s, d)
      val cookie = concat(
        lit("uid="), col("user_id").cast("string"),
        lit("; sess=%2Fa%20b; theme=dark; q=a=b; bad=%zz"))
      val parsed = parseCookies(cookie)
      e.select(
          col("event_id"),
          element_at(parsed, "uid").as("uid_val"),
          element_at(parsed, "sess").as("sess_val"),
          element_at(parsed, "theme").as("theme_val"),
          element_at(parsed, "q").as("q_val"),
          element_at(parsed, "bad").as("bad_val"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, CAST(user_id AS VARCHAR) AS uid_val,
        '/a b' AS sess_val, 'dark' AS theme_val, 'a=b' AS q_val,
        CAST(NULL AS VARCHAR) AS bad_val
      FROM events ORDER BY event_id"""))

  // ---------------------------------------------------------------- q37
  /** The full insert-data hot path (db.clj:146-173) end-to-end: build the
    * reference's two-level JSON envelope from events columns, run it through
    * EventPipeline.parse (from_json ×2, cookie map, UTM extraction, JSON
    * re-serialization), and check the extracted fields against the oracle's
    * direct computation — a lossless round-trip proof of the parse.
    *
    * Execution shape (the q103 lesson applied to JSON): the Jackson
    * work is CPU-bound on byte-small rows, so parallelism must not
    * follow input size — the 4 source columns are range-spread over an
    * EXPLICIT partition count and sorted BEFORE the envelope is built,
    * and the build+parse runs as an order-preserving projection above
    * the sort: executed once (an `orderBy` above it would re-run the
    * whole chain for range-boundary sampling) on every core (the raw
    * scan alone is a single ~10 MB split). Measured 5.3 s → sub-second
    * at sf0.1; the per-row JSON cost itself is the documented intrinsic
    * floor. */
  val q37 = QueryDef(
    "q37_events_parse",
    (s, d) => {
      val n = s.conf.get("spark.sql.shuffle.partitions").toInt
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("user_id"), col("ts_ns"))
        .repartitionByRange(n, col("event_id"))
        .sortWithinPartitions(col("event_id"))
      val tMs = expr("ts_ns div 1000000")
      val inner = to_json(struct(
        map(lit("utm_source"), col("event_type"),
            lit("utm_campaign"), concat(lit("camp-"), col("user_id").cast("string"))).as("args"),
        lit("/track").as("path"),
        struct(
          concat(lit("10.0.0."), pmod(col("user_id"), lit(255)).cast("string")).as("X-Forward-For"),
          concat(lit("UA-"), col("event_type")).as("User-Agent"),
          lit("example.com").as("Host"),
          concat(lit("uid="), col("user_id").cast("string")).as("Cookie")).as("headers"),
        col("event_id").cast("string").as("id"),
        concat(lit("http://example.com/e/"), col("event_id").cast("string")).as("url"),
        tMs.as("t")))
      val data = to_json(struct(
        (tMs + lit(5L)).as("epoch"),
        inner.as("body")))
      val raw = e.select(
        lpad(col("event_id").cast("string"), 56, "0").as("sequenceNumber"),
        data.as("data"))
      // already globally ordered: range partitions on event_id + in-
      // partition sort below, and lpad/id is order-preserving — a final
      // orderBy here would only re-execute the JSON chain for sampling
      EventPipeline.parse(raw)
        .select(col("id"), col("ts"), col("received_at"), col("url"),
          col("utm_source"), col("utm_campaign"), col("cookies"),
          col("ip"), col("user_agent"))
    },
    Some("""SELECT lpad(CAST(event_id AS VARCHAR), 56, '0') AS id,
        epoch_ms(epoch_ns(ts) // 1000000) AS ts,
        epoch_ms((epoch_ns(ts) // 1000000) + 5) AS received_at,
        'http://example.com/e/' || event_id AS url,
        event_type AS utm_source,
        'camp-' || user_id AS utm_campaign,
        '{"uid":"' || user_id || '"}' AS cookies,
        '10.0.0.' || (user_id % 255) AS ip,
        'UA-' || event_type AS user_agent
      FROM events ORDER BY id"""))

  // ---------------------------------------------------------------- q65
  /** Dead-letter audit: count records whose JSON payload fails to parse,
    * per event_type. Corruption is synthesized deterministically (every
    * 10th event gets trailing garbage); Spark detects failure as
    * from_json → NULL (safe-parse semantics, utils.clj:65-71), DuckDB as
    * NOT json_valid — two independent definitions of "malformed" that
    * must agree. This is the counting half of a dead-letter-queue path:
    * in production the same predicate routes rows to a quarantine sink. */
  val q65 = QueryDef(
    "q65_malformed_audit",
    (s, d) => {
      // corruption is PREFIX garbage: Spark's Jackson tolerates trailing
      // junk after a complete value, so a suffix would not be "malformed"
      // to from_json while json_valid rejects it — prefix breaks both
      val mangled = when(pmod(col("event_id"), lit(10)) === 0,
        concat(lit("///"), col("props"))).otherwise(col("props"))
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(mangled, org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)).isNull.as("bad"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("bad"), 1)).as("n_malformed"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n_total,
        count(*) FILTER (NOT json_valid(
          CASE WHEN event_id % 10 = 0 THEN '///' || props ELSE props END)) AS n_malformed
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // --------------------------------------------------------------- q176
  /** URL canonicalization + dedup census — the crawl-side normalizer
    * that precedes any URL-keyed dedup or frontier: lowercase the
    * scheme/host, drop the fragment, strip tracking (`utm_*`) query
    * params, sort the surviving params, and strip a trailing slash —
    * then count how many raw variants collapse into each canonical URL.
    * Dirty variants are synthesized deterministically from events
    * columns (case-mangled host on every 2nd row, fragment on every
    * 3rd, utm noise on all — the real-world re-crawl mechanics), so the
    * oracle checks the canonicalizer, not a fixture file.
    *
    * Scale shape: per-row string kernel (split/filter/sort over the
    * param list — bounded, tiny arrays), then one census agg keyed by
    * the canonical string. The variants-per-canonical census is exactly
    * the skew diagnostic a URL-keyed shuffle needs before it runs. */
  val q176 = QueryDef(
    "q176_url_canonicalize",
    (s, d) => {
      val e = Tables.events(s, d)
      val host = when(col("event_id") % 2 === 0, "Example.COM").otherwise("example.com")
      val frag = when(col("event_id") % 3 === 0, "#section-2").otherwise("")
      val dirty = concat(
        when(col("event_id") % 2 === 0, "HTTP://").otherwise("http://"), host,
        lit("/p/"), pmod(col("event_id"), lit(40)).cast("string"),
        when(col("event_id") % 5 === 0, "/").otherwise(""),
        lit("?utm_source="), col("event_type"),
        lit("&z="), pmod(col("user_id"), lit(3)).cast("string"),
        lit("&utm_campaign=c"), pmod(col("user_id"), lit(7)).cast("string"),
        lit("&a="), pmod(col("event_id"), lit(2)).cast("string"),
        frag)
      val noFrag = regexp_replace(dirty, "#.*$", "")
      val base = lower(regexp_extract(noFrag, "^([^?]*)", 1))
      val query = regexp_extract(noFrag, "\\?(.*)$", 1)
      val keptParams = array_join(
        array_sort(filter(split(query, "&"), p => !p.startsWith("utm_"))), "&")
      val canonical = concat(
        regexp_replace(base, "/$", ""),
        when(length(keptParams) > 0, concat(lit("?"), keptParams)).otherwise(lit("")))
      e.select(dirty.as("raw_url"), canonical.as("url"))
        .groupBy(col("url"))
        .agg(count(lit(1)).as("n_hits"),
          countDistinct(col("raw_url")).as("n_variants"))
        .orderBy(col("url"))
    },
    Some("""WITH dirty AS (SELECT
        (CASE WHEN event_id % 2 = 0 THEN 'HTTP://' ELSE 'http://' END)
          || (CASE WHEN event_id % 2 = 0 THEN 'Example.COM' ELSE 'example.com' END)
          || '/p/' || CAST(event_id % 40 AS VARCHAR)
          || (CASE WHEN event_id % 5 = 0 THEN '/' ELSE '' END)
          || '?utm_source=' || event_type
          || '&z=' || CAST(user_id % 3 AS VARCHAR)
          || '&utm_campaign=c' || CAST(user_id % 7 AS VARCHAR)
          || '&a=' || CAST(event_id % 2 AS VARCHAR)
          || (CASE WHEN event_id % 3 = 0 THEN '#section-2' ELSE '' END) AS raw_url
        FROM events),
      canon AS (SELECT raw_url,
        regexp_replace(lower(regexp_extract(regexp_replace(raw_url, '#.*$', ''),
            '^([^?]*)', 1)), '/$', '')
        || (CASE WHEN len(list_filter(string_split(
              regexp_extract(regexp_replace(raw_url, '#.*$', ''), '\?(.*)$', 1),
              '&'), p -> NOT starts_with(p, 'utm_'))) > 0
            THEN '?' || array_to_string(list_sort(list_filter(string_split(
              regexp_extract(regexp_replace(raw_url, '#.*$', ''), '\?(.*)$', 1),
              '&'), p -> NOT starts_with(p, 'utm_'))), '&')
            ELSE '' END) AS url
        FROM dirty)
      SELECT url, count(*) AS n_hits,
        CAST(count(DISTINCT raw_url) AS BIGINT) AS n_variants
      FROM canon GROUP BY url ORDER BY url"""),
    doc = "URL canonicalizer (case/fragment/utm/trailing-slash) + variant-collapse census")

  // ---------------------------------------------------------------- q201
  /** Data-contract validation (the expectations/quality-gate census a
    * pipeline runs before promoting a batch): uniqueness, nullability,
    * domain, range, and cross-table referential integrity, each reported
    * as (rule, n_checked, n_violations, pass). The five events-table rules
    * ride ONE aggregation pass (q195's fuse-then-stack shape: no rule
    * re-scans the table); the foreign-key rule is a broadcast-able
    * left-anti count. At 100 TB this is the cheapest possible gate — a
    * scan-side census with a KB-sized result — and a failed `pass` is what
    * flips a batch to quarantine instead of publish (the F7 dead-letter
    * ethos applied table-wide). */
  val q201 = QueryDef(
    "q201_data_contract",
    (s, d) => {
      val e = Tables.events(s, d)
      val lo = 19723L * 86400000000000L  // 2024-01-01
      val hi = 19875L * 86400000000000L  // 2024-06-01
      val fused = e.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(col("event_id"))).as("v_unique"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("v_null"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("v_neg"),
        sum(when(!col("event_type").isin("view", "click", "purchase", "signup", "error"),
          1L).otherwise(0L)).as("v_domain"),
        sum(when(col("ts_ns") < lo || col("ts_ns") >= hi, 1L).otherwise(0L)).as("v_range"))
      val eventRules = fused.select(expr("""stack(5,
          '1_event_id_unique',   n_rows, v_unique,
          '2_user_id_not_null',  n_rows, v_null,
          '3_value_non_negative',n_rows, v_neg,
          '4_event_type_domain', n_rows, v_domain,
          '5_ts_in_range',       n_rows, v_range)
          AS (rule, n_checked, n_violations)"""))
      val orders = Tables.orders(s, d)
      val fk = orders.join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .crossJoin(broadcast(orders.agg(count(lit(1)).as("n_checked"))))
        .select(lit("6_orders_customer_fk").as("rule"),
          col("n_checked"), col("n_violations"))
      eventRules.unionByName(fk)
        .select(col("rule"), col("n_checked"), col("n_violations"),
          (col("n_violations") === 0L).as("pass"))
        .orderBy(col("rule"))
    },
    Some("""WITH ev AS (SELECT COUNT(*) AS n_rows,
          COUNT(*) - COUNT(DISTINCT event_id) AS v_unique,
          CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
          CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_neg,
          CAST(SUM(CASE WHEN event_type NOT IN
            ('view','click','purchase','signup','error') THEN 1 ELSE 0 END) AS BIGINT) AS v_domain,
          CAST(SUM(CASE WHEN epoch_ns(ts) < 19723 * 86400000000000
            OR epoch_ns(ts) >= 19875 * 86400000000000 THEN 1 ELSE 0 END) AS BIGINT) AS v_range
        FROM events),
      rules AS (
        SELECT '1_event_id_unique' AS rule, n_rows AS n_checked, v_unique AS n_violations FROM ev
        UNION ALL SELECT '2_user_id_not_null', n_rows, v_null FROM ev
        UNION ALL SELECT '3_value_non_negative', n_rows, v_neg FROM ev
        UNION ALL SELECT '4_event_type_domain', n_rows, v_domain FROM ev
        UNION ALL SELECT '5_ts_in_range', n_rows, v_range FROM ev
        UNION ALL SELECT '6_orders_customer_fk',
          (SELECT COUNT(*) FROM orders),
          (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)))
      SELECT rule, n_checked, n_violations, n_violations = 0 AS pass
      FROM rules ORDER BY rule"""),
    doc = "expectations gate: uniqueness/null/domain/range fused into one pass + FK anti-join; pass/fail per rule")

  val all: Seq[QueryDef] = Seq(q31, q32, q33, q34, q35, q36, q37, q65, q176, q201)
}
