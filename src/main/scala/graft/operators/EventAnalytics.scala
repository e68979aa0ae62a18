package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.{QueryDef, Tables}

/** Event-analytics tier over the events table: the product-analytics
  * queries the reference's Postgres sink exists to serve (its events table,
  * /root/reference/README.md:68-71, feeds exactly this class of dashboard
  * SQL) — an ordered conversion funnel and weekly cohort retention.
  * Both are integer-exact (counts, date arithmetic) so the DuckDB oracle
  * hash-matches. events.ts is microsecond-granular in the test corpus
  * (verified: zero sub-µs values), so Spark's TIMESTAMP(MICROS) strict
  * inequalities agree with DuckDB's nanosecond reads. */
object EventAnalytics {

  // --------------------------------------------------------------- q117
  /** Ordered conversion funnel view → click → purchase: a user counts at a
    * stage only with a STRICTLY LATER event than their entry to the
    * previous stage (min-ts semantics, the standard product-analytics
    * definition — not a mere type-presence count).
    *
    * Scale shape: three passes, each a pushed-down event_type filter (only
    * that type's rows leave the scan) then an agg + equi-join keyed on
    * user_id. The agg output and the next join share the user_id
    * partitioning, so Catalyst reuses the Exchange rather than
    * re-shuffling; stage populations shrink monotonically so each
    * successive join is smaller. No windows, no full-table sort. */
  /** The funnel's stage pipeline over any (user_id, event_type, ts) frame —
    * factored out so CurationSpec can drive it with adversarial event
    * orderings the driver corpus can't produce. Returns one frame per
    * stage keyed by user_id with that stage's entry timestamp. */
  def funnelStages(ev: org.apache.spark.sql.DataFrame,
      stages: Seq[String]): Seq[org.apache.spark.sql.DataFrame] =
    stages.tail.scanLeft(
      ev.filter(col("event_type") === stages.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("entry_ts"))) { (prev, st) =>
      ev.filter(col("event_type") === st)
        .join(prev, "user_id").filter(col("ts") > col("entry_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("entry_ts"))
    }

  val q117 = QueryDef(
    "q117_funnel",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val Seq(v, c, p) = funnelStages(ev, Seq("view", "click", "purchase"))
      v.agg(count(lit(1)).as("users")).select(lit("1_view").as("stage"), col("users"))
        .unionByName(c.agg(count(lit(1)).as("users"))
          .select(lit("2_click").as("stage"), col("users")))
        .unionByName(p.agg(count(lit(1)).as("users"))
          .select(lit("3_purchase").as("stage"), col("users")))
        .orderBy(col("stage"))
    },
    Some("""WITH v AS (SELECT user_id, min(ts) AS tv FROM events
               WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
              JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
              JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)
      SELECT '1_view' AS stage, count(*) AS users FROM v
      UNION ALL SELECT '2_click', count(*) FROM c
      UNION ALL SELECT '3_purchase', count(*) FROM p
      ORDER BY stage"""),
    doc = "strict-ordering funnel; per-stage Exchange reuse on user_id")

  // --------------------------------------------------------------- q118
  /** Weekly cohort retention: users grouped by the ISO week of their first
    * event; active_users counts users from cohort w active in week
    * w + offset. Week arithmetic is pure integer date math
    * (date_trunc('week') → Monday in both engines; offset =
    * datediff-days div 7 — exact on the aligned Mondays).
    *
    * Scale shape: one (user, week) distinct (shuffle on user_id+week),
    * one first-week agg (shuffle on user_id), then an equi-join on
    * user_id that reuses the agg's partitioning; the final (cohort,
    * offset) agg is over weeks² keys — tiny. The (user, week) distinct
    * makes the final count(*) a distinct-user count without a
    * count_distinct buffer. */
  val q118 = QueryDef(
    "q118_cohort_retention",
    (s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val cohort = act.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
      act.join(cohort, "user_id")
        .select(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("long").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("active_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""WITH act AS (SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      cohort AS (SELECT user_id, min(wk) AS cohort_week FROM act GROUP BY user_id)
      SELECT c.cohort_week,
        CAST(date_diff('day', c.cohort_week, a.wk) // 7 AS BIGINT) AS week_offset,
        count(*) AS active_users
      FROM act a JOIN cohort c USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""),
    doc = "weekly cohort retention; integer week math, Exchange reuse on user_id")

  // --------------------------------------------------------------- q126
  /** Event-transition (Markov) matrix: for each user's event sequence
    * ordered by (ts, event_id) — event_id breaks timestamp ties so both
    * engines see the SAME sequence — count (prev → next) transitions and
    * each row's share of its prev-type total. The share is a single IEEE
    * division of two exact integers, so it is bit-identical cross-engine.
    *
    * Scale shape: one shuffle on user_id for the lead() window (users are
    * independent — no global sort), then a tiny (|types|²) pair agg and a
    * broadcast of the |types|-row totals. */
  val q126 = QueryDef(
    "q126_event_transitions",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .select(col("event_type").as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
        .groupBy(col("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy(col("prev_type")).agg(sum(col("n")).as("n_prev"))
      pairs.join(broadcast(tot), "prev_type")
        .select(col("prev_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("n_prev"), 6).as("p"))
        .orderBy(col("prev_type"), col("next_type"))
    },
    Some("""WITH seq AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events),
      pairs AS (SELECT event_type AS prev_type, next_type, count(*) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT prev_type, sum(n) AS n_prev FROM pairs GROUP BY prev_type)
      SELECT p.prev_type, p.next_type, p.n,
        round(p.n::DOUBLE / t.n_prev, 6) AS p
      FROM pairs p JOIN tot t USING (prev_type)
      ORDER BY prev_type, next_type"""),
    doc = "per-user Markov transition counts + exact-integer-ratio probabilities")

  // --------------------------------------------------------------- q127
  /** Anomalous-volume days: flag days whose event count sits more than
    * 2σ from that type's daily mean — with the z-test done in EXACT
    * integer algebra so the verdict is engine-independent. With n days,
    * S = Σc, Q = Σc²: |c − S/n| > 2σ_pop  ⇔  (n·c − S)² > 4·(n·Q − S²).
    * Counts are integers, so both sides are exact BIGINTs (at 100 TB
    * volumes promote to DECIMAL(38,0) — the comparison stays exact); no
    * float mean/stddev ever feeds the flag (same scaled-integer trick as
    * q114's PMI ranking and q119's budgets).
    *
    * Scale shape: daily-count agg (the only big shuffle, map-side
    * combined), |types|-row stats agg, broadcast back. */
  val q127 = QueryDef(
    "q127_volume_outliers",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("c"))
      val stats = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("sq"))
      daily.join(broadcast(stats), "event_type")
        .select(col("event_type"), col("day"), col("c"),
          ((col("n") * col("c") - col("s")) * (col("n") * col("c") - col("s"))
            > (col("n") * col("sq") - col("s") * col("s")) * 4).as("is_outlier"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
          count(*) AS c FROM events GROUP BY 1, 2),
      stats AS (SELECT event_type, count(*) AS n, sum(c) AS s, sum(c*c) AS sq
        FROM daily GROUP BY event_type)
      SELECT d.event_type, d.day, d.c,
        ((s.n * d.c - s.s) * (s.n * d.c - s.s) > 4 * (s.n * s.sq - s.s * s.s)) AS is_outlier
      FROM daily d JOIN stats s USING (event_type)
      ORDER BY event_type, day"""),
    doc = "2-sigma daily-volume anomaly flags via exact scaled-integer z-test")

  // --------------------------------------------------------------- q136
  /** Gaps-and-islands → SCD2 intervals: collapse each user's consecutive
    * runs of the same event_type into validity intervals
    * [valid_from, valid_to) with a NULL-ended current row — the
    * slowly-changing-dimension build every warehouse runs over a change
    * stream. Run ids come from the classic pattern: flag change points
    * with lag(), then a running sum assigns island numbers.
    *
    * Scale shape: users are independent — both windows and the run
    * aggregation partition on user_id, so the whole query is ONE
    * user_id shuffle reused across window → agg → window (plus the
    * output sort). Tie-break (ts, event_id) makes run assignment
    * deterministic cross-engine. */
  val q136 = QueryDef(
    "q136_scd2_intervals",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val flagged = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
        .withColumn("run_id",
          sum(when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
            .otherwise(0L)).over(byUser))
      val runs = flagged.groupBy(col("user_id"), col("run_id"))
        .agg(min(col("event_type")).as("event_type"),
          min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      runs
        .withColumn("valid_to",
          lead(col("valid_from"), 1)
            .over(Window.partitionBy(col("user_id")).orderBy(col("run_id"))))
        .select(col("user_id"), col("run_id"), col("event_type"),
          col("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"), col("n_events"))
        .orderBy(col("user_id"), col("run_id"))
    },
    Some("""WITH ordered AS (SELECT user_id, event_type, ts, event_id,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events),
      flagged AS (SELECT user_id, event_type, ts,
          CAST(sum(CASE WHEN prev_type IS NULL OR prev_type != event_type THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
        FROM ordered),
      runs AS (SELECT user_id, run_id, min(event_type) AS event_type,
          min(ts) AS valid_from, count(*) AS n_events
        FROM flagged GROUP BY user_id, run_id),
      intervals AS (SELECT user_id, run_id, event_type, valid_from, n_events,
          lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to
        FROM runs)
      SELECT user_id, run_id, event_type, valid_from, valid_to,
        (valid_to IS NULL) AS is_current, n_events
      FROM intervals ORDER BY user_id, run_id"""),
    doc = "gaps-and-islands run collapse into SCD2 validity intervals; one user_id shuffle")

  // --------------------------------------------------------------- q138
  /** Time-weighted average (TWAP): each observation of `value` holds
    * until the next observation of the same event_type, so its weight is
    * that gap in microseconds — the standard fix for irregularly-spaced
    * metrics where a plain mean over-counts bursts. Determinism is the
    * decimal-accumulator convention (QueryDef.FloatNote) end to end:
    * value rounds once to DECIMAL(18,6) (same half-up in both engines —
    * q63's precedent), the µs gap is an exact BIGINT, their product and
    * sum are exact decimals, and the single final division runs in IEEE
    * doubles (gap totals < 2^53, exactly representable).
    *
    * Scale shape: one event_type window shuffle for lead(), then a tiny
    * per-type agg — partial aggregation collapses everything map-side. */
  val q138 = QueryDef(
    "q138_twap",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byT = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_type"), col("value"), col("ts"), col("event_id"))
        .withColumn("next_ts", lead(col("ts"), 1).over(byT))
        .filter(col("next_ts").isNotNull)
        .select(col("event_type"),
          (unix_micros(col("next_ts")) - unix_micros(col("ts"))).as("dt"),
          col("value").cast("decimal(18,6)").as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("v") * col("dt").cast("decimal(20,0)")).cast("double").as("wv"),
          sum(col("dt")).as("dt_total"))
        .select(col("event_type"), col("n_intervals"),
          round(col("wv") / col("dt_total").cast("double"), 6).as("twap"))
        .orderBy(col("event_type"))
    },
    Some("""WITH g AS (SELECT event_type,
          epoch_us(lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id))
            - epoch_us(ts) AS dt,
          CAST(value AS DECIMAL(18,6)) AS v
        FROM events)
      SELECT event_type, count(*) AS n_intervals,
        round(CAST(SUM(v * CAST(dt AS DECIMAL(20,0))) AS DOUBLE)
          / CAST(SUM(dt) AS DOUBLE), 6) AS twap
      FROM g WHERE dt IS NOT NULL
      GROUP BY event_type ORDER BY event_type"""),
    doc = "time-weighted average per type; decimal-exact value x microsecond weights")

  // --------------------------------------------------------------- q153
  /** Inter-event gap percentiles per type — p50/p90 of the microsecond
    * spacing between consecutive events, the latency-distribution view
    * of arrival behavior. Exact interpolated percentiles via q23's
    * boundary-rank method (rank arithmetic + one interpolation — never a
    * value-buffering percentile), over integer µs gaps. */
  val q153 = QueryDef(
    "q153_gap_percentiles",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byT = Window.partitionBy(col("event_type"))
      val gaps = Tables.events(s, d)
        .select(col("event_type"), col("ts"), col("event_id"))
        .withColumn("gap",
          unix_micros(col("ts")) - unix_micros(
            lag(col("ts"), 1).over(byT.orderBy(col("ts"), col("event_id")))))
        .filter(col("gap").isNotNull)
      val ps = Seq("p50_us" -> 0.5, "p90_us" -> 0.9)
      val ranked = gaps.select(col("event_type"), col("gap").cast("double").as("v"),
        row_number().over(byT.orderBy(col("gap"), col("event_id"))).as("rn"),
        count(lit(1)).over(byT).as("n"))
      def h(p: Double): Column = lit(1.0) + (col("n") - 1) * p
      val needed = ranked.filter(
        ps.map { case (_, p) => col("rn") === floor(h(p)) || col("rn") === ceil(h(p)) }
          .reduce(_ || _))
      val aggs = ps.flatMap { case (nm, p) => Seq(
        max(when(col("rn") === floor(h(p)), col("v"))).as(s"${nm}_lo"),
        max(when(col("rn") === ceil(h(p)), col("v"))).as(s"${nm}_hi"),
        max(h(p) - floor(h(p))).as(s"${nm}_f"))
      } :+ min(col("n")).as("n_gaps")
      needed.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
        .select(col("event_type") +: ps.map { case (nm, _) =>
          round(col(s"${nm}_lo") + col(s"${nm}_f") * (col(s"${nm}_hi") - col(s"${nm}_lo")), 4)
            .as(nm)
        } :+ col("n_gaps"): _*)
        .orderBy(col("event_type"))
    },
    Some("""WITH g AS (SELECT event_type, event_id,
          epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id)) AS gap
        FROM events)
      SELECT event_type,
        ROUND(QUANTILE_CONT(gap, 0.5), 4) AS p50_us,
        ROUND(QUANTILE_CONT(gap, 0.9), 4) AS p90_us,
        count(gap) AS n_gaps
      FROM g WHERE gap IS NOT NULL GROUP BY event_type ORDER BY event_type"""),
    doc = "p50/p90 inter-arrival gaps via q23 boundary-rank percentiles; integer µs")

  // --------------------------------------------------------------- q154
  /** Peak-burst detection: the densest 5-minute window per event type
    * (max count over a sliding interval RANGE frame) and when it first
    * peaked — capacity planning's "what's the worst burst" number.
    * Deterministic argmax: the earliest timestamp achieving the peak.
    * q137's incremental interval frame + a tiny max join-back. */
  val q154 = QueryDef(
    "q154_peak_burst",
    (s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events_v")
      s.sql("""WITH c AS (SELECT event_type, ts,
            count(*) OVER (PARTITION BY event_type ORDER BY ts
                           RANGE BETWEEN INTERVAL '5' MINUTE PRECEDING AND CURRENT ROW) AS n5
          FROM events_v),
        m AS (SELECT event_type, max(n5) AS peak_count FROM c GROUP BY event_type)
        SELECT c.event_type, min(m.peak_count) AS peak_count, min(c.ts) AS peak_at
        FROM c JOIN m ON c.event_type = m.event_type AND c.n5 = m.peak_count
        GROUP BY c.event_type ORDER BY c.event_type""")
    },
    Some("""WITH c AS (SELECT event_type, ts,
          count(*) OVER (PARTITION BY event_type ORDER BY ts
                         RANGE BETWEEN INTERVAL 5 MINUTE PRECEDING AND CURRENT ROW) AS n5
        FROM events),
      m AS (SELECT event_type, max(n5) AS peak_count FROM c GROUP BY event_type)
      SELECT c.event_type, min(m.peak_count) AS peak_count, min(c.ts) AS peak_at
      FROM c JOIN m ON c.event_type = m.event_type AND c.n5 = m.peak_count
      GROUP BY c.event_type ORDER BY c.event_type"""),
    doc = "densest sliding 5-min window per type; earliest-peak argmax, interval frame")

  // --------------------------------------------------------------- q168
  /** DAU / WAU stickiness: daily actives over trailing-7-day actives —
    * the engagement ratio on every product dashboard. Exact distincts
    * WITHOUT a sliding re-distinct per day: the corpus collapses once to
    * (user, day) pairs, each pair then contributes to the 7 days it
    * keeps a user "weekly active" (a 7-way generate, far smaller than
    * re-scanning events per window), and one distinct-agg per day
    * finishes it. Days outside the observed range drop out via the
    * final inner join. Output ratio is a single IEEE division of exact
    * integers. */
  val q168 = QueryDef(
    "q168_stickiness",
    (s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
      val wau = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("i")).as("day"))
        .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
        .orderBy(col("day"))
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
          CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
      contrib AS (SELECT user_id, day + CAST(i AS INTEGER) AS day
        FROM ud, range(0, 7) t(i)),
      wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM contrib GROUP BY day),
      dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day)
      SELECT d.day, d.dau, w.wau, round(d.dau::DOUBLE / w.wau, 6) AS stickiness
      FROM dau d JOIN wau w USING (day) ORDER BY d.day"""),
    doc = "DAU/WAU via (user, day) collapse + 7-way contribution explode; no re-distinct")

  // --------------------------------------------------------------- q179
  /** Event-time lateness census — the watermark-planning diagnostic: how
    * far events arrive behind their event time, per type, bucketed at
    * the candidate watermark horizons (10 s / 60 s). A streaming
    * deployment reads this off the batch log BEFORE picking
    * `withWatermark`: `n_beyond_60s` is exactly the data a 1-minute
    * watermark would drop. Lateness is synthesized deterministically
    * from event_id (the fixture's arrival channel carries a constant
    * +5 ms, which would make the census vacuous) — the synthesis is part
    * of the query contract on both engines, so the oracle checks the
    * bucketing machinery. Scan → per-row arithmetic → |types| agg: the
    * cheapest possible shape at any scale. */
  val q179 = QueryDef(
    "q179_lateness_census",
    (s, d) => {
      val lag = pmod(col("event_id") * 37, lit(120000L)) // 0..120s in ms
      Tables.events(s, d)
        .select(col("event_type"), lag.as("lag_ms"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          max(col("lag_ms")).as("max_lag_ms"),
          sum(when(col("lag_ms") <= 10000L, 1L).otherwise(0L)).as("n_within_10s"),
          sum(when(col("lag_ms") > 10000L && col("lag_ms") <= 60000L, 1L)
            .otherwise(0L)).as("n_10s_to_60s"),
          sum(when(col("lag_ms") > 60000L, 1L).otherwise(0L)).as("n_beyond_60s"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n_events,
        max((event_id * 37) % 120000) AS max_lag_ms,
        CAST(count(*) FILTER (WHERE (event_id * 37) % 120000 <= 10000) AS BIGINT)
          AS n_within_10s,
        CAST(count(*) FILTER (WHERE (event_id * 37) % 120000 > 10000
          AND (event_id * 37) % 120000 <= 60000) AS BIGINT) AS n_10s_to_60s,
        CAST(count(*) FILTER (WHERE (event_id * 37) % 120000 > 60000) AS BIGINT)
          AS n_beyond_60s
      FROM events GROUP BY event_type ORDER BY event_type"""),
    doc = "per-type lateness buckets at candidate watermark horizons; scan + tiny agg")

  // --------------------------------------------------------------- q180
  /** Join-key BLOWUP profiler — the pre-flight cost estimate for any
    * self-join on a candidate key: per user_id, the number of row pairs
    * a self-equi-join would produce (n·(n−1)/2), with each hot key's
    * share of the total pair work. The top keys are exactly where an
    * unprofiled sessionize/self-join melts down at 100 TB and where
    * salting (q63) or AQE skew handling must aim. Integer-exact pair
    * math in DECIMAL(38,0) (n² headroom), one count agg + a top-20
    * global sort-limit (TakeOrderedAndProject: bounded per-task heaps)
    * over |keys| rows. */
  val q180 = QueryDef(
    "q180_selfjoin_blowup",
    (s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("n"),
          expr("cast(n as decimal(38,0)) * (n - 1) div 2").as("n_pairs"))
      val total = counts.agg(sum(col("n_pairs")).as("total_pairs"))
      counts.crossJoin(broadcast(total))
        .select(col("user_id"), col("n"), col("n_pairs"),
          round(col("n_pairs").cast("double") / col("total_pairs"), 6).as("pair_share"))
        .orderBy(col("n_pairs").desc, col("user_id"))
        .limit(20)
    },
    Some("""WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
      p AS (SELECT user_id, n, CAST(n AS HUGEINT) * (n - 1) // 2 AS n_pairs FROM c),
      t AS (SELECT sum(n_pairs) AS total_pairs FROM p)
      SELECT user_id, n, CAST(n_pairs AS BIGINT) AS n_pairs,
        round(n_pairs::DOUBLE / total_pairs, 6) AS pair_share
      FROM p CROSS JOIN t
      ORDER BY n_pairs DESC, user_id LIMIT 20"""),
    doc = "per-key self-join pair counts + share: where salting/AQE must aim before a self-join")

  // ---------------------------------------------------------------- q191
  /** Last-touch marketing attribution — for every purchase, the most
    * recent preceding non-purchase event of the same user within a 7-day
    * lookback is the credited channel; purchases with no touch in the
    * window are 'direct'. This is the q147 LOCF shape (last_value IGNORE
    * NULLS over a sparse signal), not a join: one user_id window shuffle
    * carries the whole attribution, which is the 100 TB-right plan — an
    * as-of join formulation (q53's operator does apply) would shuffle both
    * event classes separately to achieve the same pairing. The carried
    * struct holds (touch ts, touch type) so the lookback window is
    * enforced on the carried row itself. Revenue sums go through the
    * decimal accumulator (engine-exact). */
  val q191 = QueryDef(
    "q191_last_touch_attribution",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), expr("ts_ns div 1000").as("ts_us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val tagged = e.withColumn("touch",
          when(col("event_type") =!= "purchase",
            struct(col("ts_us").as("t_ts"), col("event_type").as("t_type"))))
        .withColumn("lt", last(col("touch"), ignoreNulls = true).over(w))
      tagged.filter(col("event_type") === "purchase")
        .select(col("value"),
          when(col("lt").isNotNull
              && col("ts_us") - col("lt.t_ts") <= lit(7L * 86400000000L),
            col("lt.t_type")).otherwise(lit("direct")).as("channel"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("revenue"))
        .orderBy(col("channel"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type, value,
          epoch_us(ts) AS ts_us FROM events),
      tagged AS (SELECT *,
          last_value(CASE WHEN event_type <> 'purchase' THEN ts_us END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_ts,
          last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_type
        FROM e)
      SELECT CASE WHEN t_ts IS NOT NULL AND ts_us - t_ts <= 7 * 86400000000
          THEN t_type ELSE 'direct' END AS channel,
        COUNT(*) AS n_purchases,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM tagged WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY channel"""),
    doc = "last-touch attribution via LOCF window (7-day lookback); one user_id shuffle, no join")

  // ---------------------------------------------------------------- q192
  /** Incremental rollup maintenance (incremental view maintenance, the
    * batch form): the daily per-type rollup is maintained as MERGEABLE
    * partial aggregates — count, decimal sum, min/max, and an HLL user
    * sketch — so a new ingest batch updates the rollup by aggregating ONLY
    * the delta and merging partials (`sum` of counts/sums, `min`/`max` of
    * bounds, `hll_union_agg` of sketches). History is never rescanned:
    * at 100 TB the base partials are a keyed state table a few KB per
    * (type, day), and each batch's cost is O(delta). The query demonstrates
    * the contract by splitting events at a date boundary, building the two
    * partial sets independently, merging, and crossing the ORACLE against
    * the direct full-scan rollup — a broken merge (non-algebraic aggregate,
    * sketch mis-union) hash-fails. The distinct-user estimate is pinned
    * within 5% of the exact count (q93's bound convention). */
  val q192 = QueryDef(
    "q192_incremental_rollup",
    (s, d) => {
      val splitNs = 19746L * 86400000000000L // 2024-01-24T00:00Z
      val e = Tables.events(s, d).select(col("event_type"),
        expr("ts_ns div 86400000000000").as("dd"), col("value"), col("user_id"),
        (col("ts_ns") < lit(splitNs)).as("is_base"))
      def partials(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("event_type"), col("dd"))
          .agg(count(lit(1)).as("pn"),
            sum(col("value").cast(DecimalType(18, 2))).as("psum"),
            min(col("value")).as("pmin"), max(col("value")).as("pmax"),
            expr("hll_sketch_agg(user_id, 14)").as("psk"))
      val merged = partials(e.filter(col("is_base")))
        .unionByName(partials(e.filter(!col("is_base"))))
        .groupBy(col("event_type"), col("dd"))
        .agg(sum(col("pn")).as("n"),
          sum(col("psum")).cast("double").as("sum_value"),
          min(col("pmin")).as("min_value"), max(col("pmax")).as("max_value"),
          expr("hll_sketch_estimate(hll_union_agg(psk, false))").as("est_users"))
      val exact = e.groupBy(col("event_type"), col("dd"))
        .agg(countDistinct(col("user_id")).as("cd"))
      merged.join(exact, Seq("event_type", "dd"))
        .select(col("event_type"), col("dd"), col("n"), col("sum_value"),
          col("min_value"), col("max_value"),
          (abs(col("est_users") - col("cd")) <= col("cd") * 0.05).as("users_ok"))
        .orderBy(col("event_type"), col("dd"))
    },
    Some("""SELECT event_type, epoch_ns(ts) // 86400000000000 AS dd,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        MIN(value) AS min_value, MAX(value) AS max_value,
        TRUE AS users_ok
      FROM events GROUP BY 1, 2 ORDER BY event_type, dd"""),
    doc = "incremental view maintenance: delta-only partials merged into the rollup (algebraic + HLL union), oracle = full rescan")

  // ---------------------------------------------------------------- q198
  /** Robust outlier detection via median + MAD — the q127 z-test's
    * heavy-tail-safe sibling: mean/stddev move with the outliers they
    * hunt, median/MAD don't. Both medians are EXACT, computed the q23
    * boundary-rank way (spilling per-type window sort, then only the 1-2
    * middle-rank rows aggregate — never a value-buffering `percentile()`
    * state): pass 1 ranks values, pass 2 ranks absolute deviations from
    * the joined-back median. Flag = |v − med| > 3·1.4826·MAD (1.4826
    * rescales MAD to σ under normality). All comparisons run on raw
    * doubles that are bit-identical in both engines (selection + one
    * two-value average, no float accumulation); rounding only at output.
    * The oracle uses DuckDB's independent median() formulation. */
  val q198 = QueryDef(
    "q198_robust_outliers",
    (s, d) => {
      val e = Tables.events(s, d).select(col("event_type"), col("value"))
      def medianBy(df: org.apache.spark.sql.DataFrame, vc: String, out: String) = {
        val w = Window.partitionBy(col("event_type")).orderBy(col(vc))
        val wAll = Window.partitionBy(col("event_type"))
        df.withColumn("rk", row_number().over(w))
          .withColumn("nn", count(lit(1)).over(wAll))
          .filter(col("rk") === expr("(nn + 1) div 2") || col("rk") === expr("(nn + 2) div 2"))
          .groupBy(col("event_type"))
          .agg((sum(col(vc)) / count(lit(1))).as(out))
      }
      val med = medianBy(e, "value", "med")
      val dev = e.join(med, Seq("event_type"))
        .select(col("event_type"), col("value"), col("med"),
          abs(col("value") - col("med")).as("adev"))
      val mad = medianBy(dev.select(col("event_type"), col("adev")), "adev", "mad")
      dev.join(mad, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(round(first(col("med")), 6).as("med"),
          round(first(col("mad")), 6).as("mad"),
          count(lit(1)).as("n"),
          sum(when(col("adev") > col("mad") * lit(4.4478), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))
    },
    Some("""WITH m AS (SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
      dv AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
        FROM events e JOIN m USING (event_type)),
      md AS (SELECT event_type, median(adev) AS mad FROM dv GROUP BY event_type)
      SELECT dv.event_type, round(any_value(dv.med), 6) AS med,
        round(any_value(md.mad), 6) AS mad, COUNT(*) AS n,
        CAST(SUM(CASE WHEN dv.adev > md.mad * 4.4478 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_outliers
      FROM dv JOIN md USING (event_type)
      GROUP BY dv.event_type ORDER BY event_type"""),
    doc = "median/MAD robust outlier census; exact boundary-rank medians, no value-buffering percentile state")

  // ---------------------------------------------------------------- q199
  /** Quantile normalization (empirical-CDF feature scaling): each value
    * maps to its within-group rank position (rank−1)/(n−1) as an exact
    * scaled integer (ppm) — the rank-based preprocessing that makes
    * features comparable across skewed distributions without learning
    * parameters. RANK() keeps ties identical (equal inputs must map to
    * equal outputs), integer div keeps the quotient engine-exact. A
    * single-row group has no spread to normalize — it maps to 0 rather
    * than tripping ANSI DIVIDE_BY_ZERO on (n−1); the guard is mirrored
    * in the oracle. event_type is LOW-cardinality, so a plain
    * partitioned window would sort each corpus-sized group in one task;
    * instead the strict-order row number comes from [[RangeRank]]
    * (range-partitioned WITHIN each type — parallel slices + broadcast
    * offsets) and RANK's tie semantics are recovered as min(rn) over the
    * fine-grained (event_type, value) partition, which is
    * hash-parallel. Output is row-per-event — the shape of a
    * feature-engineering pass, not a report. */
  val q199 = QueryDef(
    "q199_quantile_normalize",
    (s, d) => {
      val base = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      RangeRank.withOrderedPrefix(base, Seq("event_type"),
          Seq(col("value"), col("event_id")), rn = Some("rnn"), nTotal = Some("nn"))
        .withColumn("rk",
          min(col("rnn")).over(Window.partitionBy(col("event_type"), col("value"))))
        .select(col("event_id"), col("event_type"),
          when(col("nn") > 1,
            expr("((CAST(rk AS BIGINT) - 1) * 1000000) div (nn - 1)"))
            .otherwise(lit(0L)).as("qn_ppm"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, event_type,
        CASE WHEN COUNT(*) OVER (PARTITION BY event_type) > 1 THEN
          ((RANK() OVER (PARTITION BY event_type ORDER BY value) - 1) * 1000000)
            // (COUNT(*) OVER (PARTITION BY event_type) - 1)
        ELSE 0 END AS qn_ppm
      FROM events ORDER BY event_id"""),
    doc = "empirical-CDF rank normalization to exact ppm; ties map identically via RANK()")

  // ---------------------------------------------------------------- q202
  /** Benford first-digit audit — the forensic data-quality screen for
    * fabricated or truncated numeric columns: the leading digit of
    * naturally-spread magnitudes follows log10(1+1/d), and a synthetic or
    * clipped column doesn't. No transcendentals cross the engines: the
    * digit comes from the first character of the BIGINT integer part
    * (identical string renderings), observed shares are exact scaled
    * integers, and the Benford expectations are baked-in ppm literals.
    * One scan + a 9-row agg. */
  val q202 = QueryDef(
    "q202_benford_audit",
    (s, d) => {
      val expected = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
        5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
      val expDf = {
        import s.implicits._
        broadcast(expected.toDF("digit", "expected_ppm"))
      }
      val digits = Tables.events(s, d)
        .filter(col("value") >= 1.0)
        .select(substring(floor(col("value")).cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = broadcast(digits.agg(sum(col("n")).as("total")))
      digits.crossJoin(tot).join(expDf, Seq("digit"))
        .select(col("digit"), col("n"),
          expr("(n * 1000000) div total").as("observed_ppm"),
          col("expected_ppm"))
        .withColumn("deviation_ppm", abs(col("observed_ppm") - col("expected_ppm")))
        .orderBy(col("digit"))
    },
    Some("""WITH digits AS (SELECT CAST(substr(CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        FROM events WHERE value >= 1.0),
      cnt AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
      tot AS (SELECT SUM(n) AS total FROM cnt),
      exp AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
        (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757))
        t(digit, expected_ppm))
      SELECT c.digit, c.n,
        CAST((c.n * 1000000) // t.total AS BIGINT) AS observed_ppm,
        CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
        CAST(abs((c.n * 1000000) // t.total - e.expected_ppm) AS BIGINT) AS deviation_ppm
      FROM cnt c CROSS JOIN tot t JOIN exp e USING (digit)
      ORDER BY c.digit"""),
    doc = "Benford leading-digit census vs baked-in log-law ppm; exact integer shares, no transcendentals")

  // ---------------------------------------------------------------- q203
  /** CUSUM changepoint detection over daily volumes — where did the
    * level shift? For each type, the cumulative sum of (daily count −
    * mean) peaks at the changepoint. Exact integer algebra throughout
    * (q127's discipline): deviations are scaled by the day count D so the
    * mean never becomes a fraction — cusum_d = Σ_{k≤d} (c_k·D − total) —
    * and the argmax |cusum| takes the earliest day on ties. One day-sized
    * window per type (the frame is |days|, not |events| — same reduced-
    * frame convention as the q154 burst scan). */
  val q203 = QueryDef(
    "q203_cusum_changepoint",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_ns div 86400000000000").as("dd"))
        .agg(count(lit(1)).as("c"))
      val stats = daily.groupBy(col("event_type"))
        .agg(sum(col("c")).as("total"), count(lit(1)).as("nd"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("dd"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cusum = daily.join(stats, Seq("event_type"))
        .withColumn("cusum", sum(col("c") * col("nd") - col("total")).over(w))
      cusum.groupBy(col("event_type"))
        .agg(max_by(struct(col("dd"), col("cusum")),
            struct(abs(col("cusum")), col("dd") * -1)).as("b"),
          first(col("nd")).as("n_days"))
        .select(col("event_type"), col("b.dd").as("cp_day"),
          abs(col("b.cusum")).as("max_abs_cusum"), col("n_days"))
        .orderBy(col("event_type"))
    },
    Some("""WITH daily AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS dd,
          COUNT(*) AS c FROM events GROUP BY 1, 2),
      stats AS (SELECT event_type, SUM(c) AS total, COUNT(*) AS nd
        FROM daily GROUP BY event_type),
      cs AS (SELECT d.event_type, d.dd,
          SUM(d.c * s.nd - s.total) OVER (PARTITION BY d.event_type ORDER BY d.dd
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum,
          s.nd
        FROM daily d JOIN stats s USING (event_type)),
      pick AS (SELECT event_type, dd, cusum, nd,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY abs(cusum) DESC, dd) AS rn
        FROM cs)
      SELECT event_type, dd AS cp_day, CAST(abs(cusum) AS BIGINT) AS max_abs_cusum,
        CAST(nd AS BIGINT) AS n_days
      FROM pick WHERE rn = 1 ORDER BY event_type"""),
    doc = "exact-integer CUSUM level-shift detector per type; argmax |cusum| with earliest-day tie-break")

  // ---------------------------------------------------------------- q209
  /** Interval coalescing (merge overlapping spans) — the sweep-line
    * classic behind "total active time" and availability math: each event
    * opens a 30-minute activity window; overlapping windows per user must
    * merge into maximal spans. A new span starts exactly when an event's
    * start exceeds the running max of all previous ends (strictly-prior
    * ROWS frame), the span id is the running count of such breaks, and
    * the span's extent is [min(start), max(end)] per id — three window
    * passes over ONE user_id shuffle, vs the naive quadratic overlap
    * join. Pure µs-integer arithmetic (DuckDB reads TIMESTAMP_NS at µs); complements q136 (SCD2 builds
    * intervals, this dissolves them). */
  val q209 = QueryDef(
    "q209_interval_coalesce",
    (s, d) => {
      val span = 1800000000L // 30 min in us (DuckDB reads TIMESTAMP_NS at us)
      val e = Tables.events(s, d).select(col("user_id"),
        expr("ts_ns div 1000").as("s"),
        (expr("ts_ns div 1000") + span).as("en"), col("event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      val prevMax = max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1))
      val flagged = e.withColumn("brk",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      val grouped = flagged.withColumn("grp",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      grouped.groupBy(col("user_id"), col("grp"))
        .agg(min(col("s")).as("span_start"), max(col("en")).as("span_end"),
          count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("span_end") - col("span_start")).as("active_us"),
          sum(col("n_events")).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS s,
          epoch_us(ts) + 1800000000 AS en, event_id FROM events),
      f AS (SELECT *, CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY s, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
            OR s > max(en) OVER (PARTITION BY user_id ORDER BY s, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            THEN 1 ELSE 0 END AS brk
        FROM e),
      g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM f),
      spans AS (SELECT user_id, grp, MIN(s) AS span_start, MAX(en) AS span_end,
          COUNT(*) AS n_events
        FROM g GROUP BY user_id, grp)
      SELECT user_id, COUNT(*) AS n_spans,
        CAST(SUM(span_end - span_start) AS BIGINT) AS active_us,
        CAST(SUM(n_events) AS BIGINT) AS n_events
      FROM spans GROUP BY user_id ORDER BY user_id"""),
    doc = "sweep-line interval merge via running-max-of-ends; per-user active time without an overlap join")

  // ---------------------------------------------------------------- q210
  /** Sequential pattern census: the top 3-event paths (trigrams) across
    * user timelines — q126's transition matrix extended one step, the
    * signal behind "what flows actually happen" funnel discovery. Two
    * lead() taps over ONE user_id window shuffle, then a |types|³-at-most
    * census agg; dense_rank keeps tied paths (q169's convention). */
  val q210 = QueryDef(
    "q210_event_trigrams",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tri = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .select(col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy(col("e1"), col("e2"), col("e3")).agg(count(lit(1)).as("n"))
      tri.withColumn("rk", dense_rank().over(BoundedWindow.over(col("n")).orderBy(col("n").desc)))
        .filter(col("rk") <= 10)
        .select(col("rk").cast("long").as("rk"), col("e1"), col("e2"), col("e3"), col("n"))
        .orderBy(col("rk"), col("e1"), col("e2"), col("e3"))
    },
    Some("""WITH seq AS (SELECT event_type AS e1,
          lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
          lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        FROM events),
      tri AS (SELECT e1, e2, e3, COUNT(*) AS n FROM seq
        WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY e1, e2, e3)
      SELECT CAST(DENSE_RANK() OVER (ORDER BY n DESC) AS BIGINT) AS rk,
        e1, e2, e3, n FROM tri
      QUALIFY rk <= 10 ORDER BY rk, e1, e2, e3"""),
    doc = "top user-timeline 3-event paths; two lead taps on one shuffle, tie-preserving dense_rank")

  // ---------------------------------------------------------------- q212
  /** Daily OHLC candlesticks per event type — the financial-rollup shape
    * (open/high/low/close + volume) expressed with ordered-selector
    * aggregates: open/close are min_by/max_by on the (ts, event_id) total
    * order (never a window sort over the day), high/low are plain
    * min/max, volume is the q63 decimal discipline. One keyed aggregation,
    * map-side combinable — the 100 TB-right plan for bucketed series
    * rollups. */
  val q212 = QueryDef(
    "q212_daily_ohlc",
    (s, d) => Tables.events(s, d)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("dd"),
        col("value"), col("ts_ns"), col("event_id"))
      .groupBy(col("event_type"), col("dd"))
      .agg(
        min_by(col("value"), struct(expr("ts_ns div 1000"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(expr("ts_ns div 1000"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("turnover"))
      .orderBy(col("event_type"), col("dd")),
    Some("""WITH r AS (SELECT event_type,
          epoch_us(ts) // 86400000000 AS dd, value,
          ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts) // 86400000000
            ORDER BY epoch_us(ts), event_id) AS ra,
          ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts) // 86400000000
            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rd
        FROM events)
      SELECT event_type, dd,
        MAX(CASE WHEN ra = 1 THEN value END) AS open,
        MAX(value) AS high, MIN(value) AS low,
        MAX(CASE WHEN rd = 1 THEN value END) AS close,
        COUNT(*) AS volume,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS turnover
      FROM r GROUP BY 1, 2 ORDER BY event_type, dd"""),
    doc = "per-(type, day) OHLC via ordered-selector aggregates; one map-side-combinable agg, no window sort")

  // ---------------------------------------------------------------- q213
  /** Weighted moving average with dyadic decay (16:8:4:2:1 over the last
    * 5 points) — EWMA's exactly-representable cousin: every weight is a
    * power of two and the divisor is their sum, so the smoothed series is
    * decimal-exact in both engines (a true α-EWMA needs αᵏ — transcendental
    * drift across engines; the windowed dyadic kernel is the standard
    * hash-oracle-safe approximation). Four lag() taps on one (type)
    * ordered window; emitted only where the full kernel exists. Daily
    * close from q212's selector discipline feeds it. */
  val q213 = QueryDef(
    "q213_weighted_moving_avg",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"), expr("ts_ns div 86400000000000").as("dd"),
          col("value"), col("ts_ns"), col("event_id"))
        .groupBy(col("event_type"), col("dd"))
        .agg(max_by(col("value"), struct(expr("ts_ns div 1000"), col("event_id"))).as("close"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("dd"))
      val c = col("close").cast(DecimalType(18, 2))
      daily
        .withColumn("wma",
          (c * 16 + lag(c, 1).over(w) * 8 + lag(c, 2).over(w) * 4
            + lag(c, 3).over(w) * 2 + lag(c, 4).over(w)).cast("double") / 31)
        .filter(col("wma").isNotNull)
        .select(col("event_type"), col("dd"), col("close"), round(col("wma"), 6).as("wma"))
        .orderBy(col("event_type"), col("dd"))
    },
    Some("""WITH r AS (SELECT event_type,
          epoch_us(ts) // 86400000000 AS dd, value,
          ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts) // 86400000000
            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rd
        FROM events),
      daily AS (SELECT event_type, dd, MAX(CASE WHEN rd = 1 THEN value END) AS close
        FROM r GROUP BY 1, 2),
      lagged AS (SELECT event_type, dd, close,
          CAST(close AS DECIMAL(18,2)) AS c,
          lag(CAST(close AS DECIMAL(18,2)), 1) OVER (PARTITION BY event_type ORDER BY dd) AS c1,
          lag(CAST(close AS DECIMAL(18,2)), 2) OVER (PARTITION BY event_type ORDER BY dd) AS c2,
          lag(CAST(close AS DECIMAL(18,2)), 3) OVER (PARTITION BY event_type ORDER BY dd) AS c3,
          lag(CAST(close AS DECIMAL(18,2)), 4) OVER (PARTITION BY event_type ORDER BY dd) AS c4
        FROM daily)
      SELECT event_type, dd, close,
        round(CAST(c * 16 + c1 * 8 + c2 * 4 + c3 * 2 + c4 AS DOUBLE) / 31, 6) AS wma
      FROM lagged WHERE c1 IS NOT NULL AND c2 IS NOT NULL
        AND c3 IS NOT NULL AND c4 IS NOT NULL
      ORDER BY event_type, dd"""),
    doc = "dyadic-kernel weighted moving average (decimal-exact EWMA stand-in); four lag taps, one ordered window")

  // ---------------------------------------------------------------- q220
  /** Funnel conversion-latency percentiles: among users whose first view
    * is followed by a strictly later purchase, how long does conversion
    * take at the median and the p90 tail? Latencies are exact integer µs;
    * percentiles use the lower-exact-value-at-ceil(p·n) rule computed by
    * boundary rank (q23/q198 discipline — rank the user-level latencies,
    * keep only the two boundary rows). The global rank over the |users|-
    * sized cohort runs as [[RangeRank]]'s two-pass range-partitioned rank
    * (P parallel slice sorts + broadcast offsets), never a single-task
    * global WindowExec sort. The conversion pairing is q117's min-ts
    * machinery: first view per user, first later purchase. */
  val q220 = QueryDef(
    "q220_funnel_latency",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), expr("ts_ns div 1000").as("tu"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tu")).as("tv"))
      val p = e.filter(col("event_type") === "purchase").join(v, "user_id")
        .filter(col("tu") > col("tv"))
        .groupBy(col("user_id")).agg(min(col("tu")).as("tp"), first(col("tv")).as("tv"))
      val lat = p.select(col("user_id"), (col("tp") - col("tv")).as("lat_us"))
      val ranked = RangeRank.withOrderedPrefix(lat, Nil,
        Seq(col("lat_us"), col("user_id")), rn = Some("rk"), nTotal = Some("nn"))
      ranked
        .filter(col("rk") === expr("(nn + 1) div 2")
          || col("rk") === expr("(9 * nn + 9) div 10"))
        .agg(first(col("nn")).as("n_converted"),
          max(when(col("rk") === expr("(nn + 1) div 2"), col("lat_us"))).as("p50_us"),
          max(when(col("rk") === expr("(9 * nn + 9) div 10"), col("lat_us"))).as("p90_us"))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
      v AS (SELECT user_id, MIN(tu) AS tv FROM e
        WHERE event_type = 'view' GROUP BY user_id),
      p AS (SELECT e.user_id, MIN(e.tu) AS tp, ANY_VALUE(v.tv) AS tv
        FROM e JOIN v USING (user_id)
        WHERE e.event_type = 'purchase' AND e.tu > v.tv GROUP BY e.user_id),
      lat AS (SELECT user_id, tp - tv AS lat_us FROM p),
      ranked AS (SELECT lat_us,
          ROW_NUMBER() OVER (ORDER BY lat_us, user_id) AS rk,
          COUNT(*) OVER () AS nn
        FROM lat)
      SELECT ANY_VALUE(nn) AS n_converted,
        MAX(CASE WHEN rk = (nn + 1) // 2 THEN lat_us END) AS p50_us,
        MAX(CASE WHEN rk = (9 * nn + 9) // 10 THEN lat_us END) AS p90_us
      FROM ranked WHERE rk = (nn + 1) // 2 OR rk = (9 * nn + 9) // 10"""),
    doc = "view->purchase conversion latency p50/p90, exact boundary-rank percentiles over the user cohort")

  // ---------------------------------------------------------------- q221
  /** RFM segmentation — the classic lifecycle-marketing rollup: per user,
    * Recency (days since last event, against the corpus horizon),
    * Frequency (event count) and Monetary (purchase cents, exact integer)
    * each quartile-coded with NTILE(4), then the 64-cell segment census.
    * Determinism: every NTILE orders by (metric, user_id) — a total
    * order, so tile boundaries cannot wobble; monetary sums are integer
    * cents (floor of value×100 — no float addition anywhere). The three
    * |users|-sized tile codings run as [[RangeRank]] two-pass ranks
    * (parallel slice sorts + broadcast offsets) with NTILE reconstructed
    * by integer arithmetic from (rn, n) — identical tiles to the oracle's
    * NTILE, no single-task global sort anywhere. */
  val q221 = QueryDef(
    "q221_rfm_segments",
    (s, d) => {
      val e = Tables.events(s, d).select(col("user_id"), col("event_type"),
        expr("ts_ns div 86400000000000").as("dd"),
        floor(col("value") * 100).cast("long").as("cents"))
      val horizon = broadcast(e.agg(max(col("dd")).as("h")))
      val rfm = e.groupBy(col("user_id"))
        .agg(max(col("dd")).as("last_dd"), count(lit(1)).as("f"),
          sum(when(col("event_type") === "purchase", col("cents"))
            .otherwise(0L)).as("m"))
        .crossJoin(horizon)
        .select(col("user_id"), (col("h") - col("last_dd")).as("r"), col("f"), col("m"))
      val rRank = RangeRank.withOrderedPrefix(rfm, Nil,
        Seq(col("r"), col("user_id")), rn = Some("rn_r"), nTotal = Some("nn"))
      val fRank = RangeRank.withOrderedPrefix(rRank, Nil,
        Seq(col("f").desc, col("user_id")), rn = Some("rn_f"))
      val mRank = RangeRank.withOrderedPrefix(fRank, Nil,
        Seq(col("m").desc, col("user_id")), rn = Some("rn_m"))
      mRank.select(col("user_id"),
          RangeRank.ntileExpr(4, "rn_r", "nn").as("r_q"),
          RangeRank.ntileExpr(4, "rn_f", "nn").as("f_q"),
          RangeRank.ntileExpr(4, "rn_m", "nn").as("m_q"))
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))
    },
    Some("""WITH e AS (SELECT user_id, event_type,
          epoch_ns(ts) // 86400000000000 AS dd,
          CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
      h AS (SELECT MAX(dd) AS h FROM e),
      rfm AS (SELECT user_id,
          (SELECT h FROM h) - MAX(dd) AS r,
          COUNT(*) AS f,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT) AS m
        FROM e GROUP BY user_id),
      coded AS (SELECT user_id,
          NTILE(4) OVER (ORDER BY r, user_id) AS r_q,
          NTILE(4) OVER (ORDER BY f DESC, user_id) AS f_q,
          NTILE(4) OVER (ORDER BY m DESC, user_id) AS m_q
        FROM rfm)
      SELECT r_q, f_q, m_q, COUNT(*) AS n_users
      FROM coded GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q"""),
    doc = "RFM quartile coding (total-order NTILEs, integer cents) + 64-cell segment census")

  // ---------------------------------------------------------------- q225
  /** Bitemporal as-of query — temporal-database semantics with BOTH time
    * axes: "what was each user's latest value as of VALID time V, as the
    * system KNEW it at TRANSACTION time T" vs what full hindsight says.
    * Valid time = event time; transaction time = ingest order (event_id —
    * the log's monotone sequence, exactly the K2 seq contract); T = half
    * the log (computed in-query, so the cut scales with the corpus). Rows
    * that arrived after T but carry valid-time < V are the LATE data that
    * make the two answers diverge — the `revised` flag counts precisely
    * the users whose as-of answer was rewritten by late arrivals, which
    * is the business case for bitemporality (audits must reproduce what
    * was believed, not what is true). Two max_by aggregations (no window
    * sort), one full outer join on user_id; null-safe compare so
    * appearing/disappearing users count as revisions. */
  val q225 = QueryDef(
    "q225_bitemporal_asof",
    (s, d) => {
      val vcut = 19741L * 86400000000L // valid-time horizon V (µs, mid-corpus)
      val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("value"), expr("ts_ns div 1000").as("tu"))
      val tcut = broadcast(e.agg(expr("max(event_id) div 2").as("tc")))
      def asOf(df: org.apache.spark.sql.DataFrame, out: String) =
        df.filter(col("tu") < vcut).groupBy(col("user_id"))
          .agg(max_by(col("value"), struct(col("tu"), col("event_id"))).as(out))
      val thenV = asOf(e.crossJoin(tcut).filter(col("event_id") <= col("tc")), "v_then")
      val nowV = asOf(e, "v_now")
      nowV.join(thenV, Seq("user_id"), "full_outer")
        .select(col("user_id"), col("v_then"), col("v_now"),
          (!(col("v_then") <=> col("v_now"))).as("revised"))
        .orderBy(col("user_id"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS tu FROM events),
      tc AS (SELECT MAX(event_id) // 2 AS tc FROM e),
      thenv AS (SELECT user_id, value AS v_then FROM (
          SELECT user_id, value, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY tu DESC, event_id DESC) AS rn
          FROM e WHERE tu < 19741 * 86400000000
            AND event_id <= (SELECT tc FROM tc)) WHERE rn = 1),
      nowv AS (SELECT user_id, value AS v_now FROM (
          SELECT user_id, value, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY tu DESC, event_id DESC) AS rn
          FROM e WHERE tu < 19741 * 86400000000) WHERE rn = 1)
      SELECT COALESCE(n.user_id, t.user_id) AS user_id, t.v_then, n.v_now,
        (t.v_then IS DISTINCT FROM n.v_now) AS revised
      FROM nowv n FULL OUTER JOIN thenv t ON t.user_id = n.user_id
      ORDER BY user_id"""),
    doc = "valid-time x transaction-time as-of: what was believed at T vs hindsight; late-arrival revisions flagged")

  // ---------------------------------------------------------------- q226
  /** Linear trend + next-day forecast per event type, EXACT: the OLS
    * slope over (day-index, daily count) computed entirely in scaled
    * integers — slope_ppm = (n·Σxy − Σx·Σy)·10⁶ div (n·Σx² − (Σx)²),
    * intercept and forecast composed from it with the same integer
    * division order on both engines, so the fitted line crosses the hash
    * oracle exactly (float OLS never could). This is the capacity-
    * planning primitive (is traffic growing, and what does tomorrow look
    * like); the frame is |days| per type — a tiny agg after the daily
    * rollup, the q203 reduced-frame convention. A type seen on a single
    * day has zero x-variance and no fittable slope — it maps to slope 0
    * instead of tripping ANSI DIVIDE_BY_ZERO; mirrored in the oracle. */
  val q226 = QueryDef(
    "q226_trend_forecast",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_ns div 86400000000000").as("dd"))
        .agg(count(lit(1)).as("y"))
      val mn = broadcast(daily.agg(min(col("dd")).as("d0")))
      daily.crossJoin(mn)
        .select(col("event_type"), (col("dd") - col("d0")).as("x"), col("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
          max(col("x")).as("xmax"))
        .select(col("event_type"), col("n"),
          when(expr("n * sxx - sx * sx") =!= 0L,
            expr("((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx)"))
            .otherwise(lit(0L)).as("slope_ppm"),
          col("sy"), col("sx"), col("xmax"))
        .select(col("event_type"), col("n"), col("slope_ppm"),
          expr("(sy * 1000000 - slope_ppm * sx) div n").as("intercept_ppm"),
          col("xmax"))
        .select(col("event_type"), col("n"), col("slope_ppm"), col("intercept_ppm"),
          expr("intercept_ppm + slope_ppm * (xmax + 1)").as("forecast_next_ppm"))
        .orderBy(col("event_type"))
    },
    Some("""WITH daily AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS dd,
          COUNT(*) AS y FROM events GROUP BY 1, 2),
      mn AS (SELECT MIN(dd) AS d0 FROM daily),
      pts AS (SELECT event_type, dd - (SELECT d0 FROM mn) AS x, y FROM daily),
      agg AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
          SUM(x * y) AS sxy, SUM(x * x) AS sxx, MAX(x) AS xmax
        FROM pts GROUP BY event_type),
      sl AS (SELECT *, CAST(CASE WHEN n * sxx - sx * sx <> 0 THEN
          ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
          ELSE 0 END AS BIGINT) AS slope_ppm FROM agg),
      ic AS (SELECT *, CAST((sy * 1000000 - slope_ppm * sx) // n AS BIGINT)
          AS intercept_ppm FROM sl)
      SELECT event_type, n, slope_ppm, intercept_ppm,
        CAST(intercept_ppm + slope_ppm * (xmax + 1) AS BIGINT) AS forecast_next_ppm
      FROM ic ORDER BY event_type"""),
    doc = "exact scaled-integer OLS trend + next-day forecast per type; no float regression crosses the oracle")

  // ---------------------------------------------------------------- q229
  /** NDCG@10 ranking-quality evaluation — the retrieval/recommender
    * metric a training pipeline runs after every model refresh: per user,
    * the "model ranking" (events by value desc) is scored against graded
    * ground-truth relevance (purchase=3 ⇒ gain 7, signup=2 ⇒ 3,
    * click=1 ⇒ 1, else 0 — the 2^rel−1 convention) with log-position
    * discounts. Engine-exact: the irrational 1/log₂(i+1) discounts are
    * BAKED as ppm literals (the same literal text on both sides — the
    * q202 Benford convention), gains and products stay integers, and the
    * final normalization is integer div, so no transcendental ever
    * crosses the oracle. Shape: ONE shuffle on user_id feeds both the
    * model-order and ideal-order row_numbers (same partition key ⇒ one
    * Exchange, two in-partition sorts), then a map-side-combinable sum;
    * at 100 TB this is a per-user fold, embarrassingly parallel. */
  val q229 = QueryDef(
    "q229_ndcg_eval",
    (s, d) => {
      val disc = typedLit(Seq(1000000L, 630929L, 500000L, 430676L, 386852L,
        356207L, 333333L, 315464L, 301029L, 289064L))
      val gain = when(col("event_type") === "purchase", 7L)
        .when(col("event_type") === "signup", 3L)
        .when(col("event_type") === "click", 1L)
        .otherwise(0L)
      val wm = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      val wi = Window.partitionBy(col("user_id"))
        .orderBy(col("gain").desc, col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"), gain.as("gain"))
        .withColumn("rn_m", row_number().over(wm))
        .withColumn("rn_i", row_number().over(wi))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("rn_m") <= 10,
            col("gain") * element_at(disc, col("rn_m").cast("int")))
            .otherwise(0L)).as("dcg_ppm"),
          sum(when(col("rn_i") <= 10,
            col("gain") * element_at(disc, col("rn_i").cast("int")))
            .otherwise(0L)).as("idcg_ppm"))
        .select(col("user_id"), col("dcg_ppm"), col("idcg_ppm"),
          when(col("idcg_ppm") > 0,
            expr("(dcg_ppm * 1000000) div idcg_ppm")).otherwise(0L).as("ndcg_ppm"))
        .orderBy(col("user_id"))
    },
    Some("""WITH g AS (SELECT user_id, event_id, value,
          CASE event_type WHEN 'purchase' THEN 7 WHEN 'signup' THEN 3
            WHEN 'click' THEN 1 ELSE 0 END AS gain
        FROM events),
      r AS (SELECT user_id, gain,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn_m,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gain DESC, event_id) AS rn_i
        FROM g),
      a AS (SELECT user_id,
          CAST(SUM(CASE WHEN rn_m <= 10 THEN gain * ([1000000, 630929, 500000,
            430676, 386852, 356207, 333333, 315464, 301029, 289064])[rn_m]
            ELSE 0 END) AS BIGINT) AS dcg_ppm,
          CAST(SUM(CASE WHEN rn_i <= 10 THEN gain * ([1000000, 630929, 500000,
            430676, 386852, 356207, 333333, 315464, 301029, 289064])[rn_i]
            ELSE 0 END) AS BIGINT) AS idcg_ppm
        FROM r GROUP BY user_id)
      SELECT user_id, dcg_ppm, idcg_ppm,
        CAST(CASE WHEN idcg_ppm > 0 THEN (dcg_ppm * 1000000) // idcg_ppm
          ELSE 0 END AS BIGINT) AS ndcg_ppm
      FROM a ORDER BY user_id"""),
    doc = "NDCG@10 per user with baked ppm log-discounts; exact integers end to end, one user-keyed shuffle")

  // ---------------------------------------------------------------- q231
  /** Score-calibration reliability bins — the audit that decides whether
    * a model's probabilities can be TRUSTED as probabilities (thresholds,
    * expected-cost decisions, sampling weights all assume it): predictions
    * are decile-binned and each bin's mean predicted probability is
    * compared to its observed positive rate; the gap column is the
    * per-bin calibration error (ECE is its n-weighted mean — recoverable
    * from these columns). The "model score" here is a deterministic
    * fixture (value scaled to [0, 1e6) ppm); outcome = purchase/signup.
    * Everything is integers: pred_ppm = floor(value·2000) (one IEEE
    * double multiply — bit-identical cross-engine), bin = pred div 1e5,
    * means and rates via integer div. One scan + one 10-row agg. */
  val q231 = QueryDef(
    "q231_calibration_bins",
    (s, d) => {
      Tables.events(s, d)
        .select(least(floor(col("value") * 2000).cast("long"), lit(999999L)).as("pred_ppm"),
          when(col("event_type").isin("purchase", "signup"), 1L).otherwise(0L).as("pos"))
        .groupBy(expr("pred_ppm div 100000").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("pos")).as("n_pos"),
          expr("sum(pred_ppm) div count(1)").as("mean_pred_ppm"),
          expr("(sum(pos) * 1000000) div count(1)").as("obs_rate_ppm"))
        .withColumn("gap_ppm", abs(col("mean_pred_ppm") - col("obs_rate_ppm")))
        .orderBy(col("bin"))
    },
    Some("""WITH p AS (SELECT least(CAST(floor(value * 2000) AS BIGINT), 999999) AS pred_ppm,
          CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS pos
        FROM events)
      SELECT pred_ppm // 100000 AS bin, COUNT(*) AS n,
        CAST(SUM(pos) AS BIGINT) AS n_pos,
        CAST(SUM(pred_ppm) // COUNT(*) AS BIGINT) AS mean_pred_ppm,
        CAST((SUM(pos) * 1000000) // COUNT(*) AS BIGINT) AS obs_rate_ppm,
        CAST(abs(SUM(pred_ppm) // COUNT(*) - (SUM(pos) * 1000000) // COUNT(*)) AS BIGINT)
          AS gap_ppm
      FROM p GROUP BY 1 ORDER BY bin"""),
    doc = "reliability-diagram bins: mean predicted ppm vs observed positive rate per decile; exact integer calibration audit")

  // --------------------------------------------------------------- q279
  /** Recency-weighted engagement (exponential time decay with a 7-day
    * half-life): score(user) = Σ value · 2^−⌊age/7d⌋ — the freshness
    * weighting a training-sample selector or a ranking feature store
    * applies so last week counts double vs the week before. Everything
    * is engine-exact by construction: the decay factor is a power of
    * two with an INTEGER exponent (halving a double is exact — no
    * exp/ln in sight), ages come from integer ns arithmetic against a
    * broadcast corpus horizon, and the weighted sum goes through the
    * decimal-accumulator convention so summation order cannot matter.
    * Top-20 ranking uses the 6-dp-rounded score with user_id tiebreak.
    *
    * Scale shape: one map-side pass (age, halvings, product), one
    * keyed agg on user_id, TakeOrderedAndProject for the top-20 — the
    * corpus horizon is the only non-map stage and it's a 1-row
    * broadcast. */
  val q279 = QueryDef(
    "q279_recency_weighting",
    (s, d) => {
      val ev = Tables.events(s, d)
      val mx = broadcast(ev.agg(max(col("ts_ns")).as("mx")))
      ev.crossJoin(mx)
        .select(col("user_id"),
          expr("value / cast(power(2, least((mx - ts_ns) div 604800000000000, 40)) as double)")
            .as("wv"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("wv").cast(DecimalType(28, 10))).cast("double"), 6).as("score"))
        .orderBy(col("score").desc, col("user_id"))
        .limit(20)
    },
    Some("""WITH e AS (SELECT user_id, value, epoch_ns(ts) AS tn FROM events),
      m AS (SELECT MAX(tn) AS mx FROM e),
      w AS (SELECT user_id,
          value / power(2, LEAST((m.mx - tn) // 604800000000000, 40)) AS wv
        FROM e CROSS JOIN m),
      a AS (SELECT user_id, COUNT(*) AS n_events,
          round(CAST(SUM(CAST(wv AS DECIMAL(28,10))) AS DOUBLE), 6) AS score
        FROM w GROUP BY user_id)
      SELECT user_id, n_events, score FROM a
      ORDER BY score DESC, user_id LIMIT 20"""),
    doc = "7-day-half-life decayed engagement per user: integer-exponent powers of two (no transcendentals), decimal-exact sums, top-20 via ordered limit")

  // --------------------------------------------------------------- q285
  /** Per-group OLS trend: slope and intercept of daily total value over
    * the day index, one regression PER event_type (q226 fits the single
    * global trend; segment-level trend tables are what dashboards and
    * mixture schedulers actually consume). Engine-exact by the usual
    * discipline: daily totals go through the decimal accumulator, the
    * x·y cross terms are re-frozen to DECIMAL(38,10) before summation
    * (so no double addition order anywhere), and the closed-form
    * slope/intercept division happens once per group on identical
    * doubles. Days are re-based against a broadcast corpus origin to
    * keep x small.
    *
    * Scale shape: one (type, day) agg, then one agg per type over ≤
    * |days| rows — both map-side combinable; the origin is a 1-row
    * broadcast. */
  val q285 = QueryDef(
    "q285_group_trend",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), expr("ts_ns div 86400000000000").as("dd"), col("value"))
      val origin = broadcast(ev.agg(min(col("dd")).as("d0")))
      val daily = ev.crossJoin(origin)
        .groupBy(col("event_type"), (col("dd") - col("d0")).as("x"))
        .agg(sum(col("value").cast(DecimalType(28, 10))).cast("double").as("y"))
      daily
        .select(col("event_type"), col("x"), col("y"),
          (col("x") * col("y")).cast(DecimalType(38, 10)).as("xy"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y").cast(DecimalType(38, 10))).cast("double").as("sy"),
          sum(col("xy")).cast("double").as("sxy"))
        .select(col("event_type"), col("n_days"),
          round(expr("(n_days * sxy - sx * sy) / (n_days * sxx - sx * sx)"), 6).as("slope"),
          round(expr("(sy - (n_days * sxy - sx * sy) / (n_days * sxx - sx * sx) * sx) / n_days"), 6).as("intercept"))
        .orderBy(col("event_type"))
    },
    Some("""WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS dd, value
        FROM events),
      o AS (SELECT MIN(dd) AS d0 FROM e),
      daily AS (SELECT event_type, dd - d0 AS x,
          CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS y
        FROM e CROSS JOIN o GROUP BY 1, 2),
      st AS (SELECT event_type, COUNT(*) AS n_days,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx,
          CAST(SUM(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy
        FROM daily GROUP BY 1)
      SELECT event_type, n_days,
        round((n_days * sxy - sx * sy) / (n_days * sxx - sx * sx), 6) AS slope,
        round((sy - (n_days * sxy - sx * sy) / (n_days * sxx - sx * sx) * sx) / n_days, 6) AS intercept
      FROM st ORDER BY event_type"""),
    doc = "per-event-type OLS daily trend (slope + intercept): decimal-frozen cross terms, re-based day index, one regression per segment")

  // --------------------------------------------------------------- q287
  /** Discrete-time survival table for conversion: per day-since-entry k,
    * the at-risk count (users whose observed span reaches k), the
    * conversion events at exactly k, and the discrete hazard — the
    * life-table form of Kaplan–Meier that stays integer-exact (the
    * product-limit survivor curve needs a running product, i.e.
    * transcendentals; the hazard table is the engine-exact core every
    * survival fit consumes). Entry = a user's first event day;
    * conversion = first 'purchase' day; right-censoring at the corpus
    * horizon.
    *
    * Scale shape: two user-keyed aggs (entry/conversion), a 31-row
    * generated day axis broadcast against the user table, one agg per
    * k — never a row blowup beyond users × 31. */
  val q287 = QueryDef(
    "q287_conversion_hazard",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts_ns div 86400000000000").as("dd"))
      val entry = ev.groupBy(col("user_id")).agg(min(col("dd")).as("entry"))
      val conv = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("dd")).as("conv"))
      val horizon = broadcast(ev.agg(max(col("dd")).as("h")))
      val spans = entry.join(conv, Seq("user_id"), "left").crossJoin(horizon)
        .select(col("user_id"),
          (col("conv") - col("entry")).as("dur"),      // null if never converted
          (col("h") - col("entry")).as("censor"))
      val ks = broadcast((0 to 30).toDF("k"))
      spans.crossJoin(ks)
        .groupBy(col("k"))
        .agg(
          sum(when(coalesce(col("dur"), col("censor")) >= col("k"), 1L).otherwise(0L)).as("at_risk"),
          sum(when(col("dur") === col("k"), 1L).otherwise(0L)).as("events"))
        .filter(col("at_risk") > 0)
        .select(col("k"), col("at_risk"), col("events"),
          expr("events * 1000000 div at_risk").as("hazard_ppm"))
        .orderBy(col("k"))
    },
    Some("""WITH e AS (SELECT user_id, event_type,
          epoch_ns(ts) // 86400000000000 AS dd FROM events),
      en AS (SELECT user_id, MIN(dd) AS entry FROM e GROUP BY 1),
      cv AS (SELECT user_id, MIN(dd) AS conv FROM e
        WHERE event_type = 'purchase' GROUP BY 1),
      h AS (SELECT MAX(dd) AS h FROM e),
      sp AS (SELECT en.user_id, cv.conv - en.entry AS dur, h.h - en.entry AS censor
        FROM en LEFT JOIN cv USING (user_id) CROSS JOIN h),
      ks AS (SELECT range AS k FROM range(0, 31))
      SELECT k,
        CAST(SUM(CASE WHEN COALESCE(dur, censor) >= k THEN 1 ELSE 0 END) AS BIGINT) AS at_risk,
        CAST(SUM(CASE WHEN dur = k THEN 1 ELSE 0 END) AS BIGINT) AS events,
        CAST(SUM(CASE WHEN dur = k THEN 1 ELSE 0 END) * 1000000
          // SUM(CASE WHEN COALESCE(dur, censor) >= k THEN 1 ELSE 0 END) AS BIGINT) AS hazard_ppm
      FROM sp CROSS JOIN ks
      GROUP BY k HAVING SUM(CASE WHEN COALESCE(dur, censor) >= k THEN 1 ELSE 0 END) > 0
      ORDER BY k"""),
    doc = "discrete-time conversion hazard table (entry = first event, event = first purchase, right-censored): integer-exact life-table core of Kaplan-Meier")

  // --------------------------------------------------------------- q288
  /** Association rules over per-user behavior baskets: for every event-
    * type pair, support, both directional confidences, and lift — the
    * market-basket readout (Agrawal's apriori at itemset size 2, which
    * is the size that matters when the item vocabulary is small and the
    * question is "which behaviors co-occur beyond chance"). Lift > 1000
    * (×1000 fixed-point) = the pair co-occurs above independence. All
    * ratios are integer ppm/permil off exact distinct-user counts.
    *
    * Scale shape: baskets = one distinct per (user, type); pair counts
    * come from the user-keyed self-join (fan-out bounded by the item
    * vocabulary per user, NOT by corpus size); marginals broadcast. */
  val q288 = QueryDef(
    "q288_association_rules",
    (s, d) => {
      val b = Tables.events(s, d).select(col("user_id"), col("event_type")).distinct()
      val nUsers = broadcast(b.select(col("user_id")).distinct().agg(count(lit(1)).as("n")))
      val marg = broadcast(b.groupBy(col("event_type")).agg(count(lit(1)).as("m")))
      val pairs = b.as("x").join(b.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(marg.select(col("event_type").as("ta"), col("m").as("n_a")), "ta")
        .join(marg.select(col("event_type").as("tb"), col("m").as("n_b")), "tb")
        .crossJoin(nUsers)
        .select(col("ta"), col("tb"), col("n_ab"),
          expr("n_ab * 1000000 div n").as("support_ppm"),
          expr("n_ab * 1000000 div n_a").as("conf_a_to_b_ppm"),
          expr("n_ab * 1000000 div n_b").as("conf_b_to_a_ppm"),
          expr("n_ab * n * 1000 div (n_a * n_b)").as("lift_x1000"))
        .orderBy(col("ta"), col("tb"))
    },
    Some("""WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
      nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM b),
      m AS (SELECT event_type, COUNT(*) AS m FROM b GROUP BY 1),
      p AS (SELECT x.event_type AS ta, y.event_type AS tb, COUNT(*) AS n_ab
        FROM b x JOIN b y ON x.user_id = y.user_id AND x.event_type < y.event_type
        GROUP BY 1, 2)
      SELECT ta, tb, n_ab,
        CAST(n_ab * 1000000 // nu.n AS BIGINT) AS support_ppm,
        CAST(n_ab * 1000000 // ma.m AS BIGINT) AS conf_a_to_b_ppm,
        CAST(n_ab * 1000000 // mb.m AS BIGINT) AS conf_b_to_a_ppm,
        CAST(n_ab * nu.n * 1000 // (ma.m * mb.m) AS BIGINT) AS lift_x1000
      FROM p JOIN m ma ON ma.event_type = p.ta
        JOIN m mb ON mb.event_type = p.tb CROSS JOIN nu
      ORDER BY ta, tb"""),
    doc = "size-2 association rules on user baskets: exact support / directional confidence / lift, user-keyed pair join bounded by item vocabulary")

  // --------------------------------------------------------------- q289
  /** One-way ANOVA of value across event_type: between/within sums of
    * squares and the F statistic, from nothing but per-group (n, Σv,
    * Σv²) — the canonical "does this categorical feature explain the
    * metric" test, and the algebra is all sums, so it is engine-exact
    * without touching a distribution function (p-value lookup is a
    * client-side table; the F statistic is the data-plane part).
    * Per-group Σ go through the decimal accumulator; the cross-group
    * reductions re-freeze each group's s²/n term to DECIMAL(38,10) so
    * no double addition order exists anywhere.
    *
    * Scale shape: one keyed agg over the corpus + one ≤|groups|-row
    * reduction. */
  val q289 = QueryDef(
    "q289_anova_f",
    (s, d) => {
      val g = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_g"),
          sum(col("value").cast(DecimalType(28, 10))).cast("double").as("s_g"),
          sum((col("value") * col("value")).cast(DecimalType(28, 10))).cast("double").as("q_g"))
      g.agg(count(lit(1)).as("k_groups"), sum(col("n_g")).as("n"),
          sum(expr("cast(s_g * s_g / n_g as decimal(38,10))")).cast("double").as("sum_s2n"),
          sum(col("s_g").cast(DecimalType(38, 10))).cast("double").as("s_tot"),
          sum(col("q_g").cast(DecimalType(38, 10))).cast("double").as("q_tot"))
        .select(col("k_groups"), col("n"),
          round(expr("sum_s2n - s_tot * s_tot / n"), 6).as("ss_between"),
          round(expr("q_tot - sum_s2n"), 6).as("ss_within"),
          round(expr("(sum_s2n - s_tot * s_tot / n) / (k_groups - 1) / ((q_tot - sum_s2n) / (n - k_groups))"), 6).as("f_stat"))
    },
    Some("""WITH g AS (SELECT event_type, COUNT(*) AS n_g,
          CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s_g,
          CAST(SUM(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS q_g
        FROM events GROUP BY 1),
      t AS (SELECT COUNT(*) AS k_groups, CAST(SUM(n_g) AS BIGINT) AS n,
          CAST(SUM(CAST(s_g * s_g / n_g AS DECIMAL(38,10))) AS DOUBLE) AS sum_s2n,
          CAST(SUM(CAST(s_g AS DECIMAL(38,10))) AS DOUBLE) AS s_tot,
          CAST(SUM(CAST(q_g AS DECIMAL(38,10))) AS DOUBLE) AS q_tot
        FROM g)
      SELECT k_groups, n,
        round(sum_s2n - s_tot * s_tot / n, 6) AS ss_between,
        round(q_tot - sum_s2n, 6) AS ss_within,
        round((sum_s2n - s_tot * s_tot / n) / (k_groups - 1)
          / ((q_tot - sum_s2n) / (n - k_groups)), 6) AS f_stat
      FROM t"""),
    doc = "one-way ANOVA F of value across event_type: pure sum algebra, decimal-frozen cross-group terms, no distribution functions in the data plane")

  val all: Seq[QueryDef] = Seq(q117, q118, q126, q127, q136, q138, q153, q154,
    q168, q179, q180, q191, q192, q198, q199, q202, q203, q209, q210, q212, q213,
    q220, q221, q225, q226, q229, q231, q279, q285, q287, q288, q289)
}
