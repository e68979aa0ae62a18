package graft.operators

import org.apache.spark.sql.functions._
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

  val all: Seq[QueryDef] = Seq(q117, q118)
}
