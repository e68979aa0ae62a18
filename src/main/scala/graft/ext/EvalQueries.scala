package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.BoundedWindow
import org.apache.spark.sql.types.DecimalType

/** Model-evaluation + time-series tier: the metrics a training pipeline
  * computes after every model refresh (ranking quality, classifier
  * quality, calibration companions) and the seasonality/autocorrelation
  * diagnostics run over event streams. Everything follows the inventory's
  * exactness discipline — scores and metrics are scaled integers (ppm) on
  * both sides of the oracle, so no IEEE rounding ever crosses the
  * DuckDB gate. Companion queries q229 (NDCG) and q231 (calibration)
  * live in EventAnalytics.
  *
  * Reference anchor: kinesis3 exposes only counters/percentiles
  * (src/kinesis3/stats.clj); this tier is part of the beyond-reference
  * LLM-pipeline surface the build brief mandates.
  */
object EvalQueries {

  /** q231's deterministic model-score fixture: value scaled to [0, 1e6)
    * ppm via ONE IEEE double multiply (bit-identical cross-engine), then
    * clamped. Shared by the whole eval tier so every metric grades the
    * same "model". */
  private def predPpm: Column =
    least(floor(col("value") * 2000).cast("long"), lit(999999L))

  private def posLabel: Column =
    when(col("event_type").isin("purchase", "signup"), 1L).otherwise(0L)

  // ---------------------------------------------------------------- q232
  /** Exact tie-aware ROC-AUC via the Mann-Whitney rank identity:
    * AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N), with the tie-group average
    * rank kept integral by doubling — for a score group starting at min
    * rank r with c members, 2·avgrank = 2r + c − 1. So
    * auc_ppm = (S2 − P(P+1))·10⁶ div (2·P·N) where
    * S2 = Σ_groups p·(2r + c − 1) — integers end to end, ties handled
    * exactly as the textbook mid-rank convention demands.
    *
    * Shape: ONE groupBy(score) shrinks the frame to the score
    * distribution (≤ 10⁶ rows by construction of pred_ppm — a bounded
    * domain, NOT the event count), a running-sum window over that bounded
    * frame assigns min-ranks, one global agg finishes. At 100 TB the only
    * full-data pass is the map-side-combinable score census; the
    * unpartitioned window never sees more than the 10⁶-row score domain.
    * The S2·10⁶ product goes through DECIMAL(38,0) (Spark) / HUGEINT
    * (DuckDB) — no overflow at any corpus size. */
  val q232 = QueryDef(
    "q232_roc_auc",
    (s, d) => {
      val byScore = Tables.events(s, d)
        .select(predPpm.as("pred"), posLabel.as("pos"))
        .groupBy(col("pred"))
        .agg(count(lit(1)).as("c"), sum(col("pos")).as("p"))
      val w = BoundedWindow.over(col("pred")).orderBy(col("pred"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byScore
        .withColumn("r", sum(col("c")).over(w) - col("c") + 1)
        .agg(
          sum(col("p")).as("pos_n"),
          sum(col("c") - col("p")).as("neg_n"),
          sum(col("p") * (lit(2L) * col("r") + col("c") - 1)).as("s2"))
        .select(col("pos_n"), col("neg_n"),
          when(col("pos_n") > 0 && col("neg_n") > 0,
            expr("(CAST(s2 - pos_n * (pos_n + 1) AS DECIMAL(38,0)) * 1000000) div (2 * pos_n * neg_n)"))
            .otherwise(lit(0L)).as("auc_ppm"))
    },
    Some("""WITH b AS (SELECT least(CAST(floor(value * 2000) AS BIGINT), 999999) AS pred,
          CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS pos
        FROM events),
      g AS (SELECT pred, COUNT(*) AS c, CAST(SUM(pos) AS BIGINT) AS p
        FROM b GROUP BY pred),
      r AS (SELECT p, c,
          SUM(c) OVER (ORDER BY pred ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - c + 1 AS r
        FROM g),
      a AS (SELECT CAST(SUM(p) AS BIGINT) AS pos_n,
          CAST(SUM(c - p) AS BIGINT) AS neg_n,
          CAST(SUM(p * (2 * r + c - 1)) AS BIGINT) AS s2 FROM r)
      SELECT pos_n, neg_n,
        CAST(CASE WHEN pos_n > 0 AND neg_n > 0
          THEN ((CAST(s2 AS HUGEINT) - pos_n * (pos_n + 1)) * 1000000)
            // (2 * pos_n * neg_n)
          ELSE 0 END AS BIGINT) AS auc_ppm
      FROM a"""),
    doc = "exact tie-aware ROC-AUC (Mann-Whitney rank identity, mid-rank ties); score-census shuffle only, ppm integers")

  // ---------------------------------------------------------------- q233
  /** Per-class confusion-matrix metrics for the q48/q230 stopword-vote
    * language-ID rule against the gold `lang` label: tp/fp/fn and
    * precision/recall/F1, all exact. F1 avoids the fractional
    * harmonic-mean composition entirely via the integer identity
    * F1 = 2tp / (2tp + fp + fn) = 2tp / (n_gold + n_pred), so every
    * metric is one integer division. Classes missing on one side (gold
    * `zh` is never predicted; a rule class may win zero golds) surface
    * with zero marginals instead of vanishing — the full-outer join of
    * the two marginals is the class axis. Shape: one scan → three tiny
    * category-keyed aggs (|classes| rows) joined broadcast-small. */
  val q233 = QueryDef(
    "q233_confusion_f1",
    (s, d) => {
      val words = TextStats.wsTokens(lower(col("text")))
      val sEn = TextStats.stopwordCount(words, "en")
      val sDe = TextStats.stopwordCount(words, "de")
      val sFr = TextStats.stopwordCount(words, "fr")
      val sEs = TextStats.stopwordCount(words, "es")
      val predicted = when(sEn >= sDe && sEn >= sFr && sEn >= sEs, "en")
        .when(sDe >= sFr && sDe >= sEs, "de")
        .when(sFr >= sEs, "fr")
        .otherwise("es")
      val t = Tables.documents(s, d)
        .select(col("lang").as("gold"), predicted.as("pred"))
      val gmar = t.groupBy(col("gold").as("cat")).agg(count(lit(1)).as("n_gold"))
      val pmar = t.groupBy(col("pred").as("cat")).agg(count(lit(1)).as("n_pred"))
      val tp = t.filter(col("gold") === col("pred"))
        .groupBy(col("gold").as("cat")).agg(count(lit(1)).as("tp"))
      gmar.join(pmar, Seq("cat"), "full_outer")
        .join(tp, Seq("cat"), "left")
        .select(col("cat"),
          coalesce(col("n_gold"), lit(0L)).as("n_gold"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          coalesce(col("tp"), lit(0L)).as("tp"))
        .select(col("cat"), col("n_gold"), col("n_pred"), col("tp"),
          when(col("n_pred") > 0, expr("(tp * 1000000) div n_pred"))
            .otherwise(lit(0L)).as("precision_ppm"),
          when(col("n_gold") > 0, expr("(tp * 1000000) div n_gold"))
            .otherwise(lit(0L)).as("recall_ppm"),
          when(col("n_gold") + col("n_pred") > 0,
            expr("(2 * tp * 1000000) div (n_gold + n_pred)"))
            .otherwise(lit(0L)).as("f1_ppm"))
        .orderBy(col("cat"))
    },
    Some("""WITH t AS (SELECT lang AS gold,
          CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
               WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
               WHEN s_fr >= s_es THEN 'fr'
               ELSE 'es' END AS pred
        FROM (SELECT lang,
          len(list_filter(string_split(lower(text), ' '), x -> x IN ('the','a','of','and','to'))) s_en,
          len(list_filter(string_split(lower(text), ' '), x -> x IN ('der','die','und','das','ein'))) s_de,
          len(list_filter(string_split(lower(text), ' '), x -> x IN ('le','la','et','les','un'))) s_fr,
          len(list_filter(string_split(lower(text), ' '), x -> x IN ('el','la','y','los','un'))) s_es
        FROM documents)),
      g AS (SELECT gold AS cat, COUNT(*) AS n_gold FROM t GROUP BY 1),
      p AS (SELECT pred AS cat, COUNT(*) AS n_pred FROM t GROUP BY 1),
      tp AS (SELECT gold AS cat, COUNT(*) AS tp FROM t WHERE gold = pred GROUP BY 1),
      m AS (SELECT COALESCE(g.cat, p.cat) AS cat,
          COALESCE(g.n_gold, 0) AS n_gold, COALESCE(p.n_pred, 0) AS n_pred
        FROM g FULL OUTER JOIN p ON g.cat = p.cat)
      SELECT m.cat, m.n_gold, m.n_pred, COALESCE(tp.tp, 0) AS tp,
        CAST(CASE WHEN m.n_pred > 0 THEN (COALESCE(tp.tp, 0) * 1000000) // m.n_pred
          ELSE 0 END AS BIGINT) AS precision_ppm,
        CAST(CASE WHEN m.n_gold > 0 THEN (COALESCE(tp.tp, 0) * 1000000) // m.n_gold
          ELSE 0 END AS BIGINT) AS recall_ppm,
        CAST(CASE WHEN m.n_gold + m.n_pred > 0
          THEN (2 * COALESCE(tp.tp, 0) * 1000000) // (m.n_gold + m.n_pred)
          ELSE 0 END AS BIGINT) AS f1_ppm
      FROM m LEFT JOIN tp ON tp.cat = m.cat ORDER BY m.cat"""),
    doc = "per-class confusion metrics for the lang-ID rule: tp/fp marginals + exact integer precision/recall/F1 (F1 = 2tp/(n_gold+n_pred))")

  // ---------------------------------------------------------------- q234
  /** Autocorrelation function (lags 1-3) of each event type's daily
    * volume series — the "is there weekly structure / is this series
    * white noise" diagnostic before any forecast (q226) is trusted.
    * Mean-centering is kept integral by n-scaling: with n observed days
    * and S = Σx, the centered value n·x_t − S is an integer, and
    * acf(l) = Σ(n·x_t − S)(n·x_{t+l} − S) / Σ(n·x_t − S)² — the n²
    * factors cancel, so the ppm quotient is exact. Both engines truncate
    * integer division toward zero, so negative correlations cross the
    * oracle unchanged. Shape: the daily census is the only full-data
    * pass; lags are lead() taps on the tiny (type × day) frame, one
    * type-partitioned window. Numerator products ride DECIMAL(38,0) /
    * HUGEINT — no overflow ceiling at corpus scale. */
  val q234 = QueryDef(
    "q234_daily_acf",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val tot = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily.join(tot, "event_type")
        .select(col("event_type"), col("day"),
          (col("n") * col("x") - col("sx")).as("cx"))
        .select(col("event_type"), col("cx"),
          lead(col("cx"), 1).over(w).as("c1"),
          lead(col("cx"), 2).over(w).as("c2"),
          lead(col("cx"), 3).over(w).as("c3"))
        .groupBy(col("event_type"))
        .agg(sum(col("cx") * col("cx")).as("den"),
          sum(col("cx") * col("c1")).as("n1"),
          sum(col("cx") * col("c2")).as("n2"),
          sum(col("cx") * col("c3")).as("n3"))
        .selectExpr("event_type", "den", "stack(3, 1, n1, 2, n2, 3, n3) AS (lag, num)")
        .select(col("event_type"), col("lag"),
          when(col("den") > 0,
            expr("(CAST(num AS DECIMAL(38,0)) * 1000000) div den"))
            .otherwise(lit(0L)).as("acf_ppm"))
        .orderBy(col("event_type"), col("lag"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
          COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      tot AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx
        FROM daily GROUP BY 1),
      c AS (SELECT daily.event_type, day, n * x - sx AS cx
        FROM daily JOIN tot USING (event_type)),
      l AS (SELECT event_type, cx,
          lead(cx, 1) OVER (PARTITION BY event_type ORDER BY day) AS c1,
          lead(cx, 2) OVER (PARTITION BY event_type ORDER BY day) AS c2,
          lead(cx, 3) OVER (PARTITION BY event_type ORDER BY day) AS c3
        FROM c),
      a AS (SELECT event_type, CAST(SUM(cx * cx) AS BIGINT) AS den,
          CAST(SUM(cx * c1) AS BIGINT) AS n1, CAST(SUM(cx * c2) AS BIGINT) AS n2,
          CAST(SUM(cx * c3) AS BIGINT) AS n3
        FROM l GROUP BY 1),
      u AS (SELECT event_type, den, 1 AS lag, n1 AS num FROM a
        UNION ALL SELECT event_type, den, 2, n2 FROM a
        UNION ALL SELECT event_type, den, 3, n3 FROM a)
      SELECT event_type, lag,
        CAST(CASE WHEN den > 0 THEN (CAST(num AS HUGEINT) * 1000000) // den
          ELSE 0 END AS BIGINT) AS acf_ppm
      FROM u ORDER BY event_type, lag"""),
    doc = "daily-volume ACF at lags 1-3 per type; n-scaled integer centering makes the ppm quotient exact, negatives truncate identically")

  // ---------------------------------------------------------------- q235
  /** Day-of-week seasonality index per event type: mean daily volume on
    * each ISO weekday relative to the type's overall mean daily volume,
    * as exact ppm — idx = (S_dow·n_all) / (n_dow·S_all) after the
    * fraction-free rearrangement (both means' denominators multiply
    * through, so no intermediate mean is ever materialized as a float).
    * The Monday-based axis uses Spark `weekday()+1` ≡ DuckDB `isodow()`
    * — the 1=Sunday `dayofweek` trap documented in the inventory is
    * avoided, not worked around. Shape: daily census → two nested tiny
    * aggs; nothing beyond the census touches full data. */
  val q235 = QueryDef(
    "q235_dow_seasonality",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .select(col("event_type"), expr("weekday(day) + 1").as("isodow"), col("x"))
      val perDow = daily.groupBy(col("event_type"), col("isodow"))
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("s_dow"))
      val perType = perDow.groupBy(col("event_type"))
        .agg(sum(col("n_days")).as("n_all"), sum(col("s_dow")).as("s_all"))
      perDow.join(perType, "event_type")
        .select(col("event_type"), col("isodow"), col("n_days"),
          expr("(s_dow * n_all * 1000000) div (n_days * s_all)").as("idx_ppm"))
        .orderBy(col("event_type"), col("isodow"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
          COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      pd AS (SELECT event_type, isodow(day) AS isodow, COUNT(*) AS n_days,
          CAST(SUM(x) AS BIGINT) AS s_dow
        FROM daily GROUP BY 1, 2),
      pt AS (SELECT event_type, CAST(SUM(n_days) AS BIGINT) AS n_all,
          CAST(SUM(s_dow) AS BIGINT) AS s_all
        FROM pd GROUP BY 1)
      SELECT pd.event_type, pd.isodow, pd.n_days,
        CAST((pd.s_dow * pt.n_all * 1000000) // (pd.n_days * pt.s_all) AS BIGINT)
          AS idx_ppm
      FROM pd JOIN pt USING (event_type) ORDER BY event_type, isodow"""),
    doc = "ISO-weekday seasonality index per type, fraction-free exact ppm; weekday()+1 == isodow kills the 1=Sunday trap")

  // ---------------------------------------------------------------- q240
  /** Sequence-pattern census over session paths — the MATCH_RECOGNIZE
    * shape without the clause: each (user, day) session collapses to an
    * ordered string of event initials (v/c/p/s/e), and a regex grades the
    * journey — here `v[^e]*p`: a view later converted to a purchase with
    * NO intervening error. Ordering inside the collapse is exact: the
    * sort key is (µs timestamp, event_id) — `ts_ns div 1000` ≡ DuckDB's
    * µs-precision reads per the inventory's timestamp convention — and
    * the collapse itself is sort_array over collected structs (engine-
    * order-independent), not a window concat. The pattern uses only
    * character-class atoms, identical under Java and RE2 regex
    * semantics. Shape: one (user, day) shuffle; paths are session-length
    * strings, the census is a tiny per-day agg. */
  val q240 = QueryDef(
    "q240_path_pattern",
    (s, d) => {
      val paths = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"),
          struct(expr("ts_ns div 1000").as("us"), col("event_id").as("eid"),
            substring(col("event_type"), 1, 1).as("ch")).as("st"))
        .groupBy(col("user_id"), col("day"))
        .agg(array_join(expr("transform(array_sort(collect_list(st)), x -> x.ch)"), "")
          .as("path"))
      paths
        .groupBy(col("day"))
        .agg(count(lit(1)).as("sessions"),
          sum(when(col("path").rlike("v[^e]*p"), 1L).otherwise(0L)).as("converted"))
        .select(col("day"), col("sessions"), col("converted"),
          expr("(converted * 1000000) div sessions").as("converted_ppm"))
        .orderBy(col("day"))
    },
    Some("""WITH p AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
          string_agg(substring(event_type, 1, 1), '' ORDER BY epoch_us(ts), event_id)
            AS path
        FROM events GROUP BY 1, 2)
      SELECT day, COUNT(*) AS sessions,
        CAST(SUM(CASE WHEN regexp_matches(path, 'v[^e]*p') THEN 1 ELSE 0 END) AS BIGINT)
          AS converted,
        CAST((SUM(CASE WHEN regexp_matches(path, 'v[^e]*p') THEN 1 ELSE 0 END) * 1000000)
          // COUNT(*) AS BIGINT) AS converted_ppm
      FROM p GROUP BY day ORDER BY day"""),
    doc = "MATCH_RECOGNIZE-shaped session path regex census: view->purchase with no intervening error, exact (us, event_id) ordering")

  // ---------------------------------------------------------------- q241
  /** Average Precision at 100 — the ranked-retrieval companion to q232:
    * take the global top-100 events by model score (ties broken by
    * event_id, the inventory's determinism convention), walk the ranking,
    * and average precision@k over the positive hits. Normalization is by
    * positives WITHIN the cutoff (the AP@K variant that stays defined
    * when total positives exceed the cutoff); each precision term is an
    * integer ppm division, and per-term flooring is part of the metric's
    * definition on both sides — bit-identical. Shape: the top-100 is a
    * TakeOrderedAndProject (per-partition heaps, no global sort of the
    * full data); the window walk then runs over exactly 100 rows. */
  val q241 = QueryDef(
    "q241_avg_precision",
    (s, d) => {
      val top = Tables.events(s, d)
        .select(predPpm.as("pred"), col("event_id"), posLabel.as("pos"))
        .orderBy(col("pred").desc, col("event_id"))
        .limit(100)
      val ord = BoundedWindow.over(col("event_id")).orderBy(col("pred").desc, col("event_id"))
      top
        .withColumn("k", row_number().over(ord))
        .withColumn("cum_pos", sum(col("pos")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .agg(sum(col("pos")).as("pos_in_top"),
          sum(when(col("pos") === 1, expr("(cum_pos * 1000000) div k"))
            .otherwise(0L)).as("sum_prec_ppm"))
        .select(col("pos_in_top"),
          when(col("pos_in_top") > 0, expr("sum_prec_ppm div pos_in_top"))
            .otherwise(lit(0L)).as("ap_ppm"))
    },
    Some("""WITH b AS (SELECT least(CAST(floor(value * 2000) AS BIGINT), 999999) AS pred,
          event_id,
          CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS pos
        FROM events),
      top AS (SELECT * FROM b ORDER BY pred DESC, event_id LIMIT 100),
      r AS (SELECT pos,
          ROW_NUMBER() OVER (ORDER BY pred DESC, event_id) AS k,
          SUM(pos) OVER (ORDER BY pred DESC, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
        FROM top),
      a AS (SELECT CAST(SUM(pos) AS BIGINT) AS pos_in_top,
          CAST(SUM(CASE WHEN pos = 1 THEN (cum_pos * 1000000) // k ELSE 0 END) AS BIGINT)
            AS sum_prec_ppm
        FROM r)
      SELECT pos_in_top,
        CAST(CASE WHEN pos_in_top > 0 THEN sum_prec_ppm // pos_in_top
          ELSE 0 END AS BIGINT) AS ap_ppm
      FROM a"""),
    doc = "AP@100 over the model-score ranking; top-k via per-partition heaps, per-term integer ppm precision — exact by definition")

  // ---------------------------------------------------------------- q242
  /** Cumulative gains / lift table by score decile — q231's reliability
    * bins re-read for TARGETING: walking deciles from the highest score
    * down, what share of all positives has been captured (gain) and how
    * much better than random is the slice so far (lift)? The grand
    * totals ride an unbounded window over the 10-row bin frame — no
    * crossJoin, no second pass. All ratios are fraction-free integer
    * rearrangements (cum_pos·total_n·10⁶ div (cum_n·total_pos)), exact
    * in both engines. Shape: one full-data census into ≤10 bins, then
    * window math on 10 rows. */
  val q242 = QueryDef(
    "q242_cumulative_gains",
    (s, d) => {
      val bins = Tables.events(s, d)
        .select(predPpm.as("pred"), posLabel.as("pos"))
        .groupBy(expr("pred div 100000").as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("pos"))
      val desc = BoundedWindow.over(col("bin")).orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = BoundedWindow.over(col("bin")).orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      bins
        .withColumn("cum_n", sum(col("n")).over(desc))
        .withColumn("cum_pos", sum(col("pos")).over(desc))
        .withColumn("tot_n", sum(col("n")).over(all))
        .withColumn("tot_pos", sum(col("pos")).over(all))
        .select(col("bin"), col("n"), col("pos"), col("cum_pos"),
          when(col("tot_pos") > 0, expr("(cum_pos * 1000000) div tot_pos"))
            .otherwise(lit(0L)).as("gain_ppm"),
          when(col("cum_n") * col("tot_pos") > 0,
            expr("(cum_pos * tot_n * 1000000) div (cum_n * tot_pos)"))
            .otherwise(lit(0L)).as("lift_ppm"))
        .orderBy(col("bin").desc)
    },
    Some("""WITH b AS (SELECT least(CAST(floor(value * 2000) AS BIGINT), 999999) AS pred,
          CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS pos
        FROM events),
      g AS (SELECT pred // 100000 AS bin, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS pos
        FROM b GROUP BY 1),
      w AS (SELECT bin, n, pos,
          SUM(n) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
          SUM(pos) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
          SUM(n) OVER () AS tot_n, SUM(pos) OVER () AS tot_pos
        FROM g)
      SELECT bin, n, pos, CAST(cum_pos AS BIGINT) AS cum_pos,
        CAST(CASE WHEN tot_pos > 0 THEN (cum_pos * 1000000) // tot_pos
          ELSE 0 END AS BIGINT) AS gain_ppm,
        CAST(CASE WHEN cum_n * tot_pos > 0
          THEN (cum_pos * tot_n * 1000000) // (cum_n * tot_pos)
          ELSE 0 END AS BIGINT) AS lift_ppm
      FROM w ORDER BY bin DESC"""),
    doc = "decile cumulative gains + lift from the q231 bins; unbounded-window totals, fraction-free exact ppm")

  // ---------------------------------------------------------------- q247
  /** A/B test evaluation as an exact 2×2 chi-square — the experimentation
    * primitive behind every "did the treatment move conversion" readout.
    * Cohorts are weekday vs weekend traffic (a deterministic assignment
    * both engines derive identically); outcome is purchase. For a 2×2
    * table the statistic collapses to ONE fraction —
    * χ² = N(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)) — so a single integer
    * division yields the exact ppm value, no per-cell float E. The
    * determinant and its square ride DECIMAL(38,0)/HUGEINT (ad−bc can
    * reach ~N²/4, its square ~N⁴/16 — headroom to N ≈ 10⁸ rows, and the
    * cohort counts this divides by would be pre-aggregated long before
    * that). Shape: ONE conditional-sum aggregation over the scan; the
    * arithmetic happens on a 1-row frame. χ² ≥ 3.84 ⇒ p < 0.05 at 1 dof
    * — the verdict column bakes that literal. */
  val q247 = QueryDef(
    "q247_ab_test",
    (s, d) => {
      val isWeekend = expr("weekday(date_trunc('day', ts)) + 1") >= 6
      val isConv = col("event_type") === "purchase"
      Tables.events(s, d)
        .agg(
          sum(when(!isWeekend && isConv, 1L).otherwise(0L)).as("a"),
          sum(when(!isWeekend && !isConv, 1L).otherwise(0L)).as("b"),
          sum(when(isWeekend && isConv, 1L).otherwise(0L)).as("c"),
          sum(when(isWeekend && !isConv, 1L).otherwise(0L)).as("dd"))
        .select(col("a"), col("b"), col("c"), col("dd"),
          expr("CAST(a AS DECIMAL(38,0)) * dd - CAST(b AS DECIMAL(38,0)) * c").as("det"),
          expr("CAST(a + b AS DECIMAL(38,0)) * (c + dd) * (a + c) * (b + dd)").as("den"))
        .select(
          (col("a") + col("b")).as("n_weekday"),
          (col("c") + col("dd")).as("n_weekend"),
          col("a").as("conv_weekday"), col("c").as("conv_weekend"),
          when(col("den") > 0,
            expr("((a + b + c + dd) * det * det * 1000000) div den"))
            .otherwise(lit(0L)).as("chi2_ppm"))
        .select(col("n_weekday"), col("n_weekend"), col("conv_weekday"),
          col("conv_weekend"), col("chi2_ppm"),
          (col("chi2_ppm") >= 3841459L).as("significant_05"))
    },
    Some("""WITH t AS (SELECT
          CASE WHEN isodow(date_trunc('day', ts)) >= 6 THEN 1 ELSE 0 END AS wk,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events),
      g AS (SELECT
          CAST(SUM(CASE WHEN wk = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN wk = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
          CAST(SUM(CASE WHEN wk = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(SUM(CASE WHEN wk = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd
        FROM t),
      h AS (SELECT a, b, c, dd,
          CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * c AS det,
          CAST(a + b AS HUGEINT) * (c + dd) * (a + c) * (b + dd) AS den
        FROM g),
      r AS (SELECT a + b AS n_weekday, c + dd AS n_weekend,
          a AS conv_weekday, c AS conv_weekend,
          CAST(CASE WHEN den > 0
            THEN ((a + b + c + dd) * det * det * 1000000) // den
            ELSE 0 END AS BIGINT) AS chi2_ppm
        FROM h)
      SELECT n_weekday, n_weekend, conv_weekday, conv_weekend, chi2_ppm,
        chi2_ppm >= 3841459 AS significant_05
      FROM r"""),
    doc = "2x2 chi-square A/B readout (weekday vs weekend conversion), single exact fraction, p<0.05 verdict baked as a ppm literal")

  // ---------------------------------------------------------------- q249
  /** Operating-threshold selection — the step between q232's AUC ("the
    * scores rank well") and q231's calibration ("the probabilities mean
    * something"): which cutoff should PRODUCTION use? Every distinct
    * score is a candidate threshold (classify positive at score ≥ t);
    * a descending cumulative over the score census yields exact TP/FP at
    * each, and two criteria pick their argmax — Youden's J (TPR − FPR,
    * the balanced choice) and F1 (via the integer identity
    * 2tp/(predicted_pos + P), the imbalanced choice). Ties resolve to
    * the LOWEST threshold (higher recall at equal score) — pinned by the
    * (score desc, pred asc) row_number on both sides. All integer ppm;
    * J can go negative and truncation toward zero matches. Shape: the
    * q232 layout — one score census full-data pass, then windows over
    * the bounded score domain. */
  val q249 = QueryDef(
    "q249_threshold_sweep",
    (s, d) => {
      val byScore = Tables.events(s, d)
        .select(predPpm.as("pred"), posLabel.as("pos"))
        .groupBy(col("pred"))
        .agg(count(lit(1)).as("c"), sum(col("pos")).as("p"))
      val desc = BoundedWindow.over(col("pred")).orderBy(col("pred").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = BoundedWindow.over(col("pred")).orderBy(col("pred").desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val swept = byScore
        .withColumn("tp", sum(col("p")).over(desc))
        .withColumn("pp", sum(col("c")).over(desc))
        .withColumn("tot_p", sum(col("p")).over(all))
        .withColumn("tot_n", sum(col("c") - col("p")).over(all))
        .select(col("pred"), col("tp"), (col("pp") - col("tp")).as("fp"),
          when(col("tot_p") > 0 && col("tot_n") > 0,
            expr("(tp * 1000000) div tot_p - ((pp - tp) * 1000000) div tot_n"))
            .otherwise(lit(0L)).as("youden_ppm"),
          when(col("pp") + col("tot_p") > 0,
            expr("(2 * tp * 1000000) div (pp + tot_p)"))
            .otherwise(lit(0L)).as("f1_ppm"))
      val wc = Window.partitionBy(col("criterion"))
        .orderBy(col("score_ppm").desc, col("pred"))
      swept
        .selectExpr("pred", "tp", "fp",
          "stack(2, 'f1', f1_ppm, 'youden', youden_ppm) AS (criterion, score_ppm)")
        .withColumn("rn", row_number().over(wc)).filter(col("rn") === 1)
        .select(col("criterion"), col("pred").as("threshold_ppm"),
          col("tp"), col("fp"), col("score_ppm"))
        .orderBy(col("criterion"))
    },
    Some("""WITH b AS (SELECT least(CAST(floor(value * 2000) AS BIGINT), 999999) AS pred,
          CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS pos
        FROM events),
      g AS (SELECT pred, COUNT(*) AS c, CAST(SUM(pos) AS BIGINT) AS p
        FROM b GROUP BY pred),
      sw AS (SELECT pred,
          SUM(p) OVER (ORDER BY pred DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
          SUM(c) OVER (ORDER BY pred DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
          SUM(p) OVER () AS tot_p, SUM(c - p) OVER () AS tot_n
        FROM g),
      m AS (SELECT pred, tp, pp - tp AS fp,
          CASE WHEN tot_p > 0 AND tot_n > 0
            THEN (tp * 1000000) // tot_p - ((pp - tp) * 1000000) // tot_n
            ELSE 0 END AS youden_ppm,
          CASE WHEN pp + tot_p > 0 THEN (2 * tp * 1000000) // (pp + tot_p)
            ELSE 0 END AS f1_ppm
        FROM sw),
      u AS (SELECT pred, tp, fp, 'f1' AS criterion, f1_ppm AS score_ppm FROM m
        UNION ALL SELECT pred, tp, fp, 'youden', youden_ppm FROM m),
      r AS (SELECT criterion, pred, tp, fp, score_ppm,
          ROW_NUMBER() OVER (PARTITION BY criterion
            ORDER BY score_ppm DESC, pred) AS rn
        FROM u)
      SELECT criterion, pred AS threshold_ppm, CAST(tp AS BIGINT) AS tp,
        CAST(fp AS BIGINT) AS fp, CAST(score_ppm AS BIGINT) AS score_ppm
      FROM r WHERE rn = 1 ORDER BY criterion"""),
    doc = "operating-threshold argmax for Youden J and F1 over the exact score sweep; lowest-threshold tie-break pinned both sides")

  // ---------------------------------------------------------------- q250
  /** Poisson-bootstrap confidence interval for mean purchase value — THE
    * distributed bootstrap: instead of resampling rows (impossible in one
    * pass), every row carries a deterministic per-replica weight with
    * mean 1, here Binomial(4, ¼) read off four md5 hex digits of
    * (event_id, replica) — bit-identical in both engines, no RNG state,
    * no shuffle of the raw data beyond one 32-way weighted aggregation
    * whose partial aggregates collapse to B rows per task. Replica means
    * use integer cents (value·100 rounds exactly — the fixture has 2
    * decimals); the CI is the 2nd/31st order statistic of the 32 replica
    * means (replica id tie-break), and the point estimate rides the same
    * output row via a whitelisted 1-row broadcast crossJoin. At 100 TB
    * the 32× aggregation input is the entire cost and B is the knob —
    * this is how Spark pipelines put error bars on anything without a
    * second pass over the data. */
  val q250 = QueryDef(
    "q250_bootstrap_ci",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      val h = md5(concat(col("event_id").cast("string"), lit(":"),
        col("b").cast("string")))
      val w = (1 to 4).map(k =>
          when(substring(h, k, 1).isin("0", "1", "2", "3"), 1L).otherwise(0L))
        .reduce(_ + _)
      val means = ev
        .select(col("event_id"), col("cents"),
          explode(sequence(lit(0), lit(31))).as("b"))
        .select(col("b"), col("cents"), w.as("w"))
        .groupBy(col("b"))
        .agg(sum(col("w")).as("sw"), sum(col("cents") * col("w")).as("swc"))
        .select(col("b"),
          when(col("sw") > 0, expr("swc div sw")).otherwise(lit(0L)).as("mean_cents"))
      val ranked = means.withColumn("rn",
        row_number().over(BoundedWindow.over(col("b")).orderBy(col("mean_cents"), col("b"))))
      val point = broadcast(ev.agg(
        expr("sum(cents) div count(1)").as("point_cents")))
      ranked
        .agg(min(when(col("rn") === 2, col("mean_cents"))).as("lo_cents"),
          min(when(col("rn") === 31, col("mean_cents"))).as("hi_cents"))
        .crossJoin(point)
        .select(col("point_cents"), col("lo_cents"), col("hi_cents"))
    },
    Some("""WITH ev AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      rep AS (SELECT ev.event_id, ev.cents, r.range AS b FROM ev, range(0, 32) r),
      wt AS (SELECT b, cents,
          (CASE WHEN substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 1)
             IN ('0','1','2','3') THEN 1 ELSE 0 END
          + CASE WHEN substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 2, 1)
             IN ('0','1','2','3') THEN 1 ELSE 0 END
          + CASE WHEN substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 3, 1)
             IN ('0','1','2','3') THEN 1 ELSE 0 END
          + CASE WHEN substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 4, 1)
             IN ('0','1','2','3') THEN 1 ELSE 0 END) AS w
        FROM rep),
      mn AS (SELECT b,
          CASE WHEN SUM(w) > 0 THEN CAST(SUM(cents * w) AS BIGINT) // CAST(SUM(w) AS BIGINT)
            ELSE 0 END AS mean_cents
        FROM wt GROUP BY b),
      rk AS (SELECT mean_cents,
          ROW_NUMBER() OVER (ORDER BY mean_cents, b) AS rn FROM mn),
      ci AS (SELECT MIN(CASE WHEN rn = 2 THEN mean_cents END) AS lo_cents,
          MIN(CASE WHEN rn = 31 THEN mean_cents END) AS hi_cents FROM rk),
      pt AS (SELECT CAST(SUM(cents) AS BIGINT) // COUNT(*) AS point_cents FROM ev)
      SELECT CAST(point_cents AS BIGINT) AS point_cents,
        CAST(lo_cents AS BIGINT) AS lo_cents, CAST(hi_cents AS BIGINT) AS hi_cents
      FROM ci CROSS JOIN pt"""),
    doc = "Poisson-bootstrap CI (B=32, deterministic md5 Binomial(4,1/4) weights) for mean purchase value; order-statistic bounds, one weighted agg")

  // --------------------------------------------------------------- q296
  /** Bradley–Terry strength fitting over pairwise preferences — the
    * preference-data shape behind reward-model training and arena-style
    * evals: given "A beat B" comparisons, fit a latent strength per
    * player such that P(i beats j) = wᵢ/(wᵢ+wⱼ). Players are the corpus
    * SOURCES; matches are hash-bucketed cross-source document pairs
    * (md5-derived buckets — the match-making analogue of LSH blocking:
    * pair work is n²/B per bucket, never corpus²); the judge is the q50
    * quality score (ties to the lower doc_id, so every match has a
    * deterministic winner). Two unrolled MM iterations
    * (wᵢ ← Wᵢ / Σⱼ nᵢⱼ/(wᵢ+wⱼ), then normalize) from a uniform start —
    * the minorize-maximize update that monotonically climbs the BT
    * likelihood.
    *
    * Determinism discipline: every per-(i,j) term rounds to 9 dp BEFORE
    * the decimal-accumulator sum (associative ⇒ order-free), every
    * iterate rounds to 9 dp, divisions are single IEEE ops — the whole
    * fit is bit-identical cross-engine without a transcendental. Scale:
    * after the bucketed pair join everything is |players|²-bounded;
    * iteration count is the knob (each is one bounded join round). */
  val q296 = QueryDef(
    "q296_bradley_terry",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        round(graft.ext.TextStats.qualityScore(col("text")), 6).as("q"),
        (expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)")
          % 50L).as("blk"))
      val pairs = docs.as("a").join(docs.as("b"),
          col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id")
            && col("a.source") =!= col("b.source"))
        .select(col("a.source").as("sa"), col("b.source").as("sb"),
          (col("a.q") >= col("b.q")).as("a_wins"))
      val byPair = pairs.groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n"), sum(when(col("a_wins"), 1L).otherwise(0L)).as("wa"))
      // lazy checkpoint: the |players|²-bounded win matrix is referenced by
      // totals + BOTH iteration rounds — materialize the bucketed pair
      // join once, not once per reference
      val g = byPair.select(col("sa").as("i"), col("sb").as("j"), col("n"),
          col("wa").as("wi"))
        .unionByName(byPair.select(col("sb").as("i"), col("sa").as("j"), col("n"),
          (col("n") - col("wa")).as("wi")))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("n")).as("g"), sum(col("wi")).as("wi"))
        .localCheckpoint(false)
      val totals = g.groupBy(col("i"))
        .agg(sum(col("g")).as("games"), sum(col("wi")).as("wins"))
      val nPlayers = broadcast(totals.agg(count(lit(1)).as("np")))
      val w0 = totals.select(col("i")).crossJoin(nPlayers)
        .select(col("i"), round(lit(1.0) / col("np"), 9).as("wv"))
      def iterate(w: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val terms = g
          .join(w.select(col("i"), col("wv").as("w_i")), "i")
          .join(w.select(col("i").as("j"), col("wv").as("w_j")), "j")
          .select(col("i"), round(col("g") / (col("w_i") + col("w_j")), 9).as("t"))
        val denom = terms.groupBy(col("i"))
          .agg(sum(col("t").cast(DecimalType(28, 10))).cast("double").as("den"))
        val raw = totals.join(denom, "i")
          .select(col("i"), round(col("wins") / col("den"), 9).as("wr"))
        val tot = broadcast(raw.agg(
          sum(col("wr").cast(DecimalType(28, 10))).cast("double").as("sw")))
        raw.crossJoin(tot)
          .select(col("i"), round(col("wr") / col("sw"), 9).as("wv"))
      }
      totals.join(iterate(iterate(w0)), "i")
        .select(col("i").as("source"), col("games"), col("wins"),
          round(col("wv"), 6).as("strength"))
        .orderBy(col("source"))
    },
    Some("""WITH docs AS (SELECT doc_id, source,
          round(least(len(string_split(lower(text), ' '))::DOUBLE / 50.0, 1.0) * 0.4
            + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                / greatest(length(text)::DOUBLE, 1.0) * 10.0, 1.0)) * 0.3
            + (len(list_filter(string_split(lower(text), ' '),
                x -> x IN ('the','a','of','and','to')))::DOUBLE
               / len(string_split(lower(text), ' '))::DOUBLE) * 0.3, 6) AS q,
          CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT) % 50 AS blk
        FROM documents),
      pairs AS (SELECT a.source AS sa, b.source AS sb, (a.q >= b.q) AS a_wins
        FROM docs a JOIN docs b ON a.blk = b.blk AND a.doc_id < b.doc_id
          AND a.source <> b.source),
      bypair AS (SELECT sa, sb, COUNT(*) AS n,
          CAST(SUM(CASE WHEN a_wins THEN 1 ELSE 0 END) AS BIGINT) AS wa
        FROM pairs GROUP BY sa, sb),
      g AS (SELECT i, j, CAST(SUM(n) AS BIGINT) AS g, CAST(SUM(wi) AS BIGINT) AS wi
        FROM (SELECT sa AS i, sb AS j, n, wa AS wi FROM bypair
              UNION ALL SELECT sb, sa, n, n - wa FROM bypair)
        GROUP BY i, j),
      totals AS (SELECT i, CAST(SUM(g) AS BIGINT) AS games,
          CAST(SUM(wi) AS BIGINT) AS wins FROM g GROUP BY i),
      np AS (SELECT COUNT(*) AS np FROM totals),
      w0 AS (SELECT i, round(1.0 / np, 9) AS wv FROM totals CROSS JOIN np),
      t1 AS (SELECT g.i, round(g.g / (a.wv + b.wv), 9) AS t
        FROM g JOIN w0 a ON a.i = g.i JOIN w0 b ON b.i = g.j),
      d1 AS (SELECT i, CAST(SUM(CAST(t AS DECIMAL(28,10))) AS DOUBLE) AS den
        FROM t1 GROUP BY i),
      r1 AS (SELECT totals.i, round(totals.wins / d1.den, 9) AS wr
        FROM totals JOIN d1 ON d1.i = totals.i),
      s1 AS (SELECT CAST(SUM(CAST(wr AS DECIMAL(28,10))) AS DOUBLE) AS sw FROM r1),
      w1 AS (SELECT i, round(wr / sw, 9) AS wv FROM r1 CROSS JOIN s1),
      t2 AS (SELECT g.i, round(g.g / (a.wv + b.wv), 9) AS t
        FROM g JOIN w1 a ON a.i = g.i JOIN w1 b ON b.i = g.j),
      d2 AS (SELECT i, CAST(SUM(CAST(t AS DECIMAL(28,10))) AS DOUBLE) AS den
        FROM t2 GROUP BY i),
      r2 AS (SELECT totals.i, round(totals.wins / d2.den, 9) AS wr
        FROM totals JOIN d2 ON d2.i = totals.i),
      s2 AS (SELECT CAST(SUM(CAST(wr AS DECIMAL(28,10))) AS DOUBLE) AS sw FROM r2),
      w2 AS (SELECT i, round(wr / sw, 9) AS wv FROM r2 CROSS JOIN s2)
      SELECT totals.i AS source, games, wins, round(w2.wv, 6) AS strength
      FROM totals JOIN w2 ON w2.i = totals.i ORDER BY source"""),
    doc = "Bradley-Terry strength fit over hash-bucketed cross-source quality preferences: two decimal-exact MM iterations, the reward-model preference-data audit")

  val all: Seq[QueryDef] = Seq(q232, q233, q234, q235, q240, q241, q242, q247,
    q249, q250, q296)
}
