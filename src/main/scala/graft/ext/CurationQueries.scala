package graft.ext

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Corpus-curation tier (round-4 extension): the filters and corpus-mining
  * passes a training-data pipeline runs between raw ingest and dedup —
  * collocation mining (PMI), a Gopher-style rule-based quality gate, and the
  * FineWeb-style duplicated-n-gram fraction. Everything here is designed
  * integer-exact (counts, scaled rational scores) so the DuckDB oracle
  * hash-matches bit-for-bit; the only doubles are final round(x, 6) ratios
  * of small integers, the convention the rest of the inventory uses.
  *
  * Reference tie-in: the reference has no text analytics (its analytics
  * surface stops at the Postgres events table, /root/reference/src/kinesis3/
  * db.clj:70-97); this tier is part of the declared north-star extension
  * set (SURVEY §2.C) graded alongside it. */
object CurationQueries {

  // --------------------------------------------------------------- q114
  /** Bigram collocation mining ranked by PMI. PMI(x,y) =
    * ln(c_xy·N_uni² / (N_bi·c_x·c_y)); with N_uni/N_bi constant per corpus
    * the RANKING is monotone in the rational c_xy/(c_x·c_y), so the query
    * emits the exact scaled integer score = c_xy·10¹² div (c_x·c_y)
    * instead of a transcendental — bit-identical across engines (ln is
    * correctly-rounded nowhere). The numerator is computed in
    * DECIMAL(38,0) with exact integral division (`div`), so the score
    * stays exact to c_xy < 10²⁶ occurrences of one bigram — no
    * realistic corpus reaches it (the previous long/double form capped
    * at ~9M).
    *
    * Scale shape: bigrams/unigrams are map-side explodes; both aggs
    * shuffle on the token string (vocabulary keys — sublinear in corpus
    * size); the two unigram-count joins broadcast (word-type vocabulary is
    * ~always broadcast-size; were it not, they are plain equi-joins and
    * AQE picks the shuffle strategy). min-count 10 prunes the long tail
    * before the joins. */
  val q114 = QueryDef(
    "q114_bigram_pmi",
    (s, d) => {
      val w = Tables.documents(s, d)
        .select(split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
      val pairs = w
        .select(explode(transform(sequence(lit(0), size(col("w")) - 2), i =>
          struct(element_at(col("w"), i + 1).as("x"),
            element_at(col("w"), i + 2).as("y")))).as("p"))
        .select(col("p.x").as("x"), col("p.y").as("y"))
      val uni = w.select(explode(col("w")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
      val bi = pairs.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 10)
      bi
        .join(broadcast(uni.select(col("t"), col("c").as("c_x"))), col("x") === col("t")).drop("t")
        .join(broadcast(uni.select(col("t"), col("c").as("c_y"))), col("y") === col("t")).drop("t")
        .select(concat_ws(" ", col("x"), col("y")).as("bigram"),
          col("c_xy"), col("c_x"), col("c_y"),
          expr("""(cast(c_xy as decimal(38,0)) * 1000000000000)
                  div (cast(c_x as decimal(38,0)) * c_y)""").as("score"))
        .orderBy(col("score").desc, col("bigram"))
        .limit(20)
    },
    Some("""WITH w AS (SELECT string_split(text, ' ') AS a FROM documents
               WHERE len(string_split(text, ' ')) >= 2),
      uni AS (SELECT unnest(a) AS t FROM w),
      uc AS (SELECT t, count(*) AS c FROM uni GROUP BY t),
      bg AS (SELECT unnest([a[i] || ' ' || a[i+1] for i in range(1, len(a))]) AS bigram FROM w),
      bc AS (SELECT bigram, count(*) AS c_xy FROM bg GROUP BY bigram HAVING count(*) >= 10)
      SELECT bc.bigram, bc.c_xy, ux.c AS c_x, uy.c AS c_y,
        bc.c_xy * 1000000000000 // (ux.c * uy.c) AS score
      FROM bc
      JOIN uc ux ON split_part(bc.bigram, ' ', 1) = ux.t
      JOIN uc uy ON split_part(bc.bigram, ' ', 2) = uy.t
      ORDER BY score DESC, bigram LIMIT 20"""),
    doc = "PMI collocations as an exact scaled-integer rank — no transcendentals cross the oracle")

  // --------------------------------------------------------------- q115
  /** Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1 family),
    * thresholds re-centered on this corpus (10-99 words/doc, single-space
    * joined — an invariant the mean-word-length rule exploits:
    * letters = length(text) - (n_words - 1), verified on the corpus).
    * Every rule is an INTEGER comparison (3·n ≤ letters ≤ 9·n instead of
    * a float mean), so the per-source verdict counts are exact.
    * Per-row scalar work + one tiny agg keyed by source — linear, no
    * join, the cheapest possible 100 TB shape. */
  val q115 = QueryDef(
    "q115_quality_gate",
    (s, d) => {
      val w = split(col("text"), " ")
      val nW = size(w).cast("long")
      val letters = (length(col("text")) - (size(w) - 1)).cast("long")
      val stop = size(filter(w, t => t.isin("the", "a", "of", "and", "to"))).cast("long")
      val nDistinct = size(array_distinct(w)).cast("long")
      val rLen = nW >= 20 && nW <= 80
      val rWordLen = letters >= nW * 3 && letters <= nW * 9
      val rStop = stop >= 2
      val rDistinct = nDistinct >= 8
      Tables.documents(s, d)
        .select(col("source"), rLen.as("r_len"), rWordLen.as("r_word_len"),
          rStop.as("r_stop"), rDistinct.as("r_distinct"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!col("r_len"), 1L).otherwise(0L)).as("fail_len"),
          sum(when(!col("r_word_len"), 1L).otherwise(0L)).as("fail_word_len"),
          sum(when(!col("r_stop"), 1L).otherwise(0L)).as("fail_stop"),
          sum(when(!col("r_distinct"), 1L).otherwise(0L)).as("fail_distinct"),
          sum(when(col("r_len") && col("r_word_len") && col("r_stop") && col("r_distinct"),
            1L).otherwise(0L)).as("n_keep"))
        .orderBy(col("source"))
    },
    Some("""WITH f AS (SELECT source,
        len(string_split(text, ' ')) AS n_w,
        length(text) - len(string_split(text, ' ')) + 1 AS letters,
        len(list_filter(string_split(text, ' '),
          t -> t IN ('the','a','of','and','to'))) AS stop,
        len(list_distinct(string_split(text, ' '))) AS n_d
      FROM documents),
      r AS (SELECT source,
        (n_w BETWEEN 20 AND 80) AS r_len,
        (letters BETWEEN n_w * 3 AND n_w * 9) AS r_word_len,
        (stop >= 2) AS r_stop,
        (n_d >= 8) AS r_distinct
      FROM f)
      SELECT source, count(*) AS n_docs,
        CAST(sum(CASE WHEN NOT r_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
        CAST(sum(CASE WHEN NOT r_word_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_len,
        CAST(sum(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
        CAST(sum(CASE WHEN NOT r_distinct THEN 1 ELSE 0 END) AS BIGINT) AS fail_distinct,
        CAST(sum(CASE WHEN r_len AND r_word_len AND r_stop AND r_distinct
          THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
      FROM r GROUP BY source ORDER BY source"""),
    doc = "Gopher-rule gate with integer-exact thresholds; per-source fail breakdown")

  // --------------------------------------------------------------- q116
  /** FineWeb-style duplicated-n-gram fraction: per document, the share of
    * its DISTINCT word 5-grams that also occur in at least one other
    * document (Penedo et al. 2024's dup_ngram signal; complements q95's
    * within-doc repetition with the cross-doc view).
    *
    * Scale shape: per-doc distinct 5-grams explode map-side; the global
    * occurrence count groups on xxhash64(gram) — an 8-byte shuffle key,
    * with the q40-pattern collision guard buffering min/max of a second
    * independent digest (Dedup.guardHash: fixed 8-byte buffers, no gram
    * text in the shuffle; a collision on BOTH hashes ≈ 2⁻¹²⁸ raises
    * instead of silently merging). The gram→count join is a plain
    * equi-join on the same 8-byte key, then a per-doc agg. */
  val q116 = QueryDef(
    "q116_dup_ngram_fraction",
    (s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"),
          explode(array_distinct(transform(sequence(lit(0), size(col("w")) - 5), i =>
            concat_ws(" ", slice(col("w"), i + 1, lit(5)))))).as("g"))
        .select(col("doc_id"), col("g"), xxhash64(col("g")).as("gh"))
      val counts = grams.groupBy(col("gh"))
        .agg(count(lit(1)).as("n_docs_with"),
          min(Dedup.guardHash(col("g"))).as("g_min"),
          max(Dedup.guardHash(col("g"))).as("g_max"))
        .select(col("gh"),
          when(col("g_min") =!= col("g_max"),
            raise_error(lit("q116: xxhash64 collision — distinct grams in one group"))
              .cast("long"))
            .otherwise(col("n_docs_with")).as("n_docs_with"))
      grams.join(counts, "gh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("n_docs_with") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .select(col("doc_id"), col("n_grams"), col("n_shared"),
          round(col("n_shared").cast("double") / col("n_grams"), 6).as("shared_frac"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents
               WHERE len(string_split(text, ' ')) >= 5),
      g AS (SELECT DISTINCT doc_id,
              unnest([array_to_string(a[i:i+4], ' ') for i in range(1, len(a)-3)]) AS g
            FROM w),
      c AS (SELECT g, count(*) AS n_docs_with FROM g GROUP BY g)
      SELECT g.doc_id, count(*) AS n_grams,
        CAST(sum(CASE WHEN c.n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        round(CAST(sum(CASE WHEN c.n_docs_with >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*), 6) AS shared_frac
      FROM g JOIN c USING (g)
      GROUP BY g.doc_id ORDER BY g.doc_id"""),
    doc = "cross-doc duplicated-5-gram share; 8-byte hash shuffle + q40 collision guard")

  // --------------------------------------------------------------- q119
  /** Token-budget fill: distribute a global token budget over sources by
    * temperature-mixed weights (α=0.5, q108's law), then greedily keep each
    * source's highest-quality documents until its budget is spent — the
    * selection step a curation pipeline runs after scoring (q50) and
    * weighting (q108).
    *
    * Determinism: budgets are INTEGER-exact — weight = floor(sqrt(tokens))
    * (IEEE sqrt is correctly rounded, so both engines floor the same
    * double) and budget = B·w div Σw in BIGINT arithmetic; a double never
    * feeds the row-selection cutoff. The greedy rule is "take while the
    * budget is not yet full" (cum tokens BEFORE the doc < budget), ordered
    * by (quality desc, doc_id) — quality doubles are per-row identical
    * across engines (q50's precedent).
    *
    * Scale shape: census agg (shuffle on source) + per-source window
    * prefix sum (shuffle on source) + summary agg — budgets are a
    * 20-row broadcast join. One spilling window pass, no global sort
    * until the 20-row output. */
  val q119 = QueryDef(
    "q119_budget_fill",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val B = 100000L
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          TextStats.qualityScore(col("text")).as("quality"))
      val census = docs.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("tokens"))
        .select(col("source"), floor(sqrt(col("tokens").cast("double"))).cast("long").as("w"))
      val budgets = census
        .crossJoin(broadcast(census.agg(sum(col("w")).as("w_sum"))))
        .select(col("source"), (lit(B) * col("w") / col("w_sum")).cast("long").as("budget"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.join(broadcast(budgets), "source")
        .withColumn("cum", sum(col("n_tok")).over(w))
        .filter(col("cum") - col("n_tok") < col("budget"))
        .groupBy(col("source"))
        .agg(max(col("budget")).as("budget"),
          count(lit(1)).as("n_selected"),
          sum(col("n_tok")).as("tokens_selected"))
        .orderBy(col("source"))
    },
    Some("""WITH docs AS (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          least(len(string_split(lower(text), ' '))::DOUBLE / 50.0, 1.0) * 0.4
            + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                / greatest(length(text)::DOUBLE, 1.0) * 10.0, 1.0)) * 0.3
            + (len(list_filter(string_split(lower(text), ' '),
                x -> x IN ('the','a','of','and','to')))::DOUBLE
               / len(string_split(lower(text), ' '))::DOUBLE) * 0.3 AS quality
        FROM documents),
      census AS (SELECT source, CAST(floor(sqrt(SUM(n_tok)::DOUBLE)) AS BIGINT) AS w
        FROM docs GROUP BY source),
      budgets AS (SELECT source, 100000 * w // (SELECT SUM(w) FROM census) AS budget
        FROM census),
      cums AS (SELECT d.source, d.n_tok, b.budget,
          SUM(d.n_tok) OVER (PARTITION BY d.source
            ORDER BY d.quality DESC, d.doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM docs d JOIN budgets b USING (source))
      SELECT source, CAST(max(budget) AS BIGINT) AS budget,
        count(*) AS n_selected,
        CAST(sum(n_tok) AS BIGINT) AS tokens_selected
      FROM cums WHERE cum - n_tok < budget
      GROUP BY source ORDER BY source"""),
    doc = "greedy quality-ordered selection under integer-exact temperature budgets")

  // --------------------------------------------------------------- q132
  /** Distribution-drift monitor: exact two-sample Kolmogorov-Smirnov
    * statistic of each source's length distribution against the REST of
    * the corpus — the alarm a pipeline raises when one crawl's documents
    * stop looking like everyone else's. KS = max |F_s − F_rest| over the
    * union of jump points; every CDF value here is an exact integer ratio
    * (cumulative counts over totals), and a single IEEE division of two
    * exact integers is bit-identical cross-engine, so even the UNROUNDED
    * statistic is deterministic (round(6) is output hygiene only).
    *
    * Scale shape: the only corpus-sized shuffle is the (source, value)
    * count agg (map-side combined). Everything after runs on BOUNDED
    * cardinality: the evaluation grid is |sources| × |distinct metric
    * values| (a drift metric is only meaningful over a bounded value
    * domain — lengths, scores, bucketed stats), the global-CDF window is
    * a single partition over just the distinct values, and the per-source
    * CDF windows partition by source. The two crossJoins are a 1-row
    * total and the bounded grid. */
  val q132 = QueryDef(
    "q132_ks_drift",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).select(col("source"), col("n_chars").as("v"))
      val csv = docs.groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
      val srcs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val vals = docs.select(col("v")).distinct()
      val tot = docs.agg(count(lit(1)).as("n"))
      val cumg = csv.groupBy(col("v")).agg(sum(col("c")).as("c"))
        .select(col("v"), sum(col("c")).over(graft.operators.BoundedWindow.over(col("v")).orderBy(col("v"))).as("cum_g"))
      val cums = srcs.crossJoin(broadcast(vals))
        .join(csv, Seq("source", "v"), "left")
        .select(col("source"), col("n_s"), col("v"),
          sum(coalesce(col("c"), lit(0L)))
            .over(Window.partitionBy(col("source")).orderBy(col("v"))).as("cum_s"))
      cums.join(broadcast(cumg), "v")
        .crossJoin(broadcast(tot))
        .groupBy(col("source"))
        .agg(min(col("n_s")).as("n_docs"),
          round(max(abs(col("cum_s").cast("double") / col("n_s")
            - (col("cum_g") - col("cum_s")).cast("double") / (col("n") - col("n_s")))), 6)
            .as("ks"))
        .orderBy(col("source"))
    },
    Some("""WITH vals AS (SELECT DISTINCT n_chars AS v FROM documents),
      srcs AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
      tot AS (SELECT count(*) AS n FROM documents),
      csv AS (SELECT source, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
      cg AS (SELECT v, sum(c) AS c FROM csv GROUP BY v),
      cumg AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum_g FROM cg),
      grid AS (SELECT s.source, s.n_s, vv.v FROM srcs s CROSS JOIN vals vv),
      cums AS (SELECT g.source, g.n_s, g.v,
          sum(COALESCE(c.c, 0)) OVER (PARTITION BY g.source ORDER BY g.v) AS cum_s
        FROM grid g LEFT JOIN csv c ON c.source = g.source AND c.v = g.v)
      SELECT cs.source, min(cs.n_s) AS n_docs,
        round(max(abs(cs.cum_s::DOUBLE / cs.n_s
          - (cg2.cum_g - cs.cum_s)::DOUBLE / (t.n - cs.n_s))), 6) AS ks
      FROM cums cs JOIN cumg cg2 USING (v) CROSS JOIN tot t
      GROUP BY cs.source ORDER BY cs.source"""),
    doc = "exact two-sample KS drift per source vs rest-of-corpus; bounded-grid evaluation")

  // --------------------------------------------------------------- q148
  /** Per-document novelty contribution: the fraction of a doc's distinct
    * 5-grams that appear for the FIRST time (by doc_id order) in that
    * doc — the diagnostic that ranks which documents actually add
    * content to a growing corpus vs re-tread what's already there.
    *
    * Scale shape: q116's layout — grams shuffle as xxhash64 keys (8
    * bytes, never the gram text) with the q40 collision fail-stop; the
    * first-occurrence table joins back on the same hash key (Exchange
    * reuse), then a per-doc agg. */
  val q148 = QueryDef(
    "q148_novelty_contribution",
    (s, d) => {
      val e = Tables.documents(s, d)
        .filter(size(split(col("text"), " ")) >= 5)
        .select(col("doc_id"),
          explode(Dedup.wordShingles(col("text"), 5)).as("gram"))
        .withColumn("gh", xxhash64(col("gram")))
      val firsts = e.groupBy(col("gh"))
        .agg(min(col("doc_id")).as("first_doc"),
          min(Dedup.guardHash(col("gram"))).as("g1"),
          max(Dedup.guardHash(col("gram"))).as("g2"))
        .select(col("gh"),
          when(col("g1") =!= col("g2"),
            raise_error(lit("q148: xxhash64 collision — distinct grams in one group"))
              .cast("long"))
            .otherwise(col("first_doc")).as("first_doc"))
      e.join(firsts, "gh")
        .groupBy(col("doc_id"))
        .agg(sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"),
          count(lit(1)).as("n_grams"))
        .select(col("doc_id"), col("n_novel"), col("n_grams"),
          round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') words FROM documents),
      g AS (SELECT doc_id,
              list_distinct([array_to_string(words[i:i+4], ' ') for i in range(1, len(words)-3)]) sh
            FROM w WHERE len(words) >= 5),
      e AS (SELECT doc_id, unnest(sh) AS gram FROM g),
      firsts AS (SELECT gram, min(doc_id) AS first_doc FROM e GROUP BY gram),
      nov AS (SELECT e.doc_id, count(*) FILTER (WHERE f.first_doc = e.doc_id) AS n_novel,
                count(*) AS n_grams
              FROM e JOIN firsts f USING (gram) GROUP BY e.doc_id)
      SELECT doc_id, n_novel, n_grams, round(n_novel::DOUBLE / n_grams, 6) AS novelty
      FROM nov ORDER BY doc_id"""),
    doc = "first-occurrence 5-gram share per doc; 8-byte hash shuffle + collision guard")

  // --------------------------------------------------------------- q149
  /** Source-vocabulary overlap matrix: exact Jaccard between every pair
    * of sources' word vocabularies — "do these two crawls speak the same
    * language", the lexical complement of q123's near-dup matrix.
    *
    * Scale shape: the pair counts come from an INVERTED-INDEX equi-join
    * on the word ((source, word) distinct rows joined to themselves on
    * word, source_a < source_b as a residual filter) — never a vocabulary
    * cross join — then |sources|²-bounded aggs; union sizes derive from
    * per-source vocab counts (|A|+|B|−shared). The oracle reproduces the
    * matrix from whole materialized vocab LISTS — an independent
    * formulation. */
  val q149 = QueryDef(
    "q149_vocab_overlap",
    (s, d) => {
      val v = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .distinct()
      val sizes = v.groupBy(col("source")).agg(count(lit(1)).as("nv"))
      val shared = v.as("a")
        .join(v.as("b"),
          col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared"))
      shared
        .join(broadcast(sizes.select(col("source").as("source_a"), col("nv").as("na"))),
          "source_a")
        .join(broadcast(sizes.select(col("source").as("source_b"), col("nv").as("nb"))),
          "source_b")
        .select(col("source_a"), col("source_b"), col("n_shared"),
          round(col("n_shared").cast("double")
            / (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some("""WITH v AS (SELECT source,
          list_sort(list_distinct(flatten(list(string_split(text, ' '))))) vocab
        FROM documents GROUP BY source)
      SELECT a.source AS source_a, b.source AS source_b,
        CAST(len(list_intersect(a.vocab, b.vocab)) AS BIGINT) AS n_shared,
        round(len(list_intersect(a.vocab, b.vocab))::DOUBLE
          / len(list_distinct(list_concat(a.vocab, b.vocab))), 6) AS jaccard
      FROM v a JOIN v b ON a.source < b.source
      ORDER BY source_a, source_b"""),
    doc = "exact source x source vocabulary Jaccard via inverted-index equi-join")

  // --------------------------------------------------------------- q150
  /** The composed curation pipeline — the capstone proving the tier's
    * operators CHAIN: rule gate (q115's integer thresholds) → exact
    * dedup keep-first (q40's hash layout + collision guard) →
    * benchmark decontamination (q101's broadcast inverted index) →
    * per-source selection census. Each stage narrows the frame the next
    * stage reads; Catalyst pipelines the narrow stages and the only
    * corpus-sized exchanges are the dedup hash-agg and its join-back.
    * One DataFrame program, one oracle replicating the whole chain. */
  val q150 = QueryDef(
    "q150_curation_pipeline",
    (s, d) => {
      val stop = Seq("the", "a", "of", "and", "to")
      val words = split(col("text"), " ")
      val w = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"), words.as("words"))
      // stage 1: rule gate (length band + at least one stopword)
      val gated = w.filter(size(col("words")).between(10, 80) &&
        size(filter(col("words"), x => lower(x).isin(stop: _*))) >= 1)
      // stage 2: exact dedup, keep-first by content hash (q40 layout)
      val keep = gated
        .select(xxhash64(col("text")).as("th"), col("doc_id"), col("text"))
        .groupBy(col("th"))
        .agg(min(col("doc_id")).as("keep_id"),
          min(Dedup.guardHash(col("text"))).as("t1"),
          max(Dedup.guardHash(col("text"))).as("t2"))
        .select(col("th"),
          when(col("t1") =!= col("t2"),
            raise_error(lit("q150: xxhash64 collision — distinct texts in one group"))
              .cast("long"))
            .otherwise(col("keep_id")).as("keep_id"))
      val deduped = gated.withColumn("th", xxhash64(col("text")))
        .join(keep, "th").filter(col("doc_id") === col("keep_id"))
      // stage 3: decontamination vs the doc 0-9 benchmark (q101 layout)
      val g5 = deduped.filter(size(col("words")) >= 5)
        .select(col("doc_id"), col("source"), col("words"),
          Dedup.wordShingles(col("text"), 5).as("sh"))
      val bench = broadcast(w
        .filter(col("doc_id") < 10 && size(col("words")) >= 5)
        .select(explode(Dedup.wordShingles(col("text"), 5)).as("gram")).distinct())
      val contaminated = g5
        .select(col("doc_id"), explode(col("sh")).as("gram"))
        .join(bench, "gram").select(col("doc_id")).distinct()
      // stage 4: census of the surviving selection
      g5.filter(col("doc_id") >= 10)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_selected"),
          sum(size(col("words")).cast("long")).as("tokens"))
        .orderBy(col("source"))
    },
    Some("""WITH w AS (SELECT doc_id, source, text, string_split(text, ' ') AS words
        FROM documents),
      gated AS (SELECT * FROM w
        WHERE len(words) BETWEEN 10 AND 80
          AND len(list_filter(words, x -> lower(x) IN ('the','a','of','and','to'))) >= 1),
      deduped AS (SELECT * FROM gated
        WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY text)),
      g5 AS (SELECT doc_id, source, words,
          list_distinct([array_to_string(words[i:i+4], ' ') for i in range(1, len(words)-3)]) sh
        FROM deduped WHERE len(words) >= 5),
      bench AS (SELECT DISTINCT unnest(sh) AS gram FROM
        (SELECT list_distinct([array_to_string(words[i:i+4], ' ') for i in range(1, len(words)-3)]) sh
         FROM w WHERE doc_id < 10 AND len(words) >= 5)),
      contaminated AS (SELECT DISTINCT doc_id FROM
        (SELECT doc_id, unnest(sh) AS gram FROM g5) c JOIN bench USING (gram)),
      selected AS (SELECT * FROM g5 WHERE doc_id >= 10
        AND doc_id NOT IN (SELECT doc_id FROM contaminated))
      SELECT source, count(*) AS n_selected,
        CAST(sum(len(words)) AS BIGINT) AS tokens
      FROM selected GROUP BY source ORDER BY source"""),
    doc = "gate -> exact dedup -> decontaminate -> census, composed end to end")

  // ---------------------------------------------------------------- q200
  /** Pareto skyline over (length, quality) per language — multi-objective
    * document selection without a scalarized score: a document survives
    * iff no other document of its language is at least as long AND at
    * least as good with one strict improvement. Computed in ONE
    * per-language window pass (not the O(n²) dominance join): sorted by
    * n_chars descending, a document is dominated exactly when the best
    * quality among STRICTLY longer docs (a RANGE frame ending 1 before)
    * reaches its own, or a same-length doc beats it. Same answer as the
    * textbook NOT EXISTS formulation — which is precisely what the oracle
    * runs, so the window algebra is verified against the quadratic
    * definition. Quality is the q50 score rounded to 6 dp (engine-exact
    * doubles); at 100 TB this is one range-partitioned sort per language
    * vs an unrunnable self-join. */
  val q200 = QueryDef(
    "q200_pareto_skyline",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(TextStats.qualityScore(col("text")), 6).as("quality"))
      val wStrict = Window.partitionBy(col("lang")).orderBy(col("n_chars").desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      val wSame = Window.partitionBy(col("lang"), col("n_chars"))
      docs
        .withColumn("m1", max(col("quality")).over(wStrict))
        .withColumn("m2", max(col("quality")).over(wSame))
        .filter(!(coalesce(col("m1") >= col("quality"), lit(false))
          || col("m2") > col("quality")))
        .select(col("lang"), col("doc_id"), col("n_chars"), col("quality"))
        .orderBy(col("lang"), col("n_chars").desc, col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id, lang, n_chars,
        round(least(len(string_split(lower(text), ' '))::DOUBLE / 50.0, 1.0) * 0.4
          + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
              / greatest(length(text)::DOUBLE, 1.0) * 10.0, 1.0)) * 0.3
          + (len(list_filter(string_split(lower(text), ' '),
              x -> x IN ('the','a','of','and','to')))::DOUBLE
             / len(string_split(lower(text), ' '))::DOUBLE) * 0.3, 6) AS quality
      FROM documents)
      SELECT x.lang, x.doc_id, x.n_chars, x.quality
      FROM d x
      WHERE NOT EXISTS (SELECT 1 FROM d y WHERE y.lang = x.lang
        AND ((y.n_chars > x.n_chars AND y.quality >= x.quality)
          OR (y.n_chars >= x.n_chars AND y.quality > x.quality)))
      ORDER BY x.lang, x.n_chars DESC, x.doc_id"""),
    doc = "per-language (length, quality) Pareto frontier in one window pass; oracle = quadratic NOT EXISTS definition")

  // ---------------------------------------------------------------- q222
  /** Binned-histogram L1 drift per source — the coarse, cheap sibling of
    * q132's two-sample KS: each source's length distribution (100-char
    * bands) against the whole corpus, distance = Σ_bands |share_src −
    * share_corpus| in exact ppm (integer division throughout — nothing
    * float crosses the oracle). L1-on-shares is what production data
    * monitors actually ship (bounded [0, 2·10⁶] ppm, robust, mergeable by
    * keeping per-band counts); the scale shape is a (source, band) count
    * agg + a broadcast of the corpus marginal. */
  val q222 = QueryDef(
    "q222_histogram_drift",
    (s, d) => {
      val b = Tables.documents(s, d)
        .select(col("source"), expr("n_chars div 100").as("band"))
      val bySrc = b.groupBy(col("source"), col("band")).agg(count(lit(1)).as("c"))
      val srcTot = bySrc.groupBy(col("source")).agg(sum(col("c")).as("st"))
      val corpus = broadcast(b.groupBy(col("band")).agg(count(lit(1)).as("cc")))
      val corpusTot = broadcast(b.agg(count(lit(1)).as("ct")))
      // every (source, band) cell of the corpus's band set: a source
      // missing a band still contributes that band's corpus share to L1
      val grid = srcTot.crossJoin(corpus)
      grid.join(bySrc, Seq("source", "band"), "left").crossJoin(corpusTot)
        .select(col("source"), col("st"),
          (coalesce(col("c"), lit(0L)) * 1000000L).as("sn"),
          (col("cc") * 1000000L).as("cn"), col("ct"))
        .select(col("source"), col("st"),
          abs(expr("sn div st") - expr("cn div ct")).as("diff"))
        .groupBy(col("source"))
        .agg(first(col("st")).as("n_docs"), sum(col("diff")).as("l1_ppm"))
        .orderBy(col("source"))
    },
    Some("""WITH b AS (SELECT source, n_chars // 100 AS band FROM documents),
      bysrc AS (SELECT source, band, COUNT(*) AS c FROM b GROUP BY 1, 2),
      srctot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS st FROM bysrc GROUP BY source),
      corpus AS (SELECT band, COUNT(*) AS cc FROM b GROUP BY band),
      corpustot AS (SELECT COUNT(*) AS ct FROM b)
      SELECT g.source, ANY_VALUE(g.st) AS n_docs,
        CAST(SUM(ABS((COALESCE(s.c, 0) * 1000000) // g.st
          - (g.cc * 1000000) // g.ct)) AS BIGINT) AS l1_ppm
      FROM (SELECT t.source, t.st, c.band, c.cc, (SELECT ct FROM corpustot) AS ct
        FROM srctot t CROSS JOIN corpus c) g
      LEFT JOIN bysrc s ON s.source = g.source AND s.band = g.band
      GROUP BY g.source ORDER BY g.source"""),
    doc = "per-source length-histogram L1 distance vs the corpus marginal, exact ppm; the cheap drift monitor next to q132's KS")

  // --------------------------------------------------------------- q230
  /** Cohen's kappa between the labeled `lang` column (annotator A, the
    * gold standard) and the q48 stopword-vote language-ID rule
    * (annotator B) — chance-corrected agreement, THE metric for deciding
    * whether a cheap heuristic labeler can replace a human pass (raw
    * accuracy flatters any rule on a skewed category mix; kappa doesn't).
    * Entirely integer-exact: with agree = #{A=B}, S = Σ_c rowA_c·colB_c
    * and N rows, kappa = (N·agree − S) / (N² − S), emitted as
    * kappa_ppm via integer div (guarded for the degenerate
    * both-annotators-constant case where N² = S). Shape: one scan
    * computes per-row predictions; the marginals are two tiny
    * category-keyed aggs joined on category (broadcast — |categories|
    * rows); N and agree ride a global agg. The zh gold class has no
    * predicted counterpart (the rule only votes en/de/fr/es) — its row
    * marginal contributes nothing to S via the inner join, exactly the
    * textbook treatment of an unused category. */
  val q230 = QueryDef(
    "q230_annotator_kappa",
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
      val rows = t.groupBy(col("gold").as("cat")).agg(count(lit(1)).as("n_gold"))
      val cols = t.groupBy(col("pred").as("cat")).agg(count(lit(1)).as("n_pred"))
      val chance = rows.join(cols, "cat")
        .agg(sum(col("n_gold") * col("n_pred")).as("chance_sum"))
      t.agg(count(lit(1)).as("n"),
          sum(when(col("gold") === col("pred"), 1L).otherwise(0L)).as("agree"))
        .crossJoin(broadcast(chance))
        .select(col("n"), col("agree"), col("chance_sum"),
          when(expr("n * n - chance_sum") =!= 0L,
            expr("((n * agree - chance_sum) * 1000000) div (n * n - chance_sum)"))
            .otherwise(lit(0L)).as("kappa_ppm"))
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
      r AS (SELECT gold AS cat, COUNT(*) AS n_gold FROM t GROUP BY 1),
      c AS (SELECT pred AS cat, COUNT(*) AS n_pred FROM t GROUP BY 1),
      s AS (SELECT CAST(SUM(r.n_gold * c.n_pred) AS BIGINT) AS chance_sum
        FROM r JOIN c USING (cat)),
      a AS (SELECT COUNT(*) AS n,
          CAST(SUM(CASE WHEN gold = pred THEN 1 ELSE 0 END) AS BIGINT) AS agree
        FROM t)
      SELECT n, agree, chance_sum,
        CAST(CASE WHEN n * n - chance_sum <> 0 THEN
          ((n * agree - chance_sum) * 1000000) // (n * n - chance_sum)
          ELSE 0 END AS BIGINT) AS kappa_ppm
      FROM a CROSS JOIN s"""),
    doc = "Cohen's kappa (gold lang vs q48's rule labeler), exact integer chance correction; can-the-heuristic-replace-the-human metric")

  // --------------------------------------------------------------- q244
  /** Chi-square balance audit of the q166 salted-hash train/val/test
    * split against the language strata — the check that the split is
    * actually stratification-free-but-balanced before anyone trusts
    * held-out metrics: per (split, lang) cell, the scaled contribution
    * ((O·N − R·C)²·10⁶) div (N·R·C) — the classic (O−E)²/E term with
    * every fraction multiplied through, so each cell's statistic is an
    * exact integer (products ride DECIMAL(38,0)/HUGEINT; no float E ever
    * exists). Large cells ⇒ the split correlates with language ⇒ the
    * hash is broken or the corpus is ordered pathologically. Shape: one
    * full-data pass into a |splits|×|langs| cell census; marginals are
    * tiny re-aggs; the 1-row grand total rides a whitelisted broadcast
    * crossJoin (q230 convention). */
  val q244 = QueryDef(
    "q244_split_balance",
    (s, d) => {
      val bucket = pmod(
        conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long"), lit(10))
      val t = Tables.documents(s, d)
        .select(col("lang"),
          when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
            .as("split"))
      val cells = t.groupBy(col("split"), col("lang")).agg(count(lit(1)).as("o"))
      val rmar = cells.groupBy(col("split")).agg(sum(col("o")).as("r"))
      val cmar = cells.groupBy(col("lang")).agg(sum(col("o")).as("c"))
      val tot = broadcast(cells.agg(sum(col("o")).as("nn")))
      cells.join(rmar, "split").join(cmar, "lang").crossJoin(tot)
        .select(col("split"), col("lang"), col("o"),
          expr("""((CAST(o AS DECIMAL(38,0)) * nn - CAST(r AS DECIMAL(38,0)) * c)
              * (CAST(o AS DECIMAL(38,0)) * nn - CAST(r AS DECIMAL(38,0)) * c)
              * 1000000)
            div (CAST(nn AS DECIMAL(38,0)) * r * c)""").as("chi2_term_ppm"))
        .orderBy(col("split"), col("lang"))
    },
    Some("""WITH t AS (SELECT lang,
          CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT lang,
          CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS b
        FROM documents)),
      cells AS (SELECT split, lang, COUNT(*) AS o FROM t GROUP BY 1, 2),
      rm AS (SELECT split, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      cm AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      tt AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM cells)
      SELECT split, lang, o,
        CAST(((CAST(o AS HUGEINT) * nn - CAST(r AS HUGEINT) * c)
            * (CAST(o AS HUGEINT) * nn - CAST(r AS HUGEINT) * c) * 1000000)
          // (CAST(nn AS HUGEINT) * r * c) AS BIGINT) AS chi2_term_ppm
      FROM cells JOIN rm USING (split) JOIN cm USING (lang) CROSS JOIN tt
      ORDER BY split, lang"""),
    doc = "per-cell chi-square contribution of split x lang, fraction-free exact ppm; the split-correlates-with-stratum alarm")

  // --------------------------------------------------------------- q245
  /** Rényi-2 (collision) repetitiveness per document, rolled up per
    * language: the probability that two DISTINCT sampled word positions
    * hold the same word — (Σc_w² − n) / (n(n−1)) — an exactly-rational
    * repetition index (0 = all distinct, 10⁶ ppm = one word repeated
    * throughout), where Shannon entropy would drag in logs the oracle
    * can't cross. The degenerate-doc tail this flags (looped boilerplate,
    * keyword stuffing) is what perplexity filters catch expensively.
    *
    * Shape: Σc² is ONE per-row HOF fold over the sorted token array
    * (run-length squares — the q173 zero-shuffle discipline); no
    * (doc, word) explode ever hits an Exchange, so the full-data cost is
    * a map-only pass feeding the tiny per-lang census. The oracle
    * computes the same Σc² via unnest + GROUP BY — different plan, same
    * integers. */
  val q245 = QueryDef(
    "q245_renyi_repetition",
    (s, d) => {
      val sumsq = expr("""aggregate(
          array_sort(split(text, ' ')),
          named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT), 'acc', CAST(0 AS BIGINT)),
          (a, w) -> IF(a.prev IS NOT NULL AND w = a.prev,
            named_struct('prev', w, 'run', a.run + CAST(1 AS BIGINT), 'acc', a.acc),
            named_struct('prev', w, 'run', CAST(1 AS BIGINT), 'acc', a.acc + a.run * a.run)),
          a -> a.acc + a.run * a.run)""")
      Tables.documents(s, d)
        .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"),
          sumsq.as("sumsq"))
        .select(col("lang"),
          when(col("n") >= 2,
            expr("((sumsq - n) * 1000000) div (n * (n - 1))"))
            .otherwise(lit(0L)).as("rep2"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"),
          expr("sum(rep2) div count(1)").as("mean_rep2_ppm"),
          max(col("rep2")).as("max_rep2_ppm"))
        .orderBy(col("lang"))
    },
    Some("""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
      t AS (SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS n FROM w),
      c AS (SELECT w.doc_id, u AS wd, COUNT(*) AS c
        FROM w, unnest(ws) AS x(u) GROUP BY 1, 2),
      ss AS (SELECT doc_id, CAST(SUM(c * c) AS BIGINT) AS sumsq FROM c GROUP BY 1),
      p AS (SELECT t.lang,
          CASE WHEN n >= 2 THEN ((sumsq - n) * 1000000) // (n * (n - 1))
               ELSE 0 END AS rep2
        FROM t JOIN ss USING (doc_id))
      SELECT lang, COUNT(*) AS docs,
        CAST(SUM(rep2) // COUNT(*) AS BIGINT) AS mean_rep2_ppm,
        CAST(MAX(rep2) AS BIGINT) AS max_rep2_ppm
      FROM p GROUP BY lang ORDER BY lang"""),
    doc = "Renyi-2 collision repetitiveness per doc (exact rational, zero-shuffle HOF fold), per-lang rollup; the cheap perplexity-filter stand-in")

  // --------------------------------------------------------------- q246
  /** Majority-vote ensemble quality gate — the production shape of
    * corpus filtering: several CHEAP independent signals each cast a
    * pass/fail vote and a document survives on votes ≥ 2 of 3, which is
    * robust to any single signal's blind spot (the reason Gopher/CCNet
    * pipelines stack rules instead of tuning one threshold). Signals,
    * all integer-exact: token count in [20, 1000]; mean word length in
    * [3, 12] checked fraction-free (3n ≤ chars_nospace ≤ 12n); lexical
    * diversity ≥ 40% (10·distinct ≥ 4·n). Census per source: docs,
    * survivors, pass rate ppm, mean vote count. One map-only pass (all
    * three signals are per-row HOF/scalar work), one tiny census agg —
    * the q115 Gopher-gate layout with an ensemble on top. */
  val q246 = QueryDef(
    "q246_ensemble_gate",
    (s, d) => {
      val words = split(col("text"), " ")
      val n = size(words).cast("long")
      val chars = length(regexp_replace(col("text"), " ", "")).cast("long")
      val dist = size(array_distinct(words)).cast("long")
      val v1 = when(n >= 20 && n <= 1000, 1L).otherwise(0L)
      val v2 = when(chars >= lit(3L) * n && chars <= lit(12L) * n, 1L).otherwise(0L)
      val v3 = when(lit(10L) * dist >= lit(4L) * n, 1L).otherwise(0L)
      Tables.documents(s, d)
        .select(col("source"), (v1 + v2 + v3).as("votes"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(when(col("votes") >= 2, 1L).otherwise(0L)).as("survivors"),
          expr("(sum(CASE WHEN votes >= 2 THEN 1 ELSE 0 END) * 1000000) div count(1)")
            .as("pass_ppm"),
          expr("(sum(votes) * 1000000) div count(1)").as("mean_votes_ppm"))
        .orderBy(col("source"))
    },
    Some("""WITH v AS (SELECT source,
          (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END)
          + (CASE WHEN length(replace(text, ' ', ''))
                BETWEEN 3 * len(string_split(text, ' '))
                AND 12 * len(string_split(text, ' ')) THEN 1 ELSE 0 END)
          + (CASE WHEN 10 * len(list_distinct(string_split(text, ' ')))
                >= 4 * len(string_split(text, ' ')) THEN 1 ELSE 0 END) AS votes
        FROM documents)
      SELECT source, COUNT(*) AS docs,
        CAST(SUM(CASE WHEN votes >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS survivors,
        CAST((SUM(CASE WHEN votes >= 2 THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT)
          AS pass_ppm,
        CAST((SUM(votes) * 1000000) // COUNT(*) AS BIGINT) AS mean_votes_ppm
      FROM v GROUP BY source ORDER BY source"""),
    doc = "3-signal majority-vote quality gate (length, word-shape, diversity), fraction-free integer votes; per-source survival census")

  // --------------------------------------------------------------- q252
  /** Bigram language-model quality scoring — the shape of a perplexity
    * filter (CCNet / Wenzek et al. 2020 use a KenLM 5-gram; the decision
    * variable is the mean per-token log-probability under a corpus LM).
    * Here the LM is a bigram model trained on the corpus itself and the
    * score is kept EXACT instead of transcendental: per bigram the
    * conditional probability p(y|x) = c_xy/c_x is emitted as the scaled
    * integer c_xy·10⁹ div c_x (ppb), and a document's score is the exact
    * integer mean of its bigrams' ppb values (arithmetic mean of
    * conditional probabilities — rank-equivalent to perplexity for the
    * gating use-case, and bit-identical across engines where a sum of
    * ln() calls is not). Low score = improbable word transitions =
    * gibberish/keyword-stuffing candidate; output is the bottom-15
    * filter candidates plus each doc's worst single transition count.
    *
    * Scale shape: the LM is vocabulary²-bounded (Heaps' law — sublinear
    * in corpus size), built with two token-keyed aggs; scoring re-joins
    * doc bigrams to the LM on the (x, y) string pair — at 100 TB the LM
    * is capped to top-K rows + unigram backoff and BROADCAST, making the
    * scoring pass shuffle-free except the final doc-keyed partial agg.
    * Here the join is left as an equi-join so AQE picks the strategy and
    * the query stays exact (no cap). */
  val q252 = QueryDef(
    "q252_lm_quality_score",
    (s, d) => {
      val w = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
      val bg = w.select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(0), size(col("w")) - 2), i =>
          struct(element_at(col("w"), i + 1).as("x"),
            element_at(col("w"), i + 2).as("y")))).as("p"))
        .select(col("doc_id"), col("source"), col("p.x").as("x"), col("p.y").as("y"))
      val cx = bg.groupBy(col("x")).agg(count(lit(1)).as("c_x"))
      val cxy = bg.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
        .join(cx, "x")
        .select(col("x"), col("y"),
          expr("(cast(c_xy as decimal(38,0)) * 1000000000) div c_x").as("ppb"))
      bg.join(cxy, Seq("x", "y"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(ppb) div count(1)").as("score_ppb"),
          min(col("ppb")).as("worst_ppb"))
        .orderBy(col("score_ppb"), col("doc_id"))
        .limit(15)
    },
    Some("""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS a FROM documents
               WHERE len(string_split(text, ' ')) >= 2),
      bg AS (SELECT doc_id, source,
          unnest([{'x': a[i], 'y': a[i+1]} for i in range(1, len(a))], recursive := true)
        FROM w),
      cx AS (SELECT x, count(*) AS c_x FROM bg GROUP BY x),
      cxy AS (SELECT bg.x, bg.y, (count(*) * 1000000000) // any_value(cx.c_x) AS ppb
        FROM bg JOIN cx USING (x) GROUP BY bg.x, bg.y)
      SELECT doc_id, source, count(*) AS n_bigrams,
        CAST(sum(ppb) // count(*) AS BIGINT) AS score_ppb,
        CAST(min(ppb) AS BIGINT) AS worst_ppb
      FROM bg JOIN cxy USING (x, y)
      GROUP BY doc_id, source
      ORDER BY score_ppb, doc_id LIMIT 15"""),
    doc = "bigram-LM quality score (perplexity-filter shape): exact ppb conditional probabilities, integer mean per doc, bottom-15 gate candidates")

  // --------------------------------------------------------------- q268
  /** The 100-TB serving form q252's scaladoc promises: the bigram LM
    * CAPPED to the top-3 continuations per left token (count desc, y —
    * deterministic), with every off-cap transition backing off to the
    * unigram probability c_y·10⁹ div T. The capped table is ≤ 3·|vocab|
    * rows — broadcastable at any corpus size — so the scoring pass is one
    * broadcast left-join + doc-keyed agg, never a vocabulary²-sized
    * shuffle. Scores stay exact scaled integers; `lm_hits` counts
    * in-cap transitions so the cap's coverage is observable next to the
    * score it produced. q252 (uncapped, exact) remains the reference;
    * this is the pair q185/q258 form for the LM tier. */
  val q268 = QueryDef(
    "q268_capped_lm_score",
    (s, d) => {
      val w = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
      val bg = w.select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(0), size(col("w")) - 2), i =>
          struct(element_at(col("w"), i + 1).as("x"),
            element_at(col("w"), i + 2).as("y")))).as("p"))
        .select(col("doc_id"), col("source"), col("p.x").as("x"), col("p.y").as("y"))
      val cx = bg.groupBy(col("x")).agg(count(lit(1)).as("c_x"))
      val tot = broadcast(bg.agg(count(lit(1)).as("t")))
      val cy = bg.groupBy(col("y")).agg(count(lit(1)).as("c_y"))
      import org.apache.spark.sql.expressions.Window
      val wnd = Window.partitionBy(col("x"))
        .orderBy(col("c_xy").desc, col("y"))
      val capped = broadcast(bg.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("c_xy"))
        .withColumn("rk", row_number().over(wnd))
        .filter(col("rk") <= 3)
        .join(cx, "x")
        .select(col("x"), col("y"),
          expr("(cast(c_xy as decimal(38,0)) * 1000000000) div c_x").as("lm_ppb")))
      bg.join(capped, Seq("x", "y"), "left")
        .join(cy, "y").crossJoin(tot)
        .select(col("doc_id"), col("source"),
          coalesce(col("lm_ppb"),
            expr("(cast(c_y as decimal(38,0)) * 1000000000) div t")).as("ppb"),
          col("lm_ppb").isNotNull.as("hit"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(ppb) div count(1)").as("score_ppb"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("lm_hits"))
        .orderBy(col("score_ppb"), col("doc_id"))
        .limit(15)
    },
    Some("""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS a FROM documents
               WHERE len(string_split(text, ' ')) >= 2),
      bg AS (SELECT doc_id, source,
          unnest([{'x': a[i], 'y': a[i+1]} for i in range(1, len(a))], recursive := true)
        FROM w),
      cx AS (SELECT x, count(*) AS c_x FROM bg GROUP BY x),
      tot AS (SELECT count(*) AS t FROM bg),
      cy AS (SELECT y, count(*) AS c_y FROM bg GROUP BY y),
      capped AS (SELECT x, y, (c_xy * 1000000000) // c_x AS lm_ppb FROM (
          SELECT bg.x, bg.y, count(*) AS c_xy, any_value(cx.c_x) AS c_x,
            ROW_NUMBER() OVER (PARTITION BY bg.x
              ORDER BY count(*) DESC, bg.y) AS rk
          FROM bg JOIN cx USING (x) GROUP BY bg.x, bg.y) WHERE rk <= 3)
      SELECT doc_id, source, count(*) AS n_bigrams,
        CAST(sum(COALESCE(capped.lm_ppb, (cy.c_y * 1000000000) // tot.t))
          // count(*) AS BIGINT) AS score_ppb,
        CAST(sum(CASE WHEN capped.lm_ppb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lm_hits
      FROM bg LEFT JOIN capped USING (x, y) JOIN cy USING (y) CROSS JOIN tot
      GROUP BY doc_id, source
      ORDER BY score_ppb, doc_id LIMIT 15"""),
    doc = "top-3-capped bigram LM + unigram backoff (broadcastable serving form of q252); exact ppb scores, cap coverage observable via lm_hits")

  // --------------------------------------------------------------- q262
  /** Hashing-trick linear classifier gate — the fastText-shaped serving
    * path of a learned quality filter (CCNet/LLaMA-style pipelines gate on
    * a linear classifier over hashed word features). Words hash into 4096
    * feature buckets; each bucket carries a fixed md5-derived integer
    * coefficient in [-1000, 1000] standing in for learned weights (the
    * SCORING path — hash, lookup, accumulate, threshold — is what the
    * engine must run at 100 TB; training happens offline). The weight is
    * computed INLINE from the bucket hash, so scoring is a pure per-row
    * map + one doc-keyed agg: no join, no shuffle beyond the final
    * aggregation, fully codegen. A learned model swaps in as a broadcast
    * 4096-row weight table without changing the plan class. The gate
    * thresholds the margin SUM (not the mean): integer-exact, and no
    * negative division whose floor-vs-truncate semantics differ across
    * engines. */
  val q262 = QueryDef(
    "q262_hashed_classifier_gate",
    (s, d) => {
      val words = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("w"))
      words
        .withColumn("b",
          expr("cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint) % 4096"))
        .withColumn("wt",
          expr("cast(conv(substring(md5(concat('clf:', cast(b as string))), 1, 8), 16, 10) as bigint) % 2001 - 1000"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_words"), sum(col("wt")).as("margin"))
        .withColumn("kept", col("margin") >= 0L)
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents),
      f AS (SELECT doc_id, source,
          CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 4096 AS b
        FROM w),
      sc AS (SELECT doc_id, source,
          CAST(('0x' || substr(md5('clf:' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000 AS wt
        FROM f)
      SELECT doc_id, source, count(*) AS n_words,
        CAST(sum(wt) AS BIGINT) AS margin, (sum(wt) >= 0) AS kept
      FROM sc GROUP BY doc_id, source ORDER BY doc_id"""),
    doc = "fastText-shaped hashed linear classifier gate: inline md5 weights, per-doc margin, shuffle-free scoring pass")

  // --------------------------------------------------------------- q263
  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each raw document
    * by how much more likely its hashed-unigram features are under a
    * TARGET domain (here lang='en') than under the raw corpus, then keep
    * the top-k. DSIR proper uses the log-ratio Σ n_b·(ln p_t(b) − ln
    * p_r(b)); this query keeps the same structure but scores in the
    * LINEAR domain — w_b = smoothed-ppb_target(b) − smoothed-ppb_raw(b),
    * all exact integers — so the result hash-matches across engines with
    * no transcendental in sight (swap the w_b column to a rounded
    * log-ratio double for literal DSIR; the plan is unchanged).
    *
    * Scale shape: both feature distributions are 4096-row aggs (broadcast
    * weight table); scoring is one map-side join + doc-keyed agg. The
    * corpus never shuffles on anything wider than (doc_id). */
  val q263 = QueryDef(
    "q263_dsir_importance",
    (s, d) => {
      val words = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
        .withColumn("b",
          expr("cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint) % 4096"))
      val raw = words.groupBy(col("b")).agg(count(lit(1)).as("c_r"))
      val tgt = words.filter(col("lang") === "en")
        .groupBy(col("b")).agg(count(lit(1)).as("c_t"))
      val totals = broadcast(words.agg(
        count(lit(1)).as("tot_r"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tot_t")))
      // add-one smoothing over the 4096-bucket space; ppb = parts-per-1e9
      val wts = broadcast(raw.join(tgt, Seq("b"), "left").crossJoin(totals)
        .select(col("b"),
          (expr("(coalesce(c_t, 0L) + 1L) * 1000000000 div (tot_t + 4096)")
            - expr("(c_r + 1L) * 1000000000 div (tot_r + 4096)")).as("w_b")))
      words.groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("n_b"))
        .join(wts, "b")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("n_b")).as("n_tokens"),
          sum(col("n_b") * col("w_b")).as("dsir_score"))
        .orderBy(col("dsir_score").desc, col("doc_id"))
        .limit(20)
    },
    Some("""WITH w AS (SELECT doc_id, lang,
          CAST(('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 8)) AS BIGINT) % 4096 AS b
        FROM documents),
      raw AS (SELECT b, count(*) AS c_r FROM w GROUP BY b),
      tgt AS (SELECT b, count(*) AS c_t FROM w WHERE lang = 'en' GROUP BY b),
      tot AS (SELECT count(*) AS tot_r,
          count(*) FILTER (lang = 'en') AS tot_t FROM w),
      wts AS (SELECT raw.b,
          (COALESCE(tgt.c_t, 0) + 1) * 1000000000 // (tot.tot_t + 4096)
            - (raw.c_r + 1) * 1000000000 // (tot.tot_r + 4096) AS w_b
        FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tot),
      db AS (SELECT doc_id, lang, b, count(*) AS n_b FROM w GROUP BY 1, 2, 3)
      SELECT db.doc_id, db.lang, CAST(sum(db.n_b) AS BIGINT) AS n_tokens,
        CAST(sum(db.n_b * wts.w_b) AS BIGINT) AS dsir_score
      FROM db JOIN wts ON wts.b = db.b
      GROUP BY db.doc_id, db.lang
      ORDER BY dsir_score DESC, doc_id LIMIT 20"""),
    doc = "DSIR-shaped importance scoring vs a target domain (hashed unigram features, integer-exact linear-domain weights); top-20 selection")

  // --------------------------------------------------------------- q264
  /** BM25 ranked retrieval over the corpus for a fixed conjunctive term
    * set — the retrieval primitive behind search-based decontamination
    * and eval-set mining. Lucene-form idf = ln(1 + (N−df+0.5)/(df+0.5)),
    * k1 = 1.2, b = 0.75; dl/avgdl is computed as the exact rational
    * dl·N/R before the one double evaluation per (doc, term). Per-doc
    * scores add the ≤3 per-term contributions as named columns (a FIXED
    * addition order — no nondeterministic double sum), rounded to 6
    * decimals, the q54 convention for transcendental outputs.
    *
    * Scale shape: df/N/R are one tiny broadcast census; tf is one
    * explode+filter agg over the corpus (the filter prunes to query
    * terms BEFORE the shuffle); top-10 plans as TakeOrderedAndProject. */
  val q264 = QueryDef(
    "q264_bm25_topk",
    (s, d) => {
      val terms = Seq("shuffle", "join", "scan")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val dl = docs.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
      val census = broadcast(dl.agg(
        count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_tokens")))
      val tf = docs.select(col("doc_id"), explode(col("ws")).as("w"))
        .filter(col("w").isin(terms: _*))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val df = broadcast(tf.groupBy(col("w")).agg(count(lit(1)).as("df")))
      val contrib = tf.join(df, "w").join(dl, "doc_id").crossJoin(census)
        .select(col("doc_id"), col("w"),
          (expr("ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))")
            * col("tf") * lit(2.2)
            / (col("tf") + lit(1.2) *
                (lit(0.25) + lit(0.75) * col("dl") * col("n_docs") / col("tot_tokens"))))
            .as("c"))
      contrib.groupBy(col("doc_id"))
        .agg(
          sum(when(col("w") === "join", col("c"))).as("c_join"),
          sum(when(col("w") === "scan", col("c"))).as("c_scan"),
          sum(when(col("w") === "shuffle", col("c"))).as("c_shuffle"),
          count(lit(1)).as("n_terms"))
        .select(col("doc_id"), col("n_terms"),
          round(coalesce(col("c_join"), lit(0.0))
            + coalesce(col("c_scan"), lit(0.0))
            + coalesce(col("c_shuffle"), lit(0.0)), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(10)
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
      census AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_tokens FROM dl),
      tf AS (SELECT doc_id, w, count(*) AS tf FROM (
          SELECT doc_id, unnest(ws) AS w FROM d)
        WHERE w IN ('shuffle', 'join', 'scan') GROUP BY doc_id, w),
      df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      contrib AS (SELECT tf.doc_id, tf.w,
          ln(1.0 + (census.n_docs - df.df + 0.5) / (df.df + 0.5))
            * tf.tf * 2.2
            / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * census.n_docs / census.tot_tokens)) AS c
        FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN census)
      SELECT doc_id, count(*) AS n_terms,
        round(COALESCE(sum(c) FILTER (w = 'join'), 0)
          + COALESCE(sum(c) FILTER (w = 'scan'), 0)
          + COALESCE(sum(c) FILTER (w = 'shuffle'), 0), 6) AS bm25
      FROM contrib GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 10"""),
    doc = "BM25 top-10 retrieval (Lucene idf, k1=1.2 b=0.75): broadcast df census, term-pruned tf agg, fixed-order double sum")

  // --------------------------------------------------------------- q272
  /** Temperature-based mixture reweighting (the multilingual-LM sampling
    * scheme: sample source s with p_s ∝ n_s^α, α = 0.5 here — upweights
    * tail sources, damps the head; α→1 recovers natural sampling, α→0
    * uniform). Weights stay integer-exact across engines by using
    * ⌊√n⌋ (sqrt is correctly rounded IEEE on identical int inputs, floor
    * kills the last-ulp question entirely); shares and a 100k-doc quota
    * come from BIGINT div against the weight total. `boost_x1000` =
    * resampled share / natural share — the number a mixture designer
    * reads to see how hard each tail source is being pulled up.
    *
    * Scale shape: one per-source agg (≤ thousands of groups at any
    * corpus size), then a 1-row total broadcast back over the census —
    * the corpus itself is touched exactly once, and never wider than
    * (source). The quota table is what a downstream weighted sampler
    * (q91's hash-sample with per-stratum rates) consumes as a broadcast. */
  val q272 = QueryDef(
    "q272_temperature_mixture",
    (s, d) => {
      val census = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("toks"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .withColumn("w_sqrt", expr("cast(floor(sqrt(cast(n_docs as double))) as bigint)"))
      val totals = broadcast(census.agg(
        sum(col("n_docs")).as("tot_docs"), sum(col("w_sqrt")).as("tot_w")))
      census.crossJoin(totals)
        .select(col("source"), col("n_docs"), col("n_tokens"), col("w_sqrt"),
          expr("n_docs * 1000000 div tot_docs").as("natural_ppm"),
          expr("w_sqrt * 1000000 div tot_w").as("sampled_ppm"),
          expr("w_sqrt * 100000 div tot_w").as("quota_docs"),
          expr("(w_sqrt * 1000000 div tot_w) * 1000 div (n_docs * 1000000 div tot_docs)")
            .as("boost_x1000"))
        .orderBy(col("source"))
    },
    Some("""WITH c AS (SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
      cw AS (SELECT *, CAST(floor(sqrt(n_docs)) AS BIGINT) AS w_sqrt FROM c),
      t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
          CAST(SUM(w_sqrt) AS BIGINT) AS tot_w FROM cw)
      SELECT source, n_docs, n_tokens, w_sqrt,
        CAST(n_docs * 1000000 // tot_docs AS BIGINT) AS natural_ppm,
        CAST(w_sqrt * 1000000 // tot_w AS BIGINT) AS sampled_ppm,
        CAST(w_sqrt * 100000 // tot_w AS BIGINT) AS quota_docs,
        CAST((w_sqrt * 1000000 // tot_w) * 1000 // (n_docs * 1000000 // tot_docs) AS BIGINT) AS boost_x1000
      FROM cw CROSS JOIN t ORDER BY source"""),
    doc = "α=0.5 temperature mixture weights per source (p ∝ n^α, integer ⌊√n⌋ form): natural vs resampled share, 100k-doc quotas, tail boost")

  // --------------------------------------------------------------- q278
  /** Curriculum schedule assembly: bucket the corpus into 10 training
    * phases by a difficulty proxy (document length, linearly banded
    * between the corpus min/max — the "short/simple first" curriculum),
    * and give each phase a DETERMINISTIC within-phase order key (md5 of
    * doc_id) so the epoch-shuffle is reproducible across engines and
    * across re-runs — curriculum training is worthless if a retried job
    * draws a different order. Emits the per-phase census a schedule
    * builder consumes: doc/token mass and the first document under the
    * frozen order.
    *
    * Scale shape: banding is a map-side expression against a 1-row
    * broadcast of (min, max); the census is one keyed agg on a 10-value
    * key; the order key is a hash, not a sort — the full corpus is
    * never globally ordered (consumers sort WITHIN a phase partition,
    * which is how the epoch files would be written anyway). */
  val q278 = QueryDef(
    "q278_curriculum_schedule",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars").cast("long").as("nc"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          md5(col("doc_id").cast("string")).as("ord"))
      val bounds = broadcast(docs.agg(min(col("nc")).as("minc"), max(col("nc")).as("maxc")))
      docs.crossJoin(bounds)
        .select(col("doc_id"), col("toks"), col("ord"),
          expr("(nc - minc) * 10 div (maxc - minc + 1)").as("phase"))
        .groupBy(col("phase"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
          min_by(col("doc_id"), col("ord")).as("first_doc"))
        .orderBy(col("phase"))
    },
    Some("""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS nc,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
          md5(doc_id::VARCHAR) AS ord FROM documents),
      b AS (SELECT MIN(nc) AS minc, MAX(nc) AS maxc FROM d)
      SELECT CAST((nc - minc) * 10 // (maxc - minc + 1) AS BIGINT) AS phase,
        COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens,
        arg_min(doc_id, ord) AS first_doc
      FROM d CROSS JOIN b GROUP BY 1 ORDER BY phase"""),
    doc = "length-banded 10-phase curriculum with a frozen md5 epoch order: per-phase doc/token census, retry-reproducible, no global sort")

  val all: Seq[QueryDef] = Seq(q114, q115, q116, q119, q132, q148, q149, q150,
    q200, q222, q230, q244, q245, q246, q252, q262, q263, q264, q268, q272, q278)
}

