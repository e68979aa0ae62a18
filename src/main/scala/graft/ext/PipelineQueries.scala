package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryDef, Tables}

/** Training-data-pipeline operators beyond the dedup/similarity tier:
  * deterministic content-addressed sampling, TF-IDF term scoring, mergeable
  * cardinality sketches, embedding quantization, within-document repetition
  * scoring, and stratified per-class selection. Every plan is linear (scan →
  * narrow transforms → keyed agg/window); nothing materializes more than its
  * keyed aggregates.
  */
object PipelineQueries {

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  // ---------------------------------------------------------------- q91
  /** Deterministic content-addressed sampling — the reproducible
    * train/holdout splitter: a row is in-sample iff the first hex byte of
    * md5(stable key) falls below the threshold (here 0x28/0x100 = 15.6%).
    * Unlike TABLESAMPLE/rand(), the decision is a pure function of the
    * row's key: stable across engines, re-runs, partitionings, and
    * cluster sizes — which is what makes a 100 TB split auditable. The
    * filter is a per-row scalar (no shuffle of unsampled data); only the
    * sampled fraction reaches the aggregate. */
  val q91 = QueryDef(
    "q91_hash_sample",
    (s, d) => Tables.lineitem(s, d)
      .filter(substring(md5(concat_ws("|",
        col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"))), 1, 2) < "28")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(*) AS n_sampled,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE substring(md5(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR), 1, 2) < '28'
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
    doc = "md5-prefix deterministic sampling: reproducible splits, no rand()")

  // ---------------------------------------------------------------- q92
  /** TF-IDF top-3 terms per document (docs 0-49; document frequency over
    * the FULL corpus). Classic keyword extraction for corpus curation.
    * Plan: one explode → two keyed aggregates (tf on the small slice, df on
    * the corpus) → equi-join → per-doc top-k via rank-limit window (planned
    * as WindowGroupLimit, bounded memory). At 100 TB the df aggregate is
    * the big one and it's a straight partial+final count — no row explosion
    * survives past the aggregates. Ranking uses the 6-dp-rounded score with
    * the term as tiebreak, so cross-engine float noise cannot reorder. */
  val q92 = QueryDef(
    "q92_tfidf_topk",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val nDocs = docs.agg(countDistinct(col("doc_id")).as("n"))
      val df_ = tok.select(col("doc_id"), col("term")).distinct()
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val tf = tok.filter(col("doc_id") < 50)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val scored = tf.join(df_, "term").crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"),
          round(col("tf") * log(col("n").cast("double") / col("df")), 6).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      scored.select(col("doc_id"), col("term"), col("score"),
          row_number().over(w).cast("long").as("rk"))
        .filter(col("rk") <= 3)
        .orderBy(col("doc_id"), col("rk"))
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
      df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE doc_id < 50 GROUP BY doc_id, term),
      sc AS (SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(n.n::DOUBLE / df.df), 6) AS score
             FROM tf JOIN df USING (term), n)
      SELECT doc_id, term, score, rk FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        FROM sc) WHERE rk <= 3
      ORDER BY doc_id, rk"""),
    doc = "keyword extraction: tf on slice, df on corpus, rank-limit top-k")

  // ---------------------------------------------------------------- q93
  /** Mergeable cardinality sketches — THE 100 TB distinct-count pattern:
    * build one HLL sketch per group (partial agg combines map-side), then
    * merge the per-group sketches into the overall total WITHOUT rescanning
    * the data (`hll_union_agg` over 5 sketch blobs, not 10^5 rows). The
    * query self-checks: every estimate must land within 5% of the exact
    * count (lgConfigK=14 → ~0.8% expected error), and the oracle pins the
    * verdicts TRUE. */
  val q93 = QueryDef(
    "q93_hll_rollup",
    (s, d) => {
      val e = Tables.events(s, d)
      val perType = e.groupBy(col("event_type"))
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
          countDistinct(col("user_id")).as("exact_cd"))
      val typed = perType.select(col("event_type"),
        expr("hll_sketch_estimate(sk)").as("est"), col("exact_cd"))
      val overall = perType
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
        .crossJoin(broadcast(e.agg(countDistinct(col("user_id")).as("exact_cd"))))
        .select(lit("ALL").as("event_type"), col("est"), col("exact_cd"))
      typed.unionByName(overall)
        .select(col("event_type"),
          (abs(col("est") - col("exact_cd")) <= col("exact_cd") * 0.05).as("within_5pct"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, TRUE AS within_5pct FROM (
        SELECT DISTINCT event_type FROM events
        UNION ALL SELECT 'ALL')
      ORDER BY event_type"""),
    doc = "per-group HLL sketches merged to a rollup without rescan; bounds pinned TRUE")

  // ---------------------------------------------------------------- q94
  /** Symmetric int8 scalar quantization of embeddings (the memory-bound
    * ANN deployment step: 4 bytes/dim → 1). Per-vector scale = 127/max|v|;
    * `floor` keeps the math bit-deterministic across engines (round() ties
    * differ). Pure per-row scalar work — embarrassingly parallel. Output
    * arrays are JSON-serialized so the driver gate hashes them. */
  val q94 = QueryDef(
    "q94_int8_quantize",
    (s, d) => Tables.embeddings(s, d)
      .select(col("vec_id"),
        array_max(transform(col("embedding"), v => abs(v.cast("double")))).as("mx"),
        col("embedding"))
      .select(col("vec_id"),
        when(col("mx") === 0.0,
            to_json(transform(col("embedding"), _ => lit(0))))
          .otherwise(to_json(transform(col("embedding"),
            v => floor(v.cast("double") * lit(127.0) / col("mx")).cast("int"))))
          .as("q_json"))
      .orderBy(col("vec_id")),
    Some("""SELECT vec_id,
        CASE WHEN mx = 0 THEN to_json(list_transform(embedding, v -> 0))
             ELSE to_json(list_transform(embedding,
               v -> CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / mx) AS INT))) END AS q_json
      FROM (SELECT vec_id, embedding,
              list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS mx
            FROM embeddings)
      ORDER BY vec_id"""),
    doc = "per-vector symmetric int8 quantization; floor for cross-engine determinism")

  // ---------------------------------------------------------------- q95
  /** Within-document repetition score (boilerplate/spam signal): the
    * fraction of a document's 3-gram shingles that are repeats.
    * Raw (non-deduped) shingling, per-row scalar; corpus-scale linear. */
  val q95 = QueryDef(
    "q95_repetition_score",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        transform(sequence(lit(0), size(col("w")) - 3), i =>
          concat_ws(" ", element_at(col("w"), i + 1),
            element_at(col("w"), i + 2), element_at(col("w"), i + 3))).as("sh"))
      .select(col("doc_id"),
        size(col("sh")).cast("long").as("n_shingles"),
        size(array_distinct(col("sh"))).cast("long").as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        round(lit(1.0) - col("n_unique").cast("double") / col("n_shingles"), 6)
          .as("repetition"))
      .orderBy(col("doc_id")),
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') words FROM documents),
      s AS (SELECT doc_id,
              [array_to_string(words[i:i+2], ' ') for i in range(1, len(words)-1)] sh
            FROM w WHERE len(words) >= 3)
      SELECT doc_id,
        CAST(len(sh) AS BIGINT) AS n_shingles,
        CAST(len(list_distinct(sh)) AS BIGINT) AS n_unique,
        round(1.0 - len(list_distinct(sh))::DOUBLE / len(sh), 6) AS repetition
      FROM s ORDER BY doc_id"""),
    doc = "repeated 3-gram fraction per doc — boilerplate detection")

  // ---------------------------------------------------------------- q96
  /** Stratified deterministic selection: exactly 5 documents per language,
    * chosen by md5(text) order — a reproducible, content-addressed
    * per-class subsample (the curation counterpart of q91's row sampler).
    * Rank-limit window → WindowGroupLimit: each partition keeps a bounded
    * top-5 heap on both sides of the shuffle, never a full sort. */
  val q96 = QueryDef(
    "q96_stratified_take",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(md5(col("text")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          row_number().over(w).cast("long").as("rk"))
        .filter(col("rk") <= 5)
        .orderBy(col("lang"), col("rk"))
    },
    Some("""SELECT lang, doc_id, rk FROM (
        SELECT lang, doc_id,
          row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
        FROM documents) WHERE rk <= 5
      ORDER BY lang, rk"""),
    doc = "deterministic per-class top-5 by content hash; WindowGroupLimit plan")

  // ---------------------------------------------------------------- q102
  /** Heavy hitters via the approx_top_k frequent-items sketch (mergeable,
    * like q93's HLL — the sketch merges across partitions map-side, so
    * the full stream is never shuffled). The key space is deliberately
    * skewed (3 keys at ~10% each over a uniform tail) so the top-3 is
    * deterministic; the query self-checks each estimate within 1% of the
    * exact count and the oracle pins the heavy keys + TRUE verdicts. */
  val q102 = QueryDef(
    "q102_heavy_hitters",
    (s, d) => {
      val keyed = Tables.events(s, d).select(
        when(pmod(col("user_id"), lit(10)) < 3,
            concat(lit("heavy-"), pmod(col("user_id"), lit(10)).cast("string")))
          .otherwise(concat(lit("tail-"), col("user_id").cast("string")))
          .as("k"))
      val est = keyed.agg(expr("approx_top_k(k, 3, 10000)").as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t.item").as("item"), col("t.count").as("est"))
      val exact = keyed.groupBy(col("k")).agg(count(lit(1)).as("n"))
      est.join(exact, est("item") === exact("k"))
        .select(col("item"),
          (abs(col("est") - col("n")) <= col("n") * 0.01).as("within_1pct"))
        .orderBy(col("item"))
    },
    Some("""SELECT 'heavy-' || x AS item, TRUE AS within_1pct
      FROM generate_series(0, 2) t(x) ORDER BY item"""),
    doc = "mergeable frequent-items sketch; skewed keys make the top-3 deterministic")

  // ---------------------------------------------------------------- q107
  /** Sequence-packing plan — the pretraining batcher's layout step:
    * concatenate documents in a deterministic order and split the token
    * stream into fixed windows (2048 here), reporting per chunk how many
    * docs landed in it and its fill. A document's chunk is decided by the
    * token PREFIX before it (`cum − tokens`), i.e. greedy concatenation
    * with no doc-boundary padding — the GPT-style packing layout.
    *
    * Scale shape: packing is inherently sequential, so it is SHARDED —
    * each `source` packs independently (exactly how production packers
    * shard by file/source), giving one spilling window sort per shard
    * rather than a global order. The running sum is a window aggregate
    * (O(1) state), never a collect; chunk stats reduce in a keyed agg. */
  val q107 = QueryDef(
    "q107_sequence_pack",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = size(split(col("text"), " ")).cast("long")
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), toks.as("tokens"))
        .withColumn("cum", sum(col("tokens")).over(w))
        .withColumn("chunk_id", floor((col("cum") - col("tokens")) / 2048L))
        .groupBy(col("source"), col("chunk_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"), col("chunk_id"))
    },
    Some("""WITH t AS (
        SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
          SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
            OVER (PARTITION BY source ORDER BY doc_id) AS cum
        FROM documents)
      SELECT source, CAST(FLOOR((cum - tokens) / 2048.0) AS BIGINT) AS chunk_id,
        COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS tokens,
        MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM t GROUP BY 1, 2 ORDER BY source, chunk_id"""),
    doc = "greedy concat packing into 2048-token windows, sharded by source")

  // ---------------------------------------------------------------- q108
  /** Dataset-mixing weights — temperature-scaled source sampling (the
    * multilingual/multi-source recipe: p_i ∝ share_i^α with α = 0.5, so
    * small sources are upsampled relative to their raw share without
    * letting any source dominate). Input is the per-(source, lang) token
    * census; output is each slice's raw share and its normalized
    * sampling weight. Everything after the first keyed aggregate is
    * arithmetic over |slices| rows — the normalizing sums are window
    * aggregates over a frame that is already reduced, so the plan stays
    * one scan + one shuffle at any corpus size. */
  val q108 = QueryDef(
    "q108_mix_weights",
    (s, d) => {
      val all = graft.operators.BoundedWindow.over(col("source"))
      Tables.documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
        .withColumn("share", col("tokens") / sum(col("tokens")).over(all))
        .withColumn("w_raw", sqrt(col("share")))
        .select(col("source"), col("lang"), col("n_docs"), col("tokens"),
          round(col("share"), 6).as("share"),
          round(col("w_raw") / sum(col("w_raw")).over(all), 6).as("weight"))
        .orderBy(col("source"), col("lang"))
    },
    Some("""WITH census AS (
        SELECT source, lang, COUNT(*) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY 1, 2),
      shared AS (
        SELECT *, tokens::DOUBLE / SUM(tokens::DOUBLE) OVER () AS share,
          sqrt(tokens::DOUBLE / SUM(tokens::DOUBLE) OVER ()) AS w_raw
        FROM census)
      SELECT source, lang, n_docs, tokens, round(share, 6) AS share,
        round(w_raw / SUM(w_raw) OVER (), 6) AS weight
      FROM shared ORDER BY source, lang"""),
    doc = "temperature-scaled (alpha=0.5) source sampling weights from the token census")

  // --------------------------------------------------------------- q130
  /** Corpus snapshot diff — the data-versioning audit run between two
    * training cuts: which documents were added, removed, changed, or
    * untouched. Snapshots derive deterministically from the one corpus
    * (A drops doc_id % 11, B drops % 17 and rewrites % 13), so both
    * engines diff identical inputs; content identity is md5(text), and
    * the verdict census carries an id checksum so a misclassified doc
    * can't hide inside a matching count.
    *
    * Scale shape: full outer equi-join on doc_id between two hash
    * projections (16-byte digests, never text), then a 4-row agg. At
    * 100 TB this is THE incremental-ingest reconciliation plan: both
    * sides shuffle once on the join key; nothing else moves. */
  val q130 = QueryDef(
    "q130_snapshot_diff",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val a = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id").as("a_id"), md5(col("text")).as("a_h"))
      val b = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id").as("b_id"),
          md5(when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("b_h"))
      a.join(b, col("a_id") === col("b_id"), "full")
        .select(coalesce(col("a_id"), col("b_id")).as("doc_id"),
          when(col("a_id").isNull, "added")
            .when(col("b_id").isNull, "removed")
            .when(col("a_h") =!= col("b_h"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_checksum"))
        .orderBy(col("status"))
    },
    Some("""WITH a AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 11 != 0),
      b AS (SELECT doc_id,
              md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS h
            FROM documents WHERE doc_id % 17 != 0),
      j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
              CASE WHEN a.doc_id IS NULL THEN 'added'
                   WHEN b.doc_id IS NULL THEN 'removed'
                   WHEN a.h != b.h THEN 'changed'
                   ELSE 'unchanged' END AS status
            FROM a FULL JOIN b ON a.doc_id = b.doc_id)
      SELECT status, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_checksum
      FROM j GROUP BY status ORDER BY status"""),
    doc = "added/removed/changed/unchanged census between two derived corpus snapshots")

  // --------------------------------------------------------------- q131
  /** Vocabulary application + OOV census: build a frequency-ranked
    * vocab (top 20 by count, ties broken by word — fully deterministic
    * ids), broadcast it over the exploded token stream, and report the
    * per-source out-of-vocabulary rate — the tokenizer-application
    * shape, where the corpus explodes to token granularity and the
    * vocab rides along as a broadcast map.
    *
    * Scale shape: token-count agg (one big map-side-combined shuffle on
    * the word), a VOCAB-sized (sublinear, here 20-row) top-k +
    * row_number — the single-partition window is over the vocab, never
    * the corpus — then a broadcast left join at token granularity and a
    * per-source agg. OOV share is an exact integer ratio. */
  val q131 = QueryDef(
    "q131_vocab_oov",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val words = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      val counts = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
      val vocab = counts.orderBy(col("c").desc, col("w")).limit(20)
        .select(col("w"),
          row_number().over(graft.operators.BoundedWindow.over(col("w")).orderBy(col("c").desc, col("w"))).as("token_id"))
      words.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"),
          round(sum(when(col("token_id").isNull, 1L).otherwise(0L)).cast("double")
            / count(lit(1)), 6).as("oov_rate"),
          sum(coalesce(col("token_id"), lit(0L))).as("id_checksum"))
        .orderBy(col("source"))
    },
    Some("""WITH words AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents),
      counts AS (SELECT w, count(*) AS c FROM words GROUP BY w),
      vocab AS (SELECT w, row_number() OVER (ORDER BY c DESC, w) AS token_id
                FROM counts ORDER BY c DESC, w LIMIT 20),
      tagged AS (SELECT wd.source, wd.w, v.token_id
                 FROM words wd LEFT JOIN vocab v USING (w))
      SELECT source, count(*) AS n_tok,
        count(*) FILTER (WHERE token_id IS NULL) AS n_oov,
        round(count(*) FILTER (WHERE token_id IS NULL)::DOUBLE / count(*), 6) AS oov_rate,
        CAST(sum(COALESCE(token_id, 0)) AS BIGINT) AS id_checksum
      FROM tagged GROUP BY source ORDER BY source"""),
    doc = "top-k frequency vocab broadcast over the token stream; per-source OOV rate")

  // --------------------------------------------------------------- q151
  /** Token-weighted median quality per source — corpus statistics must
    * weight by TOKENS, not documents (a doc-weighted mean lets a million
    * empty stubs mask one bad 100M-token dump). Exact lower weighted
    * median: rows sort by (quality, doc_id) within source, the answer is
    * the first value whose doubled cumulative weight reaches the total —
    * all integer comparisons, per-row-identical quality doubles (q50's
    * precedent), no interpolation.
    *
    * Scale shape: source is LOW-cardinality, so a per-source ordered
    * window would single-task-sort each corpus-sized group; the
    * cumulative weight instead comes from [[graft.operators.RangeRank]]
    * — range-partitioned within source, parallel slice prefix sums,
    * broadcast offsets — then a per-source agg. */
  val q151 = QueryDef(
    "q151_weighted_median_quality",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("w"),
          round(TextStats.qualityScore(col("text")), 6).as("v"))
      val cum = graft.operators.RangeRank.withOrderedPrefix(
        scored, Seq("source"), Seq(col("v"), col("doc_id")),
        weights = Seq(graft.operators.RangeRank.Weight("w", "cw", Some("tw"))))
      cum.groupBy(col("source"))
        .agg(min(col("tw")).as("total_tokens"),
          min(when(col("cw") * 2 >= col("tw"), col("v"))).as("weighted_median_quality"))
        .orderBy(col("source"))
    },
    Some("""WITH scored AS (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
          round(least(len(string_split(lower(text), ' '))::DOUBLE / 50.0, 1.0) * 0.4
            + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                / greatest(length(text)::DOUBLE, 1.0) * 10.0, 1.0)) * 0.3
            + (len(list_filter(string_split(lower(text), ' '),
                x -> x IN ('the','a','of','and','to')))::DOUBLE
               / len(string_split(lower(text), ' '))::DOUBLE) * 0.3, 6) AS v
        FROM documents),
      cum AS (SELECT source, v, w, doc_id,
          sum(w) OVER (PARTITION BY source ORDER BY v, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
          sum(w) OVER (PARTITION BY source) AS tw
        FROM scored)
      SELECT source, CAST(min(tw) AS BIGINT) AS total_tokens,
        min(v) FILTER (WHERE 2*cw >= tw) AS weighted_median_quality
      FROM cum GROUP BY source ORDER BY source"""),
    doc = "exact lower weighted median (token weights); integer cumulative-weight rule")

  // --------------------------------------------------------------- q152
  /** Equi-width histogram of document lengths per language — the
    * width_bucket shape: 8 bins spanning each language's [min, max].
    * Bin assignment is floor((v − lo) / width) with the top edge clamped
    * into the last bin; lo/hi are integers and the division is a single
    * IEEE op, so bin ids are engine-identical. Two tiny aggs (bounds +
    * histogram), bounds broadcast. */
  val q152 = QueryDef(
    "q152_length_histogram",
    (s, d) => {
      val b = Tables.documents(s, d).groupBy(col("lang"))
        .agg(min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
      Tables.documents(s, d).join(broadcast(b), "lang")
        .select(col("lang"),
          least(floor((col("n_chars") - col("lo"))
            / ((col("hi") - col("lo")) / 8.0)), lit(7L)).cast("long").as("bin"))
        .groupBy(col("lang"), col("bin")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("bin"))
    },
    Some("""WITH b AS (SELECT lang, min(n_chars) AS lo, max(n_chars) AS hi
        FROM documents GROUP BY lang),
      binned AS (SELECT d.lang,
          CAST(least(floor((d.n_chars - b.lo) / ((b.hi - b.lo) / 8.0)), 7) AS BIGINT) AS bin
        FROM documents d JOIN b USING (lang))
      SELECT lang, bin, count(*) AS n FROM binned GROUP BY lang, bin
      ORDER BY lang, bin"""),
    doc = "8-bin equi-width length histogram per language; broadcast bounds")

  // --------------------------------------------------------------- q156
  /** Pareto token concentration: how few documents hold half of each
    * source's tokens — the long-tail diagnostic behind length-capping
    * and sampling decisions (a source where 5% of docs carry 50% of
    * tokens needs different treatment than a uniform one). The
    * "docs-for-half" rule is exact-integer: a doc counts while twice the
    * cumulative weight BEFORE it is still below the total. Prefix sums
    * run via [[graft.operators.RangeRank]] (parallel range-partitioned
    * slices + broadcast offsets) — source is low-cardinality, so the old
    * per-source ordered window was a single-task sort at scale. */
  val q156 = QueryDef(
    "q156_pareto_concentration",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("w"))
      val cum = graft.operators.RangeRank.withOrderedPrefix(
        base, Seq("source"), Seq(col("w").desc, col("doc_id")),
        nTotal = Some("nd"),
        weights = Seq(graft.operators.RangeRank.Weight("w", "cw", Some("tw"))))
      cum.groupBy(col("source"))
        .agg(min(col("nd")).as("n_docs"),
          sum(when((col("cw") - col("w")) * 2 < col("tw"), 1L).otherwise(0L))
            .as("docs_for_half"))
        .select(col("source"), col("n_docs"), col("docs_for_half"),
          round(col("docs_for_half").cast("double") / col("n_docs"), 6)
            .as("frac_docs_for_half"))
        .orderBy(col("source"))
    },
    Some("""WITH d AS (SELECT source, doc_id,
          CAST(len(string_split(text,' ')) AS BIGINT) AS w FROM documents),
      cum AS (SELECT source, doc_id, w,
          sum(w) OVER (PARTITION BY source ORDER BY w DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
          sum(w) OVER (PARTITION BY source) AS tw,
          count(*) OVER (PARTITION BY source) AS nd
        FROM d)
      SELECT source, CAST(min(nd) AS BIGINT) AS n_docs,
        CAST(count(*) FILTER (WHERE 2*(cw - w) < tw) AS BIGINT) AS docs_for_half,
        round(count(*) FILTER (WHERE 2*(cw - w) < tw)::DOUBLE / min(nd), 6)
          AS frac_docs_for_half
      FROM cum GROUP BY source ORDER BY source"""),
    doc = "min docs covering half of each source's tokens; exact cumulative-weight rule")

  // --------------------------------------------------------------- q157
  /** The dataset card: one row summarizing the corpus — doc/token/source/
    * language counts, exact duplicate rate, and mean quality — the
    * numbers every published dataset README leads with. Mean quality is
    * decimal-exact (per-row quality rounds once to 6 dp, sums in
    * DECIMAL, divides once), duplicate rate is an exact integer ratio
    * over a distinct-text count. One pass + cheap distinct aggs. */
  val q157 = QueryDef(
    "q157_dataset_card",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          round(TextStats.qualityScore(col("text")), 6)
            .cast("decimal(10,6)").as("q"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("text")).as("n_distinct_texts"),
          (sum(col("q")) / count(lit(1))).cast("double").as("mean_q"))
        .select(col("n_docs"), col("n_tokens"), col("n_sources"), col("n_langs"),
          round(lit(1.0) - col("n_distinct_texts").cast("double") / col("n_docs"), 6)
            .as("dup_rate"),
          round(col("mean_q"), 6).as("mean_quality"))
    },
    Some("""SELECT count(*) AS n_docs,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        count(DISTINCT source) AS n_sources,
        count(DISTINCT lang) AS n_langs,
        round(1.0 - count(DISTINCT text)::DOUBLE / count(*), 6) AS dup_rate,
        round(CAST(SUM(CAST(round(
            least(len(string_split(lower(text), ' '))::DOUBLE / 50.0, 1.0) * 0.4
            + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                / greatest(length(text)::DOUBLE, 1.0) * 10.0, 1.0)) * 0.3
            + (len(list_filter(string_split(lower(text), ' '),
                x -> x IN ('the','a','of','and','to')))::DOUBLE
               / len(string_split(lower(text), ' '))::DOUBLE) * 0.3, 6)
          AS DECIMAL(10,6))) / count(*) AS DOUBLE), 6) AS mean_quality
      FROM documents"""),
    doc = "one-row corpus summary: counts, exact dup rate, decimal-exact mean quality")

  // --------------------------------------------------------------- q166
  /** Deterministic train/val/test split assignment (80/10/10): the split
    * is a pure function of a salted content-addressed hash — re-running
    * on any cluster size, any partitioning, any day gives every document
    * the same split, and adding documents never reshuffles existing ones
    * (the q91 property, applied to the canonical ML-data split). The
    * salt ("split:") isolates this hash use from every other md5-keyed
    * decision in the pipeline. Census per (source, split) proves the
    * proportions land. */
  val q166 = QueryDef(
    "q166_split_assignment",
    (s, d) => {
      val bucket = pmod(
        conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long"), lit(10))
      Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
            .as("split"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy(col("source"), col("split"))
    },
    Some("""WITH b AS (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS bucket
        FROM documents),
      s AS (SELECT doc_id, source, n_tok,
          CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
        FROM b)
      SELECT source, split, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM s GROUP BY source, split ORDER BY source, split"""),
    doc = "salted content-hash 80/10/10 split; stable under growth and repartitioning")

  // --------------------------------------------------------------- q167
  /** Split-leakage audit: identical content appearing on BOTH sides of a
    * train/eval boundary silently inflates benchmarks — the classic
    * id-keyed-split failure q166's content-hash split cannot prevent
    * when the same text re-enters under a new id. The fixture doubles
    * the corpus under shifted ids (the real-world re-crawl mechanism);
    * the audit groups by CONTENT and reports each group's split-set
    * signature — any signature with a comma is leakage.
    *
    * Scale shape: the content group key is xxhash64(text) (8-byte
    * shuffle + the q40 collision fail-stop); the signature census is
    * |signatures|-sized. This is the check to run after every split
    * rebuild. */
  val q167 = QueryDef(
    "q167_split_leakage",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val allDocs = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val bucket = pmod(
        conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long"), lit(10))
      val b = allDocs.select(col("text"), xxhash64(col("text")).as("th"),
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
          .as("split"))
      b.groupBy(col("th"))
        .agg(array_join(array_sort(collect_set(col("split"))), ",").as("splits"),
          count(lit(1)).as("n_copies"),
          min(Dedup.guardHash(col("text"))).as("t1"),
          max(Dedup.guardHash(col("text"))).as("t2"))
        .select(
          when(col("t1") =!= col("t2"),
            raise_error(lit("q167: xxhash64 collision — distinct texts in one group"))
              .cast("string"))
            .otherwise(col("splits")).as("splits"),
          col("n_copies"))
        .groupBy(col("splits"))
        .agg(count(lit(1)).as("n_groups"), sum(col("n_copies")).as("n_docs"))
        .orderBy(col("splits"))
    },
    Some("""WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000, text FROM documents),
      b AS (SELECT doc_id, text,
          CASE WHEN CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 8
               THEN 'train'
               WHEN CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 8
               THEN 'val' ELSE 'test' END AS split
        FROM all_docs),
      g AS (SELECT text, array_to_string(list_sort(list(DISTINCT split)), ',') AS splits,
              count(*) AS n_copies
            FROM b GROUP BY text)
      SELECT splits, count(*) AS n_groups, CAST(sum(n_copies) AS BIGINT) AS n_docs
      FROM g GROUP BY splits ORDER BY splits"""),
    doc = "content groups spanning multiple splits = eval leakage; hash shuffle + guard")

  // --------------------------------------------------------------- q183
  /** Boundary-respecting sequence packing + padding-waste audit — the
    * complement of q107's greedy concat: here a document NEVER splits
    * across sequences (the eval-batch / instruction-tuning layout), so
    * a chunk closes when the next doc would overflow the 256-token
    * window and the unreached tail is PADDING. The per-source report
    * (chunks, padding, fill %) is the number that decides between the
    * two packing modes for a corpus shape.
    *
    * Scale shape: packing is sequential per shard, so each source folds
    * its doc-ordered token list through ONE higher-order `aggregate`
    * (state = (chunks, fill, waste) — O(1)); the only shuffle is the
    * per-source collect_list. The oracle computes the same fold via
    * DuckDB's list_reduce over an ORDER BY-ed list aggregate — two
    * engines, two fold implementations, one answer. */
  val q183 = QueryDef(
    "q183_boundary_pack",
    (s, d) => {
      val t = size(split(col("text"), " ")).cast("long")
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), t.as("t"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("total_tokens"),
          expr("""aggregate(
              transform(array_sort(collect_list(struct(doc_id, t))), x -> x.t),
              named_struct('chunks', 0L, 'fill', 0L, 'waste', 0L),
              (a, tok) -> IF(a.chunks = 0,
                named_struct('chunks', 1L, 'fill', tok, 'waste', 0L),
                IF(a.fill + tok > 256L,
                  named_struct('chunks', a.chunks + 1, 'fill', tok,
                    'waste', a.waste + (256L - a.fill)),
                  named_struct('chunks', a.chunks, 'fill', a.fill + tok,
                    'waste', a.waste))),
              a -> named_struct('chunks', a.chunks,
                'waste', a.waste + (256L - a.fill))) AS p"""))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("p.chunks").as("n_chunks"),
          col("p.waste").as("padding_tokens"),
          // exact ppm, not a rounded double: chunk capacities are powers
          // of two, so total/(chunks·256) lands on exact binary halves
          // where Spark's HALF_UP and DuckDB's double-round disagree
          // (bit one such case at sf0.001)
          expr("total_tokens * 1000000 div (p.chunks * 256)").as("fill_ppm"))
        .orderBy(col("source"))
    },
    Some("""WITH RECURSIVE t AS (SELECT source, doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents),
      -- the fold is a recursive CTE, NOT list_reduce: DuckDB 1.0.0's
      -- list_reduce mis-evaluates inside a multi-group aggregate (same
      -- sorted input list folds to 7 chunks grouped vs 6 single-group —
      -- reproduced on src9 at sf0.001 with the list itself verified
      -- identical), so a grouped lambda fold cannot be the oracle for an
      -- order-sensitive computation. The recursion advances all sources
      -- in lockstep, one element per step, and is bug-path-free.
      fold AS (
        SELECT source, rn, 1::BIGINT AS chunks, t AS fill, 0::BIGINT AS waste
        FROM t WHERE rn = 1
        UNION ALL
        SELECT s.source, s.rn,
          CASE WHEN f.fill + s.t > 256 THEN f.chunks + 1 ELSE f.chunks END,
          CASE WHEN f.fill + s.t > 256 THEN s.t ELSE f.fill + s.t END,
          CASE WHEN f.fill + s.t > 256 THEN f.waste + 256 - f.fill ELSE f.waste END
        FROM fold f JOIN t s ON s.source = f.source AND s.rn = f.rn + 1),
      fin AS (SELECT source, chunks, fill, waste FROM (
          SELECT source, chunks, fill, waste,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY rn DESC) AS r
          FROM fold) WHERE r = 1),
      tot AS (SELECT source, count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS total_tokens
        FROM t GROUP BY source)
      SELECT tot.source, n_docs, total_tokens,
        fin.chunks AS n_chunks,
        CAST(fin.waste + (256 - fin.fill) AS BIGINT) AS padding_tokens,
        CAST(total_tokens * 1000000 // (fin.chunks * 256) AS BIGINT) AS fill_ppm
      FROM tot JOIN fin ON fin.source = tot.source
      ORDER BY tot.source"""),
    doc = "doc-boundary packing: chunks, padding waste, fill ppm per source; one HOF fold per shard (oracle folds via recursive CTE)")

  // ---------------------------------------------------------------- q188
  /** Pairwise audience-overlap matrix via HLL sketch algebra — q93's
    * mergeable-sketch discipline applied to set INTERSECTION: for every
    * event-type pair, |A∩B| is estimated by inclusion-exclusion over the
    * per-type sketches (est(A) + est(B) − est(A∪B), the union being
    * `hll_union` of two already-built sketches — no rescan of the raw
    * data, ever). This is the 100 TB shape for "how much do these N
    * segments overlap": one pass builds N sketches of a few KB each; all
    * N·(N−1)/2 pair estimates then run on the driver-sized sketch table
    * (broadcast self-join). The exact path (distinct (type, user) self-
    * join) exists only to pin the estimator's error bound — the oracle
    * hash-checks the exact overlaps and the bound verdict, so a sketch
    * regression (wrong lgK, broken union) fails the gate. */
  val q188 = QueryDef(
    "q188_hll_overlap",
    (s, d) => {
      val e = Tables.events(s, d)
      val sk = e.groupBy(col("event_type"))
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
          countDistinct(col("user_id")).as("cd"))
      val du = e.select(col("event_type"), col("user_id")).distinct()
      val exactPairs = du.as("x").join(du.as("y"),
          col("x.user_id") === col("y.user_id")
            && col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("exact_overlap"))
      val est = sk.as("a").join(broadcast(sk.as("b")),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          (col("a.cd") + col("b.cd")
            - expr("hll_sketch_estimate(hll_union(a.sk, b.sk))")).as("est_overlap"),
          expr("hll_sketch_estimate(hll_union(a.sk, b.sk))").as("est_union"))
      est.join(exactPairs, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"),
          coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"),
          (abs(col("est_overlap") - coalesce(col("exact_overlap"), lit(0L)))
            <= greatest(lit(5.0), col("est_union") * lit(0.05))).as("within_bound"))
        .orderBy(col("type_a"), col("type_b"))
    },
    Some("""WITH t AS (SELECT DISTINCT event_type FROM events),
      du AS (SELECT DISTINCT event_type, user_id FROM events),
      pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
        FROM t a JOIN t b ON a.event_type < b.event_type),
      ov AS (SELECT x.event_type AS ta, y.event_type AS tb, COUNT(*) AS c
        FROM du x JOIN du y
          ON x.user_id = y.user_id AND x.event_type < y.event_type
        GROUP BY 1, 2)
      SELECT p.ta AS type_a, p.tb AS type_b,
        CAST(COALESCE(ov.c, 0) AS BIGINT) AS exact_overlap,
        TRUE AS within_bound
      FROM pairs p LEFT JOIN ov ON ov.ta = p.ta AND ov.tb = p.tb
      ORDER BY type_a, type_b"""),
    doc = "segment-overlap matrix by HLL inclusion-exclusion: sketch algebra only, error bound pinned TRUE")

  // ---------------------------------------------------------------- q197
  /** Trailing-7-day distinct users per (type, day) by SLIDING-WINDOW
    * SKETCH MERGE — the classic "sliding distinct" problem solved the
    * mergeable way: one daily HLL sketch per (type, day) (a single pass
    * over the data), then each output day unions its 7 constituent daily
    * sketches (`hll_union_agg` over an offset-exploded equi-join — KB-sized
    * sketches replicate 7×, raw rows never re-scan). The naive form
    * re-reads each day's events 7 times; at 100 TB the daily sketches are
    * a tiny state table and each new day costs one partial + 7 unions —
    * the same incremental discipline as q192. Exact trailing counts (the
    * expensive way, offset-exploding distinct user-days) cross the oracle
    * together with the estimator's 5% bound verdict. */
  val q197 = QueryDef(
    "q197_sliding_distinct",
    (s, d) => {
      val e = Tables.events(s, d).select(col("event_type"),
        expr("ts_ns div 86400000000000").as("dd"), col("user_id"))
      val days = e.select(col("event_type"), col("dd")).distinct()
      val daily = e.groupBy(col("event_type"), col("dd"))
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      val est = daily
        .select(col("event_type"), col("sk"),
          explode(sequence(lit(0L), lit(6L))).as("off"), col("dd"))
        .select(col("event_type"), (col("dd") + col("off")).as("dd"), col("sk"))
        .join(days, Seq("event_type", "dd"))
        .groupBy(col("event_type"), col("dd"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      val exact = e.distinct()
        .select(col("event_type"), col("user_id"),
          explode(sequence(lit(0L), lit(6L))).as("off"), col("dd"))
        .select(col("event_type"), (col("dd") + col("off")).as("dd"), col("user_id"))
        .join(days, Seq("event_type", "dd"))
        .groupBy(col("event_type"), col("dd"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      est.join(exact, Seq("event_type", "dd"))
        .select(col("event_type"), col("dd"), col("exact_users"),
          (abs(col("est") - col("exact_users"))
            <= greatest(lit(3.0), col("exact_users") * lit(0.05))).as("within_bound"))
        .orderBy(col("event_type"), col("dd"))
    },
    Some("""WITH e AS (SELECT event_type,
          epoch_ns(ts) // 86400000000000 AS dd, user_id FROM events),
      days AS (SELECT DISTINCT event_type, dd FROM e)
      SELECT d.event_type, d.dd,
        (SELECT COUNT(DISTINCT e2.user_id) FROM e e2
          WHERE e2.event_type = d.event_type
            AND e2.dd BETWEEN d.dd - 6 AND d.dd) AS exact_users,
        TRUE AS within_bound
      FROM days d ORDER BY event_type, dd"""),
    doc = "trailing-7d distinct via daily HLL sketch union (no re-scan); exact counts + bound cross the oracle")

  // --------------------------------------------------------------- q273
  /** T5-style span-corruption accounting — the preprocessing pass that
    * turns raw documents into denoising-objective training examples:
    * ~15% of token positions are marked for masking by a deterministic
    * per-(doc, position) hash (the corruption must be reproducible
    * across re-runs and engines — no RNG state), consecutive masked
    * positions coalesce into SPANS (gaps-and-islands: pos − row_number
    * over masked positions is constant within a run), and each span is
    * replaced by one sentinel token, so the encoder-side length after
    * corruption is n_tokens − n_masked + n_spans. This query emits the
    * per-document census (token/mask/span counts, post-corruption
    * length, realized mask ppm) that both the example writer and the
    * token-budget planner (q119) consume.
    *
    * Scale shape: everything is keyed by doc_id — the explode, the
    * island window, and the census agg all partition on the same 8-byte
    * key, so the whole pass is one shuffle of (doc_id, pos) pairs and
    * every window is narrow. No driver state, no RNG, no UDF. */
  val q273 = QueryDef(
    "q273_span_corruption",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val words = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val toks = words.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
      val masked = words.filter(
        expr("cast(conv(substring(md5(concat(cast(doc_id as string), ':', cast(pos as string))), 1, 8), 16, 10) as bigint) % 1000 < 150"))
      val wI = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val spans = masked
        .withColumn("island", col("pos") - row_number().over(wI))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_masked"),
          countDistinct(col("island")).as("n_spans"))
      toks.join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_masked"), lit(0L)).as("n_masked"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"))
        .withColumn("n_after", col("n_tokens") - col("n_masked") + col("n_spans"))
        .withColumn("mask_ppm", expr("n_masked * 1000000 div n_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (SELECT doc_id, i - 1 AS pos FROM (
          SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i
          FROM documents)),
      toks AS (SELECT doc_id, COUNT(*) AS n_tokens FROM w GROUP BY doc_id),
      m AS (SELECT doc_id, pos FROM w
        WHERE CAST(('0x' || substr(md5(doc_id || ':' || pos), 1, 8)) AS BIGINT) % 1000 < 150),
      isl AS (SELECT doc_id, pos,
          pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM m),
      sp AS (SELECT doc_id, COUNT(*) AS n_masked,
          COUNT(DISTINCT island) AS n_spans
        FROM isl GROUP BY doc_id)
      SELECT t.doc_id, t.n_tokens,
        COALESCE(sp.n_masked, 0) AS n_masked,
        COALESCE(sp.n_spans, 0) AS n_spans,
        t.n_tokens - COALESCE(sp.n_masked, 0) + COALESCE(sp.n_spans, 0) AS n_after,
        CAST(COALESCE(sp.n_masked, 0) * 1000000 // t.n_tokens AS BIGINT) AS mask_ppm
      FROM toks t LEFT JOIN sp USING (doc_id) ORDER BY t.doc_id"""),
    doc = "deterministic T5 span-corruption census: hash-marked 15% positions, gaps-and-islands span coalescing, sentinel-adjusted lengths")

  // --------------------------------------------------------------- q275
  /** Weighted sampling without replacement, stratified per source
    * (Efraimidis–Spirakis A-ES): each doc draws a deterministic uniform
    * u ∈ (0,1) from an md5 hash of its id, and the k docs with the
    * largest u^(1/w) win — equivalently the largest ln(u)/w, which is
    * what's computed (w = n_chars, so long docs are proportionally more
    * likely to be kept; the scheme a token-budgeted subcorpus draw
    * uses when "sample 1% of docs" must mean "1% of tokens"). The sort
    * key is frozen as ⌊ln(u)/w · 10⁹⌋ (BIGINT); ties break on doc_id.
    * Determinism caveat: the frozen key still crosses one transcendental
    * (ln), so cross-engine equality is by overwhelming likelihood, not
    * construction — java.lang.Math.log and DuckDB's libm ln agree to the
    * last ulp on these inputs, and a 1-ulp divergence only flips the key
    * if the product lands EXACTLY on a floor boundary (~1e-9 per row).
    * A by-construction variant would precompute ln in one engine and
    * freeze it into the fixture; not worth the fixture coupling here.
    *
    * Scale shape: the reservoir is a rank-limit window per stratum,
    * which TopKAggregateRewrite turns into the bounded k-row-heap
    * aggregate (ObjectHashAggregate + Generate in the plan — no Sort,
    * no Window), one shuffle on `source`; the hash, log, and division
    * are all map-side. This is the one-pass distributed form of weighted
    * reservoir sampling: no rand() state, reproducible across retries
    * (a failed task re-draws identical samples — A-ES with a PRNG
    * cannot promise that). */
  val q275 = QueryDef(
    "q275_weighted_sample",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("es_key").desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("wt"))
        .withColumn("u_scaled",
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"))
        .withColumn("es_key",
          expr("cast(floor(ln((u_scaled + 0.5) / 4294967296.0) / wt * 1000000000.0) as bigint)"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("doc_id"), col("wt"), col("es_key"))
        .orderBy(col("source"), col("rk"))
    },
    Some("""WITH c AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS wt,
          CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT) AS u_scaled
        FROM documents),
      k AS (SELECT *, CAST(floor(ln((u_scaled + 0.5) / 4294967296.0) / wt * 1000000000.0) AS BIGINT) AS es_key
        FROM c),
      r AS (SELECT source, doc_id, wt, es_key,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY es_key DESC, doc_id) AS rk
        FROM k)
      SELECT source, rk, doc_id, wt, es_key FROM r WHERE rk <= 5
      ORDER BY source, rk"""),
    doc = "Efraimidis–Spirakis weighted reservoir (k=5 per source, w=n_chars): deterministic md5 uniforms, frozen-integer ln(u)/w keys, rank-limit window — one pass, no full sort, retry-reproducible")

  // --------------------------------------------------------------- q284
  /** Group k-fold assignment (GroupKFold): every document of a SOURCE
    * lands in the same fold, so cross-validation never trains on one
    * half of a source and evaluates on the other — the grouped variant
    * of q166's content-hash split, needed whenever leakage runs along
    * a grouping key (site, author, user) rather than content identity
    * (q167 audits the content axis; this one makes the group axis
    * leak-proof BY CONSTRUCTION). Fold comes from the md5 of the group
    * key alone, so membership is reproducible and independent of corpus
    * growth within a group. The census exposes group k-fold's known
    * cost: fold sizes wobble with group granularity (docs_share_ppm).
    *
    * Scale shape: fold id is a map-side hash of the group key; the
    * census is one agg keyed by (fold) after a per-(fold, source)
    * partial — no shuffle wider than the group census. */
  val q284 = QueryDef(
    "q284_group_kfold",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .withColumn("fold",
          expr("cast(conv(substring(md5(source), 1, 8), 16, 10) as bigint) % 5"))
      val total = broadcast(docs.agg(count(lit(1)).as("tot_docs")))
      docs.groupBy(col("fold"), col("source"))
        .agg(count(lit(1)).as("nd"), sum(col("toks")).as("nt"))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_sources"), sum(col("nd")).as("n_docs"),
          sum(col("nt")).as("n_tokens"))
        .crossJoin(total)
        .select(col("fold"), col("n_sources"), col("n_docs"), col("n_tokens"),
          expr("n_docs * 1000000 div tot_docs").as("docs_share_ppm"))
        .orderBy(col("fold"))
    },
    Some("""WITH d AS (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
          CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 5 AS fold
        FROM documents),
      t AS (SELECT COUNT(*) AS tot_docs FROM d),
      g AS (SELECT fold, source, COUNT(*) AS nd, CAST(SUM(toks) AS BIGINT) AS nt
        FROM d GROUP BY 1, 2)
      SELECT fold, COUNT(*) AS n_sources, CAST(SUM(nd) AS BIGINT) AS n_docs,
        CAST(SUM(nt) AS BIGINT) AS n_tokens,
        CAST(SUM(nd) * 1000000 // tot_docs AS BIGINT) AS docs_share_ppm
      FROM g CROSS JOIN t GROUP BY fold, tot_docs ORDER BY fold"""),
    doc = "GroupKFold by source (k=5, md5 of the group key): leakage-proof along the group axis by construction, per-fold imbalance census")

  val all: Seq[QueryDef] =
    Seq(q91, q92, q93, q94, q95, q96, q102, q107, q108, q130, q131, q151, q152,
      q156, q157, q166, q167, q183, q188, q197, q273, q275, q284)
}
