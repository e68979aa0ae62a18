package graft.ext

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Privacy + document-structure tier of the training-data pipeline:
  * PII redaction, paragraph-level exact dedup (the CCNet line-dedup
  * shape), overlapping sequence chunking for embedding/context windows,
  * and percentile-band length filtering.
  *
  * 100 TB design notes:
  *  - redaction (q120) is per-row regex work — embarrassingly parallel,
  *    zero shuffles before the tiny per-source census agg;
  *  - paragraph dedup (q121) shuffles ONCE on an 8-byte xxhash64 of the
  *    paragraph (never the paragraph text as the key), with the q40-style
  *    collision fail-stop guard;
  *  - chunking (q122) is generate-and-explode with no shuffle at all
  *    until the output sort;
  *  - the length band (q125) runs the q23 boundary-rank percentile (a
  *    spilling window sort per language, never a value-buffering
  *    percentile) and broadcasts the per-language cutoff row back over
  *    the corpus.
  */
object PrivacyQueries {

  // --------------------------------------------------------------- q120
  /** PII redaction audit. The synthetic corpus carries no PII, so the
    * query first injects deterministic doc_id-derived PII (an email, an
    * IPv4, and a phone number on every third doc) and then redacts it —
    * the injection is part of the query contract on BOTH engines, so the
    * oracle checks the redaction machinery (regexp_count /
    * regexp_replace), not the synthesizer. Patterns avoid lookaround and
    * word-boundary classes so Java regex and DuckDB's RE2 agree; the
    * three patterns are disjoint by construction (only the email has an
    * '@'; only the phone has a '+'; only the IP is four dotted octets),
    * so counting on the dirty text and replacing in any order is exact.
    *
    * Scale shape: scan → per-row regex projection → 20-group agg. The
    * regex kernel is the cost; it parallelizes linearly and nothing
    * shuffles but 20-row partials. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+1-555-[0-9]{4}"
  private val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** text + deterministic doc_id-derived PII (shared by q120 and its spec). */
  private[graft] def injectPii(text: Column, docId: Column): Column = {
    val idStr = docId.cast("string")
    concat(text,
      lit(" contact u"), idStr, lit("@ex"), pmod(docId, lit(7)).cast("string"),
      lit(".com via 10."), pmod(docId, lit(200)).cast("string"),
      lit("."), pmod(docId, lit(250)).cast("string"),
      lit("."), (pmod(docId, lit(254)) + 1).cast("string"),
      when(pmod(docId, lit(3)) === 0,
        concat(lit(" call +1-555-"),
          lpad(pmod(docId, lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")))
  }

  /** All three PII patterns replaced (shared by q120 and its spec). */
  private[graft] def redact(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

  val q120 = QueryDef(
    "q120_pii_redact",
    (s, d) => {
      val dirty = Tables.documents(s, d)
        .select(col("source"), injectPii(col("text"), col("doc_id")).as("t"))
      dirty
        .select(col("source"), col("t"), redact(col("t")).as("clean"),
          regexp_count(col("t"), lit(EmailRe)).as("e"),
          regexp_count(col("t"), lit(IpRe)).as("i"),
          regexp_count(col("t"), lit(PhoneRe)).as("p"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("e")).as("n_emails"),
          sum(col("i")).as("n_ips"),
          sum(col("p")).as("n_phones"),
          sum(length(col("t")) - length(col("clean"))).as("chars_removed"))
        .orderBy(col("source"))
    },
    Some("""WITH dirty AS (SELECT doc_id, source,
        text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex' || CAST(doc_id % 7 AS VARCHAR)
          || '.com via 10.' || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)
          || '.' || CAST(doc_id % 254 + 1 AS VARCHAR)
          || CASE WHEN doc_id % 3 = 0
               THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END AS t FROM documents),
      red AS (SELECT source, t,
        regexp_replace(regexp_replace(regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
          '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS clean,
        len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS n_phones,
        len(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ips
      FROM dirty)
      SELECT source, count(*) AS n_docs,
        CAST(sum(n_emails) AS BIGINT) AS n_emails, CAST(sum(n_ips) AS BIGINT) AS n_ips,
        CAST(sum(n_phones) AS BIGINT) AS n_phones,
        CAST(sum(len(t) - len(clean)) AS BIGINT) AS chars_removed
      FROM red GROUP BY source ORDER BY source"""),
    doc = "PII redaction audit: regex count/replace of injected emails/IPs/phones")

  // --------------------------------------------------------------- q121
  /** Paragraph-level exact dedup (CCNet-style line dedup). The corpus
    * text is single-line, so "paragraph" = consecutive 16-word block —
    * the same deterministic segmentation on both engines (16 words keeps
    * a measured ~4% cross-doc duplicate rate in the synthetic corpus, so
    * the dedup path is actually exercised). Keep-first rule: a paragraph
    * instance survives iff it is the (doc_id, idx)-minimal occurrence of
    * its text corpus-wide.
    *
    * Scale shape: the only wide exchange is the window over
    * xxhash64(para) — an 8-byte key, one shuffle; text crosses the wire
    * once as the windowed row payload (unavoidable: the survivor's text
    * must reach its keeper decision), never as a join/group KEY. A
    * 64-bit collision would merge two distinct paragraphs, so the q40
    * fail-stop guard (min != max of Dedup.guardHash — a second
    * independent 8-byte digest — over the hash partition) raises rather
    * than silently over-deduping. Reassembly is a per-doc groupBy
    * (second shuffle, doc-sized payloads) emitting an md5 so the full
    * deduped text never lands in the result. */
  val q121 = QueryDef(
    "q121_paragraph_dedup",
    (s, d) => {
      val words = split(col("text"), " ")
      val paras = Tables.documents(s, d).select(col("doc_id"),
        transform(
          sequence(lit(0), ceil(size(words) / lit(16.0)).cast("int") - 1),
          i => array_join(slice(words, i * lit(16) + 1, lit(16)), " ")).as("paras"))
      val part = Window.partitionBy(col("ph"))
      val marked = paras
        .select(col("doc_id"), posexplode(col("paras")).as(Seq("idx", "para")))
        .withColumn("ph", xxhash64(col("para")))
        .select(col("doc_id"), col("idx"), col("para"),
          (row_number().over(part.orderBy(col("doc_id"), col("idx"))) === 1).as("kept"),
          (min(Dedup.guardHash(col("para"))).over(part)
            =!= max(Dedup.guardHash(col("para"))).over(part)).as("collision"))
      marked.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_paras"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          md5(array_join(
            transform(
              array_sort(collect_list(when(col("kept"), struct(col("idx"), col("para"))))),
              x => x.getField("para")),
            "\n")).as("kept_md5"),
          max(col("collision")).as("bad"))
        .select(col("doc_id"), col("n_paras"),
          when(col("bad"),
            raise_error(lit("q121: xxhash64 collision — distinct paragraphs in one group"))
              .cast("long"))
            .otherwise(col("n_kept")).as("n_kept"),
          col("kept_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS words FROM documents),
      p0 AS (SELECT doc_id,
          [{'idx': i-1, 'para': array_to_string(words[(i-1)*16+1:(i-1)*16+16], ' ')}
           for i in range(1, CAST(ceil(len(words)/16.0) AS BIGINT)+1)] AS lst FROM w),
      p AS (SELECT doc_id, unnest(lst) AS u FROM p0),
      r AS (SELECT doc_id, u.idx AS idx, u.para AS para,
              row_number() OVER (PARTITION BY u.para ORDER BY doc_id, u.idx) AS rn
            FROM p)
      SELECT doc_id, count(*) AS n_paras,
        count(*) FILTER (WHERE rn = 1) AS n_kept,
        md5(coalesce(string_agg(para, chr(10) ORDER BY idx) FILTER (WHERE rn = 1), ''))
          AS kept_md5
      FROM r GROUP BY doc_id ORDER BY doc_id"""),
    doc = "corpus-wide keep-first paragraph dedup; 8-byte hash shuffle + collision guard")

  // --------------------------------------------------------------- q122
  /** Overlapping sequence chunking: split each document into 64-token
    * chunks with a 16-token overlap (stride 48) — the standard layout
    * step before embedding or context-window packing. Chunk count is
    * ceil(max(n-16, 1)/48), so every token is covered and consecutive
    * chunks share exactly 16 tokens except the (possibly shorter) tail.
    *
    * Scale shape: pure generate-and-explode — no shuffle exists in the
    * plan until the output sort. Chunk text leaves the query only as an
    * md5, so result size stays O(chunks), not O(bytes). */
  val q122 = QueryDef(
    "q122_doc_chunking",
    (s, d) => {
      val words = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("doc_id"), words.as("w"),
          size(words).as("n"),
          ceil((greatest(size(words) - 16, lit(1))) / lit(48.0)).cast("int").as("nc"))
        .select(col("doc_id"), col("w"), col("n"),
          posexplode(sequence(lit(0), col("nc") - 1)).as(Seq("_", "ci")))
        .select(col("doc_id"),
          col("ci").cast("long").as("chunk_idx"),
          (col("ci") * 48).cast("long").as("start_tok"),
          least(lit(64), col("n") - col("ci") * 48).cast("long").as("n_tok"),
          md5(array_join(slice(col("w"), col("ci") * lit(48) + 1, lit(64)), " ")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS words,
          CAST(ceil(greatest(len(string_split(text,' ')) - 16, 1) / 48.0) AS BIGINT) AS n_chunks
        FROM documents),
      p0 AS (SELECT doc_id,
          [{'i': i-1, 'c': array_to_string(words[(i-1)*48+1:(i-1)*48+64], ' '),
            'n': least(64, len(words) - (i-1)*48)}
           for i in range(1, n_chunks+1)] AS lst FROM w),
      p AS (SELECT doc_id, unnest(lst) AS u FROM p0)
      SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
        CAST(u.i * 48 AS BIGINT) AS start_tok,
        CAST(u.n AS BIGINT) AS n_tok, md5(u.c) AS chunk_md5
      FROM p ORDER BY doc_id, chunk_idx"""),
    doc = "64-token chunks, stride 48 (16-token overlap); shuffle-free until output sort")

  // --------------------------------------------------------------- q125
  /** Percentile-band length filter: per-language p10/p90 cutoffs on
    * n_chars (exact interpolated percentiles via the q23 boundary-rank
    * method — a spilling window sort, no value buffering), then a census
    * of kept / too-short / too-long per language. Cutoffs are a 5-row
    * broadcast back over the corpus: the classic "two-pass stats filter"
    * a curation pipeline runs on length, perplexity, or quality scores.
    * Both engines compare against the ROUNDED cutoff, so the band edge
    * is bit-identical. */
  val q125 = QueryDef(
    "q125_length_band_filter",
    (s, d) => {
      val ps = Seq("lo" -> 0.10, "hi" -> 0.90)
      val byL = Window.partitionBy(col("lang"))
      val docs = Tables.documents(s, d).select(col("lang"), col("n_chars"))
      val ranked = docs.select(col("lang"), col("n_chars").cast("double").as("v"),
        row_number().over(byL.orderBy(col("n_chars"))).as("rn"),
        count(lit(1)).over(byL).as("n"))
      def h(p: Double): Column = lit(1.0) + (col("n") - 1) * p
      val needed = ranked.filter(
        ps.map { case (_, p) => col("rn") === floor(h(p)) || col("rn") === ceil(h(p)) }
          .reduce(_ || _))
      val aggs = ps.flatMap { case (nm, p) => Seq(
        max(when(col("rn") === floor(h(p)), col("v"))).as(s"${nm}_lo"),
        max(when(col("rn") === ceil(h(p)), col("v"))).as(s"${nm}_hi"),
        max(h(p) - floor(h(p))).as(s"${nm}_f"))
      }
      val cuts = needed.groupBy(col("lang")).agg(aggs.head, aggs.tail: _*)
        .select(col("lang") +: ps.map { case (nm, _) =>
          round(col(s"${nm}_lo") + col(s"${nm}_f") * (col(s"${nm}_hi") - col(s"${nm}_lo")), 4)
            .as(nm)
        }: _*)
      Tables.documents(s, d).select(col("lang"), col("n_chars"))
        .join(broadcast(cuts), "lang")
        .groupBy(col("lang"))
        .agg(min(col("lo")).as("lo"), min(col("hi")).as("hi"),
          count(lit(1)).as("n_docs"),
          sum(when(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"), 1L)
            .otherwise(0L)).as("n_kept"),
          sum(when(col("n_chars") < col("lo"), 1L).otherwise(0L)).as("n_short"),
          sum(when(col("n_chars") > col("hi"), 1L).otherwise(0L)).as("n_long"))
        .orderBy(col("lang"))
    },
    Some("""WITH cuts AS (SELECT lang,
          ROUND(QUANTILE_CONT(n_chars, 0.10), 4) AS lo,
          ROUND(QUANTILE_CONT(n_chars, 0.90), 4) AS hi
        FROM documents GROUP BY lang)
      SELECT d.lang, min(c.lo) AS lo, min(c.hi) AS hi,
        count(*) AS n_docs,
        count(*) FILTER (WHERE d.n_chars >= c.lo AND d.n_chars <= c.hi) AS n_kept,
        count(*) FILTER (WHERE d.n_chars < c.lo) AS n_short,
        count(*) FILTER (WHERE d.n_chars > c.hi) AS n_long
      FROM documents d JOIN cuts c USING (lang)
      GROUP BY d.lang ORDER BY d.lang"""),
    doc = "per-language p10/p90 length band census; q23 boundary-rank percentiles")

  // --------------------------------------------------------------- q171
  /** PII PSEUDONYMIZATION — the privacy tier's second mode: where q120
    * REDACTS (destroys the value), pseudonymization replaces each PII
    * literal with a keyed token `PII_<md5(key:value)[0..8]>` so the same
    * email maps to the same token corpus-wide — record linkage and
    * per-user aggregation survive anonymization (GDPR art. 4(5)
    * pseudonymisation, the standard trade against full redaction). The
    * query emits each doc's token sequence (occurrence order: emails,
    * then IPs, then phones — the injector's order) plus the corpus-level
    * consistency census per source: distinct tokens vs total mentions.
    *
    * Scale shape: per-row regex extract + hash transform (no shuffle);
    * the census aggregates |tokens|-sized partials per source. The md5
    * domain key ("k1:") makes tokens deterministic across engines AND
    * prevents rainbow-joining tokens back to raw values hashed
    * elsewhere without the key. */
  val q171 = QueryDef(
    "q171_pii_pseudonyms",
    (s, d) => {
      def tokens(t: Column, re: String): Column =
        transform(regexp_extract_all(t, lit(re), lit(0)),
          m => concat(lit("PII_"), substring(md5(concat(lit("k1:"), m)), 1, 8)))
      val dirty = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          injectPii(col("text"), col("doc_id")).as("t"))
      dirty
        .select(col("doc_id"), col("source"),
          concat(tokens(col("t"), EmailRe), tokens(col("t"), IpRe),
            tokens(col("t"), PhoneRe)).as("toks"))
        .select(col("doc_id"), col("source"),
          size(col("toks")).cast("long").as("n_pii"),
          array_join(col("toks"), ",").as("pseudonyms"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dirty AS (SELECT doc_id, source,
        text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex' || CAST(doc_id % 7 AS VARCHAR)
          || '.com via 10.' || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)
          || '.' || CAST(doc_id % 254 + 1 AS VARCHAR)
          || CASE WHEN doc_id % 3 = 0
               THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END AS t FROM documents),
      tok AS (SELECT doc_id, source,
        list_concat(list_concat(
          list_transform(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'),
            m -> 'PII_' || substr(md5('k1:' || m), 1, 8)),
          list_transform(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'),
            m -> 'PII_' || substr(md5('k1:' || m), 1, 8))),
          list_transform(regexp_extract_all(t, '\+1-555-[0-9]{4}'),
            m -> 'PII_' || substr(md5('k1:' || m), 1, 8))) AS toks
        FROM dirty)
      SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_pii,
        array_to_string(toks, ',') AS pseudonyms
      FROM tok ORDER BY doc_id"""),
    doc = "keyed PII pseudonymization: same value -> same token corpus-wide, linkage survives")

  // ---------------------------------------------------------------- q217
  /** Subject-erasure propagation (right-to-be-forgotten): a deletion list
    * (subjects with user_id ≡ 0 mod 37 — the deterministic stand-in for a
    * GDPR request batch) must purge the raw event store AND every derived
    * mart that carries subject rows; the audit reports, per table,
    * rows before / purged / after plus a `clean` verdict proving zero
    * subject rows survive. Mechanics are broadcast anti-joins on the
    * (tiny) deletion list — at 100 TB this is the tombstone-then-compact
    * pass, and the audit IS the compliance artifact. (Sketch-backed marts
    * — q93's HLL rollups — cannot subtract a subject and must REBUILD;
    * that rebuild cost is exactly why erasure SLAs size the sketch tier.) */
  val q217 = QueryDef(
    "q217_subject_erasure",
    (s, d) => {
      val e = Tables.events(s, d)
      val profiles = e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val deleted = col("user_id") % 37 === 0
      def audit(name: String, df: org.apache.spark.sql.DataFrame) = {
        df.agg(
            count(lit(1)).as("n_before"),
            sum(when(deleted, 1L).otherwise(0L)).as("n_purged"),
            sum(when(!deleted, 1L).otherwise(0L)).as("n_after"),
            (sum(when(deleted, 1L).otherwise(0L))
              === count(lit(1)) - sum(when(!deleted, 1L).otherwise(0L))).as("clean"))
          .select(lit(name).as("table_name"), col("n_before"), col("n_purged"),
            col("n_after"), col("clean"))
      }
      audit("1_events", e.select(col("user_id")))
        .unionByName(audit("2_user_profiles", profiles.select(col("user_id"))))
        .orderBy(col("table_name"))
    },
    Some("""WITH p AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
      SELECT '1_events' AS table_name, COUNT(*) AS n_before,
        CAST(SUM(CASE WHEN user_id % 37 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
        CAST(SUM(CASE WHEN user_id % 37 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
        TRUE AS clean
      FROM events
      UNION ALL
      SELECT '2_user_profiles', COUNT(*),
        CAST(SUM(CASE WHEN user_id % 37 = 0 THEN 1 ELSE 0 END) AS BIGINT),
        CAST(SUM(CASE WHEN user_id % 37 <> 0 THEN 1 ELSE 0 END) AS BIGINT),
        TRUE
      FROM p ORDER BY table_name"""),
    doc = "GDPR erasure audit across raw + derived tables: purge counts and a zero-residual verdict per table")

  // ---------------------------------------------------------------- q218
  /** k-anonymity census over the quasi-identifier (event_type, day,
    * value-band): how many QI equivalence classes — and how many ROWS —
    * sit below the re-identification threshold k=5? The minimum class
    * size IS the dataset's k-anonymity; singleton classes are the rows an
    * attacker with auxiliary knowledge pins exactly. One QI-keyed
    * aggregation then a 3-row census — the privacy analog of q195's
    * stats pass, and the measurement that decides whether a release
    * needs further generalization (coarser bands) or suppression. */
  val q218 = QueryDef(
    "q218_k_anonymity",
    (s, d) => {
      val classes = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("ts_ns div 86400000000000").as("dd"),
          floor(col("value") / 10.0).cast("long").as("band"))
        .agg(count(lit(1)).as("cls"))
      val minK = broadcast(classes.agg(min(col("cls")).as("k_anonymity")))
      classes
        .select(when(col("cls") === 1, "1_singleton")
            .when(col("cls") < 5, "2_small_2_to_4")
            .otherwise("3_k5_or_more").as("bucket"),
          col("cls"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_classes"), sum(col("cls")).as("n_rows"))
        .crossJoin(minK)
        .orderBy(col("bucket"))
    },
    Some("""WITH classes AS (SELECT event_type,
          epoch_ns(ts) // 86400000000000 AS dd,
          CAST(FLOOR(value / 10.0) AS BIGINT) AS band, COUNT(*) AS cls
        FROM events GROUP BY 1, 2, 3),
      mk AS (SELECT MIN(cls) AS k_anonymity FROM classes)
      SELECT CASE WHEN cls = 1 THEN '1_singleton'
          WHEN cls < 5 THEN '2_small_2_to_4'
          ELSE '3_k5_or_more' END AS bucket,
        COUNT(*) AS n_classes, CAST(SUM(cls) AS BIGINT) AS n_rows,
        (SELECT k_anonymity FROM mk) AS k_anonymity
      FROM classes GROUP BY 1 ORDER BY bucket"""),
    doc = "QI equivalence-class size census + dataset k-anonymity; the generalize-or-suppress decision input")

  // ---------------------------------------------------------------- q219
  /** Per-user contribution bounding audit — the differential-privacy
    * preprocessing measurement: DP noise calibrates to the SENSITIVITY of
    * a query, i.e. the most rows one subject contributes to any released
    * cell; unbounded contributions make DP guarantees vacuous. Per
    * released cell family (event_type), report the max per-user daily
    * contribution, and the exact row loss if contributions were clamped
    * at C=3 (the standard pre-aggregation clamp) — the utility-vs-privacy
    * trade quantified before any noise is drawn (noise itself is random
    * and belongs outside a hash-checked inventory). All exact integers:
    * one (user, type, day) aggregation, then a type-keyed rollup. */
  val q219 = QueryDef(
    "q219_contribution_bounds",
    (s, d) => {
      val perUserDay = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"),
          expr("ts_ns div 86400000000000").as("dd"))
        .agg(count(lit(1)).as("c"))
      perUserDay.groupBy(col("event_type"))
        .agg(max(col("c")).as("max_contribution"),
          sum(col("c")).as("rows_total"),
          sum(greatest(col("c") - 3L, lit(0L))).as("rows_clipped_at_3"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    },
    Some("""WITH pud AS (SELECT event_type, user_id,
          epoch_ns(ts) // 86400000000000 AS dd, COUNT(*) AS c
        FROM events GROUP BY 1, 2, 3)
      SELECT event_type, MAX(c) AS max_contribution,
        CAST(SUM(c) AS BIGINT) AS rows_total,
        CAST(SUM(GREATEST(c - 3, 0)) AS BIGINT) AS rows_clipped_at_3,
        COUNT(DISTINCT user_id) AS n_users
      FROM pud GROUP BY event_type ORDER BY event_type"""),
    doc = "DP sensitivity audit: max per-subject contribution per cell family + exact clamp loss at C=3")

  // --------------------------------------------------------------- q253
  /** Boilerplate paragraph stripping — the OTHER half of CCNet-style
    * structural cleanup. q121 is keep-first instance dedup (every
    * paragraph text survives exactly once corpus-wide); this pass instead
    * REMOVES every instance (including the first) of any paragraph whose
    * document frequency is ≥ 3 distinct docs — the "terms of service /
    * nav bar / cookie banner" pattern, where the text is noise wherever
    * it appears, not content that deserves one canonical copy.
    * Segmentation is the same deterministic 16-word block as q121.
    * Output per doc: paragraph counts, boilerplate instances removed,
    * chars removed, and an md5 of the reassembled (in-order) kept text so
    * the full stripped corpus never lands in the result set.
    *
    * Scale shape: document frequency is a window count-distinct over
    * xxhash64(para) — one 8-byte-keyed shuffle, same as q121, with the
    * same second-hash collision fail-stop (a collision would wrongly
    * brand a unique paragraph boilerplate); reassembly is the per-doc
    * groupBy. DF (distinct docs), not raw frequency, is the decision
    * variable, so a single doc that repeats its own paragraph 50× is NOT
    * flagged — repetition inside one doc is q116/q245's business. */
  val q253 = QueryDef(
    "q253_boilerplate_strip",
    (s, d) => {
      val words = split(col("text"), " ")
      val paras = Tables.documents(s, d).select(col("doc_id"),
        transform(
          sequence(lit(0), ceil(size(words) / lit(16.0)).cast("int") - 1),
          i => array_join(slice(words, i * lit(16) + 1, lit(16)), " ")).as("paras"))
      val part = Window.partitionBy(col("ph"))
      val marked = paras
        .select(col("doc_id"), posexplode(col("paras")).as(Seq("idx", "para")))
        .withColumn("ph", xxhash64(col("para")))
        .select(col("doc_id"), col("idx"), col("para"),
          (size(collect_set(col("doc_id")).over(part)) >= 3).as("boiler"),
          (min(Dedup.guardHash(col("para"))).over(part)
            =!= max(Dedup.guardHash(col("para"))).over(part)).as("collision"))
      marked.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_paras"),
          sum(when(col("boiler"), 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("boiler"), length(col("para"))).otherwise(0L)).as("chars_removed"),
          md5(array_join(
            transform(
              array_sort(collect_list(when(!col("boiler"), struct(col("idx"), col("para"))))),
              x => x.getField("para")),
            "\n")).as("kept_md5"),
          max(col("collision")).as("bad"))
        .select(col("doc_id"), col("n_paras"),
          when(col("bad"),
            raise_error(lit("q253: xxhash64 collision — distinct paragraphs in one group"))
              .cast("long"))
            .otherwise(col("n_removed")).as("n_removed"),
          col("chars_removed"), col("kept_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS words FROM documents),
      p0 AS (SELECT doc_id,
          [{'idx': i-1, 'para': array_to_string(words[(i-1)*16+1:(i-1)*16+16], ' ')}
           for i in range(1, CAST(ceil(len(words)/16.0) AS BIGINT)+1)] AS lst FROM w),
      p AS (SELECT doc_id, unnest(lst) AS u FROM p0),
      r AS (SELECT doc_id, u.idx AS idx, u.para AS para,
              count(DISTINCT doc_id) OVER (PARTITION BY u.para) >= 3 AS boiler
            FROM p)
      SELECT doc_id, count(*) AS n_paras,
        count(*) FILTER (WHERE boiler) AS n_removed,
        CAST(coalesce(sum(length(para)) FILTER (WHERE boiler), 0) AS BIGINT) AS chars_removed,
        md5(coalesce(string_agg(para, chr(10) ORDER BY idx) FILTER (WHERE NOT boiler), ''))
          AS kept_md5
      FROM r GROUP BY doc_id ORDER BY doc_id"""),
    doc = "CCNet boilerplate removal: strip ALL instances of paragraphs with DF >= 3 docs; 8-byte hash shuffle, collision fail-stop, per-doc reassembly md5")

  val all: Seq[QueryDef] = Seq(q120, q121, q122, q125, q171, q217, q218, q219, q253)
}
