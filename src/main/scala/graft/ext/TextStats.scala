package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Text-analysis tier over the documents table: token counting (whitespace
  * + regex), quality scoring, stopword-based language ID, and md5
  * bottom-sketch document fingerprinting. All per-row scalar work —
  * embarrassingly parallel, codegen'd, no shuffle beyond the final agg. */
object TextStats {

  def wsTokens(text: Column): Column = split(text, " ")

  /** BPE-ish tokenizer: letter runs, digit runs, or single non-space
    * symbols — the standard pre-tokenization regex family. */
  val TokenRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def regexTokens(text: Column): Column = regexp_extract_all(text, lit(TokenRegex), lit(0))

  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "un"),
    "es" -> Seq("el", "la", "y", "los", "un"))

  def stopwordCount(words: Column, lang: String): Column =
    size(filter(words, w => w.isin(Stopwords(lang): _*)))

  /** q50's [0,1] quality score as a reusable column: length /
    * punctuation / stopword components, pure double arithmetic on exact
    * integer inputs (bit-identical across engines). Shared by q50, q111,
    * and the streaming corpus telemetry. */
  def qualityScore(text: Column): Column = {
    val words = wsTokens(lower(text))
    val nTok = size(words).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val stopR = stopwordCount(words, "en").cast("double") / nTok
    val lenScore = least(nTok / 50.0, lit(1.0))
    val punctScore = lit(1.0) -
      least(punct / greatest(length(text).cast("double"), lit(1.0)) * 10.0, lit(1.0))
    lenScore * 0.4 + punctScore * 0.3 + stopR * 0.3
  }

  // ---------------------------------------------------------------- q47
  /** Corpus token/char statistics per (lang, source-prefix) — whitespace
    * tokens, regex tokens, char counts with exact decimal-mean. */
  val q47 = QueryDef(
    "q47_text_stats",
    (s, d) => Tables.documents(s, d)
      .select(col("lang"),
        size(wsTokens(col("text"))).cast("long").as("n_ws"),
        size(regexTokens(col("text"))).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_ch"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("sum_ws_tokens"),
        sum(col("n_tok")).as("sum_regex_tokens"),
        sum(col("n_ch")).as("sum_chars"),
        (sum(col("n_ch")).cast("double") / count(lit(1))).as("avg_chars"))
      .select(col("lang"), col("n_docs"), col("sum_ws_tokens"),
        col("sum_regex_tokens"), col("sum_chars"), round(col("avg_chars"), 6).as("avg_chars"))
      .orderBy(col("lang")),
    Some(s"""SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_ws_tokens,
        CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))) AS BIGINT) AS sum_regex_tokens,
        CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
        round(CAST(SUM(length(text)) AS DOUBLE) / COUNT(*), 6) AS avg_chars
      FROM documents GROUP BY lang ORDER BY lang"""))

  // ---------------------------------------------------------------- q48
  /** Stopword-vote language ID with a deterministic argmax (ties resolve
    * in en > de > fr > es order), reported as a confusion matrix against
    * the labeled lang. The heuristic is the operator under test — the
    * corpus vocabulary is synthetic, so agreement with the label is not
    * the point; cross-engine determinism is. */
  val q48 = QueryDef(
    "q48_lang_id",
    (s, d) => {
      val words = wsTokens(lower(col("text")))
      val sEn = stopwordCount(words, "en")
      val sDe = stopwordCount(words, "de")
      val sFr = stopwordCount(words, "fr")
      val sEs = stopwordCount(words, "es")
      val predicted = when(sEn >= sDe && sEn >= sFr && sEn >= sEs, "en")
        .when(sDe >= sFr && sDe >= sEs, "de")
        .when(sFr >= sEs, "fr")
        .otherwise("es")
      Tables.documents(s, d)
        .select(col("lang"), predicted.as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    },
    Some("""WITH scored AS (
        SELECT lang,
          len(list_filter(string_split(lower(text), ' '), x -> x IN ('the','a','of','and','to'))) s_en,
          len(list_filter(string_split(lower(text), ' '), x -> x IN ('der','die','und','das','ein'))) s_de,
          len(list_filter(string_split(lower(text), ' '), x -> x IN ('le','la','et','les','un'))) s_fr,
          len(list_filter(string_split(lower(text), ' '), x -> x IN ('el','la','y','los','un'))) s_es
        FROM documents)
      SELECT lang,
        CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr >= s_es THEN 'fr'
             ELSE 'es' END AS predicted,
        COUNT(*) AS n
      FROM scored GROUP BY 1, 2 ORDER BY lang, predicted"""))

  // ---------------------------------------------------------------- q49
  /** Document fingerprinting: bottom-1 sketch over md5'd word-trigram
    * shingles (md5 is bit-identical across engines, min is lexicographic
    * on the hex). Shared fingerprint ⇒ shared rarest shingle — the
    * winnowing-style containment signal. */
  val q49 = QueryDef(
    "q49_fingerprint",
    (s, d) => Tables.documents(s, d)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        Dedup.wordShingles(col("text"), 3).as("sh"))
      .select(col("doc_id"),
        org.apache.spark.sql.GraftBridge.column(graft.functions.MinMd5Hex(
          org.apache.spark.sql.GraftBridge.expression(col("sh")))).as("fingerprint"),
        size(col("sh")).cast("long").as("n_shingles"))
      .orderBy(col("doc_id")),
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') words FROM documents),
      s AS (SELECT doc_id,
              list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words)-1)]) sh
            FROM w WHERE len(words) >= 3)
      SELECT doc_id, list_min(list_transform(sh, x -> md5(x))) AS fingerprint,
        CAST(len(sh) AS BIGINT) AS n_shingles
      FROM s ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q50
  /** Quality scoring: length / punctuation / stopword components combined
    * into one [0,1] score; the downstream filter threshold is the
    * pipeline's knob. Pure double arithmetic on exact integer inputs —
    * bit-identical across engines. */
  val q50 = QueryDef(
    "q50_quality_score",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), round(qualityScore(col("text")), 6).as("quality"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        round(least(len(string_split(lower(text), ' '))::DOUBLE / 50.0, 1.0) * 0.4
          + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
              / greatest(length(text)::DOUBLE, 1.0) * 10.0, 1.0)) * 0.3
          + (len(list_filter(string_split(lower(text), ' '),
              x -> x IN ('the','a','of','and','to')))::DOUBLE
             / len(string_split(lower(text), ' '))::DOUBLE) * 0.3, 6) AS quality
      FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q104
  /** Winnowing fingerprints over a Rabin-Karp rolling hash (char 8-grams,
    * window 16 — see [[graft.functions.WinnowFingerprints]]): the
    * copy-span-detecting fingerprint family, complementing q49's
    * whole-document md5 bottom-sketch. The oracle recomputes the exact
    * polynomial/selection definition in SQL; the output reduces each
    * fingerprint set to (count, min, max, xor) so the driver hashes
    * scalar columns. */
  val q104 = QueryDef(
    "q104_winnow_fingerprint",
    (s, d) => Tables.documents(s, d)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        org.apache.spark.sql.GraftBridge.column(graft.functions.WinnowFingerprints(
          org.apache.spark.sql.GraftBridge.expression(col("text")), 8, 16)).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        element_at(col("fps"), 1).as("fp_min"),
        element_at(col("fps"), -1).as("fp_max"),
        aggregate(col("fps"), lit(0L), (a, x) => a.bitwiseXOR(x)).as("fp_xor"))
      .orderBy(col("doc_id")),
    Some("""WITH g AS (
        SELECT doc_id, [
            list_reduce(list_prepend(0::BIGINT,
              [ord(text[i+j-1:i+j-1])::BIGINT for j in range(1, 9)]),
              (a,b) -> (a*257+b)%2147483647)
          for i in range(1, length(text)-8+2)] AS hs
        FROM documents WHERE length(text) >= 8),
      wins AS (
        SELECT doc_id, CASE WHEN len(hs) <= 16 THEN [list_min(hs)]
          ELSE [list_min(hs[i:i+15]) for i in range(1, len(hs)-16+2)] END AS sel
        FROM g),
      fp AS (SELECT doc_id, list_sort(list_distinct(sel)) AS fps FROM wins)
      SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
        fps[1] AS fp_min, fps[-1] AS fp_max,
        list_reduce(list_prepend(0::BIGINT, fps), (a,b) -> xor(a,b)) AS fp_xor
      FROM fp ORDER BY doc_id"""),
    doc = "rolling-hash winnowing (SIGMOD'03): shared substrings >= k+w-1 share a fingerprint")

  // ---------------------------------------------------------------- q111
  /** Corpus health report — the per-source dashboard a data curation run
    * ships: document/token counts, exact-duplicate rate (distinct-hash
    * census over md5, the cross-engine-stable key), mean quality (q50's
    * score averaged), and language entropy (how concentrated each
    * source's language mix is). One scan feeds the main census; the
    * entropy term reduces to per-(source, lang) counts first, so its
    * window normalization runs over |slices| rows, not documents, and
    * joins back at |sources| rows. The md5-distinct census shuffles
    * (source, hash) pairs — 16-byte keys, the q40 principle: never the
    * text itself. */
  val q111 = QueryDef(
    "q111_corpus_health",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val score = qualityScore(col("text"))
      val base = Tables.documents(s, d)
      val main = base.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"),
        ((count(lit(1)) - countDistinct(md5(col("text")))) / count(lit(1))).as("dup_raw"),
        avg(score).as("mq"))
      val ent = base.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).cast("double").as("n"))
        .withColumn("t", sum(col("n")).over(Window.partitionBy(col("source"))))
        .groupBy(col("source"))
        .agg((-sum((col("n") / col("t")) * log(col("n") / col("t")))).as("ent"))
      main.join(broadcast(ent), "source")
        .select(col("source"), col("n_docs"), col("tokens"),
          round(col("dup_raw"), 6).as("dup_rate"),
          round(col("mq"), 6).as("mean_quality"),
          round(col("ent"), 6).as("lang_entropy"))
        .orderBy(col("source"))
    },
    Some("""WITH scored AS (SELECT source, lang, text,
        least(len(string_split(lower(text), ' '))::DOUBLE / 50.0, 1.0) * 0.4
          + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
              / greatest(length(text)::DOUBLE, 1.0) * 10.0, 1.0)) * 0.3
          + (len(list_filter(string_split(lower(text), ' '),
              x -> x IN ('the','a','of','and','to')))::DOUBLE
             / len(string_split(lower(text), ' '))::DOUBLE) * 0.3 AS q
      FROM documents),
      main AS (SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
          (COUNT(*) - COUNT(DISTINCT md5(text)))::DOUBLE / COUNT(*) AS dup_raw,
          AVG(q) AS mq
        FROM scored GROUP BY source),
      lc AS (SELECT source, lang, COUNT(*)::DOUBLE AS n FROM documents GROUP BY 1, 2),
      ent AS (SELECT source, -SUM((n / t) * ln(n / t)) AS ent
        FROM (SELECT *, SUM(n) OVER (PARTITION BY source) AS t FROM lc)
        GROUP BY source)
      SELECT m.source, n_docs, tokens, round(dup_raw, 6) AS dup_rate,
        round(mq, 6) AS mean_quality, round(e.ent, 6) AS lang_entropy
      FROM main m JOIN ent e USING (source) ORDER BY source"""),
    doc = "per-source curation dashboard: counts, exact-dup rate, mean quality, language entropy")

  // --------------------------------------------------------------- q172
  /** Vocabulary growth curve (Heaps'-law point estimates): cumulative
    * distinct-word count vs cumulative token count at 500-doc ingest
    * checkpoints — the diagnostic that says whether a crawl is still
    * contributing vocabulary or re-treading it (the integral view of
    * q148's per-doc novelty). All integers, no curve fitting — the
    * downstream consumer fits V = K·n^β offline; the engine's job is the
    * exact points.
    *
    * Scale shape: first-occurrence per word = one vocab-keyed agg
    * (sublinear in corpus size, q148's layout); bucket rollups reduce
    * 500×, but |buckets| still grows LINEARLY with the corpus, so the
    * cumulative pass runs through [[graft.operators.RangeRank]] (parallel
    * range-partitioned prefix sums + broadcast offsets), not a
    * single-task ordered window. */
  val q172 = QueryDef(
    "q172_vocab_growth",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bucket = floor(col("doc_id") / 500).cast("long")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val tokensPerBucket = docs
        .groupBy(bucket.as("bucket"))
        .agg(sum(size(col("w"))).cast("long").as("n_tokens"),
          count(lit(1)).as("n_docs"))
      val newWordsPerBucket = docs
        .select(col("doc_id"), explode(col("w")).as("word"))
        .groupBy(col("word")).agg(min(col("doc_id")).as("first_doc"))
        .groupBy(floor(col("first_doc") / 500).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_new_words"))
      val perBucket = tokensPerBucket.join(newWordsPerBucket, Seq("bucket"), "left")
        .na.fill(0L, Seq("n_new_words"))
      graft.operators.RangeRank.withOrderedPrefix(perBucket, Nil, Seq(col("bucket")),
          weights = Seq(graft.operators.RangeRank.Weight("n_tokens", "cum_tokens"),
            graft.operators.RangeRank.Weight("n_new_words", "cum_vocab")))
        .select(col("bucket"), col("n_docs"), col("cum_tokens"), col("cum_vocab"))
        .orderBy(col("bucket"))
    },
    Some("""WITH w AS (SELECT doc_id, doc_id // 500 AS bucket,
          string_split(text, ' ') AS a FROM documents),
      tb AS (SELECT bucket, CAST(sum(len(a)) AS BIGINT) AS n_tokens,
          count(*) AS n_docs FROM w GROUP BY bucket),
      fw0 AS (SELECT doc_id, unnest(a) AS word FROM w),
      fw AS (SELECT word, min(doc_id) AS first_doc FROM fw0 GROUP BY word),
      nb AS (SELECT first_doc // 500 AS bucket, count(*) AS n_new_words
          FROM fw GROUP BY 1)
      SELECT tb.bucket, tb.n_docs,
        CAST(sum(tb.n_tokens) OVER (ORDER BY tb.bucket) AS BIGINT) AS cum_tokens,
        CAST(sum(coalesce(nb.n_new_words, 0)) OVER (ORDER BY tb.bucket) AS BIGINT) AS cum_vocab
      FROM tb LEFT JOIN nb USING (bucket) ORDER BY tb.bucket"""),
    doc = "Heaps-law vocabulary growth checkpoints; vocab-keyed agg, window over buckets only")

  // --------------------------------------------------------------- q173
  /** Repetition-run detection: per document, the longest run of the SAME
    * word repeated consecutively and the count of runs of length >= 3 —
    * the cheap loop-detector that catches degenerate generator output
    * ("the the the ...") and broken crawls, complementing q95's n-gram
    * repetition ratio with exact run geometry.
    *
    * Scale shape: the whole computation is ONE per-row higher-order fold
    * (`aggregate` over the word array with a (current, best, runs)
    * struct accumulator) — zero shuffles, zero joins, codegen-friendly
    * scan → project → sort. The oracle formulates it independently as a
    * gaps-and-islands window over the exploded words: two engines, two
    * algorithms, one answer. */
  val q173 = QueryDef(
    "q173_repetition_runs",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("n_words"),
          expr("""aggregate(
              IF(size(w) < 2, array(), sequence(2, size(w))),
              named_struct('cur', 1, 'best', 1, 'n3', 0),
              (acc, i) -> IF(element_at(w, i) = element_at(w, i - 1),
                named_struct('cur', acc.cur + 1,
                  'best', greatest(acc.best, acc.cur + 1), 'n3', acc.n3),
                named_struct('cur', 1, 'best', acc.best,
                  'n3', acc.n3 + IF(acc.cur >= 3, 1, 0))),
              acc -> named_struct(
                'best', acc.best,
                'n3', acc.n3 + IF(acc.cur >= 3, 1, 0))) AS r"""))
        .select(col("doc_id"), col("n_words"),
          col("r.best").cast("long").as("max_run"),
          col("r.n3").cast("long").as("n_runs_ge3"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      t AS (SELECT doc_id, unnest(a) AS word, generate_subscripts(a, 1) AS i FROM w),
      isl AS (SELECT doc_id, word, i,
          i - row_number() OVER (PARTITION BY doc_id, word ORDER BY i) AS grp
        FROM t),
      runs AS (SELECT doc_id, count(*) AS run_len
        FROM isl GROUP BY doc_id, word, grp)
      SELECT w.doc_id, CAST(len(w.a) AS BIGINT) AS n_words,
        CAST(max(r.run_len) AS BIGINT) AS max_run,
        CAST(count(*) FILTER (WHERE r.run_len >= 3) AS BIGINT) AS n_runs_ge3
      FROM w JOIN runs r USING (doc_id)
      GROUP BY w.doc_id, w.a ORDER BY w.doc_id"""),
    doc = "longest same-word run + runs>=3 per doc; one HOF fold, zero shuffles, window oracle")

  // --------------------------------------------------------------- q181
  /** Word frequency-of-frequencies (the Zipf spectrum's integer form):
    * for each occurrence count c, how many distinct words occur exactly
    * c times and how many tokens they account for. The hapax row (c=1)
    * over total vocab is the standard OOV-pressure signal; the heavy
    * tail rows say what a frequency-capped vocab keeps. Two aggs, both
    * keyed sublinearly (vocab, then |distinct counts|); exact integers
    * end to end. */
  val q181 = QueryDef(
    "q181_freq_spectrum",
    (s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("c")).agg(count(lit(1)).as("n_words"))
        .select(col("c"), col("n_words"), (col("c") * col("n_words")).as("n_tokens"))
        .orderBy(col("c"))
    },
    Some("""WITH wc AS (SELECT w, count(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w)
      SELECT c, count(*) AS n_words, CAST(c * count(*) AS BIGINT) AS n_tokens
      FROM wc GROUP BY c ORDER BY c"""),
    doc = "Zipf frequency spectrum: words and tokens per occurrence count; vocab-keyed aggs")

  // --------------------------------------------------------------- q182
  /** Per-source length Gini coefficient — the inequality metric for
    * corpus balance audits (a source whose token mass concentrates in a
    * few giant documents behaves differently under sampling and packing
    * than a uniform one). Computed by the exact rank formula
    * G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over lengths sorted ascending
    * (ties broken by doc_id — same total order on both engines), with
    * DECIMAL(38,0) numerators so nothing rounds before the final
    * division.
    *
    * Scale note: the rank needs a per-source sort (one window shuffle
    * over (source, length)); at corpus scale the standard escape is the
    * same formula over a binned histogram (q152's layout) — exact form
    * here, since the oracle must match bit-for-bit. */
  val q182 = QueryDef(
    "q182_length_gini",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("x"), col("doc_id"))
      val ranked = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("decimal(38,0)").as("x"))
        .withColumn("i", row_number().over(w).cast("decimal(38,0)"))
      ranked.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("x")).as("sx"),
          sum(col("i") * col("x")).as("six"))
        .select(col("source"), col("n_docs"),
          col("sx").cast("long").as("total_chars"),
          // numerator/denominator stay EXACT decimals, convert to double
          // separately, divide in double — the same exact-int → nearest-
          // double → IEEE-divide sequence the oracle's HUGEINT path takes
          // (a decimal DIVISION would round at decimal scale first and
          // can differ from the double quotient in the 6th digit)
          round((col("six") * 2 - (col("n_docs") + 1) * col("sx")).cast("double")
            / (col("n_docs") * col("sx")).cast("double"), 6).as("gini"))
        .orderBy(col("source"))
    },
    Some("""WITH ranked AS (SELECT source, doc_id, n_chars,
          row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i
        FROM documents)
      SELECT source, count(*) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        round(CAST((2 * sum(CAST(i AS HUGEINT) * n_chars)
            - (count(*) + 1) * sum(CAST(n_chars AS HUGEINT)))
          AS DOUBLE) / (count(*) * sum(n_chars)), 6) AS gini
      FROM ranked GROUP BY source ORDER BY source"""),
    doc = "per-source length inequality via the exact rank-formula Gini; decimal numerators")

  // ---------------------------------------------------------------- q190
  /** Bigram language-model fluency scoring (the CCNet/KenLM-shaped quality
    * signal, exact-integer form): train add-one-smoothed bigram conditional
    * probabilities on the corpus itself, then score every document by the
    * sum of its bigrams' scaled conditional probabilities
    * `((c₂+1)·10⁹) div (c₁+V)` — documents full of corpus-typical word
    * transitions score high, word salad scores near the smoothing floor.
    * Integer div per term keeps the whole statistic engine-exact (the
    * log-space formulation needs transcendentals that cannot cross a hash
    * oracle; monotonicity per term is preserved).
    *
    * Scale shape: the count model is vocab-keyed (sublinear in corpus);
    * the instance→model joins shuffle on word keys — stopword bigrams are
    * the classic hot keys, which is exactly what AQE skew-join or
    * Scale.saltedJoin handles; the per-doc rollup is an 8-byte doc_id agg.
    * V (vocabulary size) is a 1-row broadcast. */
  val q190 = QueryDef(
    "q190_bigram_lm_score",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val inst = docs.select(col("doc_id"),
          explode(zip_with(
            slice(col("w"), lit(1), size(col("w")) - 1),
            slice(col("w"), lit(2), size(col("w")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c2 = inst.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = inst.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val vocab = broadcast(docs.select(explode(col("w")).as("t"))
        .agg(countDistinct(col("t")).as("v")))
      val perDoc = inst
        .join(c2, Seq("w1", "w2")).join(c1, Seq("w1")).crossJoin(vocab)
        .select(col("doc_id"), expr("((c2 + 1) * 1000000000) div (c1 + v)").as("term"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("term")).as("score"))
      docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("score"), lit(0L)).as("score"))
        .withColumn("avg_term",
          when(col("n_bigrams") > 0, expr("score div n_bigrams")).otherwise(lit(0L)))
        .orderBy(col("doc_id"))
    },
    Some("""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      binst AS (SELECT doc_id,
          unnest([{'w1': w[i], 'w2': w[i + 1]} for i in range(1, len(w))]) AS bg
        FROM docs),
      inst AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM binst),
      c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM inst GROUP BY w1, w2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM inst GROUP BY w1),
      vocab AS (SELECT COUNT(DISTINCT t) AS v
        FROM (SELECT unnest(w) AS t FROM docs)),
      perdoc AS (SELECT i.doc_id,
          COUNT(*) AS n_bigrams,
          CAST(SUM(((c2.c2 + 1) * 1000000000) // (c1.c1 + vocab.v)) AS BIGINT) AS score
        FROM inst i
          JOIN c2 ON c2.w1 = i.w1 AND c2.w2 = i.w2
          JOIN c1 ON c1.w1 = i.w1
          CROSS JOIN vocab
        GROUP BY i.doc_id)
      SELECT d.doc_id,
        COALESCE(p.n_bigrams, 0) AS n_bigrams,
        COALESCE(p.score, 0) AS score,
        CASE WHEN COALESCE(p.n_bigrams, 0) > 0
          THEN p.score // p.n_bigrams ELSE 0 END AS avg_term
      FROM docs d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
      ORDER BY d.doc_id"""),
    doc = "add-one bigram LM fluency score, exact scaled-integer conditionals; vocab-keyed count model")

  // ---------------------------------------------------------------- q223
  /** Positional-inverted-index phrase search — the search-engine
    * primitive: a phrase query "w₁ w₂" is answered by intersecting the
    * two words' positional postings on (doc, position+1), never by
    * scanning text. The query phrase is the corpus's own most frequent
    * bigram (deterministic argmax with lexicographic tie-break), so the
    * whole operator — index build, phrase selection, postings
    * intersection — is self-contained and the DuckDB oracle can check it
    * with an INDEPENDENT formulation (substring containment over padded
    * text), proving the positional join is exactly phrase semantics.
    * Scale shape: postings are (word-key, doc, pos) — the intersection is
    * an equi-join on (doc, pos) after each side prunes to one word via
    * the broadcast 1-row phrase; at 100 TB the postings table is the
    * persisted index and each query touches only its terms' slices. */
  val q223 = QueryDef(
    "q223_phrase_search",
    (s, d) => {
      val postings = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "word")))
      val phrase = broadcast(postings.as("a")
        .join(postings.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("b.p") === col("a.p") + 1)
        .groupBy(col("a.word").as("w1"), col("b.word").as("w2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w1"), col("w2"))
        .limit(1).select(col("w1"), col("w2")))
      val first = postings.join(phrase, col("word") === col("w1"))
        .select(col("doc_id"), col("p"))
      val second = postings.join(phrase, col("word") === col("w2"))
        .select(col("doc_id").as("doc_id2"), (col("p") - 1).as("p2"))
      val hits = first.join(second,
          col("doc_id") === col("doc_id2") && col("p") === col("p2"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("occurrences"))
      hits.agg(count(lit(1)).as("n_docs"),
          sum(col("occurrences")).as("n_occurrences"),
          sum(col("doc_id")).as("doc_id_checksum"))
        .crossJoin(phrase)
        .select(concat(col("w1"), lit(" "), col("w2")).as("phrase"),
          col("n_docs"), col("n_occurrences"), col("doc_id_checksum"))
    },
    Some("""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      binst AS (SELECT doc_id,
          unnest([{'w1': w[i], 'w2': w[i + 1]} for i in range(1, len(w))]) AS bg
        FROM docs),
      top AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM binst
        GROUP BY 1, 2 ORDER BY COUNT(*) DESC, 1, 2 LIMIT 1),
      hits AS (SELECT d.doc_id,
          len(list_filter([w[i] = t.w1 AND w[i + 1] = t.w2
            for i in range(1, len(w))], x -> x)) AS occ
        FROM docs d CROSS JOIN top t)
      SELECT (SELECT w1 || ' ' || w2 FROM top) AS phrase,
        COUNT(*) FILTER (WHERE occ > 0) AS n_docs,
        CAST(SUM(occ) AS BIGINT) AS n_occurrences,
        CAST(SUM(CASE WHEN occ > 0 THEN doc_id ELSE 0 END) AS BIGINT) AS doc_id_checksum
      FROM hits"""),
    doc = "phrase query via positional postings intersection; self-selected top bigram, independent containment oracle")

  // ---------------------------------------------------------------- q238
  /** TextRank keyword extraction — unsupervised corpus keywords as the
    * stationary weight of a random walk on the word co-occurrence graph
    * (Mihalcea & Tarau 2004), the standard pre-embedding keyword/keyphrase
    * baseline a curation pipeline runs to label sources and drive topic
    * mixing. Nodes are the top-200 corpus words (frequency census with
    * (count desc, word) determinism), edges are ADJACENT-word
    * co-occurrences built with one zip_with over each token array (no
    * positional self-join on the Spark side), symmetrized and weighted by
    * co-occurrence count. Two damped power-iteration rounds run in the
    * q185 exact-integer discipline: pr scaled to 10¹², per-edge
    * contribution (pr·wt) div outw, pr' = (15·(10¹² div n) + 85·in) div
    * 100 — every quantity integral, both engines truncate identically,
    * and the bounded unroll keeps the plan static.
    *
    * Shape: the token explode + census is the only full-data pass; the
    * pair stream filters against the broadcast 200-word vocab BEFORE the
    * edge aggregation, so the graph frame is vocab-bounded (≤ 200² edges)
    * regardless of corpus size — rounds are joins on a tiny frame. The
    * 1-row node-count crossJoin is a whitelisted broadcast (ScaleSpec
    * convention). */
  val q238 = QueryDef(
    "q238_textrank_keywords",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(wsTokens(lower(col("text"))).as("w"))
      val wc = toks.select(explode(col("w")).as("wd"))
        .groupBy(col("wd")).agg(count(lit(1)).as("c"))
      val vocab = wc
        .withColumn("rn", row_number().over(
          graft.operators.BoundedWindow.over(col("wd")).orderBy(col("c").desc, col("wd"))))
        .filter(col("rn") <= 200).select(col("wd"))
      val pairs = toks.filter(size(col("w")) >= 2)
        .select(expr("""explode(zip_with(slice(w, 1, size(w)-1), slice(w, 2, size(w)-1),
            (x, y) -> named_struct('w1', x, 'w2', y))) AS pr"""))
        .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
        .filter(col("w1") =!= col("w2"))
      val edges = pairs
        .join(broadcast(vocab.withColumnRenamed("wd", "w1")), "w1")
        .join(broadcast(vocab.withColumnRenamed("wd", "w2")), "w2")
        .select(explode(array(
            struct(col("w1").as("src"), col("w2").as("dst")),
            struct(col("w2").as("src"), col("w1").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("wt"))
        .localCheckpoint()
      val outw = edges.groupBy(col("src")).agg(sum(col("wt")).as("ow"))
      val nodes = edges.select(col("src").as("wd")).distinct()
      val nRow = broadcast(nodes.agg(count(lit(1)).as("nn")))
      def step(pr: DataFrame): DataFrame = {
        val contrib = edges.join(outw, "src")
          .join(pr.withColumnRenamed("wd", "src"), "src")
          .select(col("dst"), expr("(pr * wt) div ow").as("ct"))
          .groupBy(col("dst")).agg(sum(col("ct")).as("in_sum"))
        nodes.crossJoin(nRow)
          .join(contrib, col("wd") === col("dst"), "left")
          .select(col("wd"),
            expr("(15 * (1000000000000 div nn) + 85 * coalesce(in_sum, CAST(0 AS BIGINT))) div 100")
              .as("pr"))
      }
      val p0 = nodes.crossJoin(nRow)
        .select(col("wd"), expr("1000000000000 div nn").as("pr"))
      step(step(p0))
        .withColumn("rn", row_number().over(
          graft.operators.BoundedWindow.over(col("wd")).orderBy(col("pr").desc, col("wd"))))
        .filter(col("rn") <= 10)
        .select(col("wd").as("word"), col("pr"))
        .orderBy(col("pr").desc, col("word"))
    },
    Some("""WITH toks AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
      wc AS (SELECT u AS wd, COUNT(*) AS c FROM toks, unnest(w) AS t(u) GROUP BY 1),
      vocab AS (SELECT wd FROM (
          SELECT wd, ROW_NUMBER() OVER (ORDER BY c DESC, wd) AS rn FROM wc)
        WHERE rn <= 200),
      rawp AS (SELECT unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))],
          recursive := true) FROM toks WHERE len(w) >= 2),
      cand AS (SELECT w1, w2 FROM rawp WHERE w1 <> w2
        AND w1 IN (SELECT wd FROM vocab) AND w2 IN (SELECT wd FROM vocab)),
      ed AS (SELECT src, dst, COUNT(*) AS wt FROM (
          SELECT w1 AS src, w2 AS dst FROM cand
          UNION ALL SELECT w2, w1 FROM cand) GROUP BY 1, 2),
      ow AS (SELECT src, CAST(SUM(wt) AS BIGINT) AS ow FROM ed GROUP BY 1),
      nodes AS (SELECT DISTINCT src AS wd FROM ed),
      n AS (SELECT COUNT(*) AS nn FROM nodes),
      p0 AS (SELECT wd, 1000000000000 // nn AS pr FROM nodes CROSS JOIN n),
      c1 AS (SELECT ed.dst, CAST(SUM((p.pr * ed.wt) // o.ow) AS BIGINT) AS in_sum
        FROM ed JOIN ow o ON o.src = ed.src JOIN p0 p ON p.wd = ed.src
        GROUP BY ed.dst),
      p1 AS (SELECT nodes.wd,
          CAST((15 * (1000000000000 // nn) + 85 * COALESCE(c1.in_sum, 0)) // 100 AS BIGINT) AS pr
        FROM nodes CROSS JOIN n LEFT JOIN c1 ON c1.dst = nodes.wd),
      c2 AS (SELECT ed.dst, CAST(SUM((p.pr * ed.wt) // o.ow) AS BIGINT) AS in_sum
        FROM ed JOIN ow o ON o.src = ed.src JOIN p1 p ON p.wd = ed.src
        GROUP BY ed.dst),
      p2 AS (SELECT nodes.wd,
          CAST((15 * (1000000000000 // nn) + 85 * COALESCE(c2.in_sum, 0)) // 100 AS BIGINT) AS pr
        FROM nodes CROSS JOIN n LEFT JOIN c2 ON c2.dst = nodes.wd)
      SELECT word, pr FROM (
          SELECT wd AS word, pr, ROW_NUMBER() OVER (ORDER BY pr DESC, wd) AS rn FROM p2)
      WHERE rn <= 10 ORDER BY pr DESC, word"""),
    doc = "TextRank keywords: 2 exact-integer damped power-iteration rounds over the vocab-bounded adjacency co-occurrence graph")

  // ---------------------------------------------------------------- q243
  /** Unicode NFC normalization audit through the native [[graft.functions.NfcNormalize]]
    * expression (pure-JDK java.text.Normalizer, codegen'd, SQL-registered
    * as `nfc_normalize` — Spark ships no normalization builtin; DuckDB's
    * nfc_normalize is the oracle's). Canonically-equivalent spellings
    * ("é" U+00E9 vs "e"+U+0301) hash differently, so every hash-keyed
    * operator (q40 exact dedup, q121 paragraph dedup, the LSH shingles)
    * silently under-dedups a corpus that isn't NFC-normalized first —
    * this query measures that exposure. The ASCII test corpus is
    * deterministically "dirtied" in-query (docs with doc_id % 3 = 0 get
    * every 'e' decomposed to e+combining-acute), then the audit counts
    * changed docs, code points recovered by composition, and verifies
    * round-trip: the normalized form must equal the precomposed-é
    * rewrite exactly. Per-row scalar work — zero shuffles before the
    * tiny per-lang census; the already-NFC fast path makes the clean
    * majority a quick-check scan with no allocation. */
  val q243 = QueryDef(
    "q243_nfc_normalize_audit",
    (s, d) => {
      def nfc(c: Column): Column =
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.NfcNormalize(
            org.apache.spark.sql.GraftBridge.expression(c)))
      val dirty = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          when(col("doc_id") % 3 === 0,
            regexp_replace(col("text"), "e", "e\u0301"))
            .otherwise(col("text")).as("txt"))
      dirty
        .select(col("lang"), col("txt"), nfc(col("txt")).as("norm"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"),
          sum(when(col("norm") =!= col("txt"), 1L).otherwise(0L)).as("changed_docs"),
          sum(length(col("txt")) - length(col("norm"))).as("chars_composed"),
          sum(when(col("norm") === regexp_replace(col("txt"), "e\u0301", "\u00e9"), 1L)
            .otherwise(0L)).as("roundtrip_ok"))
        .orderBy(col("lang"))
    },
    Some("""WITH dirty AS (SELECT doc_id, lang,
          CASE WHEN doc_id % 3 = 0 THEN replace(text, 'e', 'e' || chr(769))
               ELSE text END AS txt
        FROM documents),
      a AS (SELECT lang, txt, nfc_normalize(txt) AS norm FROM dirty)
      SELECT lang, COUNT(*) AS docs,
        CAST(SUM(CASE WHEN norm <> txt THEN 1 ELSE 0 END) AS BIGINT) AS changed_docs,
        CAST(SUM(len(txt) - len(norm)) AS BIGINT) AS chars_composed,
        CAST(SUM(CASE WHEN norm = replace(txt, 'e' || chr(769), chr(233))
          THEN 1 ELSE 0 END) AS BIGINT) AS roundtrip_ok
      FROM a GROUP BY lang ORDER BY lang"""),
    doc = "NFC normalization exposure audit via the native nfc_normalize expression; composition verified against the precomposed rewrite")

  // --------------------------------------------------------------- q277
  /** Distinct-n corpus diversity (the distinct-1/2/3 metric generative-
    * corpus audits report — Li et al.'s "Diversity-Promoting" framing):
    * per source, the share of n-gram OCCURRENCES that are unique types,
    * for n = 1, 2, 3. Low distinct-2/3 flags templated or machine-
    * generated text that per-doc repetition scores (q95, q173) miss
    * because the repetition lives ACROSS documents of one source.
    *
    * Scale shape: each tier is explode → two keyed aggregations, first
    * on (source, gram) — partial/map-side combinable, the only wide key
    * — then on source; nothing quadratic, no distinct() on a global
    * set. The three tiers are independent single-pass pipelines
    * unioned at the ≤ 3·|sources| summary level. */
  val q277 = QueryDef(
    "q277_distinct_ngrams",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("ws"))
      def tier(n: Int) = {
        val grams =
          if (n == 1) base.select(col("source"), explode(col("ws")).as("g"))
          else base.filter(size(col("ws")) >= n)
            .select(col("source"), explode(
              expr(s"transform(sequence(0, size(ws) - $n), i -> concat_ws(' ', slice(ws, i + 1, $n)))")).as("g"))
        grams.groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
          .groupBy(col("source"))
          .agg(sum(col("c")).as("total_grams"), count(lit(1)).as("uniq_grams"))
          .select(col("source"), lit(n).cast("int").as("n"),
            col("total_grams"), col("uniq_grams"),
            expr("uniq_grams * 1000000 div total_grams").as("distinct_ppm"))
      }
      tier(1).unionByName(tier(2)).unionByName(tier(3))
        .orderBy(col("source"), col("n"))
    },
    Some("""WITH d AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
      g1 AS (SELECT source, unnest(ws) AS g FROM d),
      g2 AS (SELECT source, ws[i] || ' ' || ws[i+1] AS g FROM (
          SELECT source, ws, unnest(range(1, len(ws))) AS i FROM d WHERE len(ws) >= 2)),
      g3 AS (SELECT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g FROM (
          SELECT source, ws, unnest(range(1, len(ws) - 1)) AS i FROM d WHERE len(ws) >= 3)),
      t AS (SELECT source, 1 AS n, g FROM g1
        UNION ALL SELECT source, 2, g FROM g2
        UNION ALL SELECT source, 3, g FROM g3),
      pg AS (SELECT source, n, g, COUNT(*) AS c FROM t GROUP BY 1, 2, 3)
      SELECT source, n, CAST(SUM(c) AS BIGINT) AS total_grams,
        COUNT(*) AS uniq_grams,
        CAST(COUNT(*) * 1000000 // SUM(c) AS BIGINT) AS distinct_ppm
      FROM pg GROUP BY source, n ORDER BY source, n"""),
    doc = "distinct-1/2/3 n-gram diversity per source: cross-doc templating signal, two keyed aggs per tier, nothing global")

  val all: Seq[QueryDef] = Seq(q47, q48, q49, q50, q104, q111, q172, q173, q181, q182,
    q190, q223, q238, q243, q277)
}
