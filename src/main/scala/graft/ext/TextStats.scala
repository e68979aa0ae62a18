package graft.ext

import org.apache.spark.sql.Column
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

  val all: Seq[QueryDef] = Seq(q47, q48, q49, q50, q104, q111)
}
