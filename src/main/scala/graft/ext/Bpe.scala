package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Distributed BPE tokenizer training — the byte-pair-encoding merge loop
  * (Sennrich et al. 2016) run as a Spark driver-iterative program, the
  * same shape as q100's connected-components loop: per round one
  * distributed aggregation elects the globally most frequent adjacent
  * symbol pair (ties broken lexicographically — fully deterministic), and
  * one narrow transform applies the merge to every word. k rounds = k
  * tiny driver scalars; the corpus-sized work stays on executors.
  *
  * 100 TB design notes:
  *  - training runs over the WORD VOCABULARY (word, freq), not the token
  *    stream: the first agg collapses the corpus to distinct words, after
  *    which per-round cost scales with |vocab| (sublinear in corpus) —
  *    exactly how production BPE trainers work;
  *  - the merge application is a per-row left-to-right fold via the
  *    `aggregate` higher-order function — no UDF, no serialization
  *    boundary, and the sequential dependency of greedy merging cannot
  *    be expressed by element-wise HOFs;
  *  - `localCheckpoint` truncates the growing lineage each round (q100's
  *    lesson), so round N's plan does not replay rounds 1..N-1;
  *  - the per-round election is `orderBy(...).limit(1)` — planned as
  *    TakeOrderedAndProject (a k=1 top-k, never a global sort).
  *
  * A RECURSIVE SQL oracle cannot express an iterative argmax-dependent
  * rewrite (aggregates are barred from a recursive CTE's recursive
  * term) — but a FIXED round count UNROLLS: one (pair-count → argmax →
  * apply-merge) CTE block per round, with the greedy merge rewrite
  * expressed as a boundary-safe string `replace` over a pipe-delimited
  * symbol state (see [[Bpe.q320]]'s scaladoc for the safety argument).
  * q134/q135 train 10 rounds and carry the 10-round unrolled oracle;
  * their vocabularies restrict to `^[a-z]+$` words IN BOTH ENGINES so
  * the pipe delimiter stays out-of-band (q261 keeps the UNRESTRICTED
  * vocabulary fully oracle-checked for the one round that needs no
  * state rewrite). BpeSpec additionally pins the trainer against an
  * independent single-threaded reference implementation on the
  * unrestricted vocabulary plus the classic hand-computed fixture. */
object Bpe {

  /** End-of-word sentinel; distinguishes "est" inside a word from "est"
    * at word end (the standard BPE convention). Chosen outside the
    * corpus alphabet. */
  val Eow = "</w>"

  /** Greedy left-to-right merge of adjacent (l, r) into l+r, as a pure
    * Column fold: [a a a] merge (a,a) -> [aa a] (non-overlapping, same as
    * the reference algorithm). */
  def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      lit(Array.empty[String]),
      (acc, s) =>
        when(size(acc) > 0 &&
            element_at(acc, size(acc)) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(s))))

  /** One elected merge: rank (1-based), the pair, and its weighted count. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Train `k` BPE merges over a (word, freq) vocabulary frame.
    * Deterministic: the election orders by (count DESC, left, right). */
  def trainMerges(vocab: DataFrame, k: Int): Seq[Merge] = train(vocab, k)._1

  /** As [[trainMerges]], also returning the final tokenized vocabulary
    * (word, freq, syms) — the state q135 reports compression from, so
    * "apply the merges" costs nothing beyond the training it already
    * ran (the returned frame is localCheckpoint-ed: no lineage replay). */
  def train(vocab: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    var state = vocab.select(col("word"), col("freq"),
      concat(split(col("word"), ""), array(lit(Eow))).as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var round = 1
    var go = true
    while (go && round <= k) {
      val top = state
        .select(col("freq"), col("syms"), posexplode(col("syms")).as(Seq("i", "l")))
        .withColumn("r", try_element_at(col("syms"), col("i") + 2))
        .filter(col("r").isNotNull)
        .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) go = false
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        // a pair seen only once has no compression value; the reference
        // algorithm stops when the best pair's count is 1
        if (c < 2) go = false
        else {
          merges += Merge(round, l, r, c)
          state = state
            .select(col("word"), col("freq"), mergePair(col("syms"), l, r).as("syms"))
            .localCheckpoint()
          round += 1
        }
      }
    }
    (merges.result(), state)
  }

  /** The shared DuckDB-side unrolled trainer: `rounds` chained
    * (pair-count → argmax → merge-rewrite) CTE blocks over the `[a-z]+`
    * word vocabulary, ending before `finalSelect`. State CTEs are
    * MATERIALIZED — each round references its predecessor twice (the
    * election chain and the rewrite), so an inlining engine would
    * otherwise re-evaluate s0 2^rounds times. */
  private def unrolledOracle(rounds: Int, finalSelect: String): String = {
    def round(k: Int): String = {
      val prev = if (k == 1) "s0" else s"s${k - 1}"
      s"""l$k AS (SELECT freq, string_split(trim(s, '|'), '||') AS ls FROM $prev),
      px$k AS (SELECT freq, ls, generate_subscripts(ls, 1) AS i, unnest(ls) AS l FROM l$k),
      pr$k AS (SELECT l, ls[i + 1] AS r, freq FROM px$k WHERE i < len(ls)),
      pc$k AS (SELECT l, r, CAST(SUM(freq) AS BIGINT) AS pair_count FROM pr$k GROUP BY l, r),
      m$k AS MATERIALIZED (SELECT l, r, pair_count FROM pc$k ORDER BY pair_count DESC, l, r LIMIT 1),
      s$k AS MATERIALIZED (SELECT freq,
          replace(s, '|' || m$k.l || '||' || m$k.r || '|', '|' || m$k.l || m$k.r || '|') AS s
        FROM $prev CROSS JOIN m$k)"""
    }
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      v AS (SELECT word, COUNT(*) AS freq FROM w
        WHERE regexp_matches(word, '^[a-z]+${"$"}') GROUP BY word),
      s0 AS MATERIALIZED (SELECT freq,
          '||' || array_to_string(list_append(string_split(word, ''), '</w>'), '||') || '||' AS s
        FROM v),
      ${(1 to rounds).map(round).mkString(",\n      ")}
      $finalSelect"""
  }

  // --------------------------------------------------------------- q134
  /** The first 10 BPE merges learned from the corpus word vocabulary
    * (`[a-z]+` words — the precondition that keeps the oracle's pipe
    * delimiter out-of-band; q261 oracle-checks the unrestricted
    * vocabulary's election). Oracle: the 10-round UNROLLED trainer —
    * every election and every rewrite crosses the engine boundary,
    * retiring the rows-only status this query carried since r4. */
  val q134 = QueryDef(
    "q134_bpe_merges",
    (s, d) => {
      val vocab = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      import s.implicits._
      trainMerges(vocab, 10)
        .toDF("merge_rank", "left", "right", "pair_count")
        .orderBy(col("merge_rank"))
    },
    Some(unrolledOracle(10,
      (1 to 10).map(k =>
        s"""${if (k == 1) "SELECT" else "UNION ALL SELECT"} $k AS merge_rank,
           l AS "left", r AS "right", pair_count FROM m$k""").mkString("\n      ") +
        "\n      ORDER BY merge_rank")),
    doc = "first 10 BPE merges over the [a-z]+ word vocabulary, fully oracle-checked via the 10-round unrolled CTE trainer; BpeSpec additionally pins vs an independent impl on the unrestricted vocabulary")

  /** Posexplode trick above: `try_element_at(syms, i + 2)` pairs element
    * i (0-based from posexplode) with its successor (element_at is
    * 1-based; the try_ form returns NULL past the end instead of an ANSI
    * error), yielding each adjacent (l, r) without a self-join. */

  // --------------------------------------------------------------- q135
  /** Tokenizer application report: train 10 merges, tokenize the word
    * vocabulary with them, and weight by corpus frequency — the
    * compression census that decides whether a learned vocab is worth
    * shipping. `tokens_char` is the character-baseline token count
    * (chars + the </w> sentinel per word occurrence); `tokens_bpe` is
    * after the merges; compression = 1 − bpe/char as an exact integer
    * ratio. `vocab_symbols` counts the distinct symbol inventory the
    * merges induce (base chars + sentinel + one new symbol per merge
    * actually used). Corpus-sized work is the one vocab-building agg;
    * everything after runs on |vocab| rows. */
  val q135 = QueryDef(
    "q135_bpe_tokenize",
    (s, d) => {
      val vocab = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      val (_, state) = train(vocab, 10)
      val syms = state.select(col("freq"),
        (length(col("word")) + 1).cast("long").as("n_char"),
        size(col("syms")).cast("long").as("n_bpe"),
        col("syms"))
      syms.agg(
          count(lit(1)).as("n_words"),
          sum(col("freq") * col("n_char")).as("tokens_char"),
          sum(col("freq") * col("n_bpe")).as("tokens_bpe"),
          size(array_distinct(flatten(collect_list(col("syms"))))).cast("long")
            .as("vocab_symbols"))
        .select(col("n_words"), col("tokens_char"), col("tokens_bpe"),
          round(lit(1.0) - col("tokens_bpe").cast("double") / col("tokens_char"), 6)
            .as("compression"),
          col("vocab_symbols"))
    },
    // the census over the SAME 10-round unrolled state: token counts,
    // compression ratio, and the induced symbol inventory all cross the
    // engine boundary (retires the second rows-only row)
    Some(unrolledOracle(10,
      """, fin AS (SELECT freq, string_split(trim(s, '|'), '||') AS ls FROM s10),
      census AS (SELECT
          CAST(COUNT(*) AS BIGINT) AS n_words,
          CAST(SUM(freq * (len(array_to_string(ls, '')) - len('</w>') + 1)) AS BIGINT)
            AS tokens_char,
          CAST(SUM(freq * len(ls)) AS BIGINT) AS tokens_bpe
        FROM fin),
      symbols AS (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) AS vocab_symbols
        FROM (SELECT unnest(ls) AS sym FROM fin) u)
      SELECT n_words, tokens_char, tokens_bpe,
        round(1.0 - CAST(tokens_bpe AS DOUBLE) / tokens_char, 6) AS compression,
        vocab_symbols
      FROM census CROSS JOIN symbols""")),
    doc = "10-merge BPE applied to the [a-z]+ vocab; frequency-weighted compression census, fully oracle-checked over the unrolled trainer's final state")

  // --------------------------------------------------------------- q261
  /** Round 1 of the merge election as a standalone query WITH a full
    * DuckDB oracle: a single argmax over adjacent-pair counts is plain
    * SQL (it's only rounds ≥ 2, whose input depends on the previous
    * argmax, that no recursive CTE can express — aggregates are barred
    * from the recursive term). q134/q135 stay spec-pinned against the
    * independent reference implementation; this row makes the election
    * logic itself — vocab build, sentinel, adjacency, tie order — cross
    * an engine boundary every round. */
  val q261 = QueryDef(
    "q261_bpe_first_merge",
    (s, d) => {
      val vocab = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      vocab.select(col("freq"),
          concat(split(col("word"), ""), array(lit(Eow))).as("syms"))
        .select(col("freq"), col("syms"), posexplode(col("syms")).as(Seq("i", "l")))
        .withColumn("r", try_element_at(col("syms"), col("i") + 2))
        .filter(col("r").isNotNull)
        .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(1)
        .select(lit(1).as("merge_rank"), col("l").as("left"),
          col("r").as("right"), col("pair_count"))
    },
    Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      v AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
      syms AS (SELECT freq, list_append(string_split(word, ''), '</w>') AS s FROM v),
      px AS (SELECT freq, s, generate_subscripts(s, 1) AS i, unnest(s) AS l FROM syms),
      pr AS (SELECT l, s[i + 1] AS r, freq FROM px WHERE i < len(s)),
      pc AS (SELECT l, r, CAST(SUM(freq) AS BIGINT) AS pair_count FROM pr GROUP BY l, r)
      SELECT 1 AS merge_rank, l AS "left", r AS "right", pair_count
      FROM pc ORDER BY pair_count DESC, l, r LIMIT 1"""),
    doc = "round-1 BPE pair election, fully oracle-checked (the one round a non-iterative engine can replicate)")

  // --------------------------------------------------------------- q320
  /** MULTI-ROUND BPE training with a full DuckDB oracle — closing q261's
    * documented one-round limitation. Rounds ≥ 2 depend on the previous
    * round's argmax, which a recursive CTE cannot express (no aggregates
    * in the recursive term) — but a FIXED round count can be UNROLLED:
    * the oracle chains one (pair-count → argmax → apply-merge) CTE block
    * per round. The merge application crosses the engine boundary as a
    * plain string `replace`: the symbol state is piped as
    * `||s1||s2||...||` and merging (l, r) replaces `|l||r|` with `|lr|`
    * — each boundary contributes two pipes and the pattern consumes only
    * the inner one per side, so left-to-right non-overlapping `replace`
    * is EXACTLY the greedy fold semantics of [[mergePair]] ([a,a,a] →
    * [aa,a]; no false matches across symbol boundaries; a replacement
    * never re-merges into its own tail — `replace` resumes after the
    * replacement, the fold never reconsiders). The vocabulary restricts
    * to ^[a-z]+$ words in BOTH engines so the pipe delimiter stays
    * out-of-band. The Spark side is the REAL driver-iterative trainer —
    * a hash match proves the whole election+rewrite loop, not a
    * SQL-shaped twin. */
  val q320 = QueryDef(
    "q320_bpe_multiround",
    (s, d) => {
      val vocab = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      import s.implicits._
      trainMerges(vocab, 3)
        .toDF("merge_rank", "left", "right", "pair_count")
        .orderBy(col("merge_rank"))
    },
    // the shared unrolled-CTE trainer (see [[unrolledOracle]]), 3 rounds
    Some(unrolledOracle(3,
      """SELECT 1 AS merge_rank, l AS "left", r AS "right", pair_count FROM m1
      UNION ALL SELECT 2, l, r, pair_count FROM m2
      UNION ALL SELECT 3, l, r, pair_count FROM m3
      ORDER BY merge_rank""")),
    doc = "3 BPE merge rounds fully oracle-checked: the argmax-dependent iteration unrolled as chained CTEs, the greedy merge rewrite expressed as boundary-safe string replace — multi-round training crosses the engine boundary")

  val all: Seq[QueryDef] = Seq(q134, q135, q261, q320)
}
