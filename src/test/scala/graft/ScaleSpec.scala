package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scale

/** The scale operators' *plan* contracts: bucketed joins must not shuffle
  * either side (the whole point of pre-bucketing). Result equivalence is
  * the DuckDB oracle's job (q63/q64). */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed join plan has no shuffle below the join") {
    val (o, l) = Scale.bucketedTables(spark, sf, 4)
    // force the merge strategy: at this fixture size the planner would
    // broadcast, which hides the property under test (bucket co-location)
    val joined = o.hint("merge").join(l, o("o_orderkey") === l("l_orderkey"))
    joined.collect() // execute so AQE finalizes the plan
    // string-based: AQE query-stage wrappers hide children from collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scans must be bucketed:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle either side:\n$plan")
  }

  test("rank-limit top-k: row_number-filter runs as the bounded aggregate; rank() keeps WindowGroupLimit") {
    // SURVEY §4 candidate (3) landed in round 5: TopKAggregateRewrite
    // turns the bare row_number-filter idiom into the k-row-buffer
    // ObjectHashAggregate (no Window, no Sort — see GraftExtensions).
    // q45 (and the whole row_number-top-k family) must plan that way;
    // a rank()-phrased top-k is outside the rule (tie semantics differ)
    // and must keep Spark 4's WindowGroupLimit partial+final pruning —
    // both pins fail if a future phrasing regresses to a full sort.
    for (q <- Seq(graft.operators.Relational.q13, graft.ext.Similarity.q45,
        graft.ext.Similarity.q133)) {
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("bounded_top_k_rows"),
        s"${q.name}: expected the BoundedTopKRows aggregate:\n$plan")
      assert(plan.contains("ObjectHashAggregate"),
        s"${q.name}: bounded top-k should run as ObjectHashAggregate:\n$plan")
      assert(!plan.contains("WindowGroupLimit"),
        s"${q.name}: the window form should be fully rewritten:\n$plan")
    }
    // dense_rank keeps ties — outside the rule, must stay a (pruned) window
    val q169plan = graft.operators.CoverageQueries.q169.fn(spark, sf)
      .queryExecution.executedPlan.toString
    val hits = "WindowGroupLimit".r.findAllIn(q169plan).size
    assert(hits >= 2,
      s"q169: expected partial+final WindowGroupLimit, got $hits:\n$q169plan")
  }

  test("q23 exact percentiles sort in a spilling window, not a value-buffering agg") {
    // Spark's percentile() buffers every value of a group inside the agg
    // buffer — OOM-class at scale. q23's contract is the sort-based plan:
    // a Window (external, spilling sort) ranks values; the final aggregate
    // only ever sees the <=2 boundary rows per percentile.
    val plan = graft.operators.Relational.q23.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a window sort:\n$plan")
    assert(!plan.toLowerCase.contains("percentile("),
      s"q23 must not use the buffering percentile() aggregate:\n$plan")
  }

  test("AQE splits a skewed sort-merge join partition (skew=true in the final plan)") {
    import org.apache.spark.sql.functions._
    // one key carries ~all left rows; thresholds lowered so the fixture
    // triggers the same decision a 100 TB skewed key would
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1", // force SMJ (AQE replan)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",          // force SMJ (static plan)
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 200000)
        .select(when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("payload-padding-payload-padding-"), col("id")).as("pay"))
      val right = spark.range(0, 2000).select(col("id").as("k"), col("id").as("v"))
      val joined = left.join(right, "k")
      // collect() executes THIS QueryExecution (a write/count plans a fresh
      // one, leaving joined.queryExecution un-finalized under AQE)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"),
        s"expected AQE to mark the skewed join (skew=true):\n${plan.take(4000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("no query plans a cartesian/nested-loop join outside the intentional whitelist") {
    // the O(n^2) join guard for the whole registry: BroadcastNestedLoopJoin
    // and CartesianProduct are only acceptable where one side is a
    // constant-size scalar/dim (audited individually below); anywhere else
    // they are the textbook 100 TB scale-killer, and this pin fails the
    // build the moment a rewrite regresses a plan into one.
    val whitelist = Set(
      "q07_cross_join_regions", // cross join IS the operator under test (5x5 dims)
      "q45_cosine_topk",        // broadcast of the constant 10-vector query side
      "q46_ann_ivf_topk",       // broadcast of nlist centroids + scalar probe set
      "q92_tfidf_topk",         // crossJoin(broadcast(1-row corpus count))
      "q93_hll_rollup",         // crossJoin(broadcast(1-row exact count))
      "q99_gap_fill",           // generated day x type scaffold (both tiny)
      "q110_ann_recall",        // composes q45+q46: same tiny broadcast sides
      "q119_budget_fill",       // crossJoin(broadcast(1-row weight sum))
      "q132_ks_drift",          // bounded srcs x distinct-values grid + 1-row total
      "q133_hard_negatives",    // q45's shape: constant 10-anchor broadcast side
      "q144_contingency_residuals", // crossJoin(broadcast(1-row grand total))
      "q155_label_balance",     // crossJoin(broadcast(1-row count totals))
      "q158_centroid_geometry", // |labels|-row centroid broadcast self-join
      "q180_selfjoin_blowup",   // crossJoin(broadcast(1-row total-pairs sum))
      "q184_kmeans_clusters",   // crossJoin(broadcast(k=4 centroid codebook))
      "q185_knn_pagerank",      // crossJoin(broadcast(1-row node count))
      "q186_zorder_skipping",   // crossJoin(broadcast(1-row matched count))
      "q188_hll_overlap",       // |types|-row sketch broadcast self-join (a < b)
      "q190_bigram_lm_score",   // crossJoin(broadcast(1-row vocab size))
      "q194_pq_adc_topk",       // q45's shape: constant 3-query broadcast ground-truth side
      "q292_pq_operating_curve", // q194's sweep: same constant 3-query broadcast ground truth
      "q296_bradley_terry",     // crossJoin(broadcast(1-row player count / strength sum))
      "q201_data_contract",     // crossJoin(broadcast(1-row orders count))
      "q202_benford_audit",     // crossJoin(broadcast(1-row digit total))
      "q218_k_anonymity",       // crossJoin(broadcast(1-row min class size))
      "q221_rfm_segments",      // crossJoin(broadcast(1-row corpus horizon))
      "q222_histogram_drift",   // crossJoin(broadcast(|bands|-row corpus marginal + 1-row total))
      "q223_phrase_search",     // crossJoin(broadcast(1-row phrase + 1-row census))
      "q225_bitemporal_asof",   // crossJoin(broadcast(1-row transaction-time cut))
      "q226_trend_forecast",    // crossJoin(broadcast(1-row min-day origin))
      "q230_annotator_kappa",   // crossJoin(broadcast(1-row chance-agreement sum))
      "q238_textrank_keywords", // crossJoin(broadcast(1-row node count)), q185 shape
      "q244_split_balance",     // crossJoin(broadcast(1-row grand total)), q230 convention
      "q250_bootstrap_ci",      // crossJoin(broadcast(1-row point estimate))
      "q258_ann_knn_pagerank",  // q185's pagerank: crossJoin(broadcast(1-row node count))
      "q259_ann_graph_recall",  // audit: 4-way crossJoin of 1-row census aggregates
      "q263_dsir_importance",   // crossJoin(broadcast(1-row token totals))
      "q264_bm25_topk",         // crossJoin(broadcast(1-row doc/token census))
      "q265_ivf_knn_pagerank",  // q184's k-row centroid broadcast + 1-row node count
      "q268_capped_lm_score",   // crossJoin(broadcast(1-row bigram total))
      "q239_user_similarity",   // crossJoin(broadcast(1-row feature-dict size))
      "q299_adaptive_user_similarity", // tiled arm: crossJoin(broadcast(1-row fid max)), q239's pattern
      "q291_ann_user_similarity", // same 1-row feature-dict / mean-vector broadcasts
      "q271_retrieval_mrr",     // q45's shape: constant 20-query broadcast side
      "q272_temperature_mixture", // crossJoin(broadcast(1-row weight/doc totals))
      "q274_rrf_fusion",        // crossJoin(broadcast(1-row census + 1-vector query))
      "q276_mmr_rerank",        // 20x20 candidate pair sims (bounded by construction)
      "q278_curriculum_schedule", // crossJoin(broadcast(1-row min/max bounds))
      "q281_nprobe_recall_curve", // q46's centroid/query broadcasts + 4-row tier-tag join
      "q309_ann_index_serve",   // q281's shape: 4-row codebook + 5-query broadcast sides over the lake index
      "q283_rank_correlation",  // <=50x50 bounded pair join of two top-k lists + 1-row m
      "q284_group_kfold",       // crossJoin(broadcast(1-row corpus total))
      "q285_group_trend",       // crossJoin(broadcast(1-row day origin))
      "q286_consistent_hash_reshard", // crossJoin(broadcast(<=144-row hash ring))
      "q287_conversion_hazard", // crossJoin(broadcast(1-row horizon + 31-row day axis))
      "q288_association_rules", // crossJoin(broadcast(1-row user count))
      "q289_anova_f",           // 1-row-to-1-row final reduction
      "q279_recency_weighting", // crossJoin(broadcast(1-row corpus horizon))
      "q306_persistent_ann_index", // q184's k=4 centroid codebook broadcast (assignTo)
      "q321_graph_ann_serve")   // exact kNN-graph BUILD (audit-tier, broadcast side;
                                // scale build = banded candidates, q185's contract) +
                                // q309-shape 5-query broadcast brute-force ground truth
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      val bad = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (bad && !whitelist(q.name)) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"unwhitelisted cartesian/nested-loop plans: ${offenders.mkString(", ")}")
  }

  test("no corpus-sized input feeds an unpartitioned window (registry-wide audit)") {
    // The single-partition WindowExec guard: Window.orderBy with no
    // partitionSpec moves the ENTIRE input through one task's sort — the
    // recurring 100 TB anti-pattern (r07 verdict). Corpus-sized global
    // orders must go through RangeRank's two-pass range-partitioned rank
    // instead (its bounded internal prefix window partitions by lit(0),
    // i.e. a NON-empty spec, precisely so this audit separates it from
    // offenders). Every name below is audited bounded: the window input is
    // an aggregate over a bounded DOMAIN (score grid, bins, days, vocab
    // top-k, event-type triples), never a relation that grows linearly
    // with the corpus. Adding a new empty-spec window requires adding its
    // name here WITH the boundedness argument.
    // EMPTY by design since round 8: every intentional bounded-domain
    // single-partition window goes through BoundedWindow.over (non-empty,
    // non-foldable constant spec), so an empty partitionSpec anywhere in
    // the registry is an un-reviewed scale bug, full stop. Add an entry
    // here ONLY with a boundedness argument — and prefer BoundedWindow.
    val boundedDomain = Map.empty[String, String]
    val withGlobalWindow = SparkEntry.registry.flatMap { q =>
      val hasGlobalWindow = q.fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.nonEmpty
      if (hasGlobalWindow) Some(q.name) else None
    }.toSet
    val offenders = withGlobalWindow -- boundedDomain.keySet
    assert(offenders.isEmpty,
      s"unaudited global-order windows (single-task sort at scale): ${offenders.mkString(", ")}")
    // the allowlist must not rot either: a dormant entry means a rewrite
    // removed the window and the boundedness argument above is stale
    val dormant = boundedDomain.keySet -- withGlobalWindow
    assert(dormant.isEmpty, s"stale allowlist entries (no global window in plan): ${dormant.mkString(", ")}")
    // and the five r07 offenders must stay OFF the list for good
    for (fixed <- Seq("q220_funnel_latency", "q221_rfm_segments",
        "q199_quantile_normalize", "q151_weighted_median_quality",
        "q156_pareto_concentration"))
      assert(!boundedDomain.contains(fixed), s"$fixed was rewritten via RangeRank")
  }

  test("plan pins: shuffle-exchange budget + join strategy for the most expensive queries") {
    // Per-query regression pins for the plans that dominate the bench: a
    // Spark upgrade or an innocent-looking refactor must not silently add
    // a shuffle or downgrade a join strategy. Budgets are the CURRENT
    // plan's counts (asserted as =, not <=: losing a shuffle is news too —
    // it means the pin's rationale comment is stale). q100 is exempt: its
    // returned frame sits behind iterative localCheckpoints, so its plan
    // string carries no pin-able structure. q64's zero-Exchange contract
    // has its own test above.
    val shuffleRe = "(?<!Broadcast)(?<!Reused)Exchange".r
    val joinRe = "\\b(\\w+Join)\\b".r
    case class Pin(q: QueryDef, shuffles: Int, joins: Set[String], why: String)
    val pins = Seq(
      // dims broadcast; facts shuffle once into the agg + once for sort
      Pin(graft.operators.Relational.q05, 2, Set("BroadcastHashJoin"),
        "star join: all four dims must broadcast, fact never SMJs"),
      // sketch agg 1 + exact-distinct 2 (partial on (rf,pk), final on rf) + sort
      Pin(graft.operators.Relational.q24, 4, Set("BroadcastHashJoin"),
        "sketches and count_distinct aggregate in separate passes"),
      // parse is embarrassingly parallel: the only shuffle is the final sort
      Pin(graft.etl.EtlQueries.q37, 1, Set.empty,
        "ETL parse must stay shuffle-free up to the output sort"),
      // 8-byte hash-key agg shuffle + output sort
      Pin(graft.ext.Dedup.q40, 2, Set.empty,
        "exact dedup shuffles the xxhash64 key, never full text"),
      // band explode -> bucket equi-join (broadcast at fixture size) + agg + sort
      Pin(graft.ext.Dedup.q41, 2, Set("BroadcastHashJoin"),
        "LSH candidates come from a band equi-join, not an all-pairs join"),
      // the ONE explicit repartitionByRange that parallelizes the CPU-bound verify
      Pin(graft.ext.Dedup.q103, 1, Set("BroadcastHashJoin"),
        "edit-distance verify: adjacent-pair equi-join + explicit spread"),
      // 16x16 block tiles meet in an equi-join (SMJ), never a BNLJ
      Pin(graft.ext.Similarity.q54, 3, Set("BroadcastHashJoin", "SortMergeJoin"),
        "exact all-pairs is a blocked equi-join with bounded task memory"),
      // window over (key, range): one partition shuffle + output sort
      Pin(graft.operators.CoverageQueries.q83, 2, Set.empty,
        "range frame runs in a single spilling window pass"),
      // centroid pipeline aggs + band join; centroids/probes broadcast
      Pin(graft.ext.Similarity.q89, 6, Set("BroadcastHashJoin"),
        "hyperplane LSH: mean-center + band equi-join, corpus shuffles only for aggs"),
      // df-cap agg + pair agg + sort + one posting shuffle; rare-set broadcast
      Pin(graft.ext.Dedup.q105, 4, Set("BroadcastHashJoin"),
        "copy-span candidates: inverted-index equi-join, df-capped, never all-pairs"),
      // per-source window shuffle + chunk agg (orderBy folds into the agg exchange)
      Pin(graft.ext.PipelineQueries.q107, 2, Set.empty,
        "packing: one spilling window per shard, no global order"),
      // bigram agg + one unigram agg per projection (c_x/c_y aliases defeat
      // exchange reuse — acceptable: vocab keys are sublinear); top-20 is
      // TakeOrderedAndProject, never a global sort
      Pin(graft.ext.CurationQueries.q114, 3, Set("BroadcastHashJoin"),
        "PMI: vocab-keyed aggs; unigram counts broadcast; top-k never global-sorts"),
      // gram-count agg on xxhash64 + probe-side join exchange (build side
      // reuses the agg partitioning) + per-doc agg; gram TEXT never keys a
      // shuffle
      Pin(graft.ext.CurationQueries.q116, 3, Set("BroadcastHashJoin", "SortMergeJoin"),
        "dup-ngram: 8-byte hash shuffles only, gram text never a shuffle key"),
      // 3 big-table shuffles (one per pushed event_type filter: view agg +
      // click/purchase join probes; stage agg outputs reuse user_id
      // partitioning) + 5 single-row/tiny exchanges for the 3 stage counts
      // and final union sort — constant-size, not data-scaled
      Pin(graft.operators.EventAnalytics.q117, 8, Set("BroadcastHashJoin", "SortMergeJoin"),
        "funnel: per-stage user_id partitioning reused, no window/global sort"),
      // regex kernel is per-row; 20-group agg + output sort only
      Pin(graft.ext.PrivacyQueries.q120, 2, Set.empty,
        "PII redaction is embarrassingly parallel up to the census agg"),
      // para-hash window shuffle + per-doc agg + output range sort
      Pin(graft.ext.PrivacyQueries.q121, 3, Set.empty,
        "paragraph dedup shuffles the 8-byte para hash, then one doc agg"),
      // generate-and-explode: the ONLY exchange is the output sort
      Pin(graft.ext.PrivacyQueries.q122, 1, Set.empty,
        "chunking plans zero shuffles before the output sort"),
      // bench-distinct + hitdoc-distinct + census aggs + output sort; the
      // corpus side itself NEVER exchanges: bench + hit-doc sets broadcast
      Pin(graft.ext.Dedup.q124, 4, Set("BroadcastHashJoin"),
        "bloom scrub: all shuffles are tiny-side/final; corpus never exchanges"),
      // ONE user_id exchange reused across window -> agg -> window + output sort
      Pin(graft.operators.EventAnalytics.q136, 2, Set.empty,
        "SCD2 islands: windows and run-agg share the user_id partitioning"),
      // one event_type window exchange + output sort; frame slides incrementally
      Pin(graft.operators.CoverageQueries.q137, 2, Set.empty,
        "interval range frame: single window pass, no per-row rescan"),
      // bigram/unigram count aggs (word-keyed, vocab-sublinear) + instance
      // joins + per-doc agg + left join-back + output sort; count models
      // broadcast back to instances, the 1-row vocab size is the BNLJ
      Pin(graft.ext.TextStats.q190, 6, Set("BroadcastHashJoin", "BroadcastNestedLoopJoin"),
        "bigram LM: word-keyed count aggs; models broadcast to instances"),
      // encode argmin agg + ADC (j, code) join + per-(q, vec) agg + rank
      // windows + ground-truth join; codebook/table/query sides broadcast
      // (the exact-top-5 side is the pinned-tiny BNLJ)
      Pin(graft.ext.Similarity.q194, 7,
        Set("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin"),
        "PQ+ADC: corpus vectors never shuffle; lookups join on (j, code)"),
      // ONE user_id window exchange drives break-flag + prefix-sum + span
      // aggs (all reuse the partitioning) + output sort
      Pin(graft.operators.EventAnalytics.q209, 2, Set.empty,
        "interval coalesce: single user_id window chain, no overlap join"),
      // one (type, day) agg exchange + output sort; selectors are
      // map-side-combinable min_by/max_by, never a window sort
      Pin(graft.operators.EventAnalytics.q212, 2, Set.empty,
        "OHLC: one keyed agg, ordered selectors instead of windows"),
      // signature-hash equi-join (both sides reuse one exchange pair) +
      // output sort; candidates only ever meet on the 8-byte hash
      Pin(graft.ext.Dedup.q224, 2, Set("BroadcastHashJoin"),
        "SymSpell: deletion-signature equi-join, never an all-pairs"),
      // bigram aggs (vocab-keyed, sublinear) + per-doc agg; the LM joins
      // back to instances as a broadcast; bottom-15 is TakeOrdered
      Pin(graft.ext.CurationQueries.q252, 3, Set("BroadcastHashJoin"),
        "LM scoring: vocab-keyed count aggs; LM broadcasts to instances; no global sort"),
      // para-hash window shuffle + per-doc agg + output sort (q121 shape)
      Pin(graft.ext.PrivacyQueries.q253, 3, Set.empty,
        "boilerplate strip shuffles the 8-byte para hash, then one doc agg"),
      // all six dims broadcast: the fact table never exchanges before the
      // year agg; sort output is the second exchange
      Pin(graft.operators.Relational.q254, 2, Set("BroadcastHashJoin"),
        "Q8 market share: star join all-broadcast, one agg + sort"),
      Pin(graft.operators.Relational.q255, 2, Set("BroadcastHashJoin"),
        "Q9 profit: star join all-broadcast, one two-level agg + sort"),
      // distinct-pairs agg + per-part max_by agg; top-20 is TakeOrdered,
      // never a window sort or correlated-MAX self-join
      Pin(graft.operators.Relational.q256, 2, Set("BroadcastHashJoin"),
        "Q2 best supplier: one argmax agg per part, no window"),
      // pair gen (bucket join + distinct) + gram joins broadcast at fixture
      // size + island window + run/pair aggs + sort
      Pin(graft.ext.Dedup.q257, 2, Set("BroadcastHashJoin"),
        "shared span: pair-bounded gram equi-joins, never corpus-squared"),
      // feature-dict + tile-tag broadcasts; ONE uvec agg exchange feeds both
      // tile sides; pair work meets in the (bi,bj) equi-join (SMJ), norms
      // ride along (no post-join lookups); top-3 agg + output sort.
      // 16→18 in r8: the |types|-row feature-dict window moved to
      // BoundedWindow (hash exchange on a constant key instead of the
      // SinglePartition exchange), costed once per dict consumer — a
      // bounded-side bookkeeping change, not a data-path shuffle
      Pin(graft.ext.Similarity.q239, 18, Set("BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin"),
        "user similarity: tiled dense pairing, 136-cell parallelism, dot is codegen'd"),
      // centroid aggs + candidate label-join + ONE tier-tagged rank window
      // + brute ground-truth join; centroids/probes/queries/tiers broadcast
      Pin(graft.ext.Similarity.q281, 10, Set("BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin"),
        "nprobe sweep: one candidate set serves all four tiers, no re-scan"))
    val problems = pins.flatMap { p =>
      val plan = p.q.fn(spark, sf).queryExecution.executedPlan.toString
      val shuffles = shuffleRe.findAllIn(plan).size
      val joins = joinRe.findAllMatchIn(plan).map(_.group(1)).toSet
        .filterNot(_ == "ReusedExchangeJoin") // defensive: token never a join op
      val errs = Seq(
        if (shuffles != p.shuffles)
          Some(s"${p.q.name}: $shuffles shuffle Exchanges, pinned ${p.shuffles} (${p.why})")
        else None,
        if (!joins.subsetOf(p.joins))
          Some(s"${p.q.name}: joins $joins outside pinned ${p.joins} (${p.why})")
        else None).flatten
      errs
    }
    assert(problems.isEmpty, problems.mkString("\n"))
    // the q24 poison-shape pin, specifically: no operator line may carry a
    // percentile sketch keyed by the distinct column (the single-distinct
    // rewrite's per-key-sketch trap, measured 17s vs 0.9s at sf0.1)
    val q24plan = graft.operators.Relational.q24.fn(spark, sf)
      .queryExecution.executedPlan.toString
    val keysRe = "keys=\\[([^\\]]*)\\]".r
    assert(!q24plan.linesIterator.exists { l =>
      l.contains("percentile_approx") &&
        keysRe.findFirstMatchIn(l).exists(_.group(1).contains("l_partkey"))
    }, s"percentile sketch must never aggregate under the distinct key:\n$q24plan")
  }

  test("salted join equals the direct join on a skewed key; salt reaches the join keys") {
    import org.apache.spark.sql.functions._
    // 60% of fact rows on one key; dim too small to matter for broadcast
    // here — the pinned property is row-identity + salt participating in
    // the join, which holds under any join strategy
    val fact = spark.range(0, 50000)
      .select(when(col("id") % 100 < 60, lit(7L)).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
    val dim = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
    val direct = fact.join(dim, "k")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Scale.saltedJoin(fact, dim, "k", salts = 8)
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
    val plan = Scale.saltedJoin(fact, dim, "k", 8).queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"salt must participate in the join keys:\n$plan")
  }

  test("bloom-prefiltered join equals the direct join; the prefilter actually prunes") {
    import org.apache.spark.sql.functions._
    // dim keys are a sparse 1% slice of the fact key space: most fact
    // rows must die at the prefilter, before any shuffle
    val fact = spark.range(0, 100000).select((col("id") % 10000).as("k"), col("id").as("v"))
    val dim = spark.range(0, 100).select((col("id") * 97).as("k"), col("id").as("w"))
    val direct = fact.join(dim, Seq("k"))
      .agg(count(lit(1)), sum(col("v") + col("w")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val bloomed = Scale.bloomPrefilteredJoin(fact, dim, "k", expectedItems = 100)
      .agg(count(lit(1)), sum(col("v") + col("w")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(bloomed == direct, "prefilter must never change the join result")
    // and the filter itself prunes: survivors ~1% of fact (+ fp margin)
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.GraftBridge
    val bf = dim.select(xxhash64(col("k")).as("__h")).stat.bloomFilter("__h", 100, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val survivors = fact.filter(GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(lit(bos.toByteArray)),
      GraftBridge.expression(xxhash64(col("k")))))).count()
    assert(survivors < 5000, s"prefilter should cut ~99% of 100k fact rows, kept $survivors")
  }

  test("salted aggregation equals direct aggregation on a skewed column") {
    import org.apache.spark.sql.functions._
    val l = Tables.lineitem(spark, sf)
    val direct = l.groupBy(col("l_returnflag").as("k"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("t"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    val salted = Scale.saltedSum(l, col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)"), salts = 16)
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
