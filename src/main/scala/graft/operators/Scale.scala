package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Scale techniques as first-class operators: skew-salted aggregation and
  * bucketed (pre-shuffled) joins. Both are *plan* transformations with
  * unchanged semantics, so both are oracle-checked against the plain
  * formulation's SQL. */
object Scale {

  /** Two-phase skew-safe aggregation: group by (key, salt) first (spreads
    * a hot key over `salts` reducers), then re-aggregate by key. For
    * algebraic aggregates (sum/count/min/max) the result is identical to
    * the direct groupBy; the win at scale is that no single reducer owns
    * a hot key's whole partition. (AQE's skew handling covers joins; this
    * is the aggregation-side equivalent, usable under any planner.) */
  def saltedSum(
      df: DataFrame, key: Column, value: Column, salts: Int): DataFrame = {
    val salted = df
      .select(key.as("k"), value.as("v"),
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("partial"), count(lit(1)).as("n_partial"))
    salted.groupBy(col("k"))
      .agg(sum(col("partial")).as("total"), sum(col("n_partial")).as("n"))
  }

  /** Skew-safe shuffled JOIN: salt the fact side (a deterministic or
    * random per-row salt both work — the salt never reaches the output),
    * replicate the dimension side `salts`× via explode, and equi-join on
    * (key, salt): a hot key's rows spread over `salts` reducers instead
    * of landing on one. Each fact row matches exactly the one dim copy
    * carrying its salt, so the result is row-identical to the unsalted
    * join (ScaleSpec pins that). Cost: the dim shuffles `salts`× larger —
    * the standard trade when the dim is too big to broadcast and AQE's
    * runtime skew split is unavailable (non-SMJ plans, older planners) or
    * insufficient (one key beyond any partition split). Use AQE first;
    * this is the explicit fallback. */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-prefiltered join — the runtime-filter pattern, explicit: build
    * a Bloom filter over the dim side's join keys (distributed aggregate;
    * the DRIVER receives only the O(bits) filter, ~1.2 MB per million
    * keys at 1% fpp — never data), embed it as a binary literal, and
    * prefilter the fact side with the codegen'd native
    * `BloomFilterMightContain` BEFORE the shuffle. Fact rows whose key
    * cannot match never serialize, never shuffle, never land in the
    * join's hash table; false positives are harmless (the exact equi-join
    * still runs behind the filter). This is what Spark's own
    * InjectRuntimeFilter does when its thresholds/shape checks allow it —
    * the explicit form works under any plan and any join strategy, and
    * pays off whenever the dim matches a small fraction of the fact
    * (selective dims, incremental loads, late-arriving corrections).
    * Keys of any type: both sides hash through xxhash64 so insert and
    * probe agree. */
  def bloomPrefilteredJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.GraftBridge
    val bf = dim.select(xxhash64(col(key)).as("__h")).stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val mightContain = GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(lit(bos.toByteArray)),
      GraftBridge.expression(xxhash64(col(key)))))
    fact.filter(mightContain).join(dim, Seq(key))
  }

  // ---------------------------------------------------------------- q63
  /** Salted aggregation equals the direct aggregation (the oracle IS the
    * direct formulation): revenue per returnflag through an 8-way salt.
    * Decimal accumulator keeps both phases engine-exact. */
  val q63 = QueryDef(
    "q63_salted_agg",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val salted = l.select(col("l_returnflag").as("k"),
          col("l_extendedprice").cast("decimal(18,2)").as("v"),
          pmod(col("l_orderkey"), lit(8)).as("salt"))
        .groupBy(col("k"), col("salt"))
        .agg(sum(col("v")).as("partial"), count(lit(1)).as("n_partial"))
      salted.groupBy(col("k"))
        .agg(sum(col("partial")).cast("double").as("total"),
          sum(col("n_partial")).as("n"))
        .select(col("k").as("l_returnflag"), col("total"), col("n"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Wall seconds the LAST bucketed-table build (CTAS) took in this
    * process — 0.0 until a build happens. Bench reports it as a separate
    * setup figure so q64's number measures the zero-Exchange join, not
    * the one-time pre-shuffle (which a real cluster amortizes over many
    * joins — that amortization is exactly what q64 demonstrates). */
  @volatile var bucketCtasSeconds: Double = 0.0

  // cache key of the build the warehouse currently holds (the table names
  // are fixed, so only ONE (session, dir, buckets) build can be live)
  @volatile private var bucketedFor: String = null

  /** Write both sides bucketed by the join key into the session warehouse
    * and return the bucketed tables — co-located join input (no exchange
    * on either side at join time; on a real cluster this is the
    * "pre-shuffle once, join many times" pattern). Built once per
    * (session, data dir, bucket count) per JVM: repeat callers — bench
    * reps, spec + query in one test JVM — reuse the tables, so only the
    * first call pays the CTAS. */
  def bucketedTables(s: SparkSession, d: String, buckets: Int): (DataFrame, DataFrame) = {
    val oTab = "graft_orders_bkt"
    val lTab = "graft_lineitem_bkt"
    val key = s"${System.identityHashCode(s)}:$d:$buckets"
    if (bucketedFor != key) synchronized {
      if (bucketedFor != key) {
        val t0 = System.nanoTime()
        // drop leftovers from previous sessions: the metastore forgets managed
        // tables across JVMs but their warehouse dirs survive and block CTAS
        Seq(oTab, lTab).foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $t")
          val loc = new java.io.File(s.conf.get("spark.sql.warehouse.dir")
            .stripPrefix("file:"), t)
          if (loc.exists()) {
            def rm(f: java.io.File): Unit = {
              if (f.isDirectory) f.listFiles().foreach(rm)
              f.delete()
            }
            rm(loc)
          }
        }
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(oTab)
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(lTab)
        bucketCtasSeconds = (System.nanoTime() - t0) / 1e9
        bucketedFor = key
      }
    }
    (s.table(oTab), s.table(lTab))
  }

  // ---------------------------------------------------------------- q64
  /** Bucketed co-located join: both fact tables pre-bucketed on the join
    * key, joined without a shuffle on either side (ScaleSpec asserts the
    * plan has no ShuffleExchange below the join). Result is
    * oracle-checked against the plain join. */
  val q64 = QueryDef(
    "q64_bucketed_join",
    (s, d) => {
      val (o, l) = bucketedTables(s, d, 8)
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q112
  /** RANGE JOIN WITHOUT AN EQUI KEY, made scalable by binning — the
    * interval-join technique Spark's planner lacks natively (a bare
    * `v BETWEEN lo AND hi` join plans as BroadcastNestedLoopJoin, O(n·m)
    * row comparisons): quantize the domain into fixed-width bins, expand
    * each interval to the bins it covers (`sequence` + `explode`), map
    * each probe value to its one bin, and join on the BIN — an equi-join
    * — with the exact range predicate left as the join's residual filter.
    * Work drops from n·m comparisons to n + Σ bins-per-interval matches;
    * bin width trades expansion factor against residual selectivity.
    * Each (value, interval) match is found exactly once (the probe's own
    * bin), so no post-join dedup is needed. The 40-interval fixture side
    * broadcasts, but the plan's shape is the point: with a million
    * intervals the same query is a shuffled equi-join on bin — the
    * BNLJ never comes back (ScaleSpec's sweep enforces that). Overlapping
    * intervals (stride < width here) multi-count probes per interval —
    * interval semantics, not dedup leakage. */
  val q112 = QueryDef(
    "q112_range_join_binned",
    (s, d) => {
      val binW = 4.0
      val bands = s.range(40).select(
        col("id").cast("int").as("band_id"),
        (col("id") * 12.0).as("lo"),
        (col("id") * 12.0 + 20.0).as("hi"))
      val binned = bands.select(col("band_id"), col("lo"), col("hi"),
        explode(sequence(floor(col("lo") / binW).cast("long"),
          floor(col("hi") / binW).cast("long"))).as("bin"))
      val probes = Tables.events(s, d)
        .select(col("value"), floor(col("value") / binW).cast("long").as("bin"))
      probes.join(broadcast(binned), Seq("bin"))
        .filter(col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_value"))
        .orderBy(col("band_id"))
    },
    Some("""WITH bands AS (
        SELECT x AS band_id, x * 12.0 AS lo, x * 12.0 + 20.0 AS hi
        FROM generate_series(0, 39) t(x))
      SELECT band_id, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM bands b JOIN events e ON e.value >= b.lo AND e.value < b.hi
      GROUP BY band_id ORDER BY band_id"""),
    doc = "equi-join range join: intervals expand to covering bins, probes hash to one bin; O(n+matches), no BNLJ")

  // ---------------------------------------------------------------- q186
  /** Z-order (Morton) clustering + data-skipping audit — the data-LAYOUT
    * scale lever: at 100 TB the cheapest scan is the one min/max file
    * statistics prune before it starts. Three candidate layouts of the
    * events table are modeled as fixed range lattices over their write key
    * (exactly the file boundaries `repartitionByRange(key) +
    * sortWithinPartitions` produces): natural ingest order (files = day),
    * single-dimension user ranges, and a Morton curve interleaving 16 bits
    * of user_id with 16 bits of epoch-day. For a two-dimensional predicate
    * (a user band × a date window) the audit computes, per layout, how many
    * files — and how many ROWS, the real I/O metric — survive min/max
    * pruning. Z-order is the only layout whose files bound BOTH dimensions,
    * so its scanned fraction approaches the predicate's true selectivity;
    * each 1-D layout must scan every file of its unsorted dimension.
    *
    * Everything is integer bit math (shiftleft/shiftright/&), exact in both
    * engines; the audit itself is two cheap keyed aggregations per layout —
    * no global sort is ever performed (the lattice IS the sort's result,
    * addressed arithmetically). */
  val q186 = QueryDef(
    "q186_zorder_skipping",
    (s, d) => {
      val e = Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        expr("ts_ns div 86400000000000").as("dd"))
      val keyed = e.withColumn("zval",
        expr("""aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, b) ->
            acc + shiftleft(shiftright(user_id, b) & 1, 2 * b)
                + shiftleft(shiftright(dd, b) & 1, 2 * b + 1),
            acc -> acc)"""))
      val matched = broadcast(keyed
        .filter(col("user_id").between(32, 47) && col("dd").between(19728L, 19735L))
        .agg(count(lit(1)).as("rows_matched")))
      def audit(name: String, fileKey: Column): DataFrame =
        keyed.groupBy(fileKey.as("f"))
          .agg(count(lit(1)).as("rows_in_file"),
            min(col("user_id")).as("mnu"), max(col("user_id")).as("mxu"),
            min(col("dd")).as("mnd"), max(col("dd")).as("mxd"))
          .select(col("rows_in_file"),
            (col("mxu") >= 32 && col("mnu") <= 47
              && col("mxd") >= 19728L && col("mnd") <= 19735L).as("scan"))
          .agg(count(lit(1)).as("files_total"),
            sum(when(col("scan"), 1L).otherwise(0L)).as("files_scanned"),
            sum(when(col("scan"), col("rows_in_file")).otherwise(0L)).as("rows_scanned"))
          .select(lit(name).as("layout"), col("files_total"),
            col("files_scanned"), col("rows_scanned"))
      Seq(
        audit("1_natural_day", col("dd")),
        audit("2_user_range", expr("user_id div 8")),
        audit("3_zorder", expr("zval div 128")))
        .reduce(_ unionByName _)
        .crossJoin(matched)
        .orderBy(col("layout"))
    },
    Some("""WITH e AS (SELECT event_id, user_id,
          epoch_ns(ts) // 86400000000000 AS dd FROM events),
      keyed AS (SELECT *, CAST(list_sum([
            (((user_id >> b) & 1) << (2 * b)) + (((dd >> b) & 1) << (2 * b + 1))
            for b in range(16)]) AS BIGINT) AS zval FROM e),
      m AS (SELECT COUNT(*) AS rows_matched FROM keyed
        WHERE user_id BETWEEN 32 AND 47 AND dd BETWEEN 19728 AND 19735),
      lay AS (
        SELECT '1_natural_day' AS layout, dd AS f, user_id, dd AS d2 FROM keyed
        UNION ALL
        SELECT '2_user_range', user_id // 8, user_id, dd FROM keyed
        UNION ALL
        SELECT '3_zorder', zval // 128, user_id, dd FROM keyed),
      files AS (SELECT layout, f, COUNT(*) AS rows_in_file,
          MIN(user_id) AS mnu, MAX(user_id) AS mxu,
          MIN(d2) AS mnd, MAX(d2) AS mxd
        FROM lay GROUP BY layout, f)
      SELECT layout, COUNT(*) AS files_total,
        CAST(SUM(CASE WHEN mxu >= 32 AND mnu <= 47 AND mxd >= 19728 AND mnd <= 19735
          THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
        CAST(COALESCE(SUM(CASE WHEN mxu >= 32 AND mnu <= 47 AND mxd >= 19728 AND mnd <= 19735
          THEN rows_in_file ELSE 0 END), 0) AS BIGINT) AS rows_scanned,
        (SELECT rows_matched FROM m) AS rows_matched
      FROM files GROUP BY layout ORDER BY layout"""),
    doc = "Morton-curve layout vs 1-D layouts: min/max file pruning audit for a 2-D predicate")

  // --------------------------------------------------------------- q282
  /** Join-key skew advisor: the pre-flight census a pipeline runs before
    * picking a join strategy for a key it hasn't seen — per candidate
    * key, row count, distinct keys, the heaviest key's share, and the
    * recommended salt factor ⌈top1_count / avg_count⌉ (1 = no salting
    * needed; the factor saltedJoin/saltedSum above would take). Exactly
    * the numbers AQE's skew handling reads at runtime, surfaced ahead
    * of time so the layout decision (salt? broadcast? bucket?) can be
    * made once and encoded in the pipeline instead of rediscovered per
    * run.
    *
    * Scale shape: one (key) agg + one 1-row summary per candidate —
    * two keyed aggregations per audited column over its own table,
    * unioned at the |candidates|-row summary level. Integer throughout. */
  val q282 = QueryDef(
    "q282_skew_advisor",
    (s, d) => {
      def audit(tag: String, df: DataFrame, key: Column) =
        df.select(key.cast("string").as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("c"))
          .agg(sum(col("c")).as("rows"), count(lit(1)).as("n_keys"),
            max(col("c")).as("top1"))
          .select(lit(tag).as("key_col"), col("rows"), col("n_keys"),
            expr("top1 * 1000000 div rows").as("top1_ppm"),
            expr("cast(ceil(cast(top1 as double) * n_keys / rows) as bigint)").as("salt_factor"))
      audit("events.user_id", Tables.events(s, d), col("user_id"))
        .unionByName(audit("events.event_type", Tables.events(s, d), col("event_type")))
        .unionByName(audit("lineitem.l_orderkey", Tables.lineitem(s, d), col("l_orderkey")))
        .unionByName(audit("orders.o_custkey", Tables.orders(s, d), col("o_custkey")))
        .unionByName(audit("documents.source", Tables.documents(s, d), col("source")))
        .orderBy(col("key_col"))
    },
    Some("""WITH a AS (
        SELECT 'events.user_id' AS key_col, COUNT(*) AS c
          FROM events GROUP BY user_id),
      b AS (SELECT 'events.event_type' AS key_col, COUNT(*) AS c
          FROM events GROUP BY event_type),
      c AS (SELECT 'lineitem.l_orderkey' AS key_col, COUNT(*) AS c
          FROM lineitem GROUP BY l_orderkey),
      d AS (SELECT 'orders.o_custkey' AS key_col, COUNT(*) AS c
          FROM orders GROUP BY o_custkey),
      e AS (SELECT 'documents.source' AS key_col, COUNT(*) AS c
          FROM documents GROUP BY source),
      u AS (SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL
        SELECT * FROM c UNION ALL SELECT * FROM d UNION ALL SELECT * FROM e)
      SELECT key_col, CAST(SUM(c) AS BIGINT) AS rows, COUNT(*) AS n_keys,
        CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top1_ppm,
        CAST(ceil(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c)) AS BIGINT) AS salt_factor
      FROM u GROUP BY key_col ORDER BY key_col"""),
    doc = "join-key skew census + salt-factor recommendation per candidate key: the ahead-of-time layout decision AQE rediscovers per run")

  // --------------------------------------------------------------- q286
  /** Consistent-hashing reshard movement census: assign every user to a
    * shard via a hash ring (16 virtual nodes per shard, successor rule
    * with wraparound), then grow the ring 8 → 9 shards and measure how
    * many keys actually move — the property that makes consistent
    * hashing the resharding scheme (≈ 1/(n+1) of keys move, vs ~all
    * keys under mod-n). This is the distributed-systems math behind the
    * EngineSpec kinesis-sim resharding case, surfaced as an auditable
    * query; the same census drives shard-count planning for any keyed
    * sink. Ring positions and key positions come from the md5-conv
    * 32-bit trick (engine-identical); ties on a ring position break by
    * shard id via a composite pos·64+shard ordering key.
    *
    * Scale shape: the ring is a ≤144-row broadcast; assignment is one
    * keyed agg over keys × ring (constant fan-out per key, map-side
    * combinable); the movement census is a |shards|-row agg. */
  val q286 = QueryDef(
    "q286_consistent_hash_reshard",
    (s, d) => {
      import s.implicits._
      def ring(n: Int): DataFrame =
        (for (sh <- 0 until n; v <- 0 until 16) yield (sh, v)).toDF("shard", "v")
          .select(col("shard"),
            expr("cast(conv(substring(md5(concat(cast(shard as string), ':', cast(v as string))), 1, 8), 16, 10) as bigint)").as("pos"))
          .select(col("shard"), col("pos"), (col("pos") * 64 + col("shard")).as("ok"))
      val keys = Tables.events(s, d).select(col("user_id")).distinct()
        .withColumn("kp",
          expr("cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint)"))
      def assign(n: Int, out: String): DataFrame =
        keys.crossJoin(broadcast(ring(n)))
          .groupBy(col("user_id"), col("kp"))
          .agg(expr("min_by(shard, ok) FILTER (WHERE pos >= kp)").as("succ"),
            expr("min_by(shard, ok)").as("wrap"))
          .select(col("user_id"), coalesce(col("succ"), col("wrap")).as(out))
      assign(8, "shard_before").join(assign(9, "shard_after"), "user_id")
        .groupBy(col("shard_after"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("shard_before") =!= col("shard_after"), 1L).otherwise(0L)).as("moved_in"))
        .select(col("shard_after"), col("n_keys"), col("moved_in"),
          expr("moved_in * 1000000 div n_keys").as("moved_ppm"))
        .orderBy(col("shard_after"))
    },
    Some("""WITH r8 AS (SELECT s.range AS shard, v.range AS v,
          CAST(('0x' || substr(md5(s.range || ':' || v.range), 1, 8)) AS BIGINT) AS pos
        FROM range(8) s, range(16) v),
      r8k AS (SELECT shard, pos, pos * 64 + shard AS ok FROM r8),
      r9 AS (SELECT s.range AS shard, v.range AS v,
          CAST(('0x' || substr(md5(s.range || ':' || v.range), 1, 8)) AS BIGINT) AS pos
        FROM range(9) s, range(16) v),
      r9k AS (SELECT shard, pos, pos * 64 + shard AS ok FROM r9),
      k AS (SELECT DISTINCT user_id,
          CAST(('0x' || substr(md5(user_id::VARCHAR), 1, 8)) AS BIGINT) AS kp
        FROM events),
      a8 AS (SELECT user_id,
          COALESCE(arg_min(shard, ok) FILTER (WHERE pos >= kp), arg_min(shard, ok)) AS shard_before
        FROM k CROSS JOIN r8k GROUP BY user_id, kp),
      a9 AS (SELECT user_id,
          COALESCE(arg_min(shard, ok) FILTER (WHERE pos >= kp), arg_min(shard, ok)) AS shard_after
        FROM k CROSS JOIN r9k GROUP BY user_id, kp)
      SELECT shard_after, COUNT(*) AS n_keys,
        CAST(SUM(CASE WHEN shard_before <> shard_after THEN 1 ELSE 0 END) AS BIGINT) AS moved_in,
        CAST(SUM(CASE WHEN shard_before <> shard_after THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS moved_ppm
      FROM a8 JOIN a9 USING (user_id)
      GROUP BY shard_after ORDER BY shard_after"""),
    doc = "consistent-hash ring (16 vnodes/shard) reshard 8->9 movement census: ~1/(n+1) keys move, engine-identical ring positions, per-shard audit")

  val all: Seq[QueryDef] = Seq(q63, q64, q112, q186, q282, q286)
}
