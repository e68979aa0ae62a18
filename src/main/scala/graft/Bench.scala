package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line the driver parses.
  *
  * Each query executes its full physical plan into the noop sink
  * (`format("noop")`) — unlike `count()`, this cannot let Catalyst prune the
  * projection/window work out of select-heavy plans, so the measured time is
  * the time a real consumer would pay. Failures are recorded per query
  * (negative sentinel + err map) instead of being swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Preflight.sweepStaleTemp().foreach(System.err.println)
    Preflight.report(spark, sfDir).foreach(System.err.println)

    def jsonEsc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    // Warm the session (codegen, parquet footer cache, executor pool) so
    // JVM/session startup isn't charged to whichever query runs first.
    try SparkEntry.registry.headOption.foreach(
      _.fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }

    // Median-of-3 per query: single-shot timings on a shared box are
    // variance-exposed (an official round once recorded 108 s for a query
    // that re-measures at 1.4 s — GC/machine-load flukes, not plan cost).
    // The median absorbs one outlier rep AND the per-query cold start
    // (first-rep codegen + parquet footer reads) without a separate
    // warm-up pass.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Dev-loop subset: SPARK_GRAFT_BENCH_ONLY="q24_approx_sketches,q103_..."
    // times just those queries. Unset (the driver's invocation) = full run.
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    val selected =
      if (only.isEmpty) SparkEntry.registry
      else SparkEntry.registry.filter(q => only(q.name))
    var errs = List.empty[(String, String)]
    val results = selected.map { q =>
      val times = (1 to reps).flatMap { _ =>
        if (errs.exists(_._1 == q.name)) None // failed once: don't retry
        else {
          val t0 = System.nanoTime()
          try {
            q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              errs ::= (q.name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
              None
          }
        }
      }
      // lower median: true median for 3 reps, best-of for 2, the value for 1
      val secs =
        if (times.isEmpty) -1.0
        else times.sorted.apply((times.size - 1) / 2)
      // max/min rep ratio: the per-query variance evidence (a ratio near 1
      // means the median is trustworthy; a large one flags machine noise)
      val spread =
        if (times.size < 2 || times.min <= 0) 1.0 else times.max / times.min
      (q.name, secs, spread)
    }
    val qs = results.map { case (k, v, _) => "\"" + jsonEsc(k) + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, _, sp) => "\"" + jsonEsc(k) + "\":" + f"$sp%.2f" }
      .mkString("{", ",", "}")
    val errJson = errs.map { case (k, v) => "\"" + jsonEsc(k) + "\":\"" + jsonEsc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v > 0 => v }.sum
    // dev loop: an explicit SPARK_GRAFT_BENCH_STREAM_ROWS forces the
    // streaming block even under a BENCH_ONLY subset run
    val streaming =
      if (only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_STREAM_ROWS"))
        streamingJson(spark)
      else "{}"
    val streamJoin =
      if (only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_JOIN_ROWS"))
        streamJoinJson(spark)
      else "{}"
    val writers =
      if (only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_WRITERS"))
        writersJson(spark)
      else "{}"
    val trickle =
      if (only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_TRICKLE"))
        trickleDeleteJson(spark)
      else "{}"
    val dvScan =
      if (only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_DVSCAN"))
        dvScanJson(spark)
      else "{}"
    // one-time costs measured outside the per-query medians (q64's first
    // rep pays the bucket CTAS; reps 2+ reuse the tables, so the median
    // is the zero-Exchange join itself)
    val setup = f"""{"q64_bucket_ctas_sec":${graft.operators.Scale.bucketCtasSeconds}%.3f,"q214_jdbc_seed_sec":${graft.sinks.SinkQueries.jdbcSeedSeconds}%.3f}"""
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"rep_spread":$spreads%s,"errors":$errJson%s,"streaming":$streaming%s,"stream_join":$streamJoin%s,"writers":$writers%s,"trickle_delete":$trickle%s,"dv_scan":$dvScan%s,"setup":$setup%s,"sf":"$sfDir%s"}"""
    println(line)
    // The full line above is ~21 KB at 334 queries, and the driver archives
    // only a ~2,000-char stdout TAIL — every BENCH_r12..r16 stored a tail
    // that starts mid-line and parsed as null, which cost five rounds their
    // per-query ground truth. The LAST stdout line is therefore a compact
    // summary guaranteed to fit that capture window (total, per-tier
    // subtotals, error names); the per-query map stays in the full line
    // and in target/bench.json / target/bench_c<cpus>.json on disk.
    // ≤20 names keeps the compact line under the capture window even in a
    // catastrophic run; n_errors still reports the true count
    val errNames = errs.take(20).map(e => "\"" + jsonEsc(e._1) + "\"").mkString("[", ",", "]")
    val slowest = results.filter(_._2 > 0).sortBy(-_._2).take(10)
      .map { case (k, v, _) => "\"" + jsonEsc(k) + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    def tierSum(prefix: String => Boolean): Double =
      results.collect { case (k, v, _) if v > 0 && prefix(k) => v }.sum
    val lakeSec = tierSum(k => k >= "q294" && k <= "q335z")
    val compact = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.size}%d,"n_errors":${errs.size}%d,"errors":$errNames%s,"lake_sec":$lakeSec%.3f,"slowest":$slowest%s,"full_json":"target/bench.json","cpus":$cpus%s,"sf":"$sfDir%s"}"""
    // stdout insurance (r07: a clean run still archived as `parsed: null`
    // because the driver keeps only a short stdout tail and the timing map
    // prints first) — the full JSON always lands on disk too, and per-cpus
    // so a c8 scaling run no longer overwrites the c32 artifact
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, line + "\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"target/bench_c$cpus.json"), line + "\n")
      System.err.println(s"[bench] json also written to ${out.toAbsolutePath} and target/bench_c$cpus.json")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: $e")
    }
    println(compact)
    spark.stop()
  }

  /** Best-effort recursive delete of a bench-block temp table: the
    * blocks write multi-GB scratch tables (bloom filters make even tiny
    * bucket files ~1 MB each), and two bench invocations in one session
    * MEASURABLY filled the disk before the next run's stale-temp sweep
    * could help — each block reclaims its own scratch. */
  private def rmTree(root: String): Unit =
    try {
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        finally s.close()
      }
    } catch { case _: Throwable => () }

  /** TRICKLE-DELETE economics, measured: N single-row DELETEs against
    * two identical lake tables — one merge-on-read (deletion-vector
    * sidecars), one copy-on-write (bucket rewrites) — reporting wall
    * per statement and BYTES WRITTEN under each table's data dir. The
    * dv design's O(keys)-vs-O(bucket-bytes) claim as an artifact number
    * instead of architecture prose: MoR bytes-written should sit orders
    * of magnitude under CoW (each CoW statement rewrites its whole
    * touched bucket; each MoR statement writes a one-key parquet +
    * manifest edit, data files byte-identical). */
  private def trickleDeleteJson(spark: SparkSession): String = {
    import org.apache.spark.sql.functions._
    import graft.sinks.ManifestUpsertSink
    try {
      val rows = 200000L
      val buckets = 16
      val deletes = 50
      def dirBytes(root: String): Long = {
        val p = java.nio.file.Paths.get(root, "data")
        if (!java.nio.file.Files.exists(p)) 0L
        else {
          val s = java.nio.file.Files.walk(p)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        }
      }
      def seed(prefix: String): (ManifestUpsertSink, String) = {
        val root = java.nio.file.Files.createTempDirectory(prefix).toString
        val sink = new ManifestUpsertSink(root, "id", buckets)
        sink.upsertBatch(
          spark.range(rows).select(col("id"),
            sha2(col("id").cast("string"), 256).as("payload"),
            lit(0L).as("seq")),
          "seq", 0L)
        (sink, root)
      }
      val (morSink, morRoot) = seed("graft_bench_trickle_mor_")
      val (cowSink, cowRoot) = seed("graft_bench_trickle_cow_")
      import spark.implicits._
      def phase(f: Long => Unit, root: String): (Double, Long) = {
        val base = dirBytes(root)
        val t0 = System.nanoTime()
        // spread across buckets: consecutive ids hash to distinct buckets
        (1L to deletes.toLong).foreach(k => f(k * 37L))
        ((System.nanoTime() - t0) / 1e9, dirBytes(root) - base)
      }
      val (morSecs, morBytes) = phase(
        k => morSink.deleteKeysMergeOnRead(Seq(k).toDF("id"), ManifestUpsertSink.AdHocBatch),
        morRoot)
      val (cowSecs, cowBytes) = phase(
        k => cowSink.deleteKeys(Seq(k).toDF("id"), ManifestUpsertSink.AdHocBatch),
        cowRoot)
      // zero lost rows: both tables agree and dropped exactly `deletes`
      val morCount = morSink.read(spark).count()
      val cowCount = cowSink.read(spark).count()
      val ok = morCount == rows - deletes && cowCount == rows - deletes
      rmTree(morRoot); rmTree(cowRoot)
      f"""{"rows":$rows,"deletes":$deletes,"mor":{"secs":$morSecs%.3f,"sec_per_delete":${morSecs / deletes}%.4f,"bytes_written":$morBytes},"cow":{"secs":$cowSecs%.3f,"sec_per_delete":${cowSecs / deletes}%.4f,"bytes_written":$cowBytes},"cow_over_mor_bytes":${if (morBytes > 0) cowBytes.toDouble / morBytes else -1.0}%.1f,"rows_exact":${if (ok) 1 else 0}}"""
    } catch { case e: Throwable =>
      s"""{"err":"${e.getClass.getSimpleName}"}"""
    }
  }

  /** DV-FOLD distribution at bucket-count scale: full scans of dv'd
    * tables at increasing bucket counts (same total rows and dv keys),
    * reporting scan wall and the SERIALIZED READER-FACTORY SIZE — the
    * per-task closure cost. The r14 finding was a global driver key
    * array shipped in every task closure (O(total dv keys) per task,
    * growing with bucket count × cap); the broadcast fold's factory
    * bytes must stay FLAT as buckets grow. */
  private def dvScanJson(spark: SparkSession): String = {
    import org.apache.spark.sql.functions._
    import graft.sinks.ManifestUpsertSink
    try {
      import spark.implicits._
      val rows = 64000L
      val dvKeys = 2048L
      val points = Seq(16, 64, 256).map { buckets =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_bench_dvscan_${buckets}_").toString
        val sink = new ManifestUpsertSink(root, "id", buckets)
        sink.upsertBatch(
          spark.range(rows).select(col("id"),
            (col("id") * 3).as("v"), lit(0L).as("seq")),
          "seq", 0L)
        sink.deleteKeysMergeOnRead(spark.range(dvKeys).select(col("id")), 1L)
        graft.sources.ManifestSource.DvFoldProbe.reset()
        // median of 3: the point is the dv fold's cost SHAPE vs bucket
        // count, not first-scan session effects (codegen, footer cache)
        def scanOnce(): (Double, Long) = {
          val t0 = System.nanoTime()
          val got = spark.read.format("graft-manifest").load(root)
            .agg(sum(col("v"))).head().getLong(0)
          ((System.nanoTime() - t0) / 1e9, got)
        }
        val runs = (1 to 3).map(_ => scanOnce())
        val secs = runs.map(_._1).sorted.apply(1)
        val got = runs.head._2
        val want = (0L until rows).map(_ * 3).sum - (0L until dvKeys).map(_ * 3).sum
        val factoryBytes = graft.sources.ManifestSource.DvFoldProbe.lastFactoryBytes
        val maxReader = graft.sources.ManifestSource.DvFoldProbe.maxReaderKeys
        // control: the same file layout scanned WITHOUT the fold (plain
        // parquet over the data files) — attributes the per-file cost of
        // many small files to the layout, not the dv machinery
        val ctrl = {
          val m = graft.sinks.ManifestUpsertSink.latestManifest(root).get
          val t0 = System.nanoTime()
          spark.read.parquet(m.files.map(_.path): _*).agg(sum(col("v"))).head()
          (System.nanoTime() - t0) / 1e9
        }
        rmTree(root)
        f"""{"buckets":$buckets,"scan_sec":$secs%.3f,"plain_parquet_sec":$ctrl%.3f,"factory_bytes":$factoryBytes,"max_reader_keys":$maxReader,"correct":${if (got == want) 1 else 0}}"""
      }
      s"""{"rows":$rows,"dv_keys":$dvKeys,"points":[${points.mkString(",")}]}"""
    } catch { case e: Throwable =>
      s"""{"err":"${e.getClass.getSimpleName}"}"""
    }
  }

  /** CONCURRENT-WRITER bench, two phases against one lake table:
    *
    *  - DISJOINT: each of N writers owns 1/N of the BUCKETS (keys
    *    filtered by the same pmod(xxhash64) the sink routes on), so
    *    concurrent commits race only on the manifest rename and resolve
    *    by REBASE — the parallel-ingest throughput path. Deterministic
    *    end state: every key's last writer is its owner, final seq =
    *    the owner's last commit.
    *  - CONTENDED: every writer hammers one shared key range, so every
    *    pair of in-flight commits is a TRUE conflict — losers abort,
    *    recompute from the fresh snapshot, retry until committed. The
    *    table serializes; the end state is one whole committed batch
    *    (all shared keys carry a single seq).
    *
    * Reports commits/s, the internal rebase count (ManifestUpsertSink
    * .rebaseRetries delta) and caller-level conflict retries, plus a
    * zero-lost-updates invariant per phase (row count + seq checksum /
    * single-batch-wins). The OCC protocol itself is spec-pinned by
    * ManifestConcurrencySpec; this block is its measured throughput. */
  private def writersJson(spark: SparkSession): String = {
    import org.apache.spark.sql.functions._
    import graft.sinks.ManifestUpsertSink
    val nWriters = sys.env.getOrElse("SPARK_GRAFT_BENCH_WRITERS", "4").toInt
    if (nWriters <= 0) return "{}"
    val buckets = 16
    val commitsPer = 4
    try {
      // ---- phase 1: bucket-disjoint writers (rebase path)
      val root1 = java.nio.file.Files.createTempDirectory("graft_bench_wrd_").toString
      val keys = 20000L
      val perW = buckets / nWriters
      val rebase0 = ManifestUpsertSink.rebaseRetries.get()
      val conflicts1 = new java.util.concurrent.atomic.AtomicLong(0)
      val t1 = System.nanoTime()
      val phase1 = (0 until nWriters).map { w =>
        new Thread(() => {
          val sink = new ManifestUpsertSink(root1, "id", buckets)
          val mine = spark.range(keys).where(
            pmod(xxhash64(col("id")), lit(buckets.toLong))
              .between(w * perW, w * perW + perW - 1))
          for (c <- 0 until commitsPer) {
            val batch = mine.select(col("id"), lit(c.toLong).as("seq"),
              concat(lit(s"w$w-c$c-"), col("id")).as("payload"))
            var done = false
            while (!done) {
              try { sink.upsertBatch(batch, "seq", ManifestUpsertSink.AdHocBatch); done = true }
              catch { case _: IllegalStateException => conflicts1.incrementAndGet(); () }
            }
          }
        }, s"bench-wrd-$w")
      }
      phase1.foreach(_.start()); phase1.foreach(_.join())
      val secs1 = (System.nanoTime() - t1) / 1e9
      val rebases = ManifestUpsertSink.rebaseRetries.get() - rebase0
      // deterministic end state: all keys present once, every key's final
      // seq is its owner's LAST commit (owners are the only writers of
      // their buckets) — any deviation is a lost update
      val fin1 = ManifestUpsertSink.read(spark, root1)
        .agg(count(lit(1)), sum(col("seq")), countDistinct(col("id"))).head()
      val lost1 = fin1.getLong(0) != keys || fin1.getLong(2) != keys ||
        fin1.getLong(1) != keys * (commitsPer - 1)

      // ---- phase 2: fully-contended writers (abort/retry path).
      // 2 commits per writer: total contention serializes commits and
      // each abort recomputes a full merge, so the phase costs
      // O(attempts x merge) wall-clock — 8 commits with ~2x retry
      // amplification demonstrates the protocol without dominating the
      // bench's wall budget
      val contendedCommits = 2
      val root2 = java.nio.file.Files.createTempDirectory("graft_bench_wrc_").toString
      val sharedRows = 2000L
      val conflicts2 = new java.util.concurrent.atomic.AtomicLong(0)
      val committed2 = new java.util.concurrent.atomic.AtomicLong(0)
      val t2 = System.nanoTime()
      val phase2 = (0 until nWriters).map { w =>
        new Thread(() => {
          val sink = new ManifestUpsertSink(root2, "id", buckets)
          for (c <- 0 until contendedCommits) {
            val batch = spark.range(sharedRows).select(col("id"),
              lit((c * 10 + w).toLong).as("seq"),
              concat(lit(s"s$w-c$c-"), col("id")).as("payload"))
            var done = false
            while (!done) {
              try {
                sink.upsertBatch(batch, "seq", ManifestUpsertSink.AdHocBatch)
                done = true; committed2.incrementAndGet(); ()
              } catch {
                case e: IllegalStateException
                    if Option(e.getMessage).exists(m =>
                      m.contains("true write conflict") || m.contains("rebase attempts")) =>
                  conflicts2.incrementAndGet(); ()
              }
            }
          }
        }, s"bench-wrc-$w")
      }
      phase2.foreach(_.start()); phase2.foreach(_.join())
      val secs2 = (System.nanoTime() - t2) / 1e9
      // commits serialize under total contention: the final state must be
      // exactly ONE whole committed batch — every shared key present once,
      // all carrying a single seq (a torn mix of two batches = lost update)
      val fin2 = ManifestUpsertSink.read(spark, root2)
        .agg(count(lit(1)), countDistinct(col("seq"))).head()
      val lost2 = fin2.getLong(0) != sharedRows || fin2.getLong(1) != 1L

      val nCommits = nWriters.toLong * commitsPer
      rmTree(root1); rmTree(root2)
      f"""{"writers":$nWriters,"disjoint":{"commits":$nCommits,"rebases":$rebases,"conflict_retries":${conflicts1.get()},"secs":$secs1%.3f,"commits_per_sec":${nCommits / secs1}%.3f,"lost_updates":${if (lost1) 1L else 0L}},"contended":{"commits":${committed2.get()},"conflict_retries":${conflicts2.get()},"secs":$secs2%.3f,"commits_per_sec":${committed2.get() / secs2}%.3f,"lost_updates":${if (lost2) 1L else 0L}}}"""
    } catch {
      case e: Throwable =>
        s"""{"writers":$nWriters,"err":"${e.getClass.getSimpleName}"}"""
    }
  }

  /** Streaming throughput micro-bench: the Engine's ingest path — records
    * source → two-level JSON parse → date-partitioned gzip line sink —
    * timed end to end over a generated seq-named log, so a regression in
    * the connector, the parse pipeline, or the sink commit cycle moves a
    * NUMBER round over round instead of hiding behind batch-only timings.
    * Wiring mirrors Engine.start() verbatim (same rename/select), and the
    * sunk row count is re-read after the clock stops: silent row loss
    * shows up as sunk != rows, not as a faster-looking run. */
  private def streamingJson(spark: SparkSession): String = {
    import org.apache.spark.sql.functions._
    // 200k default: at 50k the number was ~70% one-time cost (query
    // start + cold codegen + planning, ~1.6 s — see the dur/startup
    // fields), i.e. it measured JVM startup, not the pipeline. 200k puts
    // the pipeline in the numerator while keeping the block bounded; the
    // breakdown fields keep the fixed costs attributable either way.
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAM_ROWS", "200000").toInt
    if (n <= 0) return "{}"
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_bench_stream_").toString
      val logDir = s"$dir/log"
      val epoch0 = 1704103500000L
      val raw = spark.range(n).select(
        lpad(col("id").cast("string"), 56, "0").as("sequenceNumber"),
        to_json(struct(
          (lit(epoch0) + col("id")).as("epoch"),
          to_json(struct(
            concat(lit("id-"), col("id")).as("id"),
            concat(lit("http://bench/p"), col("id") % 100).as("url"),
            (lit(epoch0) + col("id")).as("t"))).as("body"))).as("data"),
        timestamp_millis(lit(epoch0) + col("id")).as("ts"))
      graft.sinks.LineFileSink.writeSeqNamed(raw, logDir, col("ts"), maxRecordsPerFile = 5000)

      // TWO modes over the same 40-chunk log (r07 ask #4):
      //  - sustained (top-level): maxChunksPerTrigger caps each micro-batch
      //    at 4 chunks, driving ~10 batches through the trigger + sink
      //    commit cycle, so rotation/commit cadence under sustained load is
      //    MEASURED — steady_rows_per_sec drops batch 0 (cold codegen) and
      //    p50/p95 are per-batch triggerExecution latencies. Per-batch
      //    planning + offset listing ride the number honestly; at the 10 ms
      //    bench trigger they are a visible tax, at a production T1
      //    interval they amortize (see "dur").
      //  - burst (nested): one drain-everything batch — the round-over-
      //    round comparable number every prior round reported.
      val chunksPerTrigger =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAM_CHUNKS_PER_TRIGGER", "4").toInt
      val sustained = runStream(spark, logDir, s"$dir/sus", n, chunksPerTrigger)
      val burst = runStream(spark, logDir, s"$dir/burst", n, -1)
      sustained.dropRight(1) + s""","burst":$burst}"""
    } catch {
      case e: Throwable =>
        s"""{"rows":$n,"err":"${e.getClass.getSimpleName}"}"""
    }
  }

  /** One end-to-end run of the ingest pipeline over an existing seq-named
    * log: records source (optionally chunk-capped per trigger) → two-level
    * JSON parse → date-partitioned gzip line sink. Wiring mirrors
    * Engine.start() verbatim; the sunk row count is re-read after the
    * clock stops, so silent row loss shows up as sunk != rows. */
  private def runStream(spark: SparkSession, logDir: String, workDir: String,
      n: Int, chunksPerTrigger: Int): String = {
    val (outDir, ckpt) = (s"$workDir/out", s"$workDir/ckpt")
    // live /stats over the sustained run: the reference README publishes a
    // sample payload (README.md:20-50); the bench artifact carries OURS,
    // fetched over HTTP from the real K4 server while the stream runs —
    // listener, EWMA meters, histograms, and routes all exercised live
    val statsPair = if (chunksPerTrigger > 0) {
      val m = new graft.stats.StreamMetrics
      spark.streams.addListener(m)
      val srv = new graft.stats.StatsServer(0, "graft-bench", m)
      Some((m, srv, srv.start()))
    } else None
    val t0 = System.nanoTime()
    val reader = spark.readStream.format("graft-records")
    val src0 = (if (chunksPerTrigger > 0)
        reader.option("maxChunksPerTrigger", chunksPerTrigger)
      else reader).load(logDir)
    // a chunk-capped trigger reads one partition per gzip chunk (gzip is
    // not splittable), so a 4-chunk micro-batch parses on 4 of 32 cores.
    // A fan-out repartition before the parse was MEASURED WORSE at this
    // batch size (steady 68k vs 96k rows/s: the extra stage + shuffle
    // costs more than the idle cores save on ~60 ms of task compute) —
    // the knob stays for re-measuring at other shapes, default off
    val fanout = sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAM_FANOUT", "0").toInt
    val src = if (fanout > 0) src0.repartition(fanout) else src0
    val parsed = graft.streaming.EventStream.parse(src)
      .withColumnRenamed("id", "sequenceNumber")
      .selectExpr("sequenceNumber", "orig_data AS data",
        "coalesce(ts, current_timestamp()) AS ts")
    // 10 ms trigger: the bench measures the PIPELINE, so idle trigger
    // ticks (processAllAvailable needs a confirming empty cycle) must
    // not ride the number; production picks its own interval (T1)
    val q = graft.streaming.EventStream.startLineFileSink(
      parsed, outDir, ckpt, intervalMs = 10L)
    val tStarted = System.nanoTime()
    q.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    // per-batch truth from the progress log: compute-only throughput
    // (addBatch wall time over non-empty batches) separates the
    // pipeline's marginal rate from query-start + planning overhead
    val allProg = q.recentProgress
    val prog = allProg.filter(_.numInputRows > 0)
    val addBatchMs = prog.map(p =>
      Option(p.durationMs.get("addBatch")).map(_.longValue).getOrElse(0L)).sum
    val nBatches = prog.length
    // per-batch latency distribution + steady-state rate: batch 0 pays
    // codegen/planning cold starts, so the sustained numbers drop it
    val batchMs = prog.map(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
    def pct(p: Double): Long =
      if (batchMs.isEmpty) 0L
      else batchMs.sorted.apply(math.min(batchMs.size - 1,
        math.ceil(p * batchMs.size).toInt - 1).max(0))
    val steady = prog.drop(1)
    val steadyRows = steady.map(_.numInputRows).sum
    val steadyMs = steady.map(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)).sum
    val steadyRps = if (steadyMs > 0) steadyRows * 1000.0 / steadyMs else 0.0
    // phase sums over ALL cycles (incl. the empty confirm batch):
    // where non-pipeline wall time goes, so a planning/commit
    // regression is attributable instead of folded into rows_per_sec
    val phases = Seq("triggerExecution", "addBatch", "walCommit",
      "queryPlanning", "getBatch", "latestOffset", "commitOffsets")
    val phaseJson = phases.map { ph =>
      val ms = allProg.map(p =>
        Option(p.durationMs.get(ph)).map(_.longValue).getOrElse(0L)).sum
      f""""$ph%s":${ms / 1e3}%.3f"""
    }.mkString("{", ",", "}")
    // fetch the live payload BEFORE stopping the query (listener events
    // are async — give the last progress event a beat to land)
    val statsSample = statsPair.map { case (m, srv, port) =>
      try {
        Thread.sleep(200)
        val in = new java.net.URL(s"http://127.0.0.1:$port/stats").openStream()
        val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        body.replaceAll("\\s*\\n\\s*", "") // one-line bench JSON contract
      } finally { srv.stop(); spark.streams.removeListener(m) }
    }
    q.stop()
    val startupSec = (tStarted - t0) / 1e9
    val sunk = graft.sinks.LineFileSink.read(spark, outDir).count()
    val statsField = statsSample.map(s => s""""stats_sample":$s,""").getOrElse("")
    f"""{$statsField%s"rows":$n,"sunk":$sunk,"sec":$sec%.3f,"rows_per_sec":${n / sec}%.0f,""" +
      f""""batches":$nBatches,"add_batch_sec":${addBatchMs / 1e3}%.3f,""" +
      f""""pipeline_rows_per_sec":${if (addBatchMs > 0) n * 1000.0 / addBatchMs else 0.0}%.0f,""" +
      f""""steady_rows_per_sec":$steadyRps%.0f,""" +
      f""""batch_p50_sec":${pct(0.5) / 1e3}%.3f,"batch_p95_sec":${pct(0.95) / 1e3}%.3f,""" +
      f""""startup_sec":$startupSec%.3f,"dur":$phaseJson%s,"lake":${lakeJson(spark)}%s}"""
  }

  /** Stream-stream join topology, bench-visible end to end (the one
    * declared streaming shape previously exercised only in specs): TWO
    * kinesis-sim streams (the wire-schema double over seq-named chunk
    * logs) → two-level JSON parse each → watermarked INTERVAL JOIN
    * (event-time bound ±5 min, watermark 10 min — state provably
    * bounded) → exactly-once manifest MERGE sink. Runs in TWO phases
    * against one checkpoint: drain the first half of both logs, STOP,
    * append the second half, RESTART — the joined table must hold
    * exactly one row per key with zero duplicates, so checkpoint
    * recovery + the sink's replay guard are measured in the artifact,
    * not just asserted in StreamingSpec. */
  private def streamJoinJson(spark: SparkSession): String = {
    import org.apache.spark.sql.functions._
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_JOIN_ROWS", "100000").toInt
    if (n <= 0) return "{}"
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_bench_ssj_").toString
      val (leftLog, rightLog) = (s"$dir/left", s"$dir/right")
      val epoch0 = 1704103500000L
      // right-side events land 60 s after their left partner: inside the
      // ±5 min bound, so every key joins exactly once
      def log(path: String, lo: Int, hi: Int, skewMs: Long): Unit = {
        val raw = spark.range(lo, hi).select(
          lpad(col("id").cast("string"), 56, "0").as("sequenceNumber"),
          to_json(struct(
            (lit(epoch0) + col("id") + lit(skewMs)).as("epoch"),
            to_json(struct(
              concat(lit("id-"), col("id")).as("id"),
              concat(lit("http://bench/j"), col("id") % 100).as("url"),
              (lit(epoch0) + col("id") + lit(skewMs)).as("t"))).as("body"))).as("data"),
          timestamp_millis(lit(epoch0) + col("id") + lit(skewMs)).as("ts"))
        graft.sinks.LineFileSink.writeSeqNamed(raw, path, col("ts"),
          maxRecordsPerFile = 5000)
      }
      val root = s"$dir/joined"
      def runPhase(): Long = {
        val l = graft.streaming.EventStream.parse(graft.sources.Sources
            .fromKinesisWire(graft.sources.Sources.kinesisSim(spark, leftLog)))
          .select(col("id").as("k"), col("ts"))
        val r = graft.streaming.EventStream.parse(graft.sources.Sources
            .fromKinesisWire(graft.sources.Sources.kinesisSim(spark, rightLog, "enrich")))
          .select(col("id").as("r_k"), col("ts").as("r_ts"))
        val joined = graft.streaming.EventStream
          .intervalJoin(l, r, "k", watermark = "10 minutes", bound = "5 minutes")
          .select(col("k"), col("ts"), col("r_ts"),
            unix_millis(col("ts")).as("seq"))
        val t = System.nanoTime()
        val q = joined.writeStream.format("graft-manifest")
          .option("orderCol", "seq").option("keyCol", "k").option("buckets", "16")
          .option("checkpointLocation", s"$dir/ckpt")
          .start(root)
        try q.processAllAvailable() finally q.stop()
        System.nanoTime() - t
      }
      // phase 1: first half of both logs
      log(leftLog, 0, n / 2, 0L); log(rightLog, 0, n / 2, 60000L)
      val ns1 = runPhase()
      // phase 2: append the second half, RESTART from the checkpoint
      log(leftLog, n / 2, n, 0L); log(rightLog, n / 2, n, 60000L)
      val ns2 = runPhase()
      val out = graft.sinks.ManifestUpsertSink.read(spark, root)
      val joinedRows = out.count()
      val distinctKeys = out.select(col("k")).distinct().count()
      val sec = (ns1 + ns2) / 1e9
      f"""{"rows_per_side":$n,"joined_rows":$joinedRows,"distinct_keys":$distinctKeys,""" +
        f""""dupes":${joinedRows - distinctKeys},"sec":$sec%.3f,""" +
        f""""pairs_per_sec":${joinedRows / sec}%.0f,""" +
        f""""phase1_sec":${ns1 / 1e9}%.3f,"phase2_sec":${ns2 / 1e9}%.3f}"""
    } catch {
      case e: Throwable => s"""{"error":"${e.getClass.getSimpleName}"}"""
    }
  }

  /** Lake-streaming micro-bench: rows/s through (1) the exactly-once
    * streaming MERGE sink (`writeStream.format("graft-manifest")` — each
    * micro-batch is a full copy-on-write commit: LWW, CDC feed, footer
    * stats) and (2) CDC-APPLY replication (the whole change history of
    * that table re-applied into a mirror via the version-offset source
    * under Trigger.AvailableNow). These are COMMIT-bound paths, not
    * parse-bound like the ingest number above — the measure of what a
    * lake table costs per version at the bench's batch size, so a
    * protocol regression (stats pass, staging, rebase bookkeeping) moves
    * a number round over round. */
  private def lakeJson(spark: SparkSession): String = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 50k/10 versions: the per-COMMIT constant dominates at bench batch
    // sizes (the protocol cost is what this tracks — at production batch
    // sizes rows/s scales with the batch, the commit cost doesn't)
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_LAKE_ROWS", "50000").toInt
    val batches = 10
    if (n <= 0) return "{}"
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_bench_lake_").toString
      val root = s"$dir/table"
      val mirror = s"$dir/mirror"
      // --- (1) streaming MERGE: n rows over `batches` micro-batches,
      // ids hash-spread over an 80%-of-n keyspace so EVERY batch mixes
      // inserts with updates of keys earlier batches own (a plain modulo
      // would make batches 1..8 pure appends and 9-10 pure updates)
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
      val per = n / batches
      val q = input.toDF().select(
          pmod(col("value") * lit(2654435761L), lit((n * 0.8).toLong)).as("id"),
          concat(lit("payload-"), col("value")).as("p"),
          col("value").as("seq"))
        .writeStream.format("graft-manifest")
        .option("orderCol", "seq").option("keyCol", "id").option("buckets", "16")
        .option("checkpointLocation", s"$dir/ckpt_merge")
        .start(root)
      val t0 = System.nanoTime()
      try {
        for (b <- 0 until batches) {
          input.addData((b.toLong * per) until ((b + 1).toLong * per))
          q.processAllAvailable()
        }
      } finally q.stop()
      val mergeSec = (System.nanoTime() - t0) / 1e9
      val versions = graft.sinks.ManifestUpsertSink.snapshotManifest(root, None).version + 1
      // --- (2) CDC-APPLY replication: the table's whole history into a
      // mirror, drained by the version-offset source in one AvailableNow run
      val imgDdl = "id BIGINT, p STRING, seq BIGINT"
      val changeRows = spark.read.format("graft-manifest").load(root).count() // warm footer cache fairness
      val t1 = System.nanoTime()
      val rq = spark.readStream.format("graft-manifest")
        .option("changes", "true").load(root)
        .select(col("id"), col("change"), col("_version"),
          from_json(col("new_image"), imgDdl, Map.empty[String, String]).getField("p").as("p"),
          from_json(col("new_image"), imgDdl, Map.empty[String, String]).getField("seq").as("seq"))
        .writeStream.format("graft-manifest")
        .option("applyChanges", "true")
        .option("orderCol", "_version").option("keyCol", "id").option("buckets", "16")
        .option("checkpointLocation", s"$dir/ckpt_repl")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(mirror)
      val drained = try rq.awaitTermination(600000) finally rq.stop()
      if (!drained) return """{"error":"replication did not drain in 600s"}"""
      val replSec = (System.nanoTime() - t1) / 1e9
      val mirrorRows = graft.sinks.ManifestUpsertSink.read(spark, mirror).count()
      val srcRows = graft.sinks.ManifestUpsertSink.read(spark, root).count()
      f"""{"rows":$n,"versions":$versions,"merge_sec":$mergeSec%.3f,""" +
        f""""merge_rows_per_sec":${n / mergeSec}%.0f,""" +
        f""""replicate_sec":$replSec%.3f,"replicate_rows_per_sec":${n / replSec}%.0f,""" +
        f""""mirror_rows":$mirrorRows,"src_rows":$srcRows,"snapshot_rows":$changeRows}"""
    } catch {
      case e: Throwable =>
        s"""{"error":"${e.getClass.getSimpleName}"}"""
    }
  }
}
