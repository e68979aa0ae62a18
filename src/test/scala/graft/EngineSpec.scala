package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** S2/T4/K4 end-to-end: config parsing contract, then a full engine run —
  * JSON lines dropped into a source dir, engine parses and sinks them as
  * gzip line files, stats server answers /ping, /stats, / and 404s. */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("config: defaults mirror the reference; --s3-bucket is required; unknown option rejected") {
    assert(Config.parse(Seq()).isLeft, "missing bucket must be an error")
    assert(Config.parse(Seq("--s3-bucket", "b")).map(c => (c.port, c.batchSize, c.intervalSec))
      == Right((8989, 1000000L, 180L)))
    assert(Config.parse(Seq("--s3-bucket", "b", "--port", "7000", "--interval", "60"))
      .map(c => (c.port, c.intervalSec)) == Right((7000, 60L)))
    assert(Config.parse(Seq("--wat")).isLeft)
    assert(Config.parse(Seq("--s3-bucket", "b", "--source-format", "records"))
      .map(_.sourceFormat) == Right("records"))
    assert(Config.parse(Seq("--s3-bucket", "b", "--source-format", "nope")).isLeft)
    assert(Config.parse(Seq("--s3-bucket", "b", "--metrics-console", "100"))
      .map(_.metricsConsoleSec) == Right(Some(100L)))
    assert(graft.stats.MetricsBinding.consoleConf(100)(
      "spark.metrics.conf.*.sink.console.period") == "100")
  }

  test("engine end-to-end over the graft-records source: replayed log keeps original sequence numbers") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // a seq-named record log (what a previous engine run uploaded) ...
    val logDir = Files.createTempDirectory("graft_engine_rlog_").toString
    val body = """{\"id\": \"id-009\", \"url\": \"http://e/9\", \"t\": 1704103500000}"""
    val data = s"""{"epoch": 1704103500005, "body": "$body"}"""
    val seq9 = "9" * 56
    graft.sinks.LineFileSink.writeSeqNamed(
      Seq((seq9, data, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
        .toDF("sequenceNumber", "data", "ts"),
      logDir, col("ts"))
    // ... replayed through the engine with --source-format records
    val outDir = Files.createTempDirectory("graft_engine_rout_").toString
    val config = Config(
      port = 0, bucket = outDir, sourcePath = Some(logDir),
      sourceFormat = "records",
      checkpoint = Some(Files.createTempDirectory("graft_engine_rck_").toString),
      intervalSec = 1L)
    val engine = new Engine(spark, config)
    engine.start()
    try {
      engine.processAllAvailable()
      val sunk = graft.sinks.LineFileSink.read(spark,
        s"$outDir/${config.appName}/${config.streamName}").collect()
      assert(sunk.length == 1)
      // the ORIGINAL sequence number survives the replay (LWW-safe), and
      // the payload is the raw record data
      assert(sunk(0).getString(0) == seq9)
      assert(sunk(0).getString(1).contains("http://e/9"))
    } finally engine.stop()
  }

  test("kinesis wire-schema double: Engine output byte-identical to the graft-records run") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // one log, three records across two chunks
    val logDir = Files.createTempDirectory("graft_ksim_log_").toString
    def rec(i: Int): (String, String, java.sql.Timestamp) = {
      val body = s"""{\\"id\\": \\"id-00$i\\", \\"url\\": \\"http://e/$i\\", \\"t\\": ${1704103500000L + i}}"""
      (("" + i) * 56 take 56,
        s"""{"epoch": ${1704103500000L + i}, "body": "$body"}""",
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
    }
    graft.sinks.LineFileSink.writeSeqNamed(
      Seq(rec(1), rec(2), rec(3)).toDF("sequenceNumber", "data", "ts"),
      logDir, col("ts"), maxRecordsPerFile = 2)

    // wire shape sanity (batch scan of the double): the exact public
    // Kinesis connector schema, deterministic shard + arrival fields
    val wire = graft.sources.Sources.kinesisSimBatch(spark, logDir, "events")
    assert(wire.schema.fieldNames.toSeq ==
      Seq("data", "streamName", "partitionKey", "sequenceNumber", "approximateArrivalTimestamp"))
    val w = wire.orderBy(col("sequenceNumber")).collect()
    assert(w.length == 3)
    assert(w.forall(_.getString(1) == "events"))
    assert(w.forall(r => r.getString(2).startsWith("shard-")))
    assert(new String(w(0).getAs[Array[Byte]](0), "UTF-8").contains("http://e/1"))

    def runEngine(fmt: String): Seq[(String, String)] = {
      val outDir = Files.createTempDirectory(s"graft_ksim_${fmt.take(4)}_").toString
      val config = Config(
        port = 0, bucket = outDir, sourcePath = Some(logDir), sourceFormat = fmt,
        checkpoint = Some(Files.createTempDirectory("graft_ksim_ck_").toString),
        intervalSec = 1L)
      val engine = new Engine(spark, config)
      engine.start()
      try {
        engine.processAllAvailable()
        graft.sinks.LineFileSink.read(spark,
            s"$outDir/${config.appName}/${config.streamName}")
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      } finally engine.stop()
    }
    val viaRecords = runEngine("records")
    val viaKinesis = runEngine("kinesis-sim")
    assert(viaRecords.length == 3)
    assert(viaKinesis == viaRecords,
      "the Kinesis wire path must produce byte-identical sink output")
  }

  test("kinesis-sim resharding: restart with a changed shard count resumes from the checkpoint with no loss/dup, new shard map applies to new records only") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // A real Kinesis reshard (split/merge) changes the shard map between
    // consumer restarts; the source contract is that offsets (file-name
    // seqs) — not shard identities — drive resume, so records are neither
    // lost nor duplicated and only records READ AFTER the restart see the
    // new shard assignment. The double's deterministic shardOf makes the
    // expected assignment computable in the spec.
    val logDir = Files.createTempDirectory("graft_reshard_log_").toString
    val outDir = Files.createTempDirectory("graft_reshard_out_").toString
    val ckpt = Files.createTempDirectory("graft_reshard_ck_").toString
    def rec(i: Int): (String, String, java.sql.Timestamp) =
      (f"$i%056d", s"""{"epoch": ${1704103500000L + i}, "body": "b$i"}""",
        new java.sql.Timestamp(1704103500000L + i))
    def run(nShards: Int): Unit = {
      val q = spark.readStream.format("graft-kinesis-sim")
        .option("nShards", nShards.toString).load(logDir)
        .select(col("sequenceNumber"), col("partitionKey"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    graft.sinks.LineFileSink.writeSeqNamed(
      (1 to 4).map(rec).toDF("sequenceNumber", "data", "ts"),
      logDir, col("ts"), maxRecordsPerFile = 2)
    run(nShards = 4)
    // reshard: 4 -> 8 shards, plus new records arriving after the split
    graft.sinks.LineFileSink.writeSeqNamed(
      (5 to 8).map(rec).toDF("sequenceNumber", "data", "ts"),
      logDir, col("ts"), maxRecordsPerFile = 2)
    run(nShards = 8)
    val out = spark.read.parquet(outDir)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(out.map(_._1).toSeq == (1 to 8).map(i => f"$i%056d"),
      s"exactly-once across the reshard restart, got ${out.map(_._1).mkString(",")}")
    def shardOf(seq: String, n: Int) = s"shard-${math.floorMod(seq.hashCode, n)}"
    out.foreach { case (seq, pk) =>
      val n = if (seq.takeRight(2).toInt <= 4) 4 else 8
      assert(pk == shardOf(seq, n), s"$seq assigned $pk, expected ${shardOf(seq, n)} (n=$n)")
    }
  }

  test("T3 fail-stop at the Engine level: awaitTermination rethrows the batch failure; a restarted Engine resumes from the same checkpoint") {
    // Failure injection: a regular FILE squats where the first batch must
    // create its `year=2024` partition directory, so query START succeeds
    // (the sink root and _spark_metadata are fine) but the BATCH write
    // dies with "not a directory" — an fs-level fault in the upload path,
    // the class the reference fail-stops on (core.clj:135-139, 154-157).
    // (Permission bits can't induce this: specs run as root.)
    val srcDir = Files.createTempDirectory("graft_t3src_").toString
    val outDir = Files.createTempDirectory("graft_t3out_").toString
    val ckpt = Files.createTempDirectory("graft_t3ck_").toString
    val config = Config(
      port = 0, bucket = outDir, sourcePath = Some(srcDir),
      checkpoint = Some(ckpt), intervalSec = 1L)
    val sinkDir = java.nio.file.Paths.get(
      s"$outDir/${config.appName}/${config.streamName}")
    Files.createDirectories(sinkDir)
    val blocker = sinkDir.resolve("year=2024")
    Files.writeString(blocker, "file where the partition dir must go")

    val body = """{\"id\": \"id-007\", \"url\": \"http://e/7\", \"t\": 1704103500000}"""
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/a.json"),
      s"""{"epoch": 1704103500005, "body": "$body"}\n""")

    val e1 = new Engine(spark, config)
    e1.start()
    try {
      // awaitTermination is the T3 surface: it must RETHROW the cause,
      // not return cleanly (Main maps this throw to exit 2)
      val thrown = intercept[Throwable] { e1.awaitTermination() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(thrown).exists(_.getMessage != null),
        "failure cause must surface through awaitTermination")
    } finally e1.stop()

    // supervisor repairs the fault; a NEW Engine on the SAME checkpoint
    // replays the failed batch — the record written before the crash
    // lands without being re-added to the source
    Files.delete(blocker)
    val e2 = new Engine(spark, config)
    e2.start()
    try {
      e2.processAllAvailable()
      val sunk = graft.sinks.LineFileSink.read(spark,
        s"$outDir/${config.appName}/${config.streamName}").collect()
      assert(sunk.length == 1, "failed batch must replay exactly once after restart")
      assert(sunk(0).getString(1).contains("http://e/7"))
    } finally e2.stop()
  }

  test("--sink-layout seq: the engine emits the reference's exact K2 object keys + resume cursor") {
    val srcDir = Files.createTempDirectory("graft_seqlay_src_").toString
    val outDir = Files.createTempDirectory("graft_seqlay_out_").toString
    val config = Config(
      port = 0, bucket = outDir, sourcePath = Some(srcDir),
      checkpoint = Some(Files.createTempDirectory("graft_seqlay_ck_").toString),
      intervalSec = 1L, sinkLayout = "seq")
    assert(Config.parse(Seq("--s3-bucket", "b", "--sink-layout", "seq")).map(_.sinkLayout)
      == Right("seq"))
    assert(Config.parse(Seq("--s3-bucket", "b", "--sink-layout", "nope")).isLeft)
    val body = """{\"id\": \"id-002\", \"url\": \"http://e/2\", \"t\": 1704103500000}"""
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/a.json"),
      s"""{"epoch": 1704103500005, "body": "$body"}\n""")
    val engine = new Engine(spark, config)
    engine.start()
    try {
      engine.processAllAvailable()
      val sinkPath = s"$outDir/${config.appName}/${config.streamName}"
      // 2024-01-01 event time -> yyyy/MM/dd dir; file name = last seq
      val day = new java.io.File(s"$sinkPath/2024/01/01")
      assert(day.exists(), s"expected the reference's yyyy/MM/dd layout under $sinkPath")
      val names = day.listFiles().map(_.getName).filter(_.endsWith(".records.log.gz"))
      assert(names.length == 1 && names(0).dropRight(".records.log.gz".length).length == 56,
        s"file name must be the 56-char last-seq cursor, got ${names.toSeq}")
      assert(graft.sinks.LineFileSink.lastCursor(spark, sinkPath).isDefined,
        "key listing must serve as the resume cursor")
      val back = graft.sinks.LineFileSink.readSeqNamed(spark, sinkPath).collect()
      assert(back.length == 1 && back(0).getString(1).contains("http://e/2"))
    } finally engine.stop()
  }

  test("engine end-to-end: file source -> parse -> gzip line sink; stats routes live") {
    val srcDir = Files.createTempDirectory("graft_engine_src_").toString
    val outDir = Files.createTempDirectory("graft_engine_out_").toString
    val config = Config(
      port = 0, // ephemeral
      bucket = outDir,
      sourcePath = Some(srcDir),
      checkpoint = Some(Files.createTempDirectory("graft_engine_ck_").toString),
      intervalSec = 1L)
    val engine = new Engine(spark, config)
    val port = engine.start()
    try {
      val body = """{\"id\": \"id-001\", \"url\": \"http://e/1\", \"t\": 1704103500000}"""
      Files.writeString(java.nio.file.Paths.get(s"$srcDir/a.json"),
        s"""{"epoch": 1704103500005, "body": "$body"}\n""")
      engine.processAllAvailable()

      val sunk = graft.sinks.LineFileSink.read(spark,
        s"$outDir/${config.appName}/${config.streamName}").collect()
      assert(sunk.length == 1)
      assert(sunk(0).getString(1).contains("http://e/1"), "payload is the original raw JSON")

      def get(path: String): (Int, String) = {
        val conn = new java.net.URL(s"http://localhost:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code < 400) conn.getInputStream else conn.getErrorStream
        (code, new String(is.readAllBytes(), "UTF-8"))
      }
      assert(get("/ping") == (200, "pong"))
      assert(get("/")._2.contains("graft"))
      val (sc, stats) = get("/stats")
      assert(sc == 200 && stats.contains("events.ingested") && stats.contains("batch-size"))
      assert(get("/nope")._1 == 404)
    } finally engine.stop()
  }
}
