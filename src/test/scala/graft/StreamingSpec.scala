package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Structured Streaming semantics via MemoryStream: windowed aggregation
  * with watermark late-data drop, streaming dedup, and the ETL parse bound
  * to a stream (SURVEY §5.4). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed counts aggregate by event-time window and key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val q = EventStream.windowedCounts(events, windowLen = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click"),
        (ts("2024-01-01 10:25:00"), "click"),
        (ts("2024-01-01 10:45:00"), "view"),
        (ts("2024-01-01 11:05:00"), "click"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT window.start, event_type, n FROM wc ORDER BY 1, 2")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(rows.toSeq == Seq(
        ("2024-01-01 10:00:00.0", "click", 2L),
        ("2024-01-01 10:00:00.0", "view", 1L),
        ("2024-01-01 11:00:00.0", "click", 1L)))
    } finally q.stop()
  }

  test("streaming corpus telemetry equals the batch census over the same documents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val docs = input.toDF().toDF("source", "text")
    val q = EventStream.runningCorpusStats(docs)
      .writeStream.format("memory").queryName("corpus").outputMode("complete").start()
    try {
      val batch1 = Seq(
        ("web", "the quick brown fox jumps over a lazy dog of winter and spring"),
        ("web", "a short one"),
        ("books", "and to the sea: of storms, and of the calm that follows!"))
      val batch2 = Seq(
        ("web", "more text arrives later in the stream and the totals must move"),
        ("wiki", "a single wiki doc"))
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()

      val got = spark.sql("SELECT source, n_docs, tokens, round(mean_quality, 9) FROM corpus ORDER BY source")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      // the BATCH form of the same census over the union of both batches —
      // the stream's running state must land on identical numbers
      val want = (batch1 ++ batch2).toDF("source", "text")
        .groupBy($"source")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.size(
              org.apache.spark.sql.functions.split($"text", " ")).cast("long")).as("tokens"),
          org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.avg(
            graft.ext.TextStats.qualityScore($"text")), 9).as("mq"))
        .orderBy($"source")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == want.toSeq)
      assert(got.map(_._1).toSeq == Seq("books", "web", "wiki"))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses redelivered ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "id")
    val q = EventStream.dedupWithinWatermark(events, keyCol = "id", watermark = "1 hour")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "a"),
        (ts("2024-01-01 10:00:01"), "a"), // duplicate delivery
        (ts("2024-01-01 10:00:02"), "b"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:05:00"), "a")) // still within watermark
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM dd ORDER BY id").collect().map(_.getString(0))
      assert(ids.toSeq == Seq("a", "b"))
    } finally q.stop()
  }

  test("ETL parse binds to a stream unchanged (batch == streaming pipeline)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val raw = input.toDF().toDF("sequenceNumber", "data")
    val parsed = EventStream.parse(raw)
    assert(parsed.isStreaming, "parse must preserve streaming-ness")
    val q = parsed.select("id", "url", "utm_source")
      .writeStream.format("memory").queryName("pp").outputMode("append").start()
    try {
      val body = """{\"args\": {\"utm_source\": \"g\"}, \"id\": \"x1\", \"url\": \"http://e/1\", \"t\": 1704103500000}"""
      input.addData(("1" * 56, s"""{"epoch": 1704103500005, "body": "$body"}"""))
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, url, utm_source FROM pp").collect()
      assert(rows.length == 1)
      assert(rows(0).getString(0) == "1" * 56)
      assert(rows(0).getString(1) == "http://e/1")
      assert(rows(0).getString(2) == "g")
    } finally q.stop()
  }

  test("observed parse: per-batch ingest-quality counters ride the query progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val raw = input.toDF().toDF("sequenceNumber", "data")
    val q = EventStream.observedParse(raw)
      .writeStream.format("memory").queryName("obs").outputMode("append").start()
    try {
      val body = """{\"id\": \"x1\", \"url\": \"http://e/1\", \"t\": 1704103500000}"""
      val payloads = Seq(
        s"""{"epoch": 1704103500005, "body": "$body"}""", // clean
        "not json at all",                                // dead letter
        """{"epoch": 1704103500007, "body": "{}"}""")     // parses, no t
      input.addData(payloads.zipWithIndex.map { case (p, i) => (s"${i + 1}" * 56, p) }: _*)
      q.processAllAvailable()
      // sum the observed metric across all progress entries that carry it
      val rows = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("ingest_quality")))
      assert(rows.nonEmpty, "observedMetrics must surface ingest_quality")
      def total(field: String): Long =
        rows.map(r => r.getLong(r.fieldIndex(field))).sum
      assert(total("rows") == 3L)
      assert(total("dead_letters") == 1L, "the garbage record is the one dead letter")
      assert(total("missing_ts") == 2L, "dead letter + missing t both lack ts")
      assert(total("payload_bytes") == payloads.map(_.length.toLong).sum)
    } finally q.stop()
  }

  test("stream-static join enriches against a broadcast dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("event_type", "n")
    val dim = Seq(("click", "interactive"), ("view", "passive")).toDF("event_type", "category")
    val q = EventStream.enrich(stream, dim, Seq("event_type"))
      .writeStream.format("memory").queryName("en").outputMode("append").start()
    try {
      input.addData(("click", 1L), ("view", 2L), ("error", 3L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, category FROM en ORDER BY event_type")
        .collect().map(r => (r.getString(0), Option(r.getString(1))))
      assert(rows.toSeq == Seq(
        ("click", Some("interactive")), ("error", None), ("view", Some("passive"))))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running counts and max sequence across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = EventStream.runningCounts(input.toDS(), timeoutMs = 0L) // NoTimeout: keeps processAllAvailable finite
      .toDF("key", "n", "last_seq")
      .writeStream.format("memory").queryName("rc").outputMode("update").start()
    try {
      input.addData(("u1", "001"), ("u1", "003"), ("u2", "002"))
      q.processAllAvailable()
      input.addData(("u1", "002"))
      q.processAllAvailable()
      val latest = spark.sql(
        "SELECT key, n, last_seq FROM (SELECT *, row_number() OVER (PARTITION BY key ORDER BY n DESC) rn FROM rc) WHERE rn = 1 ORDER BY key")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      assert(latest.toSeq == Seq(("u1", 3L, "003"), ("u2", 1L, "002")),
        "state accumulates across micro-batches; lastSeq is the max sequence seen")
    } finally q.stop()
  }

  test("transformWithState running counts match the mapGroupsWithState semantics (RocksDB store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState needs the RocksDB provider (TTL + multiple state
    // variables ride its column families); scope the conf to this query
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, String)]
      // ttlMs=0 (TimeMode.None): processing-time TTL, like
      // ProcessingTimeTimeout before it, stalls processAllAvailable in
      // this environment — the test pins the state semantics, not TTL
      val q = EventStream.runningCountsTws(input.toDS(), ttlMs = 0L)
        .toDF("key", "n", "last_seq")
        .writeStream.format("memory").queryName("rctws").outputMode("update").start()
      try {
        input.addData(("u1", "001"), ("u1", "003"), ("u2", "002"))
        q.processAllAvailable()
        input.addData(("u1", "002"))
        q.processAllAvailable()
        val latest = spark.sql(
          "SELECT key, n, last_seq FROM (SELECT *, row_number() OVER (PARTITION BY key ORDER BY n DESC) rn FROM rctws) WHERE rn = 1 ORDER BY key")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        assert(latest.toSeq == Seq(("u1", 3L, "003"), ("u2", 1L, "002")),
          "ValueState accumulates across micro-batches; lastSeq is the max sequence seen")
      } finally q.stop()
    } finally prevProvider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming near-dup: arriving docs flag against earlier docs sharing LSH buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, String)]
      val q = EventStream.streamingNearDup(input.toDF().toDF("doc_id", "text"))
        .toDF("doc_id", "matched_id", "est")
        .writeStream.format("memory").queryName("snd").outputMode("append").start()
      try {
        val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet hills tonight"
        input.addData((1L, base), (2L, "completely different words about spark shuffles and parquet column pruning at scale"))
        q.processAllAvailable()
        // batch 2: 10 = exact copy of 1, 11 = near copy, 12 = unrelated,
        // 13+14 = in-batch exact pair, both unseen before
        val inBatch = "entirely novel sentence mentioning winnowing fingerprints and rolling hash windows for spans"
        input.addData(
          (10L, base),
          (11L, base.replace("tonight", "today")),
          (12L, "another unrelated line of text carrying no resemblance to anything said before now"),
          (13L, inBatch), (14L, inBatch))
        q.processAllAvailable()
        val hits = spark.sql(
          "SELECT DISTINCT doc_id, matched_id, est FROM snd ORDER BY doc_id, matched_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        val pairs = hits.map(h => (h._1, h._2)).toSet
        assert(pairs.contains((10L, 1L)), s"exact copy must flag against the original: ${hits.toSeq}")
        assert(pairs.contains((11L, 1L)), s"near copy must flag against the original: ${hits.toSeq}")
        assert(pairs.contains((14L, 13L)), s"in-batch pair must flag (docId order): ${hits.toSeq}")
        assert(!hits.exists(h => h._1 == 12L || h._2 == 12L), "unrelated doc must not flag")
        assert(!hits.exists(h => h._1 == 2L || h._2 == 2L), "unrelated doc must not flag")
        // signature agreement on an exact copy is exactly 1.0
        assert(hits.filter(h => (h._1, h._2) == (10L, 1L)).forall(_._3 == 1.0))
      } finally q.stop()
    } finally prevProvider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("state store reader exposes streaming aggregation state as a batch DataFrame") {
    // Spark 4's statestore data source: the ops/debugging surface that
    // turns a checkpoint's keyed state into a queryable table — how a
    // production engine answers "what is this stream currently holding"
    // without stopping it or instrumenting the job.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sss_").toString
    val q = input.toDS().groupBy(col("value").as("k")).count()
      .writeStream.format("memory").queryName("sssagg").outputMode("update")
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData("a", "a", "b")
      q.processAllAvailable()
      input.addData("a")
      q.processAllAvailable()
    } finally q.stop()
    val state = spark.read.format("statestore").load(ckpt)
    // schema: key struct<...>, value struct<agg buffer>, partition_id —
    // extract both by POSITION so internal buffer/key field naming can't
    // break the pin
    val rows = state.select(col("key"), col("value"))
      .collect().map { r =>
        (r.getStruct(0).getString(0), r.getStruct(1).getLong(0))
      }.toMap
    assert(rows == Map("a" -> 3L, "b" -> 1L),
      s"checkpointed state must reflect the post-batch-2 counts, got $rows")
  }

  test("streaming bounded top-k: k-row state merges across batches, order-independent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Long, Double)]
      val q = EventStream.streamingTopK(input.toDS(), k = 3)
        .toDF("key", "id", "score", "rank")
        .writeStream.format("memory").queryName("stk").outputMode("update").start()
      try {
        input.addData(("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 1.0), ("b", 9L, 2.0))
        q.processAllAvailable()
        // batch 2: a new leader + a tie on score (id breaks it) + a loser
        input.addData(("a", 4L, 11.0), ("a", 5L, 9.0), ("a", 6L, 0.5))
        q.processAllAvailable()
        val batches = spark.sql("SELECT * FROM stk").as[(String, Long, Double, Int)].collect()
        // the LATEST emission per key must equal the batch top-3 of all fed rows
        val expectA = Seq(("a", 4L, 11.0, 1), ("a", 2L, 9.0, 2), ("a", 5L, 9.0, 3))
        expectA.foreach(row => assert(batches.contains(row),
          s"latest top-3 for key a must contain $row"))
        assert(!batches.contains(("a", 1L, 5.0, 1)), "id 1 never led")
        assert(batches.contains(("b", 9L, 2.0, 1)), "singleton key keeps its one row")
        // state is bounded: no emission ranks beyond k
        assert(batches.forall(_._4 <= 3))
        // batch 3: RE-SCORE the leader down — the fresh score must replace
        // the buffered 11.0, not share the buffer with it (an id is a live
        // entity; stale-score-outranks-fresh was the round-5 advice flag)
        input.addData(("a", 4L, 0.1))
        q.processAllAvailable()
        val all3 = spark.sql("SELECT key, id, score, rank FROM stk")
          .as[(String, Long, Double, Int)].collect()
        // the batch-3 emission: 2 and 5 promoted to ranks 1-2, id 4 demoted
        // to rank 3 at its FRESH score (the buggy both-slots merge would
        // have kept 4 at rank 1 on the stale 11.0 instead)
        Seq(("a", 2L, 9.0, 1), ("a", 5L, 9.0, 2), ("a", 4L, 0.1, 3)).foreach(row =>
          assert(all3.contains(row), s"post-re-score top-3 must contain $row"))
        assert(all3.count(r => r._2 == 4L && r._3 == 0.1) == 1,
          "the re-scored id appears exactly once at its fresh score")
      } finally q.stop()
    } finally prevProvider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-stream interval join matches keys within the time bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val li = MemoryStream[(String, Timestamp)]
    val ri = MemoryStream[(String, Timestamp)]
    val left = li.toDF().toDF("k", "ts")
    val right = ri.toDF().toDF("r_k", "r_ts")
    val q = EventStream.intervalJoin(left, right, "k", bound = "5 minutes")
      .select("k", "ts", "r_ts")
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      li.addData(("a", ts("2024-01-01 10:00:00")), ("b", ts("2024-01-01 10:00:00")))
      ri.addData(
        ("a", ts("2024-01-01 10:03:00")),  // within +5m -> joins
        ("a", ts("2024-01-01 10:20:00")),  // outside bound -> dropped
        ("c", ts("2024-01-01 10:00:00"))) // no left key
      q.processAllAvailable()
      val rows = spark.sql("SELECT k, r_ts FROM ssj ORDER BY k").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString))
      assert(rows.toSeq == Seq(("a", "2024-01-01 10:03:00.0")))
    } finally q.stop()
  }

  test("dual-sink fan-out: one micro-batch lands in BOTH line files and the JDBC table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = s"jdbc:derby:memory:dual${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE events (id VARCHAR(64) PRIMARY KEY, url VARCHAR(256))")
    conn.close()
    val sink = new graft.sinks.JdbcUpsertSink(url, "events", "id")
    val dir = java.nio.file.Files.createTempDirectory("graft_dual_").toString

    val input = MemoryStream[(String, String)]
    val parsed = EventStream.parse(input.toDF().toDF("sequenceNumber", "data"))
    val q = EventStream.startDualSink(parsed,
      s"$dir/lines", s"$dir/ckpt", Some(sink),
      jdbcCols = Seq("id", "url"), orderCol = "id", intervalMs = 100L)
    try {
      val body = """{\"id\": \"x\", \"url\": \"http://e/9\", \"t\": 1704103500000}"""
      input.addData(("7" * 56, s"""{"epoch": 1704103500005, "body": "$body"}"""))
      q.processAllAvailable()
      // side 1: gzip line files hold the ORIGINAL raw json
      val lines = graft.sinks.LineFileSink.read(spark, s"$dir/lines").collect()
      assert(lines.length == 1 && lines(0).getString(0) == "7" * 56)
      assert(lines(0).getString(1).contains("http://e/9"))
      // side 2: the upsert table holds the PARSED row
      val c2 = java.sql.DriverManager.getConnection(url)
      val rs = c2.createStatement().executeQuery("SELECT id, url FROM events")
      assert(rs.next() && rs.getString(1) == "7" * 56 && rs.getString(2) == "http://e/9")
      assert(!rs.next())
      c2.close()
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits closed sessions when the gap is exceeded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = EventStream.closedSessions(input.toDS(), gapMs = 30 * 60 * 1000L)
      .toDF("user", "n_events", "start_ms", "end_ms")
      .writeStream.format("memory").queryName("cs").outputMode("append").start()
    try {
      val t0 = 1704103200000L // 2024-01-01 10:00:00
      input.addData(("u1", t0), ("u1", t0 + 300000L), ("u2", t0))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM cs").head().getLong(0) == 0L,
        "open sessions emit nothing")
      input.addData(("u1", t0 + 7200000L)) // 2h later -> closes u1's session
      q.processAllAvailable()
      val rows = spark.sql("SELECT user, n_events, start_ms, end_ms FROM cs")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq(("u1", 2L, t0, t0 + 300000L)))
    } finally q.stop()
  }

  test("streaming line-file sink writes the K1 gzip date-partitioned layout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp)]
    val raw = input.toDF().toDF("sequenceNumber", "data", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink_").toString
    val q = EventStream.startLineFileSink(raw, s"$dir/data", s"$dir/ckpt", intervalMs = 100L)
    try {
      input.addData(
        ("1" * 56, """{"a":1}""", ts("2024-01-02 10:00:00")),
        ("2" * 56, """{"b":2}""", ts("2024-01-03 10:00:00")))
      q.processAllAvailable()
      val files = new java.io.File(s"$dir/data").listFiles()
      assert(files.exists(_.getName.startsWith("year=2024")), files.mkString(", "))
      val back = graft.sinks.LineFileSink.read(spark, s"$dir/data")
        .orderBy("sequenceNumber").collect()
      assert(back.map(_.getString(0)).toSeq == Seq("1" * 56, "2" * 56))
      assert(back.map(_.getString(1)).toSeq == Seq("""{"a":1}""", """{"b":2}"""))
      val gz = new java.io.File(s"$dir/data/year=2024/month=01/day=02").listFiles()
      assert(gz != null && gz.exists(_.getName.endsWith(".txt.gz")), "gzip files in date partitions")
    } finally q.stop()
  }

  test("streaming seq-named sink advances the K2 resume cursor batch over batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp)]
    val raw = input.toDF().toDF("sequenceNumber", "data", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_seq_stream_").toString
    val q = EventStream.startSeqNamedSink(raw, s"$dir/data", s"$dir/ckpt", intervalMs = 100L)
    try {
      input.addData(("3" * 56, """{"a":1}""", ts("2024-01-02 10:00:00")))
      q.processAllAvailable()
      assert(graft.sinks.LineFileSink.lastCursor(spark, s"$dir/data").contains("3" * 56))
      input.addData(("7" * 56, """{"b":2}""", ts("2024-01-02 11:00:00")))
      q.processAllAvailable()
      assert(graft.sinks.LineFileSink.lastCursor(spark, s"$dir/data").contains("7" * 56))
      val back = graft.sinks.LineFileSink.readSeqNamed(spark, s"$dir/data")
        .orderBy("sequenceNumber").collect()
      assert(back.map(_.getString(0)).toSeq == Seq("3" * 56, "7" * 56))
    } finally q.stop()
  }

  test("streaming corpus-delta dedup: arrivals flag against the static corpus with EXACT Jaccard") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet hills tonight"
    val corpus = Seq(
      (100L, base),
      (101L, "a completely separate corpus document about parquet footers and shuffle partitions"))
      .toDF("doc_id", "text").cache()
    val input = MemoryStream[(Long, String)]
    val q = EventStream.streamingDeltaDedup(
        input.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("sdd").outputMode("append").start()
    try {
      val nearCopy = base.replace("tonight", "today")
      input.addData(
        (1L, base), // exact copy of corpus doc 100
        (2L, nearCopy), // near copy of 100
        (3L, "entirely novel arrival that matches nothing in the existing corpus at all"))
      q.processAllAvailable()
      // duplicate of an EARLIER ARRIVAL only (not of the corpus): must
      // NOT flag — the operator is directional, corpus-side memory only
      input.addData((4L, "entirely novel arrival that matches nothing in the existing corpus at all"))
      q.processAllAvailable()
      val hits = spark.sql("SELECT new_id, old_id, j FROM sdd ORDER BY new_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(hits.map(h => (h._1, h._2)).toSeq == Seq((1L, 100L), (2L, 100L)),
        s"exact + near copy flag against corpus, novel/arrival-dup do not: ${hits.toSeq}")
      assert(hits(0)._3 == 1.0, "exact copy: exact Jaccard 1.0 (not an estimate)")
      // the near copy's exact J: one 16-word tail change in an 17-word
      // trigram window — high but below 1
      assert(hits(1)._3 > 0.6 && hits(1)._3 < 1.0)
    } finally q.stop()
  }

  test("streaming semantic dedup: arriving vector flags against the corpus LSH index; unrelated and arrival-dup vectors do not") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val v = Array.tabulate(64)(i => if (i < 8) 1.0f else 0.02f * i)
    val vNear = v.updated(62, v(62) + 0.002f) // cosine ≈ 1 vs v
    val vFar = Array.tabulate(64)(i => if (i >= 56) 1.0f else -0.015f * i)
    val corpus = Seq((100L, v), (101L, vFar)).toDF("vec_id", "embedding").cache()
    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.EventStream.streamingSemanticDedup(
        input.toDF().toDF("vec_id", "embedding"), corpus)
      .writeStream.format("memory").queryName("ssd").outputMode("append").start()
    try {
      val novel = Array.tabulate(64)(i => (if (i % 2 == 0) -1.0f else 1.0f) * 0.5f)
      input.addData((1L, vNear), (2L, novel))
      q.processAllAvailable()
      // duplicate of arrival 2, NOT of the corpus: directional contract
      input.addData((3L, novel))
      q.processAllAvailable()
      val hits = spark.sql("SELECT new_id, old_id, cos FROM ssd ORDER BY new_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(hits.map(h => (h._1, h._2)).toSeq == Seq((1L, 100L)),
        s"only the planted near-vector flags, got: ${hits.toSeq}")
      assert(hits(0)._3 > 0.99, s"exact cosine on the flagged pair: ${hits(0)._3}")
    } finally q.stop()
  }
}
