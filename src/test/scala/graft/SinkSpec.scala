package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{JdbcUpsertSink, LineFileSink}

/** K3 JDBC upsert against a real embedded Derby database: LWW semantics,
  * idempotent replay (the at-least-once contract, SURVEY §5.3), and
  * partition-parallel writes. */
class SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDb(name: String): String = {
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE events (id VARCHAR(64) PRIMARY KEY, val DOUBLE, seq BIGINT)")
    conn.close()
    url
  }

  private def readAll(url: String): Map[String, (Double, Long)] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT id, val, seq FROM events")
      val buf = scala.collection.mutable.Map[String, (Double, Long)]()
      while (rs.next()) buf(rs.getString(1)) = (rs.getDouble(2), rs.getLong(3))
      buf.toMap
    } finally conn.close()
  }

  test("upsert: delete-then-insert keyed LWW; replay is a no-op; newer batch wins") {
    import spark.implicits._
    val url = freshDb("upsert1")
    val sink = new JdbcUpsertSink(url, "events", "id")

    val b1 = Seq(("a", 1.0, 1L), ("b", 2.0, 1L), ("a", 1.5, 2L)).toDF("id", "val", "seq")
    sink.upsertBatch(b1, "seq")
    assert(readAll(url) == Map("a" -> (1.5, 2L), "b" -> (2.0, 1L)), "in-batch LWW keeps max seq")

    sink.upsertBatch(b1, "seq") // redelivery of the same batch
    assert(readAll(url) == Map("a" -> (1.5, 2L), "b" -> (2.0, 1L)), "replay is a no-op")

    val b2 = Seq(("a", 9.0, 3L), ("c", 3.0, 3L)).toDF("id", "val", "seq")
    sink.upsertBatch(b2, "seq")
    assert(readAll(url) == Map("a" -> (9.0, 3L), "b" -> (2.0, 1L), "c" -> (3.0, 3L)),
      "later batch overwrites matching ids, preserves others")
  }

  test("dialect selection + generated SQL: Postgres ON CONFLICT with json casts, generic delete+insert") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("user_data", StringType),
      StructField("ts", TimestampType)))

    assert(JdbcUpsertSink.dialectFor("jdbc:postgresql://h:5432/db") == JdbcUpsertSink.Postgres)
    assert(JdbcUpsertSink.dialectFor("jdbc:derby:memory:x;create=true") == JdbcUpsertSink.Generic)

    // Postgres: one atomic statement, EXCLUDED update, ?::json typing for
    // declared JSON columns (reference PGobject("json") parity)
    assert(JdbcUpsertSink.pgUpsertSql("events", schema, "id", Set("user_data")) ==
      "INSERT INTO events (id, user_data, ts) VALUES (?, ?::json, ?) " +
        "ON CONFLICT (id) DO UPDATE SET user_data = EXCLUDED.user_data, ts = EXCLUDED.ts")

    // key-only schema: conflicting re-insert must be a no-op, not an error
    val keyOnly = StructType(Seq(StructField("id", StringType)))
    assert(JdbcUpsertSink.pgUpsertSql("events", keyOnly, "id", Set.empty) ==
      "INSERT INTO events (id) VALUES (?) ON CONFLICT (id) DO NOTHING")

    // MySQL/MariaDB: ON DUPLICATE KEY UPDATE with VALUES() refs and
    // CAST(? AS JSON) typing; both URL schemes select the dialect
    assert(JdbcUpsertSink.dialectFor("jdbc:mysql://h:3306/db") == JdbcUpsertSink.MySql)
    assert(JdbcUpsertSink.dialectFor("jdbc:mariadb://h:3306/db") == JdbcUpsertSink.MySql)
    assert(JdbcUpsertSink.mysqlUpsertSql("events", schema, "id", Set("user_data")) ==
      "INSERT INTO events (id, user_data, ts) VALUES (?, CAST(? AS JSON), ?) " +
        "ON DUPLICATE KEY UPDATE user_data = VALUES(user_data), ts = VALUES(ts)")
    assert(JdbcUpsertSink.mysqlUpsertSql("events", keyOnly, "id", Set.empty) ==
      "INSERT INTO events (id) VALUES (?) ON DUPLICATE KEY UPDATE id = id")

    // generic dialect: the portable delete+insert pair
    assert(JdbcUpsertSink.deleteSql("events", "id") == "DELETE FROM events WHERE id = ?")
    assert(JdbcUpsertSink.insertSql("events", schema) ==
      "INSERT INTO events (id, user_data, ts) VALUES (?, ?, ?)")

    // identifier validation still guards every dialect's interpolation
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.pgUpsertSql("events; DROP TABLE x", schema, "id", Set.empty)
    }
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.mysqlUpsertSql("events; DROP TABLE x", schema, "id", Set.empty)
    }
  }

  test("upsert handles a multi-partition batch") {
    import spark.implicits._
    val url = freshDb("upsert2")
    val sink = new JdbcUpsertSink(url, "events", "id")
    val big = (1 to 500).map(i => (s"k$i", i.toDouble, 1L)).toDF("id", "val", "seq")
      .repartition(8)
    sink.upsertBatch(big, "seq")
    val out = readAll(url)
    assert(out.size == 500 && out("k42") == (42.0, 1L))
  }

  test("streaming foreachBatch -> JDBC upsert: at-least-once redelivery converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = freshDb("upsert3")
    val sink = new JdbcUpsertSink(url, "events", "id")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double, Long)]
    val q = input.toDF().toDF("id", "val", "seq")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) => sink.upsertBatch(df, "seq") }
      .outputMode("append")
      .start()
    try {
      input.addData(("a", 1.0, 1L), ("b", 2.0, 1L))
      q.processAllAvailable()
      input.addData(("a", 1.0, 1L), ("a", 5.0, 2L)) // redelivery + update in one batch
      q.processAllAvailable()
      assert(readAll(url) == Map("a" -> (5.0, 2L), "b" -> (2.0, 1L)))
    } finally q.stop()
  }

  test("line sink batch round-trip preserves every byte and partitions by date") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_spec_").toString
    val raw = Seq(
      ("1" * 56, """{"x":"a b"}""", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      ("2" * 56, "payload with spaces", java.sql.Timestamp.valueOf("2024-02-02 00:00:00")))
      .toDF("sequenceNumber", "data", "ts")
    LineFileSink.write(raw, dir, col("ts"))
    val back = LineFileSink.read(spark, dir).orderBy("sequenceNumber").collect()
    assert(back.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("1" * 56, """{"x":"a b"}"""),
      ("2" * 56, "payload with spaces")))
    assert(new java.io.File(s"$dir/year=2024/month=02/day=01").exists())
  }

  test("date filters PRUNE partitions at the file index (readDated plan carries PartitionFilters)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_").toString
    val rows = Seq(
      ("1" * 56, "day-one", java.sql.Timestamp.valueOf("2024-02-01 10:00:00")),
      ("2" * 56, "day-two", java.sql.Timestamp.valueOf("2024-02-02 10:00:00")),
      ("3" * 56, "day-three", java.sql.Timestamp.valueOf("2024-02-03 10:00:00")))
      .toDF("sequenceNumber", "data", "ts")
    LineFileSink.write(rows, dir, col("ts"))

    val oneDay = LineFileSink.readDated(spark, dir)
      .filter(col("year") === 2024 && col("month") === 2 && col("day") === 2)
    assert(oneDay.collect().map(_.getString(1)).toSeq == Seq("day-two"))
    // the filter must reach the file index as a partition filter — the
    // scan never lists/decodes the other days (the 100 TB log property)
    val plan = oneDay.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
    assert(pf.exists(l => l.contains("day") && !l.contains("PartitionFilters: []")),
      s"expected a day partition filter in the scan:\n$plan")
  }

  test("K2 seq-named layout: file name = last seq (resume cursor), idempotent rewrite, lossless re-read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_seqnamed_").toString
    def seq(n: Int) = f"$n%056d"
    val raw = Seq(
      (seq(3), "a", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      (seq(1), "b", java.sql.Timestamp.valueOf("2024-02-01 08:00:00")),
      (seq(2), "c", java.sql.Timestamp.valueOf("2024-02-01 16:00:00")),
      (seq(9), "d", java.sql.Timestamp.valueOf("2024-02-02 00:00:00")))
      .toDF("sequenceNumber", "data", "ts")
    LineFileSink.writeSeqNamed(raw, dir, col("ts"), maxRecordsPerFile = 2)
    // day 01 holds seqs 1,2,3 sorted -> chunks (1,2)+(3): names 2 and 3;
    // day 02 holds seq 9 -> name 9. The name is the LAST seq in the file.
    def names(d: String) = new java.io.File(s"$dir/2024/02/$d").listFiles()
      .map(_.getName).filter(_.endsWith(".records.log.gz")).sorted.toSeq
    assert(names("01") == Seq(s"${seq(2)}.records.log.gz", s"${seq(3)}.records.log.gz"))
    assert(names("02") == Seq(s"${seq(9)}.records.log.gz"))
    // the key listing IS the progress record
    assert(LineFileSink.lastCursor(spark, dir).contains(seq(9)))
    // lossless inverse via the same F11 line format
    val back = LineFileSink.readSeqNamed(spark, dir).orderBy("sequenceNumber").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(back == Seq(seq(1) -> "b", seq(2) -> "c", seq(3) -> "a", seq(9) -> "d"))
    // replay: same input -> same names, same contents, no growth
    LineFileSink.writeSeqNamed(raw, dir, col("ts"), maxRecordsPerFile = 2)
    assert(names("01").size == 2 && names("02").size == 1)
    assert(LineFileSink.readSeqNamed(spark, dir).count() == 4)
  }

  test("T3 fail-stop: sink failure kills the query with the cause; restart from checkpoint resumes losslessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Derby database WITHOUT the target table: the first micro-batch's
    // upsert throws, the query dies (reference: exit 2, core.clj:135-139)
    val db = s"t3fail${System.nanoTime()}"
    val url = s"jdbc:derby:memory:$db;create=true"
    java.sql.DriverManager.getConnection(url).close()
    val sink = new JdbcUpsertSink(url, "events", "id")
    val dir = java.nio.file.Files.createTempDirectory("graft_t3_").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val parsed = graft.streaming.EventStream.parse(input.toDF().toDF("sequenceNumber", "data"))
    val body = """{\"id\": \"x\", \"url\": \"http://e/1\", \"t\": 1704103500000}"""
    input.addData(("5" * 56, s"""{"epoch": 1704103500005, "body": "$body"}"""))

    def start() = graft.streaming.EventStream.startDualSink(parsed,
      s"$dir/lines", s"$dir/ckpt", Some(sink),
      jdbcCols = Seq("id", "url"), orderCol = "id", intervalMs = 100L)

    val q1 = start()
    val thrown = intercept[Exception] { q1.processAllAvailable() }
    assert(q1.exception.isDefined, "query must surface the sink failure, not swallow it")
    assert(thrown.getMessage != null)
    q1.stop()

    // "supervisor fixed the world": create the table, restart from the
    // SAME checkpoint -> the failed batch replays, nothing is lost
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE events (id VARCHAR(64) PRIMARY KEY, url VARCHAR(256))")
    conn.close()
    val q2 = start()
    try {
      q2.processAllAvailable()
      val c2 = java.sql.DriverManager.getConnection(url)
      val rs = c2.createStatement().executeQuery("SELECT id, url FROM events")
      assert(rs.next() && rs.getString(1) == "5" * 56 && rs.getString(2) == "http://e/1")
      assert(!rs.next(), "exactly once after replay (idempotent upsert)")
      c2.close()
      assert(LineFileSink.read(spark, s"$dir/lines").count() >= 1,
        "line-file side holds the record (duplicates on replay are q40's job)")
    } finally q2.stop()
  }

  test("manifest sink: LWW merge, replayed batch is a no-op, untouched buckets never rewrite") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 8)

    // batch 0: seed 100 keys
    val b0 = (0L until 100L).map(i => (i, s"v0-$i", 1L)).toDF("id", "payload", "seq")
    sink.upsertBatch(b0, "seq", batchId = 0L)
    assert(sink.read(spark).count() == 100)

    // batch 1: update 5 keys (incl. an in-batch LWW pair) + insert 2 new
    val b1 = ((0L until 5L).map(i => (i, s"v1-$i", 3L)) ++
      Seq((0L, "stale", 2L), (100L, "new-100", 3L), (101L, "new-101", 3L)))
      .toDF("id", "payload", "seq")
    val before = graft.sinks.ManifestUpsertSink.latestManifest(root).get
    sink.upsertBatch(b1, "seq", batchId = 1L)
    val after = graft.sinks.ManifestUpsertSink.latestManifest(root).get
    val got = sink.read(spark).select("id", "payload").as[(Long, String)]
      .collect().toMap
    assert(got.size == 102)
    assert(got(0L) == "v1-0", "in-batch LWW must pick seq=3 over the stale seq=2 row")
    assert(got(4L) == "v1-4" && got(7L) == "v0-7" && got(100L) == "new-100")

    // copy-on-write contract: buckets b1 never touched keep their EXACT
    // v0 file paths in the new manifest (zero I/O for untouched data);
    // bucket identity recomputed through the same in-plan xxhash64
    val touchedBuckets = Seq(0L, 1L, 2L, 3L, 4L, 100L, 101L).toDF("id")
      .select(pmod(xxhash64(col("id")), lit(8L)).as("b"))
      .distinct().as[Long].collect().toSet
    val beforeByBucket = before.files.groupBy(_.bucket)
    val afterByBucket = after.files.groupBy(_.bucket)
    for (b <- 0L until 8L if !touchedBuckets.contains(b); if beforeByBucket.contains(b))
      assert(afterByBucket(b).map(_.path).sorted == beforeByBucket(b).map(_.path).sorted,
        s"untouched bucket $b must carry its v0 files forward verbatim")
    for (b <- touchedBuckets if beforeByBucket.contains(b))
      assert(afterByBucket(b).map(_.path).toSet.intersect(
        beforeByBucket(b).map(_.path).toSet).isEmpty,
        s"touched bucket $b must be fully rewritten (copy-on-write)")

    // replay batch 1 (foreachBatch redelivery): committed id -> no-op
    sink.upsertBatch(b1.withColumn("payload", lit("replayed")), "seq", batchId = 1L)
    val m2 = graft.sinks.ManifestUpsertSink.latestManifest(root).get
    assert(m2.version == after.version && m2.batchId == 1L,
      "replaying a committed batch must not create a new version")
    assert(sink.read(spark).select("id", "payload").as[(Long, String)]
      .collect().toMap.apply(0L) == "v1-0", "replay must not change data")
  }

  test("manifest sink: time travel, compaction preserves data + replay guard, vacuum reclaims") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest2_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    sink.upsertBatch(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "p", "seq"), "seq", 1L)

    // time travel: v0 is the pre-merge snapshot as committed
    val v0 = graft.sinks.ManifestUpsertSink.readVersion(spark, root, 0L)
      .select("id", "p").as[(Long, String)].collect().toMap
    assert(v0 == Map(1L -> "a", 2L -> "b"))

    // compaction: same rows, one file per populated bucket, batchId kept
    sink.compact(spark)
    val mc = graft.sinks.ManifestUpsertSink.latestManifest(root).get
    assert(mc.batchId == 1L, "compaction must keep the last MERGED batch id")
    assert(mc.files.groupBy(_.bucket).values.forall(_.size == 1),
      "compaction must leave one file per bucket")
    assert(sink.read(spark).select("id", "p").as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // the replay guard survives compaction: batch 1 redelivery still no-op
    sink.upsertBatch(Seq((9L, "x", 9L)).toDF("id", "p", "seq"), "seq", 1L)
    assert(sink.read(spark).count() == 3)

    // vacuum to the live version: old versions unreadable, live intact
    sink.vacuum(keepVersions = 1)
    intercept[IllegalStateException] {
      graft.sinks.ManifestUpsertSink.readVersion(spark, root, 0L)
    }
    assert(sink.read(spark).select("id", "p").as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("manifest sink: additive schema evolution (new column lands, old rows read null)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest4_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    // batch 1 carries a NEW column; it must merge (ADD COLUMN semantics)
    sink.upsertBatch(Seq((2L, "b2", "en", 2L), (3L, "c", "de", 2L))
      .toDF("id", "p", "lang", "seq"), "seq", 1L)
    val got = sink.read(spark).select("id", "p", "lang")
      .as[(Long, String, Option[String])].collect()
      .map { case (id, p, l) => id -> ((p, l)) }.toMap
    assert(got == Map(1L -> ("a", None), 2L -> ("b2", Some("en")),
      3L -> ("c", Some("de"))),
      "pre-evolution rows read the new column as null; merged rows carry it")
    // compaction unifies the vintages; data unchanged
    sink.compact(spark)
    assert(sink.read(spark).select("id", "lang").as[(Long, Option[String])]
      .collect().toMap == Map(1L -> None, 2L -> Some("en"), 3L -> Some("de")))
  }

  test("streaming foreachBatch -> manifest sink: micro-batch ids drive the replay guard") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_manifest3_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_manifest3_ck_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val q = graft.streaming.EventStream.startManifestSink(
      input.toDF().toDF("id", "p", "seq"), sink,
      cols = Seq("id", "p", "seq"), orderCol = "seq", checkpoint = ckpt,
      intervalMs = 50L)
    try {
      input.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      input.addData((2L, "b2", 2L), (2L, "stale", 1L), (3L, "c", 2L))
      q.processAllAvailable()
      val got = sink.read(spark).select("id", "p").as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"),
        "in-batch LWW by seq + cross-batch MERGE through the streaming path")
      val m = graft.sinks.ManifestUpsertSink.latestManifest(root).get
      assert(m.batchId >= 1L, "manifest must track the micro-batch id")
    } finally q.stop()
  }

  test("manifest sink through the Hadoop store (file: scheme): merge, time travel, change feed") {
    import spark.implicits._
    val local = java.nio.file.Files.createTempDirectory("graft_manifest5_").toString
    val root = s"file:$local" // scheme -> HadoopStore control plane
    assert(graft.sinks.TableStore.forPath(root).isInstanceOf[graft.sinks.TableStore.HadoopStore])
    assert(graft.sinks.TableStore.forPath(local) eq graft.sinks.TableStore.NioStore)
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    sink.upsertBatch(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "p", "seq"), "seq", 1L)
    assert(sink.read(spark).select("id", "p").as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    assert(graft.sinks.ManifestUpsertSink.readVersion(spark, root, 0L)
      .select("id", "p").as[(Long, String)].collect().toMap == Map(1L -> "a", 2L -> "b"),
      "time travel must work through the Hadoop store")
    val feed = graft.sinks.ManifestUpsertSink.readChanges(spark, root, 1L)
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(feed == Map(2L -> "updated", 3L -> "inserted"))
    // replay guard holds across the Hadoop control plane too
    sink.upsertBatch(Seq((9L, "x", 9L)).toDF("id", "p", "seq"), "seq", 1L)
    assert(sink.read(spark).count() == 3)
  }

  test("DSv2 write surface: save() creates and MERGEs; writeStream is exactly-once; overwrite rejected") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2w_").toString
    // first write CREATES the table (keyCol/buckets from options)
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq")
      .write.format("graft-manifest").option("orderCol", "seq")
      .option("keyCol", "id").option("buckets", "4").mode("append").save(root)
    // second append MERGEs (keyCol/buckets come from the manifest now)
    Seq((2L, "b2", 2L), (2L, "stale", 1L), (3L, "c", 2L)).toDF("id", "p", "seq")
      .write.format("graft-manifest").option("orderCol", "seq").mode("append").save(root)
    val viaConnector = spark.read.format("graft-manifest").load(root)
      .select("id", "p").as[(Long, String)].collect().toMap
    assert(viaConnector == Map(1L -> "a", 2L -> "b2", 3L -> "c"),
      "save() must run the LWW MERGE protocol, not a blind append")
    // the DSv2-written table IS a sink table: Scala API reads it identically
    assert(graft.sinks.ManifestUpsertSink.read(spark, root)
      .select("id", "p").as[(Long, String)].collect().toMap == viaConnector)
    val m = graft.sinks.ManifestUpsertSink.snapshotManifest(root, None)
    assert(m.keyCol.contains("id") && m.buckets.contains(4) && m.version == 1L)
    // overwrite is ambiguous under MERGE semantics — rejected loudly
    val e = intercept[Exception] {
      Seq((9L, "x", 9L)).toDF("id", "p", "seq")
        .write.format("graft-manifest").option("orderCol", "seq")
        .mode("overwrite").save(root)
    }
    assert(e.getMessage != null)

    // streaming: writeStream.format("graft-manifest") = the exactly-once
    // foreachBatch path behind the standard API
    implicit val sqlCtx = spark.sqlContext
    val sroot = java.nio.file.Files.createTempDirectory("graft_dsv2ws_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dsv2ws_ck_").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val q = input.toDF().toDF("id", "p", "seq")
      .writeStream.format("graft-manifest")
      .option("orderCol", "seq").option("keyCol", "id").option("buckets", "4")
      .option("checkpointLocation", ckpt)
      .start(sroot)
    try {
      input.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      input.addData((2L, "b2", 2L), (3L, "c", 2L))
      q.processAllAvailable()
      val got = graft.sinks.ManifestUpsertSink.read(spark, sroot)
        .select("id", "p").as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
      assert(graft.sinks.ManifestUpsertSink.snapshotManifest(sroot, None).batchId >= 1L,
        "the manifest must carry Spark's micro-batch id — the replay guard's input")
      // an AD-HOC backfill save() into the live stream's table must not
      // advance the streaming batch-id sequence — synthesizing "next"
      // ids would make the stream's own next micro-batch look like a
      // replay and silently drop it (the r10-review data-loss bug)
      val preBatch = graft.sinks.ManifestUpsertSink.snapshotManifest(sroot, None).batchId
      Seq((50L, "backfill", 1L)).toDF("id", "p", "seq")
        .write.format("graft-manifest").option("orderCol", "seq").mode("append").save(sroot)
      assert(graft.sinks.ManifestUpsertSink.snapshotManifest(sroot, None).batchId == preBatch,
        "ad-hoc writes must leave the streaming batch id untouched")
      input.addData((4L, "d", 3L))
      q.processAllAvailable()
      val after = graft.sinks.ManifestUpsertSink.read(spark, sroot)
        .select("id", "p").as[(Long, String)].collect().toMap
      assert(after(4L) == "d", "the stream's next micro-batch must land, not be shadowed")
      assert(after(50L) == "backfill" && after.size == 5)
      // contradicting options on an existing table fail loudly
      val e2 = intercept[Exception] {
        Seq((60L, "x", 1L)).toDF("id", "p", "seq")
          .write.format("graft-manifest").option("orderCol", "seq")
          .option("keyCol", "p").mode("append").save(sroot)
      }
      assert(e2.getMessage.contains("keyCol"))
    } finally q.stop()
  }

  test("URI-illegal local roots (spaces) dispatch to nio and work end-to-end") {
    import spark.implicits._
    // `new URI(root)` would throw here — the r09 advisory regression; the
    // syntactic scheme probe must treat this as a plain nio path
    val root = java.nio.file.Files.createTempDirectory("graft spaced dir ").toString
    assert(root.contains(" "))
    assert(graft.sinks.TableStore.forPath(root) eq graft.sinks.TableStore.NioStore)
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    assert(sink.read(spark).select("id", "p").as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b"))
  }

  test("vacuum: keepChangeVersions retains the CDC feed past the data horizon for lagging subscribers") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vacfeed_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 2)
    for (v <- 0L until 4L)
      sink.upsertBatch(Seq((v, s"p$v", v)).toDF("id", "p", "seq"), "seq", v)
    def feedExists(v: Long) =
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root, "_changes", s"v$v"))
    // data horizon 1, feed horizon 3: versions 1-3 keep their feeds even
    // though only v3's data/manifest survive — a subscriber checkpointed
    // at v1 can still drain
    sink.vacuum(keepVersions = 1, keepChangeVersions = Some(3))
    assert(!feedExists(0L), "v0 feed is past BOTH horizons")
    assert(feedExists(1L) && feedExists(2L) && feedExists(3L),
      "feeds inside keepChangeVersions must survive data vacuum")
    assert(graft.sinks.ManifestUpsertSink.readChanges(spark, root, 1L)
      .select("id").as[Long].collect().toSeq == Seq(1L),
      "a retained feed version stays readable after its manifest is gone")
    intercept[IllegalStateException] {
      graft.sinks.ManifestUpsertSink.readVersion(spark, root, 1L)
    }
    // default (None): feed horizon = data horizon — the old behavior
    sink.vacuum(keepVersions = 1)
    assert(!feedExists(1L) && !feedExists(2L) && feedExists(3L))
  }

  test("commit race: a second writer of the same manifest version fails loudly (both stores)") {
    val stores = Seq(
      "nio" -> graft.sinks.TableStore.NioStore,
      "hadoop" -> new graft.sinks.TableStore.HadoopStore)
    for ((label, store) <- stores) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_race_${label}_").toString
      store.commitNew(dir, "v0.manifest", "version=0\nbatchId=0")
      val e = intercept[IllegalStateException] {
        store.commitNew(dir, "v0.manifest", "version=0\nbatchId=99")
      }
      assert(e.getMessage.contains("concurrent commit"), s"$label store race message")
      assert(store.readString(s"$dir/v0.manifest").contains("batchId=0"),
        s"$label store: the losing writer must not clobber the committed manifest")
      assert(store.listNames(dir) == Seq("v0.manifest"),
        s"$label store: the losing temp file must be cleaned up")
    }
  }

  test("manifest sink: bucket count is part of the table — reopening with a different count fails") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest6_").toString
    new graft.sinks.ManifestUpsertSink(root, "id", buckets = 8)
      .upsertBatch(Seq((1L, "a", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    assert(graft.sinks.ManifestUpsertSink.latestManifest(root).get.buckets.contains(8),
      "committed manifests must record the table's bucket count")
    val wrong = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    val e = intercept[IllegalStateException] {
      wrong.upsertBatch(Seq((2L, "b", 2L)).toDF("id", "p", "seq"), "seq", 1L)
    }
    assert(e.getMessage.contains("buckets=8"), "merge must name the committed count")
    intercept[IllegalStateException] { wrong.compact(spark) }
    // the correctly-configured sink still works
    new graft.sinks.ManifestUpsertSink(root, "id", buckets = 8)
      .upsertBatch(Seq((2L, "b", 2L)).toDF("id", "p", "seq"), "seq", 1L)
  }

  test("changesStream: the CDC subscription tails merge-time feeds across versions, live") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cdcsub_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdcsub_ck_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    sink.upsertBatch(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "p", "seq"), "seq", 1L)
    val q = graft.streaming.EventStream.changesStream(spark, root)
      .writeStream.format("memory").queryName("cdc_feed")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .start()
    try {
      q.processAllAvailable()
      def got(): Set[(Long, Long, String)] = spark.table("cdc_feed")
        .select("version", "id", "change").as[(Long, Long, String)].collect().toSet
      assert(got() == Set((0L, 1L, "inserted"), (0L, 2L, "inserted"),
        (1L, 2L, "updated"), (1L, 3L, "inserted")),
        "the subscription must replay every committed version's feed")
      // a merge WHILE subscribed: the new version's changes arrive without
      // restart — the file source discovers the new version dir itself
      sink.upsertBatch(Seq((4L, "d", 3L)).toDF("id", "p", "seq"), "seq", 2L)
      q.processAllAvailable()
      assert(got().filter(_._1 == 2L) == Set((2L, 4L, "inserted")),
        "a live merge's feed must flow to the subscriber")
    } finally q.stop()
  }

  test("maintainedAggStream: streaming IVM over the CDC subscription tracks the snapshot aggregate exactly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ivm_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivm_ck_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, 10.0, 1L), (2L, 20.0, 1L), (3L, 30.0, 1L))
      .toDF("id", "v", "seq"), "seq", 0L)
    sink.upsertBatch(Seq((2L, 25.0, 2L), (4L, 40.0, 2L))
      .toDF("id", "v", "seq"), "seq", 1L)
    val q = graft.streaming.EventStream.maintainedAggStream(
        graft.streaming.EventStream.changesStream(spark, root),
        imageSchema = "id BIGINT, seq BIGINT, v DOUBLE",
        groupExpr = pmod(col("id"), lit(2L)), valueField = "v")
      .writeStream.format("memory").queryName("ivm_totals")
      .outputMode("complete") // memory sink: full state replaces the table per trigger
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .start()
    try {
      q.processAllAvailable()
      def snapshotAgg(): Map[Long, Double] = sink.read(spark)
        .groupBy(pmod(col("id"), lit(2L)).as("grp"))
        .agg(sum(col("v")).as("t")).as[(Long, Double)].collect().toMap
      def state(): Map[Long, Double] = spark.table("ivm_totals")
        .select(col("grp"), col("total")).as[(Long, Double)].collect().toMap
      assert(state() == snapshotAgg(),
        s"after draining the feed the maintained state must equal the snapshot aggregate")
      assert(state() == Map(0L -> 65.0, 1L -> 40.0))
      // a live merge: the maintained view follows without any rescan
      sink.upsertBatch(Seq((1L, 15.0, 3L), (6L, 60.0, 3L)).toDF("id", "v", "seq"), "seq", 2L)
      q.processAllAvailable()
      assert(state() == snapshotAgg() && state() == Map(0L -> 125.0, 1L -> 45.0))
      // a live DELETE: the `deleted` feed row's BEFORE image subtracts —
      // the maintained view absorbs all three CDC verbs
      sink.deleteKeys(Seq(2L, 6L).toDF("id"), batchId = 3L)
      q.processAllAvailable()
      assert(state() == snapshotAgg() && state() == Map(0L -> 40.0, 1L -> 45.0))
    } finally q.stop()
  }

  test("materialized view in the lake: CDC in, versioned MV out, == recompute under merges+deletes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mv_src_").toString
    val mvRoot = java.nio.file.Files.createTempDirectory("graft_mv_out_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mv_ck_").toString
    val src = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    src.upsertBatch(Seq((1L, 10.0, 1L), (2L, 20.0, 1L), (3L, 30.0, 1L))
      .toDF("id", "v", "seq"), "seq", 0L)
    val mvSink = new graft.sinks.ManifestUpsertSink(mvRoot, "grp", buckets = 2)
    val q = graft.streaming.EventStream.startMaintainedView(
      spark, root, mvSink, imageSchema = "id BIGINT, seq BIGINT, v DOUBLE",
      groupExpr = pmod(col("id"), lit(2L)), valueField = "v",
      checkpoint = ckpt, intervalMs = 50L)
    try {
      def recompute(): Map[Long, Double] = src.read(spark)
        .groupBy(pmod(col("id"), lit(2L)).as("grp"))
        .agg(sum(col("v")).as("t")).as[(Long, Double)].collect().toMap
      def mv(): Map[Long, Double] = mvSink.read(spark)
        .select(col("grp"), col("total")).as[(Long, Double)].collect().toMap
      q.processAllAvailable()
      assert(mv() == recompute() && mv() == Map(0L -> 20.0, 1L -> 40.0),
        "after draining the seed feed the MV table must equal the recompute")
      // live merge: O(changed groups) MV maintenance
      src.upsertBatch(Seq((2L, 25.0, 2L), (4L, 40.0, 2L)).toDF("id", "v", "seq"), "seq", 1L)
      q.processAllAvailable()
      assert(mv() == recompute() && mv() == Map(0L -> 65.0, 1L -> 40.0))
      // live deletes, including GROUP DEATH: killing ids 1 and 3 empties
      // group 1 — its MV row must be deleted, not left at zero
      src.deleteKeys(Seq(1L, 3L).toDF("id"), batchId = 2L)
      q.processAllAvailable()
      assert(mv() == recompute() && mv() == Map(0L -> 65.0),
        "an emptied group must vanish from the MV (count-delta group death)")
      // the MV is itself a lake table: versioned, with its own CDC feed
      val mvM = graft.sinks.ManifestUpsertSink.snapshotManifest(mvRoot, None)
      assert(mvM.version >= 2L, "each maintenance trigger commits a new MV version")
      val mvFeed = spark.read.format("graft-manifest")
        .option("changesOf", mvM.version).load(mvRoot)
        .select("grp", "change").as[(Long, String)].collect().toSet
      assert(mvFeed.nonEmpty, "the MV's own merges/deletes record a change feed")
      // time travel on the VIEW: the pre-delete MV version still reads
      val prev = graft.sinks.ManifestUpsertSink
        .readVersion(spark, mvRoot, mvM.version - 1)
        .select(col("grp"), col("total")).as[(Long, Double)].collect().toMap
      assert(prev == Map(0L -> 65.0, 1L -> 40.0))
    } finally q.stop()
  }

  test("timestampAsOf time travel: commit stamps resolve snapshots by wall clock") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_tsasof_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, "a", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    val ts0 = graft.sinks.ManifestUpsertSink.snapshotManifest(root, None).ts.get
    Thread.sleep(25) // distinct wall-clock stamps
    sink.upsertBatch(Seq((1L, "b", 2L)).toDF("id", "p", "seq"), "seq", 1L)
    val ts1 = graft.sinks.ManifestUpsertSink.snapshotManifest(root, None).ts.get
    assert(ts0 < ts1)

    def pAt(tsMs: Long): String = graft.sinks.ManifestUpsertSink
      .readTimestamp(spark, root, tsMs).select("p").as[String].head()
    assert(pAt(ts0) == "a" && pAt(ts1 - 1) == "a",
      "between the commits, the v0 snapshot is current")
    assert(pAt(ts1) == "b" && pAt(ts1 + 60000) == "b",
      "at/after the last commit, the latest snapshot is current")
    intercept[IllegalStateException] { pAt(ts0 - 10) } // predates the table

    // the DSv2 option: epoch millis and ISO-8601 both resolve
    assert(spark.read.format("graft-manifest").option("timestampAsOf", ts0)
      .load(root).select("p").as[String].head() == "a")
    assert(spark.read.format("graft-manifest")
      .option("timestampAsOf", java.time.Instant.ofEpochMilli(ts0).toString)
      .load(root).select("p").as[String].head() == "a")
  }

  test("history: the manifest log as a DataFrame, one row per committed version") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_hist_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    sink.deleteKeys(Seq(2L).toDF("id"), 1L)
    sink.compact(spark)
    val h = graft.sinks.ManifestUpsertSink.history(spark, root)
      .orderBy("version")
      .select("version", "batch_id", "has_change_feed", "n_files", "key_col")
      .as[(Long, Long, Boolean, Long, Option[String])].collect().toSeq
    assert(h.map(_._1) == Seq(0L, 1L, 2L), "one row per committed version")
    assert(h.map(_._3) == Seq(true, true, false),
      "merge and delete record feeds; compaction changes no rows")
    assert(h.map(_._2) == Seq(0L, 1L, 1L),
      "compaction keeps the last data batch id — the replay guard's contract")
    assert(h.forall(_._4 > 0) && h.forall(_._5.contains("id")))
    val ts = graft.sinks.ManifestUpsertSink.history(spark, root)
      .orderBy("version").select("ts").as[Option[Long]].collect()
    assert(ts.forall(_.isDefined) && ts.flatten.sliding(2).forall(p => p(0) <= p(1)),
      "every commit is stamped; single-writer stamps are monotone")
  }

  test("graft-manifest DSv2 read: latest/versionAsOf/changesOf match the Scala reads; bad version raises") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest8_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    // schema-evolving second batch: the connector must mergeSchema
    sink.upsertBatch(Seq((2L, "b2", "en", 2L), (3L, "c", "de", 2L))
      .toDF("id", "p", "lang", "seq"), "seq", 1L)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "p").as[(Long, String)].collect().toMap
    val latest = spark.read.format("graft-manifest").load(root)
    assert(latest.columns.toSet == Set("id", "p", "lang", "seq"),
      "connector must merge schema vintages across buckets")
    assert(rows(latest) == rows(sink.read(spark)))
    assert(rows(spark.read.format("graft-manifest").option("versionAsOf", 0L).load(root))
      == rows(graft.sinks.ManifestUpsertSink.readVersion(spark, root, 0L)),
      "versionAsOf must time-travel exactly as the Scala read")
    val feedSql = spark.read.format("graft-manifest").option("changesOf", 1L).load(root)
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(feedSql == Map(2L -> "updated", 3L -> "inserted"))
    intercept[IllegalStateException] {
      spark.read.format("graft-manifest").option("versionAsOf", 9L).load(root).collect()
    }
    // pushdown sanity: a filtered projection plans as an ordinary parquet
    // scan with pushed filters — the connector adds resolution, not a
    // bespoke (and unoptimized) reader
    val plan = latest.filter(col("id") === 2L).select("p")
      .queryExecution.executedPlan.toString
    // the key column is non-nullable by contract (r12), so Catalyst
    // drops the redundant IsNotNull and pushes only the equality
    assert(plan.contains("PushedFilters: [EqualTo(id,2)]"),
      s"filter must push into the parquet scan:\n${plan.take(1500)}")
    assert(!plan.contains("IsNotNull(id)"),
      "a non-nullable key must not generate an IsNotNull guard")
  }

  test("deleteKeys: touched-bucket rewrite, deleted feed rows with BEFORE images, no-op edges") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest9_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch((1L to 20L).map(i => (i, s"p$i", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    val before = graft.sinks.ManifestUpsertSink.snapshotManifest(root, None)

    // delete two existing keys and one absent key
    sink.deleteKeys(Seq(3L, 7L, 999L).toDF("id"), batchId = 1L)
    val after = graft.sinks.ManifestUpsertSink.snapshotManifest(root, None)
    assert(sink.read(spark).select("id").as[Long].collect().toSet
      == (1L to 20L).toSet -- Set(3L, 7L))
    // untouched buckets carry their ORIGINAL files forward verbatim
    val touched = Seq(3L, 7L, 999L).toDF("id")
      .select(pmod(xxhash64(col("id")), lit(4L))).as[Long].collect().toSet
    val carriedBefore = before.files.filterNot(f => touched(f.bucket)).toSet
    assert(carriedBefore.subsetOf(after.files.toSet),
      "deleteKeys must not rewrite untouched buckets")
    // the feed records ONLY the keys that existed, with BEFORE images
    val feed = graft.sinks.ManifestUpsertSink.readChanges(spark, root, 1L)
      .select("id", "change", "old_image", "new_image")
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    assert(feed.map(_._1).toSeq == Seq(3L, 7L))
    assert(feed.forall(r => r._2 == "deleted" && r._3 != null && r._4 == null))
    assert(feed.head._3.contains("\"p\":\"p3\""), s"BEFORE image carries the payload: ${feed.head._3}")

    // replayed delete is a no-op; so is a delete of only-absent keys
    sink.deleteKeys(Seq(5L).toDF("id"), batchId = 1L)
    assert(graft.sinks.ManifestUpsertSink.snapshotManifest(root, None).version == after.version,
      "replayed batch id must not commit")
    sink.deleteKeys(Seq(888L).toDF("id"), batchId = 2L)
    assert(sink.read(spark).count() == 18)

    // deleting a whole bucket's keys makes the bucket vanish from the manifest
    val bucketOfOne = Seq(1L).toDF("id")
      .select(pmod(xxhash64(col("id")), lit(4L))).as[Long].collect().head
    val sameBucket = (1L to 20L).filter(k =>
      graft.sinks.ManifestStats.bucketOf(k, 4).contains(bucketOfOne))
    sink.deleteKeys(sameBucket.toDF("id"), batchId = 3L)
    val m = graft.sinks.ManifestUpsertSink.snapshotManifest(root, None)
    assert(!m.files.exists(_.bucket == bucketOfOne),
      "an emptied bucket must stop appearing in the manifest")
    assert(sink.read(spark).count() == 18 - sameBucket.count(k => k != 3L && k != 7L))
  }

  test("merge-time change feed equals the snapshot diff; vacuum removes emptied dirs") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest7_").toString
    val sink = new graft.sinks.ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("id", "p", "seq"), "seq", 0L)
    // batch 1: update key 2 (new value), rewrite key 3 with the IDENTICAL
    // row (same payload AND seq), insert key 4 — the feed must
    // distinguish all three
    sink.upsertBatch(Seq((2L, "b2", 2L), (3L, "c", 1L), (4L, "d", 2L))
      .toDF("id", "p", "seq"), "seq", 1L)

    val feed = graft.sinks.ManifestUpsertSink.readChanges(spark, root, 1L)
    val classified = feed.select(col("id"),
      when(col("old_hash").isNull, lit("inserted"))
        .when(col("old_hash") === col("new_hash"), lit("rewritten_unchanged"))
        .otherwise(lit("updated")).as("kind"))
      .as[(Long, String)].collect().toMap
    assert(classified == Map(2L -> "updated", 3L -> "rewritten_unchanged", 4L -> "inserted"))

    // the feed must agree with the full snapshot diff on the same history
    // (restricted to touched keys — untouched rows never enter the feed)
    val v0 = graft.sinks.ManifestUpsertSink.readVersion(spark, root, 0L)
      .select(col("id"), col("p").as("p0"), col("seq").as("s0"))
    val v1 = graft.sinks.ManifestUpsertSink.readVersion(spark, root, 1L)
      .select(col("id"), col("p").as("p1"), col("seq").as("s1"))
    val diff = v0.join(v1, Seq("id"), "full_outer")
      .filter(col("p0").isNull || !(col("p0") <=> col("p1") && col("s0") <=> col("s1")))
      .select(col("id"),
        when(col("p0").isNull, lit("inserted")).otherwise(lit("updated")).as("kind"))
      .as[(Long, String)].collect().toMap
    // key 3's rewrite carried identical values, so the diff calls it
    // unchanged while the feed records the physical rewrite; modulo that
    // documented distinction the two views are identical
    assert(classified.filter(_._2 != "rewritten_unchanged") == diff)

    // vacuum after compaction: the dropped versions' data AND change dirs
    // disappear entirely (compaction makes every v0/v1 file dead — an
    // un-compacted vacuum rightly keeps carried-forward v0 files alive)
    sink.compact(spark)
    sink.vacuum(keepVersions = 1)
    val liveDirs = graft.sinks.ManifestUpsertSink.snapshotManifest(root, None).files
      .map(f => java.nio.file.Paths.get(f.path).getParent.getParent.getFileName.toString)
      .toSet
    assert(new java.io.File(s"$root/data").list().toSet == liveDirs,
      "vacuum must remove dropped version data dirs entirely, not just their files")
    for (v <- Seq("v0", "v1"))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_changes", v)),
        s"vacuum must reclaim the dropped $v change feed")
    intercept[IllegalStateException] {
      graft.sinks.ManifestUpsertSink.readChanges(spark, root, 0L)
    }
    assert(sink.read(spark).count() == 4, "live version intact after vacuum")
  }
}
