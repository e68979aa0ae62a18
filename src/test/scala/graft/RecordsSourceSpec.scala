package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.LineFileSink
import graft.sources.Sources

/** S1 — the `graft-records` DataSource V2 connector over the K2 seq-named
  * layout: batch parity with the text re-reader, streaming offsets from the
  * file-name cursor, incremental pickup of new chunks, and restart-from-
  * checkpoint resuming strictly past the committed cursor (the reference's
  * list-keys-resume-after-max contract, core.clj:47-50). */
class RecordsSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def seq(n: Int) = f"$n%056d"
  private def fixture(dir: String, rows: Seq[(String, String, String)]): Unit = {
    import spark.implicits._
    val df = rows.map { case (s, d, t) => (s, d, Timestamp.valueOf(t)) }
      .toDF("sequenceNumber", "data", "ts")
    LineFileSink.writeSeqNamed(df, dir, col("ts"), maxRecordsPerFile = 2)
  }

  test("batch read through the connector equals the text re-reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_batch_").toString
    fixture(dir, Seq(
      (seq(1), "alpha", "2024-03-01 01:00:00"),
      (seq(2), "beta",  "2024-03-01 02:00:00"),
      (seq(3), "gamma", "2024-03-02 01:00:00")))
    val viaConnector = Sources.recordsBatch(spark, dir)
      .orderBy("sequenceNumber")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(viaConnector == Seq(
      (seq(1), "alpha", "2024/03/01"),
      (seq(2), "beta",  "2024/03/01"),
      (seq(3), "gamma", "2024/03/02")))
    val viaText = LineFileSink.readSeqNamed(spark, dir)
      .orderBy("sequenceNumber")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(viaConnector.map(t => (t._1, t._2)) == viaText)
  }

  test("streaming: file-name seqs are the offset; new chunks arrive incrementally; restart resumes past the cursor") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_stream_").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_rs_chk_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_rs_out_").toString
    fixture(dir, Seq(
      (seq(1), "a", "2024-03-01 01:00:00"),
      (seq(2), "b", "2024-03-01 02:00:00")))

    // parquet file sink: checkpoint-recoverable (memory sink is not), and
    // its manifest gives exactly-once visibility into what each run emitted
    def start() = Sources.records(spark, dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk).outputMode("append").start()
    def emitted(): Seq[(String, String)] =
      spark.read.parquet(out).orderBy("sequenceNumber").collect()
        .map(r => (r.getAs[String]("sequenceNumber"), r.getAs[String]("data"))).toSeq

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(emitted() == Seq(seq(1) -> "a", seq(2) -> "b"))
      // new chunk committed while running: picked up by the next trigger
      fixture(dir, Seq((seq(5), "c", "2024-03-03 01:00:00")))
      q1.processAllAvailable()
      assert(emitted() == Seq(seq(1) -> "a", seq(2) -> "b", seq(5) -> "c"))
    } finally q1.stop()

    // while stopped, more data lands; a restart from the same checkpoint
    // must emit ONLY seqs above the committed cursor (no re-delivery)
    fixture(dir, Seq((seq(7), "d", "2024-03-04 01:00:00")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(emitted() == Seq(
        seq(1) -> "a", seq(2) -> "b", seq(5) -> "c", seq(7) -> "d"))
    } finally q2.stop()
  }

  test("maxChunksPerTrigger rate-limits admission; Trigger.AvailableNow drains the frozen backlog and stops") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_an_").toString
    // 4 chunks (maxRecordsPerFile=2 over 8 rows on one date)
    fixture(dir, (1 to 8).map(i =>
      (seq(i), s"d$i", "2024-03-01 0%d:00:00".format(i))))
    val q = spark.readStream.format("graft-records")
      .option("maxChunksPerTrigger", 1).load(dir)
      .writeStream.format("memory").queryName("rs_an")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query should self-terminate")
      // every pre-start row delivered, in >=4 rate-limited batches
      assert(spark.sql("SELECT count(*) FROM rs_an").collect()(0).getLong(0) == 8)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 4, s"expected >=4 admission-limited batches, got $batches")
    } finally q.stop()
    // chunks landing after termination are not consumed (the cap froze)
    fixture(dir, Seq((seq(9), "late", "2024-03-05 01:00:00")))
    assert(spark.sql("SELECT count(*) FROM rs_an").collect()(0).getLong(0) == 8)
  }

  test("column pruning reaches the V2 scan: a seq-only projection reads a 1-column schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_prune_").toString
    fixture(dir, Seq(
      (seq(1), "alpha", "2024-03-01 01:00:00"),
      (seq(2), "beta", "2024-03-01 02:00:00")))
    val pruned = Sources.recordsBatch(spark, dir).select(col("sequenceNumber"))
    val scanOut = pruned.queryExecution.executedPlan.collectLeaves()
      .head.output.map(_.name)
    assert(scanOut == Seq("sequenceNumber"),
      s"scan must emit only the requested column, got $scanOut")
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq == Seq(seq(1), seq(2)))
    // cursor probes (max over the seq column) ride the same pruned path
    val cursor = Sources.recordsBatch(spark, dir)
      .agg(max(col("sequenceNumber"))).collect()(0).getString(0)
    assert(cursor == seq(2))
  }

  test("filter pushdown prunes chunk files: seq bounds and partition prefixes shrink the scan") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_fprune_").toString
    // writer chunks at 2 records/file: [1,2] on 03/01, [3] on 03/02
    fixture(dir, Seq(
      (seq(1), "alpha", "2024-03-01 01:00:00"),
      (seq(2), "beta", "2024-03-01 02:00:00"),
      (seq(3), "gamma", "2024-03-02 01:00:00")))
    def nParts(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case b: BatchScanExec => b.partitions.size }.get
    val full = Sources.recordsBatch(spark, dir)
    assert(nParts(full) == 2, "two committed chunks, two partitions unpruned")
    // seq lower bound: chunk [1,2] (name seq(2)) provably holds nothing >= seq(3)
    val tail = full.filter(col("sequenceNumber") >= seq(3))
    assert(nParts(tail) == 1, "seq >= bound must prune the earlier chunk file")
    assert(tail.collect().map(_.getString(1)).toSeq == Seq("gamma"))
    // seq upper bound: chunk [3] has exclusive lower seq(2) — nothing <= seq(2)
    val head = full.filter(col("sequenceNumber") <= seq(2))
    assert(nParts(head) == 1, "seq <= bound must prune the later chunk file")
    assert(head.collect().map(_.getString(1)).sorted.toSeq == Seq("alpha", "beta"))
    // partition prefix: month scan keeps both, day equality keeps one
    assert(nParts(full.filter(col("partition").startsWith("2024/03"))) == 2)
    val day = full.filter(col("partition") === "2024/03/02")
    assert(nParts(day) == 1, "partition equality must prune by date prefix")
    assert(day.collect().map(_.getString(1)).toSeq == Seq("gamma"))
    // residual semantics: a bound FALLING INSIDE a chunk keeps the chunk
    // but Spark's row-level filter still applies — no over-delivery
    val mid = full.filter(col("sequenceNumber") >= seq(2))
    assert(nParts(mid) == 2, "seq(2) sits inside chunk [1,2] — conservatively kept")
    assert(mid.collect().map(_.getString(1)).sorted.toSeq == Seq("beta", "gamma"))
  }

  test("a corrupted chunk FAILS the read loudly (fail-stop, never silent truncation)") {
    // T3 alignment at the source: a truncated gzip member must abort the
    // job with a surfaced cause, not quietly yield fewer rows — silent
    // truncation of a durable log is the one unrecoverable failure mode
    // (nothing downstream can know data went missing).
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_poison_").toString
    fixture(dir, Seq(
      (seq(1), "alpha", "2024-03-01 01:00:00"),
      (seq(2), "beta", "2024-03-02 01:00:00")))
    val f = new java.io.File(s"$dir/2024/03/02").listFiles()
      .filter(_.getName.endsWith(".records.log.gz")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath, bytes.take(bytes.length / 2))
    val thrown = intercept[Exception] {
      Sources.recordsBatch(spark, dir).count()
    }
    assert(thrown.getMessage != null, "the abort must carry a cause")
  }

  test("streaming output feeds the standard pipeline shape (parse + window) unchanged") {
    // the connector's output schema is the reference's record shape —
    // prove it binds to the same downstream the other sources feed
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_pipe_").toString
    fixture(dir, Seq(
      (seq(1), """{"epoch": 1704103200000, "body": "{\"id\": \"x\", \"t\": 1704103200000}"}""",
        "2024-03-01 01:00:00")))
    val q = Sources.records(spark, dir)
      .select(col("sequenceNumber"), col("data"))
      .writeStream.format("memory").queryName("rs3").outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM rs3").collect()(0).getLong(0)
      assert(n == 1)
    } finally q.stop()
  }
}
