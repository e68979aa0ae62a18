package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** S1 — source abstraction. Every source yields the raw record shape the
  * reference's processor consumes (core.clj:149): `sequenceNumber` string,
  * `data` string payload, plus `ts` event-time for partitioning/windows.
  *
  * Correctness and bench never depend on a cloud connector (SURVEY §7.4
  * risk 4): file/rate/memory sources cover tests and backfill;
  * [[kinesisReader]] is the one production binding point and is only a
  * configured reader — `.load()` happens at the edge. */
object Sources {

  /** Streaming file source over the K1 line-file layout (gzip text,
    * date-partitioned): the re-reader of the engine's own sink output. */
  def lineFiles(spark: SparkSession, path: String): DataFrame =
    graft.sinks.LineFileSink.read(spark, path)

  /** Streaming text-file source of raw JSON lines, sequence numbers
    * synthesized MONOTONE (for replay/backfill of foreign data that has
    * no sequence numbers).
    *
    * Monotonicity matters: K3's last-write-wins upsert and the
    * running-count state's `lastSeq` both order records by sequence
    * number, so a pure content-hash seq (an id, not an order) silently
    * breaks "last"-wins when the same key is replayed. The synthesized
    * seq is two fixed-width halves: the batch arrival time in micros
    * (`current_timestamp` is constant within a trigger, so a later batch
    * always compares greater — lexicographic order == arrival order
    * across micro-batches, which is exactly the property replays need),
    * then a content-hash suffix as a stable discriminator between
    * different records of one batch (foreign lines carry no intrinsic
    * order WITHIN a batch, and streaming projections admit no monotonic
    * row id). Width stays 56 chars like real sequence numbers. */
  def jsonLines(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path)
      .select(
        concat(
          lpad(unix_micros(current_timestamp()).cast("string"), 28, "0"),
          lpad(lower(hex(xxhash64(col("value")))), 28, "0")
        ).as("sequenceNumber"),
        col("value").as("data"),
        current_timestamp().as("ts"))

  /** Rate source for load tests: synthetic two-level JSON payloads at
    * `rowsPerSecond`, sequence numbers from the rate source's value. */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        lpad(col("value").cast("string"), 56, "0").as("sequenceNumber"),
        concat(
          lit("{\"epoch\": "), unix_millis(col("timestamp")).cast("string"),
          lit(", \"body\": \"{\\\"id\\\": \\\""), col("value").cast("string"),
          lit("\\\", \\\"t\\\": "), unix_millis(col("timestamp")).cast("string"),
          lit("}\"}")).as("data"),
        col("timestamp").as("ts"))

  /** S1 — stream the K2 seq-named object layout through the engine's own
    * DataSource V2 connector ([[RecordsSource]]): the durable-log stand-in
    * for the Kinesis stream, with the file-name sequence numbers as the
    * streaming offset (the reference's resume-after-max-key contract,
    * core.clj:47-50). Batch form: [[recordsBatch]]. */
  def records(spark: SparkSession, path: String): DataFrame =
    spark.readStream.format("graft-records").load(path)

  /** Batch scan of the same layout via the same connector (backfill). */
  def recordsBatch(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-records").load(path)

  /** Production Kinesis binding point (S1, core.clj:165-173): a fully
    * configured reader for the spark-sql-kinesis connector. The connector
    * is an external artifact, so this never calls `.load()` — prod code
    * does `Sources.kinesisReader(spark, stream, region).load()`; tests
    * assert the configuration without AWS. Unlike the reference we do NOT
    * disable checkpointing (the worker sets `:checkpoint false`,
    * core.clj:170) — restart-from-checkpoint is the T3 policy. */
  def kinesisReader(spark: SparkSession, streamName: String, region: String,
      initialPosition: String = "latest"): DataStreamReader =
    spark.readStream.format("kinesis")
      .option("streamName", streamName)
      .option("region", region)
      .option("initialPosition", initialPosition)

  /** Kinesis wire schema → engine record shape: the ONE adapter between
    * any Kinesis-shaped stream (the real connector or the
    * [[KinesisSimSource]] test double — both emit
    * data/streamName/partitionKey/sequenceNumber/approximateArrivalTimestamp)
    * and [[graft.streaming.EventStream.parse]]. Payloads are UTF-8 JSON
    * (the reference decodes `:data` bytes the same way, core.clj:149);
    * `ts` defaults to arrival time and is refined to the payload's event
    * time by the parse stage downstream. */
  def fromKinesisWire(wire: DataFrame): DataFrame =
    wire.select(
      col("sequenceNumber"),
      col("data").cast("string").as("data"),
      col("approximateArrivalTimestamp").as("ts"))

  /** The wire-shaped Kinesis double over a K2 seq-named log (streaming).
    * Engine-ready form: `fromKinesisWire(kinesisSim(...))`. */
  def kinesisSim(spark: SparkSession, path: String,
      streamName: String = "events"): DataFrame =
    spark.readStream.format("graft-kinesis-sim")
      .option("streamName", streamName).load(path)

  /** Batch scan of the same double (backfill-path parity checks). */
  def kinesisSimBatch(spark: SparkSession, path: String,
      streamName: String = "events"): DataFrame =
    spark.read.format("graft-kinesis-sim")
      .option("streamName", streamName).load(path)
}
