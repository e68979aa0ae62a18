package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Oracle-checked queries exercising the sink tier. q38 actually writes
  * and re-reads gzip line files (the one place a correctness query touches
  * disk — a scratch dir, removed by the OS); q39 pins the K3 LWW upsert
  * semantics as a pure batch operator. */
object SinkQueries {

  // ---------------------------------------------------------------- q38
  /** K1/K2 round-trip: events → "<seq> <data>" date-partitioned gzip text
    * → re-read via the F11 split → original rows. The oracle states the
    * expected reconstruction directly; a hash match proves the sink+scan
    * pair is lossless including the gzip codec and partition layout. */
  val q38 = QueryDef(
    "q38_line_sink_roundtrip",
    (s, d) => {
      val raw = Tables.events(s, d).select(
        lpad(col("event_id").cast("string"), 56, "0").as("sequenceNumber"),
        col("props").as("data"),
        col("ts"))
      val dir = Files.createTempDirectory("graft_q38_").toString
      LineFileSink.write(raw, dir, col("ts"))
      LineFileSink.read(s, dir)
        .select(col("sequenceNumber"), col("data"))
        .orderBy(col("sequenceNumber"))
    },
    Some("""SELECT lpad(CAST(event_id AS VARCHAR), 56, '0') AS sequenceNumber,
        props AS data
      FROM events ORDER BY sequenceNumber"""))

  // ---------------------------------------------------------------- q39
  /** K3 LWW upsert semantics (db.clj:113-134 effective behavior): deliver
    * every event twice — the redelivery carrying a newer order stamp and a
    * changed payload — and assert the operator keeps exactly the newest
    * row per key. Re-running on its own output is a no-op (idempotence;
    * asserted in SinkSpec). */
  val q39 = QueryDef(
    "q39_upsert_lww",
    (s, d) => {
      val e = Tables.events(s, d)
      val first = e.select(col("event_id"), col("value"), lit(1L).as("delivery"))
      val redelivered = e.select(col("event_id"), (col("value") * 2).as("value"), lit(2L).as("delivery"))
      JdbcUpsertSink.lastWriteWins(first.unionByName(redelivered), "event_id", col("delivery"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, value * 2 AS value, CAST(2 AS BIGINT) AS delivery
      FROM events ORDER BY event_id"""))

  // ---------------------------------------------------------------- q90
  /** S1 connector round-trip: events → seq-named gzip chunks
    * (K2 `yyyy/MM/dd/<last-seq>.records.log.gz` layout) → batch read back
    * through the `graft-records` DataSource V2 connector. The oracle states
    * the reconstruction, including the `partition` column the connector
    * derives from the date prefix — a hash match proves the connector's
    * chunk listing, gzip decode, F11 split, and prefix attribution are all
    * lossless. (The connector's streaming offset semantics are
    * RecordsSourceSpec's job; its data plane is identical batch vs
    * micro-batch — both read whole chunks.) */
  val q90 = QueryDef(
    "q90_records_source_roundtrip",
    (s, d) => {
      val raw = Tables.events(s, d).select(
        lpad(col("event_id").cast("string"), 56, "0").as("sequenceNumber"),
        col("props").as("data"),
        col("ts"))
      val dir = Files.createTempDirectory("graft_q90_").toString
      LineFileSink.writeSeqNamed(raw, dir, col("ts"))
      s.read.format("graft-records").load(dir)
        .orderBy(col("sequenceNumber"))
    },
    Some("""SELECT lpad(CAST(event_id AS VARCHAR), 56, '0') AS sequenceNumber,
        props AS data,
        strftime(ts, '%Y/%m/%d') AS partition
      FROM events ORDER BY sequenceNumber"""))

  val all: Seq[QueryDef] = Seq(q38, q39, q90)
}
