package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.events` must be encoding-agnostic: the driver corpus has shipped
  * `events.ts` as BOTH parquet TIMESTAMP(NANOS) (read as LongType under
  * `nanosAsLong`) and TIMESTAMP(MICROS) (read as timestamp/NTZ). A 100-TB
  * lake mixes file vintages, so the loader branches on the READ dtype; this
  * spec writes the same logical rows in both encodings and asserts the
  * loader output is identical (ts_ns exact, ts at µs precision).
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // epoch-nanos values incl. sub-µs residue (ns vintage keeps it; the µs
  // vintage never had it — so fixtures use whole-µs values where outputs
  // must match, plus one ns-only row to pin lossless ts_ns)
  private val microsRows = Seq(
    (1L, 1704103500000000L), // 2024-01-01T10:45:00Z
    (2L, 1704103500123456L),
    (3L, -1000000L)) // pre-epoch: sign guard for the div/mul paths

  private def writeBoth(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables_spec_").toString
    val (nsDir, usDir) = (s"$dir/ns", s"$dir/us")
    // ns vintage: LongType column named ts, written via the nanos flag's
    // read-representation (a raw long column round-trips as INT64 which the
    // nanosAsLong reader surfaces as LongType — same shape the old corpus had)
    microsRows.toDF("event_id", "us")
      .select(col("event_id"), (col("us") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$nsDir/events.parquet")
    // µs vintage: real TimestampType column, stored as parquet timestamp[us]
    microsRows.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$usDir/events.parquet")
    (nsDir, usDir)
  }

  test("events loader yields identical ts/ts_ns for nanos-long and µs-timestamp encodings") {
    val (nsDir, usDir) = writeBoth()
    val a = Tables.events(spark, nsDir).select("event_id", "ts", "ts_ns")
      .orderBy("event_id").collect()
    val b = Tables.events(spark, usDir).select("event_id", "ts", "ts_ns")
      .orderBy("event_id").collect()
    assert(a.toSeq == b.toSeq,
      s"encodings must agree\nns: ${a.mkString("; ")}\nus: ${b.mkString("; ")}")
    // ts_ns exact at whole-µs inputs
    assert(a.map(_.getLong(2)).toSeq == microsRows.map(_._2 * 1000L))
  }

  test("nanos vintage keeps sub-µs residue in ts_ns (lossless long path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables_spec_ns_").toString
    Seq((1L, 1704103500123456789L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Tables.events(spark, dir).select("ts_ns", "ts").head()
    assert(r.getLong(0) == 1704103500123456789L)
    assert(r.getTimestamp(1).getTime == 1704103500123L) // µs-truncated wall clock
  }

  test("driver corpus (current vintage) loads with non-null ts and consistent ts_ns") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val r = e.select(count(lit(1)), sum(when(col("ts").isNull || col("ts_ns").isNull, 1).otherwise(0)),
      sum(when(unix_micros(col("ts")) * 1000L =!= col("ts_ns"), 1).otherwise(0))).head()
    assert(r.getLong(0) == 1000L)
    assert(r.getLong(1) == 0L, "no null ts/ts_ns")
    assert(r.getLong(2) == 0L, "ts and ts_ns agree at µs precision")
  }
}
