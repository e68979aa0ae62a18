package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver corpus (TESTDATA.md): one parquet per table under
  * a scale-factor directory. Columns/filters are pruned/pushed by Catalyst at
  * the parquet scan, so loaders never pre-select — callers declare what they
  * need and the optimizer trims the scan (`ReadSchema`/`PushedFilters`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). The supported path is
    * `spark.sql.legacy.parquet.nanosAsLong` (runtime-settable), which reads
    * the column as LongType nanos. We expose BOTH representations so every
    * query picks the right precision:
    *  - `ts_ns`: raw epoch-nanos long (lossless; use when the oracle side
    *    compares via DuckDB `epoch_ns(ts)`)
    *  - `ts`: TimestampType truncated to micros (Spark's native precision;
    *    use for date_trunc/window-style ops where sub-µs never matters)
    * Integer `div` keeps the ns→µs conversion exact — a double division
    * would lose precision above 2^53. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts_ns", col("ts").cast("long"))
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
