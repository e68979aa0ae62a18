package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.EventFunctions._

/** K1+K2 — the reference's buffer-and-upload path (gzip line files,
  * date-partitioned object layout) re-expressed as a Spark file sink.
  *
  * Reference behavior (/root/reference/src/kinesis3/core.clj):
  *  - lines are `"<seq> <data>"` appended to a gzip stream (core.clj:153,
  *    100-107)
  *  - rotation uploads to `<bucket>/kinesis3/<stream>/yyyy/MM/dd/
  *    <last-seq>.records.log.gz` (core.clj:41-58)
  *
  * Spark-first mapping: the gzip buffering, rotation, and upload protocol
  * are the file sink's job (task-local buffer → commit); the date key
  * layout becomes `partitionBy(year, month, day)` — which additionally
  * buys partition pruning on re-read, which the reference's flat key
  * layout cannot do. Works identically for `df.write` (batch) and
  * `df.writeStream` (rotation = micro-batch boundary; see
  * streaming.EventStream). */
object LineFileSink {

  /** Write (sequenceNumber, data) rows as date-partitioned gzip line files.
    * `maxRecordsPerFile` enforces the reference's count-based rotation cap
    * (T1 batch-size contract) inside each partition directory. */
  def write(
      raw: DataFrame,
      path: String,
      tsCol: Column,
      maxRecordsPerFile: Long = graft.streaming.RotationTrigger.DefaultBatchSize,
      mode: String = "overwrite"): Unit =
    raw.select(
        formatLine(col("sequenceNumber"), col("data")).as("value"),
        date_format(tsCol, "yyyy").as("year"),
        date_format(tsCol, "MM").as("month"),
        date_format(tsCol, "dd").as("day"))
      .write
      .partitionBy("year", "month", "day")
      .option("compression", "gzip")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(mode)
      .text(path)

  /** Re-read the line files back into (sequenceNumber, data) via the F11
    * fixed-offset split (utils.clj:17-19) — the lossless inverse of write.
    * Date partitions prune on `year`/`month`/`day` filters. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        lineSeqNumber(col("value")).as("sequenceNumber"),
        linePayload(col("value")).as("data"))
}
