package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for the streaming ingest path: times the BATCH
  * equivalent of records-source → parse → select → gzip text write at
  * several chunk sizes and prints the optimized plan, so parse pruning
  * and task parallelism effects are attributable outside the streaming
  * machinery. Not part of the driver contract. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.Tables.sessionConf)
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val epoch0 = 1704103500000L
    for (chunk <- Seq(5000, n / 32 max 1)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_sprof_").toString
      val raw = spark.range(n).select(
        lpad(col("id").cast("string"), 56, "0").as("sequenceNumber"),
        to_json(struct(
          (lit(epoch0) + col("id")).as("epoch"),
          to_json(struct(
            concat(lit("id-"), col("id")).as("id"),
            concat(lit("http://bench/p"), col("id") % 100).as("url"),
            (lit(epoch0) + col("id")).as("t"))).as("body"))).as("data"),
        timestamp_millis(lit(epoch0) + col("id")).as("ts"))
      graft.sinks.LineFileSink.writeSeqNamed(raw, s"$dir/log", col("ts"),
        maxRecordsPerFile = chunk)
      val parsed = graft.streaming.EventStream.parse(
          graft.sources.Sources.recordsBatch(spark, s"$dir/log"))
        .withColumnRenamed("id", "sequenceNumber")
        .selectExpr("sequenceNumber", "orig_data AS data",
          "coalesce(ts, current_timestamp()) AS ts")
      val sel = parsed.select(
        graft.functions.EventFunctions.formatLine(col("sequenceNumber"), col("data")).as("value"),
        date_format(col("ts"), "yyyy").as("year"),
        date_format(col("ts"), "MM").as("month"),
        date_format(col("ts"), "dd").as("day"))
      if (chunk == 5000) println(sel.queryExecution.optimizedPlan.toString.take(4000))
      // warm + 2 timed reps
      for (rep <- 0 to 2) {
        val t0 = System.nanoTime()
        sel.write.partitionBy("year", "month", "day")
          .option("compression", "gzip").mode("overwrite").text(s"$dir/out")
        val dt = (System.nanoTime() - t0) / 1e9
        if (rep > 0) println(f"chunk=$chunk rep=$rep n=$n batch_write_sec=$dt%.3f rows_per_sec=${n / dt}%.0f")
      }
    }
    spark.stop()
  }
}
