package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan probe used during round 13 plan audits (not part of the
  * driver contract). */
object PlanChk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.Tables.sessionConf)
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.sinks.SinkQueries.q323.fn(spark, "/root/testdata/sf0.01")
    println("=== static plan ===")
    println(df.queryExecution.sparkPlan.toString.take(4000))
    df.write.format("noop").mode("overwrite").save()
    println("=== executed ===")
    println(df.queryExecution.executedPlan.toString.take(6000))
    println("probe=" + graft.sources.ManifestSource.RuntimeFilterProbe.last)
    spark.stop()
  }
}
