package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: `runMain graft.PlanDump <sfDir> <query...>` prints each
  * named query's formatted physical plan — the per-round "is this the plan
  * I'd want at 100 TB" review (pushdown reached the scan? small sides
  * broadcast? shuffle count right?) without spelunking through spec logs.
  * No queries execute; localCheckpoint-backed chains (q185/q258/q265) do
  * run their checkpointed prefix, so expect those to take seconds. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.registry.filter(q => names.isEmpty || names(q.name)).foreach { q =>
      println(s"==== ${q.name}")
      try q.fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"  PLAN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
