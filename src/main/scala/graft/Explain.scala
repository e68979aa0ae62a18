package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of the named
  * queries (or all) so scan pruning (ReadSchema/PushedFilters), join
  * strategies (Broadcast vs SortMerge, no CartesianProduct), and
  * WholeStageCodegen spans can be eyeballed per query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = args.toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.registry.foreach { q =>
      if (only.isEmpty || only(q.name)) {
        println(s"\n========== ${q.name} ==========")
        try q.fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
