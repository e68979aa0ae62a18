package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional: restrict to the named queries (local debugging)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .withExtensions(new GraftExtensions)
    // debugging hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    Preflight.sweepStaleTemp().foreach(System.err.println)
    Preflight.report(spark, sfDir).foreach(System.err.println)
    // derived counts, not hand-tallied (coverage denominators drift otherwise)
    System.err.println(s"[verify] registry=${SparkEntry.registry.size} " +
      s"oracle_eligible=${SparkEntry.oracleSql.size} " +
      s"no_oracle=${SparkEntry.registry.size - SparkEntry.oracleSql.size}")
    // Partial failure must be LOUD: a swallowed per-query exception makes the
    // round's correctness file silently smaller (r06 lost 73 queries to a
    // schema drift and the artifact still read as green). Every failure is
    // recorded in failures.json next to oracle_sql.json so the driver — and
    // the next round's reader — sees exactly what died and why.
    var failures = Vector.empty[(String, String)]
    // HarnessSpec's loudness contract: named queries fail on purpose so the
    // spec can assert a broken query is visible in failures.json (never a
    // silently smaller artifact). No-op unless the property is set.
    val injectFail: Set[String] = sys.props.get("graft.verify.injectFail")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    SparkEntry.registry.foreach { q =>
      if (only.isEmpty || only(q.name)) {
        val t0 = System.nanoTime()
        try {
          if (injectFail(q.name)) sys.error(s"injected failure for ${q.name}")
          q.fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/${q.name}")
          System.err.println(f"[verify] ${q.name} ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
        } catch { case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(400)}"
          failures :+= (q.name -> msg)
          System.err.println(s"[verify] ${q.name} failed: $msg")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/failures.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (failures.nonEmpty)
      System.err.println(s"[verify] *** ${failures.size} QUERIES FAILED — see failures.json ***")
    // HarnessSpec drives main() inside the shared test session; stopping it
    // there would kill every later suite
    if (!sys.props.contains("graft.verify.noStop")) spark.stop()
  }
}
