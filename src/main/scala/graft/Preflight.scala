package graft

import org.apache.spark.sql.SparkSession

/** Schema-drift preflight for Verify/Bench: before any query runs, print one
  * line per corpus table — row count + column:dtype fingerprint — and a
  * targeted diagnosis for known drift points. When the driver regenerates
  * `/root/testdata` with a different encoding (r06: `events.ts` flipped from
  * parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS)), this block turns "73
  * identical analysis stack traces" into one legible line at the top of the
  * run log. Count uses the parquet footer only (no data scan) so the
  * preflight costs milliseconds even at large SF.
  */
object Preflight {
  def report(spark: SparkSession, sfDir: String): Seq[String] =
    Tables.names.flatMap { t =>
      try {
        val df = Tables.load(spark, sfDir, t)
        val fp = df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
        val n = df.count()
        val diag = if (t != "events") "" else df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            " [events.ts: nanos-long vintage]"
          case dt =>
            s" [events.ts: ${dt.simpleString} (µs vintage) — ts_ns derived via unix_micros*1000]"
        }
        Seq(s"[preflight] $t rows=$n schema={$fp}$diag")
      } catch {
        case e: Throwable =>
          Seq(s"[preflight] $t UNREADABLE: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
}
