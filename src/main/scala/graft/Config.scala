package graft

/** S2 — engine configuration, mirroring the reference's CLI surface
  * (cli-options, /root/reference/src/kinesis3/core.clj:192-211) with the
  * same defaults: port 8989, batch-size 1e6, interval 180 s. The
  * reference requires --s3-bucket and errors out otherwise
  * (core.clj:242-244); parse() preserves that contract as a Left.
  *
  * Unlike the reference (checkpoint disabled, core.clj:170), a checkpoint
  * location is first-class here — Structured Streaming's restart story
  * replaces the reference's process-suicide-and-supervisor loop (T3). */
final case class Config(
    port: Int = 8989,
    appName: String = "graft",
    streamName: String = "events",
    bucket: String = "",
    batchSize: Long = 1000000L,
    intervalSec: Long = 180L,
    checkpoint: Option[String] = None,
    sourcePath: Option[String] = None,
    /** "lines" = raw JSON text files (seqs synthesized); "records" = the
      * engine's own seq-named record log via the graft-records connector;
      * "kinesis-sim" = the same log replayed through the Kinesis
      * wire-schema double (production record shape + adapter). */
    sourceFormat: String = "lines",
    /** Console metrics dump period (K5's console reporter, core.clj:250
      * dumps every 100 s); None = off. */
    metricsConsoleSec: Option[Long] = None,
    /** Output layout. "hive" (default): `year=/month=/day=` text-sink
      * partitions — prunable by date filters, exactly-once via the file
      * manifest. "seq": the reference's exact K2 object naming,
      * `yyyy/MM/dd/<last-seq>.records.log.gz` (core.clj:41-58) — the key
      * listing IS the resume cursor, and the log replays through
      * `--source-format records`. */
    sinkLayout: String = "hive")

object Config {

  val usage: String =
    """graft [options]
      |  --port N            stats HTTP port (default 8989)
      |  --app-name NAME     application name (default graft)
      |  --stream NAME       stream name (default events)
      |  --s3-bucket BUCKET  output bucket/path (REQUIRED)
      |  --batch-size N      rotation count cap (default 1000000)
      |  --interval SECS     rotation interval (default 180)
      |  --checkpoint PATH   streaming checkpoint location
      |  --source-path PATH  file source dir (omit to bind a stream source)
      |  --source-format F   lines (raw JSON text, default) | records
      |                      (seq-named record log via graft-records) |
      |                      kinesis-sim (Kinesis wire-schema double)
      |  --metrics-console S console metrics dump every S seconds (off by default)
      |  --sink-layout L     hive (date-partition pruning, default) | seq
      |                      (the reference's <last-seq>.records.log.gz keys)
      |""".stripMargin

  private def num[T](flag: String, v: String, f: String => T): Either[String, T] =
    try Right(f(v))
    catch { case _: NumberFormatException => Left(s"$flag expects a number, got: $v") }

  def parse(args: Seq[String]): Either[String, Config] = {
    def go(rest: List[String], c: Config): Either[String, Config] = rest match {
      case Nil => Right(c)
      case "--port" :: v :: t        => num("--port", v, _.toInt).flatMap(p => go(t, c.copy(port = p)))
      case "--app-name" :: v :: t    => go(t, c.copy(appName = v))
      case "--stream" :: v :: t      => go(t, c.copy(streamName = v))
      case "--s3-bucket" :: v :: t   => go(t, c.copy(bucket = v))
      case "--batch-size" :: v :: t  => num("--batch-size", v, _.toLong).flatMap(b => go(t, c.copy(batchSize = b)))
      case "--interval" :: v :: t    => num("--interval", v, _.toLong).flatMap(i => go(t, c.copy(intervalSec = i)))
      case "--checkpoint" :: v :: t  => go(t, c.copy(checkpoint = Some(v)))
      case "--source-path" :: v :: t => go(t, c.copy(sourcePath = Some(v)))
      case "--source-format" :: v :: t =>
        if (v == "lines" || v == "records" || v == "kinesis-sim")
          go(t, c.copy(sourceFormat = v))
        else Left(s"--source-format expects lines|records|kinesis-sim, got: $v")
      case "--metrics-console" :: v :: t =>
        num("--metrics-console", v, _.toLong).flatMap(p => go(t, c.copy(metricsConsoleSec = Some(p))))
      case "--sink-layout" :: v :: t =>
        if (v == "hive" || v == "seq") go(t, c.copy(sinkLayout = v))
        else Left(s"--sink-layout expects hive|seq, got: $v")
      case other :: _ => Left(s"unknown option: $other")
    }
    go(args.toList, Config()).flatMap { c =>
      // the reference's required-option check (core.clj:242-244)
      if (c.bucket.isEmpty) Left("Bucket name is required. Please define --s3-bucket")
      else Right(c)
    }
  }
}
