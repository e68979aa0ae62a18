package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.Sources
import graft.stats.{StatsServer, StreamMetrics}
import graft.streaming.EventStream

/** T4 — lifecycle wiring (the reference's component system-map,
  * core.clj:214-226): one Engine owns the SparkSession, the streaming
  * query, the metrics listener, and the stats HTTP server.
  *
  * T3 — failure policy: where the reference calls System/exit 2 on any
  * S3/stream IOException (core.clj:135-139, 154-157) and leans on a
  * supervisor to restart the process, this engine lets the
  * StreamingQuery fail, surfaces the cause from awaitTermination, and
  * restarts from the checkpoint — the Spark-native form of the same
  * fail-stop-and-restart contract, minus the data loss window of the
  * reference's unflushed gzip buffer. */
final class Engine(spark: SparkSession, config: Config) {

  private var query: StreamingQuery = _
  private var server: StatsServer = _
  val metrics = new StreamMetrics

  /** Bind source → parse → line-file sink, start stats. Returns the
    * bound HTTP port (useful when config.port = 0 in tests). */
  def start(): Int = {
    spark.streams.addListener(metrics)
    val raw = config.sourcePath match {
      case Some(path) if config.sourceFormat == "records" =>
        // replay/migrate from an existing seq-named record log: original
        // sequence numbers preserved end to end (LWW stays correct)
        Sources.records(spark, path)
      case Some(path) if config.sourceFormat == "kinesis-sim" =>
        // the production Kinesis SHAPE, end to end: wire records through
        // the same one-line adapter a real connector binding uses
        Sources.fromKinesisWire(Sources.kinesisSim(spark, path, config.streamName))
      case Some(path) => Sources.jsonLines(spark, path)
      case None       => Sources.rate(spark, rowsPerSecond = 100)
    }
    val parsed = EventStream.parse(raw)
      .withColumnRenamed("id", "sequenceNumber")
      .selectExpr("sequenceNumber", "orig_data AS data", "coalesce(ts, current_timestamp()) AS ts")
    val sinkPath = s"${config.bucket}/${config.appName}/${config.streamName}"
    val ckpt = config.checkpoint.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_ckpt_").toString)
    query = config.sinkLayout match {
      case "seq" => EventStream.startSeqNamedSink(
        parsed, sinkPath, ckpt,
        intervalMs = config.intervalSec * 1000, batchSize = config.batchSize)
      case _ => EventStream.startLineFileSink(
        parsed, sinkPath, ckpt,
        intervalMs = config.intervalSec * 1000, batchSize = config.batchSize)
    }
    server = new StatsServer(config.port, config.appName, metrics)
    server.start()
  }

  def processAllAvailable(): Unit = query.processAllAvailable()

  /** Block until the query dies; rethrows the failure cause (T3). */
  def awaitTermination(): Unit = query.awaitTermination()

  def stop(): Unit = {
    if (query != null) {
      // stop() on an already-FAILED query rethrows its stored cause; that
      // cause is awaitTermination's to surface (T3), and a second throw
      // here would mask it / break caller cleanup. Genuine stop failures
      // on a healthy query still propagate.
      try query.stop()
      catch { case e: Throwable if query.exception.isDefined => () }
    }
    if (server != null) server.stop()
    spark.streams.removeListener(metrics)
  }
}

/** EP1 — CLI boot (core.clj:228-252): parse options (usage/exit on
  * error, required-bucket check), wire the system, run until the stream
  * terminates; non-zero exit on failure mirrors the reference's
  * fail-stop exit 2. */
object Main {
  def main(args: Array[String]): Unit =
    Config.parse(args.toIndexedSeq) match {
      case Left(err) =>
        System.err.println(err)
        System.err.println(Config.usage)
        sys.exit(1)
      case Right(config) =>
        Log.init() // tagged format, engine INFO, noisy namespaces WARN
        val spark = SparkSession.builder()
          .appName(config.appName)
          .config("spark.sql.session.timeZone", "UTC")
          .config(Tables.sessionConf)
          .config(graft.stats.MetricsBinding.jmxConf) // K5 JMX reporter
          .config(config.metricsConsoleSec // K5 console reporter (opt-in)
            .map(graft.stats.MetricsBinding.consoleConf).getOrElse(Map.empty))
          .withExtensions(new GraftExtensions)
          .getOrCreate()
        val engine = new Engine(spark, config)
        engine.start()
        // SIGTERM/exit path: System.exit does NOT unwind the stack, so a
        // `finally` never runs on the fail-stop path — a shutdown hook is
        // the one mechanism that stops the query/server on BOTH clean
        // SIGTERM (the reference's component stop, core.clj:251-252) and
        // exit(2). stop() is idempotent and failure-tolerant.
        val hook = sys.addShutdownHook { engine.stop() }
        try {
          engine.awaitTermination()
          hook.remove()
          engine.stop()
        } catch {
          case e: Throwable =>
            System.err.println(s"stream failed: ${e.getMessage}")
            sys.exit(2) // T3 fail-stop; supervisor/checkpoint restarts (hook stops components)
        }
    }
}
