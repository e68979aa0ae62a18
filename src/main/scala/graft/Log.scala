package graft

import org.apache.logging.log4j.{Level, LogManager, Logger}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.ConsoleAppender
import org.apache.logging.log4j.core.config.Configurator
import org.apache.logging.log4j.core.layout.PatternLayout

/** Logging module — the reference's `kinesis3.log` policy (log.clj:8-95)
  * re-expressed against log4j2, Spark's own logging backend:
  *
  *  - a TAGGED line format, `[GRAFT]<timestamp> <level> [<logger>] -
  *    <message><stacktrace>` (the reference's fmt-output-fn emits the
  *    same shape under a `[KINESIS3]` tag, log.clj:8-15) — the tag makes
  *    engine lines grep-able inside a Spark driver log that interleaves
  *    dozens of subsystems;
  *  - engine namespaces at INFO, the noisy library namespaces capped at
  *    WARN (the reference's `:ns-blacklist` intent, log.clj:58-60 — on a
  *    real driver, Spark/Hadoop INFO spam drowns the engine's signal);
  *  - applied PROGRAMMATICALLY at boot, not via a bundled
  *    log4j2.properties: a library that ships an auto-discovered config
  *    file hijacks logging for every application that embeds it. An
  *    embedder that wants full control simply never calls [[init]].
  *
  * The reference's disabled-by-default `:spit` file appender is served by
  * log4j2's own file appenders through standard configuration — not
  * re-implemented here. */
object Log {

  val Tag = "[GRAFT]"
  val Pattern = s"$Tag%d{yyyy-MM-dd'T'HH:mm:ss.SSSX} %level [%c] - %m%n%ex"

  /** ns-blacklist analog: subsystems whose INFO firehose buries the
    * engine's own lines on a production driver. */
  val QuietNamespaces: Seq[String] =
    Seq("org.apache.spark", "org.apache.hadoop", "org.sparkproject")

  /** Engine namespace(s) kept at the reference's default INFO. */
  val EngineNamespace = "graft"

  def logger(name: String): Logger = LogManager.getLogger(name)

  /** Install the policy: tagged console appender on the root logger,
    * engine at `engineLevel`, noisy namespaces at WARN. Idempotent. */
  def init(engineLevel: Level = Level.INFO): Unit = {
    Configurator.setLevel(EngineNamespace, engineLevel)
    QuietNamespaces.foreach(ns => Configurator.setLevel(ns, Level.WARN))
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val root = cfg.getRootLogger
    if (!root.getAppenders.containsKey("graft-console")) {
      val layout = PatternLayout.newBuilder()
        .withPattern(Pattern).withConfiguration(cfg).build()
      // the typed ConsoleAppender.Builder uses self-referential generics
      // scalac cannot infer; the stable static factory sidesteps that
      val console = ConsoleAppender.createAppender(
        layout, null, ConsoleAppender.Target.SYSTEM_ERR, "graft-console",
        false, false, true)
      console.start()
      // replace the default console appender rather than double-printing
      root.getAppenders.keySet().toArray(Array.empty[String])
        .foreach(root.removeAppender)
      root.addAppender(console, null, null)
      ctx.updateLoggers()
    }
  }
}
