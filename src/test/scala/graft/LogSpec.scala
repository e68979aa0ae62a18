package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.scalatest.funsuite.AnyFunSuite

/** The logging module's policy contract (reference kinesis3.log):
  * tagged console format, engine INFO, noisy namespaces capped. */
class LogSpec extends AnyFunSuite {

  test("Log.init installs the tagged appender and the level policy; idempotent") {
    Log.init()
    Log.init() // second call must not stack appenders

    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val root = ctx.getConfiguration.getRootLogger
    assert(root.getAppenders.containsKey("graft-console"),
      "root logger must carry the engine's console appender")
    assert(root.getAppenders.size() == 1, "init must replace, not stack, appenders")
    val layout = root.getAppenders.get("graft-console").getLayout.toString
    assert(layout.contains(Log.Tag), s"layout must carry the ${Log.Tag} tag: $layout")

    // level policy: engine at INFO, blacklist namespaces at WARN
    assert(LogManager.getLogger("graft.streaming.EventStream").getLevel == Level.INFO)
    for (ns <- Log.QuietNamespaces)
      assert(LogManager.getLogger(s"$ns.SomeClass").getLevel == Level.WARN, ns)

    // and the engine can actually log through it
    Log.logger("graft.LogSpec").info("logging module self-check line")
  }
}
