package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.stats.{EwmaMeter, StreamMetrics}

/** K5 meter semantics: the reference serves codahale-style 1/5/15-minute
  * EWMA rates (core.clj:31-36; README payload). The fold is deterministic
  * with an injected clock, so the decay law is pinned EXACTLY:
  * after a tick the rate folds as `r += alpha * (instant - r)` with
  * `alpha = 1 - exp(-tick/period)`, i.e. n silent ticks multiply the rate
  * by `exp(-n * tick / period)`. */
class StatsSpec extends AnyFunSuite {

  test("EWMA meter: first tick initializes to the instant rate") {
    val m = new EwmaMeter(5000L)
    m.mark(100L, 0L)
    val (r1, r5, r15) = m.snapshot(5000L) // one tick: 100 events / 5 s
    assert(r1 == 20.0 && r5 == 20.0 && r15 == 20.0)
    assert(m.total.sum() == 100L)
  }

  test("EWMA meter: silence decays by exp(-n*tick/period); 1m decays fastest") {
    val m = new EwmaMeter(5000L)
    m.mark(100L, 0L)
    m.snapshot(5000L) // initializing tick at 20/s
    val (r1, r5, r15) = m.snapshot(65000L) // 12 silent ticks
    assert(r1 < r5 && r5 < r15, s"decay order: $r1 $r5 $r15")
    def expected(period: Double) = 20.0 * math.exp(-12 * 5.0 / period)
    assert(math.abs(r1 - expected(60.0)) < 1e-9)
    assert(math.abs(r5 - expected(300.0)) < 1e-9)
    assert(math.abs(r15 - expected(900.0)) < 1e-9)
  }

  test("EWMA meter: steady input converges to the true rate") {
    val m = new EwmaMeter(5000L)
    var t = 0L
    while (t <= 1200000L) { m.mark(50L, t); t += 5000L } // 10/s for 20 min
    val (r1, r5, r15) = m.snapshot(1200000L)
    assert(math.abs(r1 - 10.0) < 1e-6, s"rate-1m $r1")
    assert(math.abs(r5 - 10.0) < 0.2, s"rate-5m $r5")
    assert(math.abs(r15 - 10.0) < 1.0, s"rate-15m $r15")
  }

  test("/stats payload carries the three EWMA rate keys") {
    val json = new StreamMetrics().statsJson()
    assert(json.contains("\"rate-1m\"") && json.contains("\"rate-5m\"")
      && json.contains("\"rate-15m\""))
    assert(json.contains("events.ingested") && json.contains("batch-duration-ms"))
  }

  test("/stats payload parity: full meter/histogram/timer key shape (parsed, not substring-matched)") {
    // The reference serves meters as 1/5/15-min rates + total, and its
    // timer/histogram blocks as percentiles + calls + mean/std-dev
    // (core.clj:71-88). Pin the full key tree so a field rename can't
    // silently break a ported dashboard.
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new StreamMetrics().statsJson())
    def keys(path: String*): Set[String] = {
      val node = path.foldLeft(root)((n, p) => n.path(p))
      assert(!node.isMissingNode, s"missing /stats node: ${path.mkString(".")}")
      val it = node.fieldNames(); val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(keys() == Set("meters", "histograms", "timers"))
    // meter = rates x3 + running total (reference `rates`, core.clj:74-75)
    assert(keys("meters", "events.ingested") ==
      Set("total", "rate-1m", "rate-5m", "rate-15m"))
    assert(keys("meters", "batches.committed") == Set("total"))
    // histogram/timer = percentiles + mean/std-dev + observation count
    // (reference buffer/timing blocks, core.clj:76-86)
    val distKeys = Set("mean", "std-dev", "p75", "p95", "p99", "n")
    assert(keys("histograms", "batch-size") == distKeys)
    assert(keys("timers", "batch-duration-ms") == distKeys)
    // every leaf is a NUMBER (a dashboard can chart it directly)
    for ((sec, name) <- Seq("meters" -> "events.ingested",
        "histograms" -> "batch-size", "timers" -> "batch-duration-ms");
        k <- keys(sec, name))
      assert(root.path(sec).path(name).path(k).isNumber, s"$sec.$name.$k must be numeric")
  }

  test("K5: the JMX reporter binding exposes Spark's metric registry as MBeans") {
    // TestSpark builds its session with MetricsBinding.jmxConf (the same
    // map Main applies in production) — the reference's jmx/start
    // (core.clj:36-37, 248-250) expressed through Spark's config-driven
    // metrics system. Force the session up, then assert the platform
    // MBean server carries the driver's metric beans.
    val s = TestSpark.spark
    s.range(1).count() // ensure the context is fully started
    val mbs = java.lang.management.ManagementFactory.getPlatformMBeanServer
    val names = mbs.queryNames(new javax.management.ObjectName("metrics:*"), null)
    assert(!names.isEmpty, "expected metrics:* MBeans from JmxSink")
    val all = new scala.collection.mutable.ArrayBuffer[String]
    names.forEach(n => all += n.toString)
    assert(all.exists(_.contains("DAGScheduler")),
      s"expected scheduler metrics among:\n${all.take(20).mkString("\n")}")
  }
}
