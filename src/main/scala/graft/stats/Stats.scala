package graft.stats

import java.net.InetSocketAddress
import java.util.concurrent.atomic.LongAdder
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** K5 — the reference's JMX metrics reporter binding (core.clj:36-37,
  * 248-250: `jmx/start`, `console/start`). Spark's metrics system is
  * configuration-driven: these properties, applied at SparkSession build,
  * register a JmxSink on every instance (driver + executors), exposing the
  * full Spark registry (DAGScheduler, BlockManager, streaming progress,
  * executor metrics) as `metrics:*` MBeans — the engine-wide counterpart
  * of the /stats endpoint's query-level EWMA meters. The console reporter
  * (the reference dumps every 100 s, core.clj:250) is opt-in via
  * `--metrics-console SECS` — on a cluster a default-on console dump is
  * log spam. */
object MetricsBinding {
  val jmxConf: Map[String, String] = Map(
    "spark.metrics.conf.*.sink.jmx.class" -> "org.apache.spark.metrics.sink.JmxSink")

  def consoleConf(periodSec: Long): Map[String, String] = Map(
    "spark.metrics.conf.*.sink.console.class" -> "org.apache.spark.metrics.sink.ConsoleSink",
    "spark.metrics.conf.*.sink.console.period" -> periodSec.toString,
    "spark.metrics.conf.*.sink.console.unit" -> "seconds")
}

/** Exponentially-weighted moving-average meter with 1/5/15-minute decay —
  * the reference's meter semantics (core.clj:31-36, README payload): rates
  * tick every 5 s with `alpha = 1 - exp(-tick/period)`, missed ticks are
  * caught up with zero-count intervals on the next mark/read, and the
  * first tick initializes the rate to the first interval's instant rate.
  * On bursty traffic an EWMA and a windowed mean are observably different
  * quantities (the EWMA decays smoothly instead of cliff-dropping when a
  * burst leaves the window) — matching the reference exactly here keeps
  * dashboards comparable.
  *
  * Time is passed in explicitly so the fold is deterministic under test;
  * production callers use `System.currentTimeMillis()`. */
final class EwmaMeter(tickMs: Long = 5000L) {
  private val periods = Array(60.0, 300.0, 900.0) // seconds: 1m / 5m / 15m
  private val alphas = periods.map(p => 1.0 - math.exp(-(tickMs / 1000.0) / p))
  private val rates = new Array[Double](3)
  private var initialized = false
  private val uncounted = new LongAdder
  private var lastTickMs = Long.MinValue
  val total = new LongAdder

  def mark(n: Long, nowMs: Long): Unit = synchronized {
    tickIfNecessary(nowMs)
    uncounted.add(n)
    total.add(n)
  }

  /** rate-1m / rate-5m / rate-15m in events per second. */
  def snapshot(nowMs: Long): (Double, Double, Double) = synchronized {
    tickIfNecessary(nowMs)
    (rates(0), rates(1), rates(2))
  }

  private def tickIfNecessary(nowMs: Long): Unit = {
    if (lastTickMs == Long.MinValue) { lastTickMs = nowMs; return }
    var elapsed = nowMs - lastTickMs
    while (elapsed >= tickMs) {
      val count = uncounted.sumThenReset() // first catch-up tick takes the
      val instant = count.toDouble / (tickMs / 1000.0) // count; the rest see 0
      var i = 0
      while (i < 3) {
        rates(i) =
          if (!initialized) instant
          else rates(i) + alphas(i) * (instant - rates(i))
        i += 1
      }
      initialized = true
      lastTickMs += tickMs
      elapsed -= tickMs
    }
  }
}

/** K4+K5 — the reference's metrics surface (/root/reference/src/kinesis3/
  * core.clj:61-98): meters for records ingested and files uploaded,
  * a histogram of batch sizes, and a timer of sink latencies, served as
  * JSON at `/stats` (plus `/` and `/ping`, 404 otherwise — the exact
  * route set of the reference's defroutes, core.clj:68-88).
  *
  * Spark-first: the numbers come from `StreamingQueryProgress` via a
  * [[StreamingQueryListener]] — the engine's own instrumentation — rather
  * than hand-maintained counters in the hot path. Rates are the
  * reference's 1/5/15-minute EWMA meters ([[EwmaMeter]]); the progress
  * ring keeps feeding the batch-size/duration histograms. */
final class StreamMetrics extends StreamingQueryListener {
  private[stats] val ingested = new EwmaMeter
  private[stats] def totalRows: Long = ingested.total.sum()
  private[stats] val totalBatches = new LongAdder
  // ring of (endTimeMs, numInputRows, batchDurationMs)
  private val ring = new java.util.concurrent.ConcurrentLinkedDeque[(Long, Long, Long)]()
  private val RingMax = 512

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    ingested.mark(p.numInputRows, System.currentTimeMillis())
    totalBatches.increment()
    ring.addLast((System.currentTimeMillis(), p.numInputRows, p.batchDuration))
    while (ring.size() > RingMax) ring.removeFirst()
  }

  private def snapshot(): Seq[(Long, Long, Long)] = {
    val it = ring.iterator()
    val buf = Vector.newBuilder[(Long, Long, Long)]
    while (it.hasNext) buf += it.next()
    buf.result()
  }

  private def percentile(sorted: Vector[Double], q: Double): Double =
    if (sorted.isEmpty) 0.0
    else sorted(math.min(sorted.size - 1, (q * sorted.size).toInt))

  /** The `/stats` JSON — meters, histograms, timers, mirroring the
    * reference's payload shape (README.md:20-50). */
  def statsJson(): String = {
    val now = System.currentTimeMillis()
    val snap = snapshot()
    val sizes = snap.map(_._2.toDouble).sorted.toVector
    val durs = snap.map(_._3.toDouble).sorted.toVector
    def mean(v: Vector[Double]) = if (v.isEmpty) 0.0 else v.sum / v.size
    def stddev(v: Vector[Double]) = {
      if (v.size < 2) 0.0
      else { val m = mean(v); math.sqrt(v.map(x => (x - m) * (x - m)).sum / (v.size - 1)) }
    }
    val (r1, r5, r15) = ingested.snapshot(now)
    f"""{
       |  "meters": {
       |    "events.ingested": {"total": ${totalRows}, "rate-1m": $r1%.3f, "rate-5m": $r5%.3f, "rate-15m": $r15%.3f},
       |    "batches.committed": {"total": ${totalBatches.sum()}}
       |  },
       |  "histograms": {
       |    "batch-size": {"mean": ${mean(sizes)}%.3f, "std-dev": ${stddev(sizes)}%.3f, "p75": ${percentile(sizes, 0.75)}%.1f, "p95": ${percentile(sizes, 0.95)}%.1f, "p99": ${percentile(sizes, 0.99)}%.1f, "n": ${sizes.size}}
       |  },
       |  "timers": {
       |    "batch-duration-ms": {"mean": ${mean(durs)}%.3f, "std-dev": ${stddev(durs)}%.3f, "p75": ${percentile(durs, 0.75)}%.1f, "p95": ${percentile(durs, 0.95)}%.1f, "p99": ${percentile(durs, 0.99)}%.1f, "n": ${durs.size}}
       |  }
       |}""".stripMargin
  }
}

/** Tiny JDK HTTP server for the stats routes — no web framework, one
  * daemon thread, same endpoints as the reference's Jetty app. */
final class StatsServer(port: Int, appName: String, metrics: StreamMetrics) {
  private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => ex.getRequestURI.getPath match {
      case "/"      => respond(ex, 200, s"""{"app": "$appName"}""")
      case "/ping"  => respond(ex, 200, "pong")
      case "/stats" => respond(ex, 200, metrics.statsJson())
      case _        => respond(ex, 404, """{"error": "not found"}""")
    })
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }
}
