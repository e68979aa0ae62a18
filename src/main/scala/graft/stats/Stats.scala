package graft.stats

import java.net.InetSocketAddress
import java.util.concurrent.atomic.LongAdder
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** K4+K5 — the reference's metrics surface (/root/reference/src/kinesis3/
  * core.clj:61-98): meters for records ingested and files uploaded,
  * a histogram of batch sizes, and a timer of sink latencies, served as
  * JSON at `/stats` (plus `/` and `/ping`, 404 otherwise — the exact
  * route set of the reference's defroutes, core.clj:68-88).
  *
  * Spark-first: the numbers come from `StreamingQueryProgress` via a
  * [[StreamingQueryListener]] — the engine's own instrumentation — rather
  * than hand-maintained counters in the hot path. Rates are computed over
  * a ring of recent progress events (the reference's 1/5/15-min EWMA
  * meters degrade to windowed means here; same observable quantities). */
final class StreamMetrics extends StreamingQueryListener {
  private[stats] val totalRows = new LongAdder
  private[stats] val totalBatches = new LongAdder
  // ring of (endTimeMs, numInputRows, batchDurationMs)
  private val ring = new java.util.concurrent.ConcurrentLinkedDeque[(Long, Long, Long)]()
  private val RingMax = 512

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    totalRows.add(p.numInputRows)
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

  private def rateSince(ms: Long, now: Long): Double = {
    val rows = snapshot().collect { case (t, n, _) if t >= now - ms => n }.sum
    rows.toDouble / (ms / 1000.0)
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
    f"""{
       |  "meters": {
       |    "events.ingested": {"total": ${totalRows.sum()}, "rate-1m": ${rateSince(60000, now)}%.3f, "rate-5m": ${rateSince(300000, now)}%.3f, "rate-15m": ${rateSince(900000, now)}%.3f},
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
