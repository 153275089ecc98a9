package graft.api

import java.net.{HttpURLConnection, URI}
import java.util.concurrent.{ArrayBlockingQueue, Executors, TimeUnit}
import java.util.concurrent.atomic.LongAdder

import graft.util.ProtoW

/** Self-telemetry loop — the reference binary wires `go-faster/sdk/app`
  * (cmd/oteldb/main.go:9, app.go:15), which exports the PROCESS'S OWN
  * OTel metrics and logs over OTLP when `OTEL_*` env is configured, so
  * a deployment can point the exporter at itself (or a peer) and then
  * PromQL/LogQL its own request rates and logs. Graft's analogue: a
  * flag-gated periodic emitter that renders the three
  * [[RequestMetrics]] registries (query/ingest/admin) as OTLP
  * cumulative counters and the structured request-log lines as OTLP
  * logs, POSTed to a configurable OTLP endpoint — by default the
  * server's OWN ingest path, or any peer/collector via
  * `--self-telemetry-endpoint` / `OTEL_EXPORTER_OTLP_ENDPOINT` (the
  * reference honors the same env, cmd/oteldb/main.go:9 →
  * go-faster/sdk); a `service.instance.id` resource attribute keeps
  * two instances' series distinct on a shared sink — after which
  * `rate(graft_http_requests_total[5m])` and
  * `histogram_quantile(0.95, rate(graft_http_request_duration_seconds_bucket[5m]))`
  * work against the instance itself, giving the windowed rates the
  * routes report's lifetime-QPS deliberately doesn't.
  *
  * Series emitted (classic Prometheus client-side flattening — the
  * same shape a remote-write of a scraped Go process carries, so the
  * stored layout and the PromQL path need nothing new):
  *   - `graft_http_requests_total{server,route,status}`
  *   - `graft_http_request_duration_seconds_bucket{server,route,le}`
  *     (cumulative le over the registry's power-of-two buckets)
  *   - `graft_http_request_duration_seconds_count/_sum{server,route}`
  *   - process-runtime gauges/counters (the sdk/app Go-runtime
  *     instrumentation analogue): `graft_jvm_heap_used/max_bytes`,
  *     `graft_jvm_gc_count_total`/`graft_jvm_gc_time_ms_total`,
  *     `graft_process_uptime_seconds`
  *
  * The TRACES third of the self-export (the reference's sdk/app wires
  * an OTel tracer over its handlers the same way): sampled requests
  * become SERVER spans named after their route, POSTed to /v1/traces —
  * TraceQL over the instance's own requests. Sampling lives in the
  * composition root's hook (1-in-N + always-on-5xx); the budget stays
  * traffic-shaped, not traffic-sized.
  *
  * NO-FEEDBACK-LOOP BUDGET: the emitter's own POSTs land on the ingest
  * server's existing route contexts, so the label space CANNOT grow
  * from self-observation — per tick the stream is ≤ 3 ingest requests,
  * the log batch is bounded by the ring (drop-oldest, counted), and
  * the series set is bounded by routes × (statuses + buckets + 2),
  * every dimension a fixed property of the server, not of traffic.
  * Values grow; series don't (asserted in ServeSpec).
  *
  * Cumulative-sum semantics (temporality=2, monotonic) mean a missed
  * or failed METRICS tick loses nothing: the next tick carries the
  * running totals and `rate()` interpolates across the gap — the
  * reason the metrics POST never retries (the reference's periodic
  * exporter makes the same choice). LOG lines are not cumulative, so a
  * failed or shed logs POST re-queues its lines into the ring (behind
  * any lines that arrived meanwhile — ordering across a failure is
  * best-effort, loss is bounded by the ring size and counted).
  * Success detection is OTLP-exact: 200 with an EMPTY body (a 200
  * carrying a partial_success body is the receiver's lossless shed —
  * every item was rejected, a failure for retry purposes).
  */
final class SelfTelemetry(
    registries: () => Seq[RequestMetrics],
    ingestUrl: () => String,
    headers: Seq[(String, String)],
    intervalMs: Long,
    serviceName: String = "graft",
    // `service.instance.id` resource attribute: with a CONFIGURED
    // (shared) sink, two instances' identically-labeled series would
    // otherwise merge into one nonsensically-resetting counter
    val instanceId: String = SelfTelemetry.nextInstanceId()) {
  import SelfTelemetry._

  private val startNs = System.currentTimeMillis() * 1000000L
  // request-log tee: bounded ring, drop-oldest under pressure (the
  // exporter must never block or grow on a log storm it itself causes)
  private val ring = new ArrayBlockingQueue[String](4096)
  val droppedLogs = new LongAdder
  // sampled request spans (the traces third of the reference's
  // three-signal self-export) — same bounded drop-oldest discipline
  private val spanRing =
    new ArrayBlockingQueue[SelfTelemetry.SpanRec](4096)
  val droppedSpans = new LongAdder
  private val spanSeq = new java.util.concurrent.atomic.AtomicLong()
  // volatile: start() and stop() may run on different threads (main vs
  // shutdown hook) with no other happens-before edge
  @volatile private var exec: java.util.concurrent.ScheduledExecutorService = _
  // atomic, not volatile: the final flush tick in stop() can race a
  // still-draining scheduled tick, and `+= 1` on a volatile loses one
  // of the two increments
  private val consecutiveFailures =
    new java.util.concurrent.atomic.AtomicLong()
  @volatile private var lastSuccessMs = 0L
  private val exportedTicks = new LongAdder

  /** Drop-oldest bounded offer, evictions counted — both rings share
    * the discipline (the exporter must never block or grow on a storm
    * it itself causes).
    */
  private def offerBounded[T](q: ArrayBlockingQueue[T], v: T,
      dropped: LongAdder): Unit =
    if (!q.offer(v)) {
      if (q.poll() != null) dropped.increment() // the evicted element
      if (!q.offer(v)) dropped.increment() // full again (racing)
    }

  /** The log sink tee — composition roots wrap their request-log sink
    * with this so lines reach both stderr and the self-stream.
    */
  def offerLog(line: String): Unit = offerBounded(ring, line, droppedLogs)

  /** Offers one sampled request span (the caller owns the sampling
    * decision — [[graft.Serve]] wires a 1-in-N + always-on-5xx rule).
    */
  def offerSpan(server: String, route: String, method: String,
      status: Int, startNs: Long, durUs: Long): Unit =
    offerBounded(spanRing, SelfTelemetry.SpanRec(server, route, method,
      status, startNs, durUs, spanSeq.incrementAndGet()), droppedSpans)

  /** One OTLP ExportTraceServiceRequest over the given span records —
    * each request becomes one SERVER span named after its route, with
    * server/method/status attributes and ERROR status for 5xx (the
    * HTTP semconv rule). Trace/span ids derive from (startNs, seq):
    * unique within the process, no RNG on the serving path.
    */
  def tracesPayload(recs: Seq[SelfTelemetry.SpanRec]): Array[Byte] = {
    def be(v: Long): Array[Byte] = {
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = ((v >>> (8 * (7 - i))) & 0xff).toByte; i += 1 }
      b
    }
    val scopeSpans = scoped()
    recs.foreach { r =>
      // the store keys on the LOW 8 bytes of the trace id, so they mix
      // (startNs, seq) — a bare seq would repeat across restarts and
      // merge unrelated traces under one id
      val low = r.startNs ^ (r.seq * 0x9E3779B97F4A7C15L)
      val span = new ProtoW()
        .bytes(1, be(r.seq) ++ be(low))
        .bytes(2, be(low))
        .str(5, r.route).vint(6, 2L) // SPAN_KIND_SERVER
        .fix64(7, r.startNs).fix64(8, r.startNs + r.durUs * 1000L)
        .msg(9, kv("server", r.server))
        .msg(9, kv("method", r.method))
        .msg(9, kv("status", r.status.toString))
      if (r.status >= 500)
        span.msg(15, new ProtoW().vint(3, 2L)): Unit // STATUS_CODE_ERROR
      scopeSpans.msg(2, span): Unit
    }
    envelope(scopeSpans)
  }

  /** One OTLP ExportMetricsServiceRequest over the current registry
    * state (public: tests decode it back through OtlpProto).
    */
  def metricsPayload(nowNs: Long): Array[Byte] = {
    def dp(attrs: Seq[(String, String)], v: Double): ProtoW = {
      val p = new ProtoW().fix64(2, startNs).fix64(3, nowNs).double(4, v)
      attrs.foreach { case (k, s) => p.msg(7, kv(k, s)) }
      p
    }
    // one Sum metric per name, one datapoint per label set
    val totals = Seq.newBuilder[ProtoW]
    val buckets = Seq.newBuilder[ProtoW]
    val counts = Seq.newBuilder[ProtoW]
    val sums = Seq.newBuilder[ProtoW]
    registries().foreach { reg =>
      val server = reg.server
      reg.snapshot().foreach { s =>
        val base = Seq("server" -> server, "route" -> s.route)
        s.statuses.foreach { case (code, n) =>
          totals += dp(base :+ ("status" -> code.toString), n.toDouble)
        }
        var cum = 0L
        var i = 0
        while (i < s.buckets.length) {
          cum += s.buckets(i)
          buckets += dp(base :+ ("le" -> leLabel(
            RequestMetrics.bucketUpperSeconds(i))), cum.toDouble)
          i += 1
        }
        // _count = the +Inf bucket (the histogram stays self-consistent
        // under a racing record(); same discipline as the routes report)
        counts += dp(base, cum.toDouble)
        sums += dp(base, s.totalUs / 1e6)
      }
    }
    def sumMetric(name: String, unit: String, dps: Seq[ProtoW]): ProtoW = {
      val sum = new ProtoW().vint(2, 2L).vint(3, 1L) // cumulative, monotonic
      dps.foreach(sum.msg(1, _))
      new ProtoW().str(1, name).str(3, unit).msg(7, sum)
    }
    // the PROCESS-RUNTIME half of the reference's self-export (sdk/app
    // wires Go runtime instrumentation the same way): JVM heap/GC and
    // engine liveness as gauges/cumulative sums, no attributes — the
    // resource identifies the instance
    def gaugeMetric(name: String, unit: String, v: Double): ProtoW = {
      val g = new ProtoW().msg(1, dp(Nil, v))
      new ProtoW().str(1, name).str(3, unit).msg(5, g)
    }
    val rt = java.lang.management.ManagementFactory.getMemoryMXBean
    val heap = rt.getHeapMemoryUsage
    var gcCount = 0L
    var gcMs = 0L
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .forEach { b =>
        if (b.getCollectionCount > 0) gcCount += b.getCollectionCount
        if (b.getCollectionTime > 0) gcMs += b.getCollectionTime
      }
    val uptimeS =
      java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime / 1e3
    val scopeMetrics = scoped()
      .msg(2, gaugeMetric("graft_jvm_heap_used_bytes", "By",
        heap.getUsed.toDouble))
    // MemoryUsage.getMax is -1 when the JVM reports the max as
    // undefined (containers without -Xmx): SKIP the series rather than
    // emit a negative byte gauge that drives used/max dashboards
    // negative — the same absent-over-bogus rule as the GC guards
    val heapMax = readHeapMax(heap)
    if (heapMax >= 0)
      scopeMetrics.msg(2, gaugeMetric("graft_jvm_heap_max_bytes", "By",
        heapMax.toDouble)): Unit
    scopeMetrics
      .msg(2, sumMetric("graft_jvm_gc_count_total", "1",
        Seq(dp(Nil, gcCount.toDouble))))
      .msg(2, sumMetric("graft_jvm_gc_time_ms_total", "ms",
        Seq(dp(Nil, gcMs.toDouble))))
      .msg(2, gaugeMetric("graft_process_uptime_seconds", "s", uptimeS))
      .msg(2, sumMetric("graft_http_requests_total", "1", totals.result()))
      .msg(2, sumMetric("graft_http_request_duration_seconds_bucket", "s",
        buckets.result()))
      .msg(2, sumMetric("graft_http_request_duration_seconds_count", "1",
        counts.result()))
      .msg(2, sumMetric("graft_http_request_duration_seconds_sum", "s",
        sums.result()))
    envelope(scopeMetrics)
  }

  /** One OTLP ExportLogsServiceRequest carrying the given request-log
    * lines as INFO records (body = the structured JSON line; LogQL
    * `| json` parses it).
    */
  def logsPayload(lines: Seq[String], nowNs: Long): Array[Byte] = {
    val scopeLogs = scoped()
    lines.foreach { line =>
      scopeLogs.msg(2, new ProtoW()
        .fix64(1, nowNs).vint(2, 9L).str(3, "INFO")
        .msg(5, new ProtoW().str(1, line)))
    }
    envelope(scopeLogs)
  }

  // ---- shared OTLP envelope fragments (all three signals nest
  // resource(1) -> scoped records(2) under the same scope identity) ----

  private def kv(k: String, v: String): ProtoW =
    new ProtoW().str(1, k).msg(2, new ProtoW().str(1, v))

  private def scoped(): ProtoW =
    new ProtoW().msg(1, new ProtoW().str(1, "graft.self").str(2, "1"))

  private def envelope(scopedRecords: ProtoW): Array[Byte] =
    new ProtoW().msg(1, new ProtoW()
      .msg(1, new ProtoW()
        .msg(1, kv("service.name", serviceName))
        .msg(1, kv("service.instance.id", instanceId)))
      .msg(2, scopedRecords)).toByteArray

  /** Test seam for the undefined-max JVM shape (getMax == -1 on hosts
    * without a resolvable -Xmx — SelfTelemetrySpec can't arrange one).
    */
  private[graft] var readHeapMax: java.lang.management.MemoryUsage => Long =
    _.getMax

  /** One export round: metrics always, logs when the ring has lines.
    * Public so tests (and a shutdown flush) can tick deterministically.
    */
  def tick(): Unit = {
    exportedTicks.increment()
    val nowNs = System.currentTimeMillis() * 1000000L
    post("/v1/metrics", metricsPayload(nowNs)): Unit
    // logs and spans are NOT cumulative: a failed/shed export re-queues
    // its batch (bounded by the ring; drops counted there)
    drainAndPost(ring, droppedLogs, "/v1/logs",
      lines => logsPayload(lines, nowNs))
    drainAndPost(spanRing, droppedSpans, "/v1/traces", tracesPayload)
  }

  /** Exporter health for the admin surface: is the loop delivering,
    * and what has it dropped — the first thing an operator checks when
    * the self-series go quiet.
    */
  def statusJson: String =
    // instanceId embeds the hostname — the one free-form string in
    // the document, escaped like every other API string
    s"""{"interval_ms":$intervalMs,""" +
      s""""instance_id":${ApiEncoders.jsonString(instanceId)},""" +
      s""""ticks":${exportedTicks.sum()},""" +
      s""""consecutive_failures":${consecutiveFailures.get()},""" +
      s""""last_success_unix_ms":$lastSuccessMs,""" +
      s""""dropped_logs":${droppedLogs.sum()},""" +
      s""""dropped_spans":${droppedSpans.sum()}}"""

  private def drainAndPost[T](q: ArrayBlockingQueue[T], dropped: LongAdder,
      path: String, payload: Seq[T] => Array[Byte]): Unit = {
    val drained = new java.util.ArrayList[T]
    q.drainTo(drained)
    if (!drained.isEmpty) {
      val items =
        scala.jdk.CollectionConverters.ListHasAsScala(drained).asScala.toSeq
      if (!post(path, payload(items)))
        items.foreach(offerBounded(q, _, dropped))
    }
  }

  /** True only on the OTLP full-success shape: 200 with an empty body
    * (a partial_success body on 200 is the lossless shed — rejected).
    */
  private def post(path: String, payload: Array[Byte]): Boolean =
    try {
      val conn = URI.create(ingestUrl() + path).toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(2000)
      conn.setReadTimeout(5000)
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/x-protobuf")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(payload.length)
      val os = conn.getOutputStream
      os.write(payload); os.close()
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = if (is != null) {
        val b = is.readAllBytes(); is.close(); b
      } else Array.emptyByteArray
      if (code == 200 && body.isEmpty) {
        consecutiveFailures.set(0)
        lastSuccessMs = System.currentTimeMillis()
        true
      }
      else {
        fail(if (code == 200) s"shed (partial_success) from $path"
        else s"HTTP $code from $path")
        false
      }
    } catch {
      case scala.util.control.NonFatal(e) => fail(e.toString); false
    }

  private def fail(why: String): Unit = {
    val n = consecutiveFailures.incrementAndGet()
    // first failure loudly, then once a minute's worth — a dead ingest
    // port must not turn the interval loop into a log storm
    if (n == 1 ||
        n % math.max(1L, 60000L / math.max(1L, intervalMs)) == 0)
      System.err.println(
        s"[graft.SelfTelemetry] export failed ($n consecutive): $why")
  }

  def start(): Unit = {
    exec = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-self-telemetry"); t.setDaemon(true); t
    })
    // guard the WHOLE body: post() catches its own IO, but a throw
    // from payload construction or the registries() thunk would
    // otherwise cancel scheduleWithFixedDelay forever — killing the
    // loop silently while statusJson still shows the last good state
    exec.scheduleWithFixedDelay(
      () => try tick() catch {
        case scala.util.control.NonFatal(e) => fail(s"tick: $e")
      },
      intervalMs, intervalMs, TimeUnit.MILLISECONDS): Unit
  }

  /** Stops the loop after one final flush tick (counters are
    * cumulative, so the flush just pins the last totals).
    */
  def stop(): Unit =
    if (exec != null) {
      exec.shutdown()
      // worst-case tick against a black-holed endpoint is ~21 s
      // (3 POSTs × 2 s connect + 5 s read); awaiting less would run
      // the final flush CONCURRENTLY with the still-blocked scheduled
      // tick, interleaving log/span batches out of order
      val drained =
        try exec.awaitTermination(25, TimeUnit.SECONDS)
        catch { case _: InterruptedException => false }
      if (drained)
        try tick() catch { case scala.util.control.NonFatal(_) => () }
    }
}

object SelfTelemetry {
  private val instanceSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Default `service.instance.id`: pid@host plus a per-process
    * sequence — unique across a fleet sharing one sink, and across two
    * instances in one JVM (the embedded/test shape). No RNG: identity
    * is structural, not random.
    */
  private def nextInstanceId(): String = {
    val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case scala.util.control.NonFatal(_) => "localhost" }
    s"${ProcessHandle.current().pid()}@$host/${instanceSeq.incrementAndGet()}"
  }

  /** One sampled request, queued for the next trace export. */
  final case class SpanRec(server: String, route: String, method: String,
      status: Int, startNs: Long, durUs: Long, seq: Long)

  /** Prometheus `le` rendering: finite bounds in decimal, +Inf spelled
    * the Prometheus way.
    */
  private[graft] def leLabel(v: Double): String =
    if (v.isPosInfinity) "+Inf"
    // trim trailing zeros without scientific notation (0.000128 style)
    else java.math.BigDecimal.valueOf(v).stripTrailingZeros.toPlainString
}
