package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicLongArray, LongAdder}

import com.sun.net.httpserver.{HttpExchange, HttpHandler}

/** Per-route request metrics + structured request logging — the
  * reference wraps EVERY ogen server with `httpmiddleware.Measure`
  * (OTel request count/duration per route template) and
  * `InjectLogger`/`LogRequests` (structured request logs):
  * internal/httpmiddleware/httpmiddleware.go:20-136, wired per server
  * in cmd/oteldb/app.go:215-236 `addOgen`. Here the same middleware
  * shape wraps the JDK servers (query, ingest, admin), and the
  * counters surface through the admin API (`GET /api/v1/routes`) so an
  * operator can read per-route p50/p95/QPS/shed counts without an
  * external scraper — self-observability is the first thing an
  * operator of an observability database reaches for when the p95
  * moves.
  *
  * Route identity is the server's CONTEXT PATH (the longest-prefix
  * route the JDK server dispatched to) — the same normalization the
  * reference gets from its ogen RouteFinder: path parameters never
  * explode the label space because `/api/traces/{id}` style routes are
  * registered as the `/api/traces/` prefix context. Unknown paths
  * dispatched to a parent context land on that parent's label, the
  * `<unknown>` analogue.
  *
  * Scale shape: recording is lock-free (LongAdder / AtomicLongArray
  * CAS-max) and allocation-free on the hot path — at the ServeProbe's
  * 30k QPS instant regime the middleware must be invisible next to the
  * ~30 µs responses it measures. Durations land in power-of-two
  * buckets (128 µs … ~2.3 h, 26 buckets); quantiles interpolate inside
  * the bucket, so p50/p95/p99 carry ≤2× bucket-edge error — the right
  * trade for a constant-memory registry that can absorb any request
  * volume (the reference's OTel histogram makes the same trade with
  * its exponential buckets).
  */
final class RequestMetrics(val server: String,
    log: Option[String => Unit] = None) {
  import RequestMetrics._

  /** Structured-request-log sink, settable after construction — a
    * composition root may create the registry before it knows whether
    * request logging is configured (the ingest receiver's instance
    * exists from construction; Serve attaches the sink at start).
    */
  @volatile var logSink: Option[String => Unit] = log

  /** Self-span hook `(route, method, status, durUs)` — the
    * self-telemetry exporter's trace half sets it; null (the default)
    * costs nothing on the hot path. The hook owns sampling AND the
    * epoch-time derivation, so unsampled requests pay one null check
    * and one invocation, never a wall-clock read.
    */
  @volatile var spanSink: (String, String, Int, Long) => Unit = _

  private val startNs = System.nanoTime()
  private val routes = new ConcurrentHashMap[String, RouteStats]()

  /** Record one completed exchange. `status` < 0 means the handler
    * wrote no response (connection died mid-exchange).
    */
  def record(route: String, method: String, status: Int,
      durationUs: Long): Unit = {
    val st = routes.computeIfAbsent(route, _ => new RouteStats)
    st.count.increment()
    st.totalUs.add(durationUs)
    st.statuses.computeIfAbsent(status, _ => new LongAdder).increment()
    var cur = st.maxUs.get()
    while (durationUs > cur && !st.maxUs.compareAndSet(cur, durationUs))
      cur = st.maxUs.get()
    st.buckets.incrementAndGet(bucketOf(durationUs)): Unit
  }

  /** The middleware: wraps a handler so every exchange through it is
    * timed, counted and (when a log sink is configured) logged as one
    * JSON line — the `LogRequests` "Got request" record with the
    * outcome fields added. Wraps OUTSIDE the auth guard so 401s are
    * measured too (the reference's Instrument sits outside its auth
    * middleware in the addOgen stack).
    */
  def measure(next: HttpHandler): HttpHandler = (ex: HttpExchange) => {
    val t0 = System.nanoTime()
    try next.handle(ex)
    finally {
      val durUs = (System.nanoTime() - t0) / 1000L
      val route = ex.getHttpContext.getPath
      val status = ex.getResponseCode // -1 when nothing was sent
      record(route, ex.getRequestMethod, status, durUs)
      val spans = spanSink
      if (spans != null) spans(route, ex.getRequestMethod, status, durUs)
      logSink.foreach { sink =>
        val j = ApiEncoders.jsonString _
        sink(s"""{"server":${j(server)},"method":${j(
          ex.getRequestMethod)},"path":${j(ex.getRequestURI.getPath)},""" +
          s""""route":${j(route)},"status":$status,""" +
          s""""duration_ms":${"%.3f".formatLocal(java.util.Locale.ROOT,
            durUs / 1000.0)}}""")
      }
    }
  }

  /** One JSON object for this server: every route with its counts,
    * per-status breakdown and latency summary, busiest first.
    */
  def snapshotJson: String = {
    val j = ApiEncoders.jsonString _
    // lifetime QPS denominator: the registry's uptime — the routes
    // report is a lifetime aggregate, so the rate is the lifetime
    // average (windowed rates are the scraper's job; the verdict asks
    // for an operator-readable QPS without one)
    val uptimeS = math.max(1e-9, (System.nanoTime() - startNs) / 1e9)
    val items = new scala.collection.mutable.ArrayBuffer[(Long, String)]
    routes.forEach { (route, st) =>
      val n = st.count.sum()
      val statuses = {
        val b = new scala.collection.mutable.ArrayBuffer[(Int, Long)]
        st.statuses.forEach((code, c) => b += ((code, c.sum())))
        b.sortBy(_._1)
          .map { case (c, v) => s""""$c":$v""" }.mkString("{", ",", "}")
      }
      val counts = Array.tabulate(BucketCount)(st.buckets.get)
      // quantile ranks derive from the BUCKET total, not `n`: record()
      // bumps count first and buckets last, so a snapshot racing an
      // in-flight record can read n = bucketSum + 1 — a rank past the
      // histogram would fall through to the open-ended top bound and
      // report a ~71-minute p99 on a sub-millisecond route
      val inBuckets = counts.sum
      def pct(q: Double): Double = quantileUs(counts, inBuckets, q) / 1000.0
      def f(v: Double): String =
        "%.3f".formatLocal(java.util.Locale.ROOT, v)
      items += ((n,
        s"""{"route":${j(route)},"count":$n,"qps":${f(n / uptimeS)},""" +
          s""""statuses":$statuses,""" +
          s""""mean_ms":${f(if (n == 0) 0.0 else st.totalUs.sum() / 1000.0 / n)},""" +
          s""""p50_ms":${f(pct(0.50))},"p95_ms":${f(pct(0.95))},""" +
          s""""p99_ms":${f(pct(0.99))},"max_ms":${f(st.maxUs.get() / 1000.0)},""" +
          s""""total_ms":${f(st.totalUs.sum() / 1000.0)}}"""))
    }
    val sorted = items.sortBy(-_._1).map(_._2)
    s"""{"server":${j(server)},"uptime_s":${
      "%.1f".formatLocal(java.util.Locale.ROOT, uptimeS)},""" +
      s""""routes":[${sorted.mkString(",")}]}"""
  }

  /** Structured registry snapshot — the self-telemetry exporter's
    * read path ([[SelfTelemetry]] renders it as OTLP). Same
    * torn-read discipline as [[snapshotJson]]: per-status counts and
    * bucket counts are each internally consistent LongAdder sums; the
    * exporter emits them as independent cumulative series, so a
    * snapshot racing an in-flight record() is off by at most the
    * in-flight request on each series — monotone, and correct at the
    * next tick.
    */
  def snapshot(): Seq[RequestMetrics.RouteSnapshot] = {
    val out = Seq.newBuilder[RequestMetrics.RouteSnapshot]
    routes.forEach { (route, st) =>
      val statuses = {
        val b = Map.newBuilder[Int, Long]
        st.statuses.forEach((code, c) => b += ((code, c.sum())))
        b.result()
      }
      out += RequestMetrics.RouteSnapshot(route, st.count.sum(), statuses,
        st.totalUs.sum(), Array.tabulate(BucketCount)(st.buckets.get))
    }
    out.result()
  }

  /** (route, status) → count, for tests and probes. */
  def statusCount(route: String, status: Int): Long =
    Option(routes.get(route))
      .flatMap(st => Option(st.statuses.get(status)))
      .fold(0L)(_.sum())

  /** Total requests recorded for a route. */
  def count(route: String): Long =
    Option(routes.get(route)).fold(0L)(_.count.sum())
}

object RequestMetrics {
  /** One route's registry state at a point in time. `buckets` are the
    * raw (non-cumulative) power-of-two histogram counts.
    */
  final case class RouteSnapshot(route: String, count: Long,
      statuses: Map[Int, Long], totalUs: Long, buckets: Array[Long])

  /** Bucket upper bounds: 128 µs · 2^i. The last bucket is open-ended. */
  private[api] val BucketCount = 26

  /** Bucket upper edge in SECONDS for index i (the last is +Inf) —
    * the `le` label values the self-telemetry exporter emits.
    */
  private[graft] def bucketUpperSeconds(i: Int): Double =
    if (i >= BucketCount - 1) Double.PositiveInfinity
    else 128e-6 * (1L << i)

  private def bucketOf(durationUs: Long): Int = {
    var i = 0
    var bound = 128L
    while (i < BucketCount - 1 && durationUs > bound) { i += 1; bound *= 2 }
    i
  }

  /** Quantile estimate off the bucket histogram: find the bucket the
    * rank lands in, interpolate linearly inside it (lower bound 0 for
    * the first bucket; the open-ended last bucket reports its lower
    * bound — by then the answer is "minutes", where edges don't
    * matter).
    */
  private[api] def quantileUs(counts: Array[Long], total: Long,
      q: Double): Double = {
    if (total == 0) return 0.0
    val rank = q * total
    var cum = 0L
    var i = 0
    while (i < counts.length) {
      val c = counts(i)
      if (cum + c >= rank && c > 0) {
        val lo = if (i == 0) 0.0 else 128.0 * (1L << (i - 1))
        val hi = 128.0 * (1L << i)
        return if (i == counts.length - 1) lo
        else lo + (hi - lo) * ((rank - cum) / c)
      }
      cum += c
      i += 1
    }
    128.0 * (1L << (counts.length - 1))
  }

  private final class RouteStats {
    val count = new LongAdder
    val statuses = new ConcurrentHashMap[Int, LongAdder]()
    val totalUs = new LongAdder
    val maxUs = new AtomicLong(0L)
    val buckets = new AtomicLongArray(BucketCount)
  }
}
