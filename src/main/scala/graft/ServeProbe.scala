package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession

import graft.util.GraftSession

/** Serving-path probe against the LIVE one-binary deployment — the
  * r14 throughput probe, committed and extended with a FloorDecomp of
  * the served handlers (verdict r14 #6): QPS/p50/p95 per traffic
  * regime over the wire, plus an in-process decomposition of one
  * tier-served and one raw PromQL range request into
  * parse+plan / execute (the envelope collect) / encode (string
  * assembly) so the end-to-end latency has a mechanism next to it.
  *
  *   sbt "runMain graft.ServeProbe [series] [regimeSeconds]"
  *
  * Ingests `series`×24 h of per-minute gauges over the OTLP wire, lets
  * the maintenance pass settle the rollup sidecar, then drives:
  *   - hour-aligned `avg_over_time(load_m[1h])` range, identical
  *     window (tier-served dashboard refresh), 4 and 16 workers
  *   - shifting-window range (unaligned ⇒ raw path, cache-busting),
  *     4 and 16 workers
  *   - instant `sum(load_m)`, 8 workers
  */
object ServeProbe {

  // the shared hand-rolled protobuf writer (r17 dedup: this file,
  // IngestBench and the self-telemetry exporter all encode OTLP wire)
  private type W = graft.util.ProtoW
  private def kv(k: String, v: String): W =
    new W().str(1, k).msg(2, new W().str(1, v))

  private val T0 = 1704067200000000000L // 2024-01-01T00:00Z ns

  /** One OTLP metrics payload: `n` per-minute gauge samples of
    * `load_m{host=<host>}` starting at T0.
    */
  private def gaugePayload(host: String, samples: Int): Array[Byte] = {
    val g = new W()
    var i = 0
    while (i < samples) {
      val p = new W().fix64(2, T0).fix64(3, T0 + i * 60000000000L)
        .double(4, (i % 60).toDouble + host.length)
      g.msg(1, p.msg(7, kv("host", host)))
      i += 1
    }
    new W().msg(1, new W()
      .msg(1, new W().msg(1, kv("service.name", "probe")))
      .msg(2, new W().msg(1, new W().str(1, "meter"))
        .msg(2, new W().str(1, "load_m").msg(5, g))))
      .toByteArray
  }

  private def post(url: String, body: Array[Byte]): Int = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-protobuf")
    val os = conn.getOutputStream
    try os.write(body) finally os.close()
    val c = conn.getResponseCode
    conn.getInputStream.readAllBytes()
    c
  }

  // the probe's OWN per-route accounting, to cross-check the admin
  // API's /api/v1/routes report (every query-server request the probe
  // makes flows through get())
  private val issuedRange = new java.util.concurrent.atomic.AtomicLong()
  private val issuedInstant = new java.util.concurrent.atomic.AtomicLong()

  private def get(url: String): Int = {
    if (url.contains("/api/v1/query_range")) issuedRange.incrementAndGet()
    else if (url.contains("/api/v1/query")) issuedInstant.incrementAndGet()
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    Option(is).foreach { s => s.readAllBytes(); s.close() }
    code
  }

  private def getBody(url: String): String = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    val is = conn.getInputStream
    try new String(is.readAllBytes(), UTF_8) finally is.close()
  }

  /** Sustained concurrent GETs for `seconds`; prints accepted QPS and
    * accepted-request p50/p95, with 503 SHEDS counted separately from
    * other errors — past saturation the bounded executor must shed
    * (503 in ~0 ms) while ACCEPTED requests keep a bounded latency,
    * instead of every request queueing unboundedly.
    */
  private def regime(name: String, workers: Int, seconds: Int)
      (url: Long => String): Unit = {
    val lat = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val sheds = new java.util.concurrent.atomic.AtomicLong()
    val errors = new java.util.concurrent.atomic.AtomicLong()
    val stop = System.nanoTime() + seconds * 1000000000L
    val seq = new java.util.concurrent.atomic.AtomicLong()
    val threads = (1 to workers).map(_ => new Thread(() => {
      while (System.nanoTime() < stop) {
        val t0 = System.nanoTime()
        val c = get(url(seq.incrementAndGet()))
        if (c == 200) lat.add(System.nanoTime() - t0)
        else if (c == 503) sheds.incrementAndGet()
        else errors.incrementAndGet()
      }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    val a = lat.toArray(new Array[java.lang.Long](0)).map(_.toLong).sorted
    def pct(p: Double) = if (a.isEmpty) 0.0 else a(((a.length - 1) * p).toInt) / 1e6
    println(f"[probe] $name%-58s workers=$workers%-3d qps=${a.length.toDouble / seconds}%7.1f " +
      f"p50=${pct(0.5)}%8.1f ms  p95=${pct(0.95)}%8.1f ms  " +
      f"sheds=${sheds.get}  errors=${errors.get}")
  }

  def main(args: Array[String]): Unit = {
    // explicit exit either way: non-daemon server threads must not
    // hold the fork, and a failed probe must REPORT failure (a
    // swallowed exception would read as a passing run with missing
    // lines)
    try { run(args); sys.exit(0) }
    catch {
      case e: Throwable =>
        e.printStackTrace()
        sys.exit(1)
    }
  }

  private def run(args: Array[String]): Unit = {
    val series = args.headOption.map(_.toInt).getOrElse(200)
    val secs = args.lift(1).map(_.toInt).getOrElse(30)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession.local(cores, "serveprobe")
    val dir = java.nio.file.Files.createTempDirectory("graft-serveprobe").toString
    val serve = new Serve(spark, Serve.Config(dir))
    val ports = serve.start()
    val q = s"http://127.0.0.1:${ports.query}"

    // ---- ingest: series × 24 h × 1/min over the wire ----
    val t0 = System.nanoTime()
    (0 until series).foreach { i =>
      post(s"http://127.0.0.1:${ports.ingestHttp}/v1/metrics",
        gaugePayload(s"h$i", 1440))
    }
    serve.flush()
    serve.maintainNow("20240103") // settle sidecar partials
    println(f"[probe] ingested $series series x 1440 samples in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val startSec = T0 / 1000000000L
    val endSec = startSec + 86400L

    // ---- traffic regimes (r14 rows, re-measured post single-pass guard) ----
    val aligned = (_: Long) =>
      s"$q/api/v1/query_range?query=${java.net.URLEncoder.encode(
        "avg_over_time(load_m[1h])", "UTF-8")}&start=$startSec&end=$endSec&step=3600"
    // shifting unaligned window: every request a fresh (start,end), 61s
    // step — unservable from the hour tier, busts the envelope cache
    val shifting = (n: Long) =>
      s"$q/api/v1/query_range?query=${java.net.URLEncoder.encode(
        "avg_over_time(load_m[7m])", "UTF-8")}&start=${startSec + 7 * 60 + n}&end=${
        startSec + 7200 + n}&step=61"
    val instant = (_: Long) =>
      s"$q/api/v1/query?query=${java.net.URLEncoder.encode(
        "sum(load_m)", "UTF-8")}&time=${startSec + 3600}"

    get(aligned(0)); get(shifting(0)); get(instant(0)) // warm codegen
    regime("hour-aligned avg_over_time range (tier, identical window)", 4, secs)(aligned)
    regime("hour-aligned avg_over_time range (tier, identical window)", 16, secs)(aligned)
    regime("shifting-window range (raw path, caches cold)", 4, secs)(shifting)
    regime("shifting-window range (raw path, caches cold)", 16, secs)(shifting)
    regime("instant sum(load_m)", 8, secs)(instant)

    // ---- FloorDecomp of the served handlers (r14 verdict #6) ----
    // the same building blocks the handler composes, timed separately
    // at steady state: parse+plan (query string → lazy DataFrame),
    // execute (the ONE envelope collect), encode (full envelope minus
    // the collect); http = end-to-end over the wire for comparison
    import org.apache.spark.sql.functions._
    val tiers = graft.promql.PromQL.tiersFromLayout(spark, s"$dir/rollup")
    val raw = spark.read.parquet(s"$dir/points")
      .select("ts_us", "name", "labels", "value")
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    def decomp(label: String, planOf: () => org.apache.spark.sql.DataFrame,
        tsCol: String, httpUrl: String): Unit = {
      (1 to 2).foreach(_ => planOf().collect()) // steady state
      val tPlan = med((1 to 5).map(_ => time(planOf())))
      val tExec = med((1 to 5).map(_ => time {
        graft.api.ApiEncoders.matrixSeries(
          planOf(), tsCol, 1000000L).collect()
      }))
      val tFull = med((1 to 5).map(_ => time {
        graft.api.ApiEncoders.promMatrix(planOf(), tsCol = tsCol)
      }))
      ServeProbe.get(httpUrl)
      val tHttp = med((1 to 5).map(_ => time { ServeProbe.get(httpUrl); () }))
      println(f"[decomp] $label%-28s parse+plan=${tPlan * 1000}%7.1f ms  " +
        f"execute=${tExec * 1000}%7.1f ms  encode=${(tFull - tExec) * 1000}%7.1f ms  " +
        f"http_e2e=${tHttp * 1000}%7.1f ms (warm cache)")
    }
    val stepUs = 3600000000L
    decomp("tier-served range",
      () => graft.promql.PromQL.rangeTierPlan("avg_over_time(load_m[1h])",
        startSec * 1000000L, endSec * 1000000L, stepUs, tiers).get,
      "ts_us", aligned(0))
    decomp("raw range (7m window)",
      () => {
        val src = raw.filter(col("ts_us") >= (startSec + 7 * 60) * 1000000L -
            7L * 60 * 1000000L)
          .filter(col("ts_us") <= (startSec + 7200) * 1000000L)
        graft.promql.PromQL.range("avg_over_time(load_m[7m])", src,
          Some(61000000L), Some(((startSec + 7 * 60) * 1000000L,
            (startSec + 7200) * 1000000L)))
      },
      "bucket_us", shifting(0))

    // layout shape matters to per-request task counts: report it
    val pointFiles = Option(new java.io.File(s"$dir/points").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory)
      .map(d => Option(d.listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))).sum
    println(s"[probe] points layout parquet files: $pointFiles")

    // ---- self-observability cross-check (r16 verdict #1): the admin
    // API's /api/v1/routes report next to the probe's own accounting —
    // the counts must AGREE exactly (every probe request to the query
    // server flows through get(), which counts per route; the metrics
    // middleware measures the same exchanges server-side). Runs BEFORE
    // receiver.stop(): stopping the receiver stops the admin server.
    val routesJson = getBody(s"http://127.0.0.1:${ports.admin}/api/v1/routes")
    def routeEntry(route: String): String = {
      val q = java.util.regex.Pattern.quote(route)
      // one route object spans up to its trailing total_ms field (the
      // nested statuses object means "first }" would cut it short)
      val m = java.util.regex.Pattern
        .compile(s""""route":"$q".*?"total_ms":[0-9.]+""").matcher(routesJson)
      if (m.find()) m.group() else s"route $route not reported"
    }
    def fieldOf(entry: String, k: String): String = {
      val m = java.util.regex.Pattern
        .compile(s""""$k":([0-9.]+)""").matcher(entry)
      if (m.find()) m.group(1) else "?"
    }
    Seq("/api/v1/query_range" -> issuedRange.get,
        "/api/v1/query" -> issuedInstant.get).foreach { case (route, mine) =>
      val e = routeEntry(route)
      val admin = fieldOf(e, "count")
      val agree = admin == mine.toString
      println(f"[routes] $route%-24s admin count=$admin%-8s probe issued=$mine%-8s " +
        f"agree=$agree  p50=${fieldOf(e, "p50_ms")} ms  p95=${fieldOf(e, "p95_ms")} ms  " +
        s"statuses=${fieldOf(e, "200")}x200/${fieldOf(e, "503")}x503")
    }

    // interference isolation: the receiver's streaming sinks tick
    // continuously (ProcessingTime(0)) — re-run the instant regime
    // with ingest stopped to price that tick load on the shared
    // local[32]. (This also stops the admin server, so the routes
    // cross-check above already ran.)
    serve.receiver.stop()
    regime("instant sum(load_m), ingest streams stopped", 8, secs)(instant)

    // saturation: 64 workers of cache-busting raw ranges against the
    // DEFAULT bounded executor (16 executing / 32 queued / 10 s wait) —
    // the overflow must SHED with instant 503s while accepted requests
    // keep a bounded latency (the r14 probe's pile-up, fixed)
    val shiftingFar = (n: Long) =>
      s"$q/api/v1/query_range?query=${java.net.URLEncoder.encode(
        "avg_over_time(load_m[7m])", "UTF-8")}&start=${startSec + 40000 + n}&end=${
        startSec + 47200 + n}&step=61"
    regime("cache-busting raw range at 4x oversubscription", 64, secs)(shiftingFar)

    serve.stop()
    spark.stop()
  }
}
