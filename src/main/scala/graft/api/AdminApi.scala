package graft.api

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession

import graft.sources.Admission

/** Admin panel API — the operational surface every deployment's load
  * balancer and on-call runbook hit on day one (reference
  * internal/adminhandler/adminhandler.go:84-255, mounted in
  * cmd/oteldb/admin.go:41-51). Same routes, JVM-true payloads:
  *
  *   - GET  /api/v1/info     — build/runtime identity, uptime, signals
  *   - GET  /api/v1/health   — per-component liveness, overall status
  *     healthy | degraded (any failing check degrades, never 500s)
  *   - GET  /api/v1/runtime  — JVM analogue of the Go runtime stats
  *     (threads for goroutines, heap used/committed/max, GC counts)
  *   - GET  /api/v1/storage  — per-signal layout stats (partitions,
  *     files, bytes, committed batches) + admission counters
  *   - GET  /api/v1/storage/efficiency — bytes/row per signal straight
  *     from parquet metadata (row counts come from footers, so the
  *     endpoint stays metadata-bound at any data size)
  *   - POST /api/v1/actions/{gc|free_os_memory|storage_maintain|
  *     repair_nan_partials}
  *   - GET  /api/v1/routes   — per-route request metrics of every
  *     wired server (the httpmiddleware.Measure counters, surfaced
  *     here instead of an external scraper)
  *
  * Health checks run per request with a short budget; the handler
  * reports a failing component as `unhealthy` and the instance as
  * `degraded` — the report itself always succeeds (adminhandler.go:
  * 106-129 semantics).
  */
final class AdminApi(
    spark: SparkSession,
    signals: Seq[AdminApi.SignalInfo] = Nil,
    components: Seq[AdminApi.Component] = Nil,
    layouts: Map[String, String] = Map.empty, // signal -> layout root
    admission: Option[Admission.Stats] = None,
    safety: Option[graft.streaming.LogSafety.Metrics] = None,
    maintain: Option[() => String] = None,
    repair: Option[() => String] = None,
    startTimeMs: Long = System.currentTimeMillis(),
    auth: Option[Auth.Middleware] = None,
    routeMetrics: Seq[RequestMetrics] = Nil,
    requestLog: Option[String => Unit] = None,
    // self-telemetry exporter health (statusJson supplier) — reported
    // inside /api/v1/routes so the routes page answers "and is the
    // self-export of these numbers actually delivering"
    selfTelemetry: Option[() => String] = None) {

  import AdminApi._

  /** This server's own per-route metrics (measured like every other
    * server's) — reported by /api/v1/routes alongside `routeMetrics`.
    */
  val metrics = new RequestMetrics("admin", requestLog)

  private var server: HttpServer = _

  def start(port: Int = 0): Int = {
    HttpApi.tuneServerDefaults() // must precede the first create in the JVM
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
      r => { val t = new Thread(r, "graft-admin"); t.setDaemon(true); t }))
    server.createContext("/api/v1/info", handler(_ => info()))
    server.createContext("/api/v1/health", handler(_ => health()))
    server.createContext("/api/v1/runtime", handler(_ => runtimeStats()))
    server.createContext("/api/v1/storage/efficiency", handler(_ => efficiency()))
    server.createContext("/api/v1/storage", handler(_ => storage()))
    server.createContext("/api/v1/routes", handler(_ => routesReport()))
    server.createContext("/api/v1/actions/", handler(runAction))
    // debug pages — the reference ships these as autozpages (OTel SDK
    // zpages mounted next to the admin surface); the JVM-true analogue
    // is a thread dump and the engine's live job/query state
    server.createContext("/debug/threadz", handler(_ => threadz()))
    server.createContext("/debug/queryz", handler(_ => queryz()))
    // status page at "/" (the reference serves its admin frontend from
    // the server root, adminhandler ui.go; ours is the adjudicated
    // static page, api/AdminUi.scala) — "/" is the JDK server's
    // longest-prefix FALLBACK context, so unknown paths land here too:
    // serve the page only at the root, 404 the rest
    server.createContext("/", metrics.measure(Auth.guard(auth,
      (ex: HttpExchange) => {
        val path = ex.getRequestURI.getPath
        if (path == "/" || path == "/index.html")
          send(ex, 200, "text/html; charset=utf-8", AdminUi.html)
        else send(ex, 404, "application/json",
          s"""{"error_message":${q(s"no route $path")}}""")
      })))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ---------- payloads ----------

  private def info(): String = {
    val uptime = (System.currentTimeMillis() - startTimeMs) / 1000.0
    val sigs = signals.map { s =>
      s"""{"signal":${q(s.signal)},"backend":${q(s.backend)},""" +
        s""""queryable":${s.queryable}${s.bind.fold("")(b => s""","bind":${q(b)}""")}}"""
    }.mkString(",")
    s"""{"version":${q(Version)},"commit":"",""" +
      s""""runtime_version":${q("scala " + util.Properties.versionNumberString +
        " / jvm " + System.getProperty("java.version"))},""" +
      s""""spark_version":${q(spark.version)},""" +
      s""""os":${q(System.getProperty("os.name").toLowerCase)},""" +
      s""""arch":${q(System.getProperty("os.arch"))},""" +
      s""""start_time":${q(java.time.Instant.ofEpochMilli(startTimeMs).toString)},""" +
      s""""uptime_seconds":$uptime,""" +
      s""""storage_enabled":${layouts.nonEmpty},""" +
      s""""signals":[$sigs]}"""
  }

  private def health(): String = {
    val checked = components.map { c =>
      val err = c.check.flatMap { f =>
        try { f(); None } catch { case e: Exception =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getSimpleName)) }
      }
      (c, err)
    }
    val overall = if (checked.exists(_._2.nonEmpty)) "degraded" else "healthy"
    val comps = checked.map { case (c, err) =>
      s"""{"name":${q(c.name)}""" +
        c.addr.fold("")(a => s""","addr":${q(a)}""") +
        s""","status":${q(if (err.isEmpty) "healthy" else "unhealthy")}""" +
        err.fold("")(e => s""","error":${q(e)}""") + "}"
    }.mkString(",")
    s"""{"status":${q(overall)},"components":[$comps]}"""
  }

  private def runtimeStats(): String = {
    val rt = Runtime.getRuntime
    val mem = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
    val gcs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    var gcCount = 0L; var gcMs = 0L
    gcs.forEach { g =>
      if (g.getCollectionCount > 0) gcCount += g.getCollectionCount
      if (g.getCollectionTime > 0) gcMs += g.getCollectionTime
    }
    s"""{"threads":${Thread.activeCount()},""" +
      s""""num_cpu":${rt.availableProcessors()},""" +
      s""""parallelism":${spark.sparkContext.defaultParallelism},""" +
      s""""heap_used_bytes":${mem.getUsed},""" +
      s""""heap_committed_bytes":${mem.getCommitted},""" +
      s""""heap_max_bytes":${mem.getMax},""" +
      s""""gc_count":$gcCount,"gc_time_ms":$gcMs}"""
  }

  /** Walks each layout root's metadata only: `date=` partition dirs,
    * parquet file counts/bytes, commit markers. No Spark job — at
    * 100 TB this is a filesystem listing, never a scan.
    */
  private def storage(): String = {
    val sigs = layouts.toSeq.sortBy(_._1).map { case (signal, root) =>
      val dirs = Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty[java.io.File])
      val parts = dirs.filter(d => d.isDirectory && d.getName.startsWith("date="))
      val files = parts.flatMap(d => Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")))
      val batches = dirs.count(_.getName.startsWith("_committed_"))
      val dates = parts.map(_.getName.stripPrefix("date=")).sorted
      s"""{"signal":${q(signal)},"partitions":${parts.length},""" +
        s""""files":${files.length},"stored_bytes":${files.map(_.length()).sum},""" +
        s""""committed_batches":$batches""" +
        (if (dates.nonEmpty)
          s""","min_date":${q(dates.head)},"max_date":${q(dates.last)}"""
        else "") + "}"
    }.mkString(",")
    val adm = admission.map { a =>
      s""","admission":{"rejected_rate":${a.shedRequests.get()},""" +
        s""""rejected_cardinality":${a.shedSamples.get()},""" +
        s""""overflowed":${a.overflowSeries.get()},""" +
        s""""active_series":${a.activeSeries.get()}}"""
    }.getOrElse("")
    // excess-log safety decision counters (the reference's odbsafety
    // Metrics interface, odbsafety/handler.go:10-15, surfaced the way
    // its processor publishes them, odbsafetyprocessor/metrics.go)
    val saf = safety.map { s =>
      val fields = s.snapshot.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}:$v" }.mkString(",")
      s""","log_safety":{$fields}"""
    }.getOrElse("")
    s"""{"storage_enabled":${layouts.nonEmpty},"signals":[$sigs]$adm$saf}"""
  }

  /** Rows from parquet footers (spark.read metadata count), bytes from
    * the filesystem → bytes/row per signal (the reference's
    * EfficiencyStats bytes_per_point, adminhandler.go:176-193).
    */
  private def efficiency(): String = {
    val sigs = layouts.toSeq.sortBy(_._1).map { case (signal, root) =>
      val dirs = Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(d => d.isDirectory && d.getName.startsWith("date="))
      val bytes = dirs.flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      val rows =
        if (dirs.isEmpty) 0L
        else spark.read.parquet(root).count() // footer metadata only
      val bpp = if (rows == 0) 0.0 else bytes.toDouble / rows
      s"""{"signal":${q(signal)},"parts":${dirs.length},"points":$rows,""" +
        s""""stored_bytes":$bytes,"bytes_per_point":$bpp}"""
    }.mkString(",")
    s"""{"storage_enabled":${layouts.nonEmpty},"signals":[$sigs]}"""
  }

  /** Per-route request metrics of every wired server (query, ingest,
    * admin): count, per-status breakdown, p50/p95/p99/mean/max — the
    * reference's `httpmiddleware.Measure` counters
    * (httpmiddleware.go:63-136), surfaced here instead of an external
    * OTel scraper so the deployment observes itself. Snapshot-priced:
    * reading sums LongAdders, no locks, no Spark.
    */
  private def routesReport(): String = {
    val servers = (routeMetrics :+ metrics).map(_.snapshotJson)
    val st = selfTelemetry
      .map(f => s""","self_telemetry":${f()}""").getOrElse("")
    s"""{"servers":[${servers.mkString(",")}]$st}"""
  }

  /** Thread dump, bounded to the top frames per thread. */
  private def threadz(): String = {
    val threads = Thread.getAllStackTraces
    val items = new scala.collection.mutable.ArrayBuffer[String]
    threads.forEach { (t, stack) =>
      val frames = stack.take(6).map(f => q(f.toString)).mkString(",")
      items += s"""{"name":${q(t.getName)},"state":${q(t.getState.toString)},""" +
        s""""daemon":${t.isDaemon},"frames":[$frames]}"""
    }
    s"""{"thread_count":${threads.size},"threads":[${items.sortBy(identity).mkString(",")}]}"""
  }

  /** Live engine state: active Spark jobs/stages (status tracker) and
    * active Structured Streaming queries — the "what is it doing right
    * now" page an on-call opens first.
    */
  private def queryz(): String = {
    val st = spark.sparkContext.statusTracker
    val jobs = st.getActiveJobIds().toSeq.sorted.flatMap { id =>
      st.getJobInfo(id).map { j =>
        s"""{"job_id":$id,"status":${q(j.status().toString)},""" +
          s""""stages":[${j.stageIds().mkString(",")}]}"""
      }
    }
    val streams = spark.streams.active.toSeq.sortBy(_.name == null).map { s0 =>
      s"""{"id":${q(s0.id.toString)}""" +
        Option(s0.name).fold("")(n => s""","name":${q(n)}""") +
        s""","is_active":${s0.isActive}}"""
    }
    s"""{"active_jobs":[${jobs.mkString(",")}],""" +
      s""""active_streams":[${streams.mkString(",")}],""" +
      s""""default_parallelism":${spark.sparkContext.defaultParallelism}}"""
  }

  private def runAction(ex: HttpExchange): String = {
    if (ex.getRequestMethod != "POST")
      throw new MethodNotAllowed(ex.getRequestMethod)
    val action = ex.getRequestURI.getPath.stripPrefix("/api/v1/actions/")
    def heap() = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getUsed
    action match {
      case "gc" | "free_os_memory" =>
        val before = heap()
        System.gc()
        val freed = math.max(0L, before - heap())
        s"""{"action":${q(action)},"ok":true,""" +
          s""""message":"GC completed","freed_bytes":$freed}"""
      case "storage_maintain" =>
        val run = maintain.getOrElse(
          throw new IllegalArgumentException("storage maintenance is not wired"))
        s"""{"action":"storage_maintain","ok":true,"message":${q(run())}}"""
      case "repair_nan_partials" =>
        // opt-in one-time repair of pre-fix NaN-poisoned rollup
        // partials (rebuilds exactly the poisoned buckets from raw)
        val run = repair.getOrElse(
          throw new IllegalArgumentException("partials repair is not wired"))
        s"""{"action":"repair_nan_partials","ok":true,"message":${q(run())}}"""
      case other =>
        throw new IllegalArgumentException(s"unknown action '$other'")
    }
  }

  // ---------- plumbing ----------

  private def q(s: String): String = ApiEncoders.jsonString(s)

  /** Client errors map to client codes, never 500 (the reference's
    * ogen router returns 405 on method mismatch and 400 on bad
    * operands; only genuine handler failures are 500s).
    */
  private final class MethodNotAllowed(val method: String)
    extends RuntimeException(s"method $method not allowed")

  /** Auth wraps every admin route like the reference's admin server
    * wiring (cmd/oteldb/admin.go:51 passes `cfg.Auth` into `addOgen`) —
    * the actions routes are DESTRUCTIVE (`storage_maintain` can drop
    * TTL-expired partitions), so this server accepts the same
    * per-section override as the query/ingest ones.
    */
  private def handler(f: HttpExchange => String)
      : com.sun.net.httpserver.HttpHandler =
    metrics.measure(Auth.guard(auth, {
      (ex: HttpExchange) =>
    val (code, body) =
      try (200, f(ex))
      catch {
        case e: MethodNotAllowed =>
          (405, s"""{"error_message":${q(e.getMessage)}}""")
        case e: IllegalArgumentException =>
          (400, s"""{"error_message":${q(Option(e.getMessage).getOrElse("bad request"))}}""")
        case e: Exception =>
          (500, s"""{"error_message":${q(Option(e.getMessage).getOrElse("error"))}}""")
      }
    send(ex, code, "application/json", body)
  }))

  private def send(ex: HttpExchange, code: Int, contentType: String,
      body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

object AdminApi {
  /** Library version reported by /api/v1/info. */
  val Version = "0.10.0"

  /** A wired service for the health report (adminhandler.go:20-28):
    * a nil check reports healthy.
    */
  final case class Component(name: String, addr: Option[String] = None,
      check: Option[() => Unit] = None)

  /** Per-signal backend configuration (adminapi SignalInfo). */
  final case class SignalInfo(signal: String, backend: String,
      queryable: Boolean = true, bind: Option[String] = None)
}
