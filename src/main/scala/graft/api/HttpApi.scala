package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-process HTTP facade over the query front-ends — the reference's
  * entire user surface is HTTP
  * (internal/lokihandler/lokihandler.go:67-645, promhandler.go:72-646,
  * tempohandler.go:66-697); this closes the same loop
  * parser → plan → encode → serve on the JDK's built-in server, no
  * extra dependencies.
  *
  * Endpoints (GET, query-string params):
  *   - /loki/api/v1/query_range?query=&step=&start=&end=
  *   - /loki/api/v1/labels?start=&end=
  *   - /loki/api/v1/label/{name}/values?query=&start=&end=
  *   - /loki/api/v1/series?match[]=&start=&end=
  *   - /api/v1/query_range?query=&step=&start=&end=   (PromQL)
  *   - /api/v1/query?query=&time=                     (PromQL instant)
  *   - /api/v1/labels | /api/v1/label/{name}/values | /api/v1/series
  *   - /api/v1/metadata?metric=&limit=                (metric metadata)
  *   - /api/search?q=&limit=&start=&end=              (TraceQL search)
  *   - /api/search/tags | /api/search/tag/{name}/values
  *   - /api/v2/search/tag/{name}/values?q=            (selector-filtered)
  *   - /api/traces/{hexTraceId} | /api/v2/traces/{hexTraceId}
  *   - /api/metrics/query_range?q=&step=              (TraceQL metrics)
  *   - /api/metrics/query?q=                          (instant form)
  *   - /api/status/buildinfo | /api/echo
  *   - /loki/api/v1/patterns | /loki/api/v1/push      (faithful stubs)
  *
  * The Prom routes also accept POST with an
  * application/x-www-form-urlencoded body carrying the same fields
  * (reference PostQuery/PostQueryRange/PostLabels/PostSeries forms).
  *
  * Every handler threads `start`/`end` into the scan BEFORE planning
  * (reference tempohandler.go:126-180, lokihandler.go:365-407,
  * promhandler.go:328-374) — at 100 TB an unbounded request must not
  * become a full-table scan; the time filter lands on the parquet
  * reader as a pushed predicate (partition/row-group pruning).
  *
  * Spark is the execution engine behind every handler; the HTTP layer
  * only parses params and serializes the already-distributed result
  * (ApiEncoders collects bounded envelopes: per-series rows, capped
  * trace lists, distinct label/tag sets).
  */
/* BY-NAME backing frames: a static caller passes plain DataFrames
 * (each reference re-evaluates to the same frame); a LIVE deployment
 * (graft.Serve) passes generation-memoized suppliers so batches
 * committed AFTER the API started become visible — a plain
 * `spark.read.parquet` frame snapshots the file listing at creation
 * and would hide them forever. `generation` feeds the result caches:
 * entries are keyed on the layout generation, so a cached window can't
 * serve answers that predate late-arriving data.
 */
final class HttpApi(logs: => DataFrame, points: => DataFrame,
    spans: => DataFrame,
    profiles: => Option[DataFrame] = None,
    exemplars: => Option[DataFrame] = None,
    series: Option[DataFrame] = None,
    limits: Limits.ResultLimits = Limits.ResultLimits(),
    rules: Seq[graft.promql.Rules.RuleGroup] = Nil,
    cube: => Option[graft.traceql.TraceQL.AttrCube] = None,
    // tier frames' `__k` column must be the CANONICAL series key —
    // VectorMatching.streamKey(labels) — as every producer writes it
    // (statTierChain, the stored sidecar's series_key): the readers
    // rebuild the label map from it (labelsOfStreamKey) instead of
    // dragging a map-typed aggregate through every tier merge
    tiers: => Map[Long, DataFrame] = Map.empty,
    logTiers: => Map[Long, DataFrame] = Map.empty,
    generation: () => Long = () => 0L,
    refreshOnStale: () => Unit = () => (),
    auth: Option[Auth.Middleware] = None,
    val metrics: RequestMetrics = new RequestMetrics("query")) {

  private var server: HttpServer = _

  /** Handler-raised HTTP statuses beyond the blanket 400. */
  private final class HttpStatus(val code: Int, msg: String)
      extends RuntimeException(msg)
  private def notFound(msg: String): Nothing =
    throw new HttpStatus(404, msg)
  private def notImplemented(msg: String): Nothing =
    throw new HttpStatus(501, msg)

  // ---- bounded execution (reference querier.go:119-120 + app.go:233) ----

  // at most maxConcurrentQueries requests execute Spark work at once;
  // queueDepth more wait up to queueWaitMs; the rest SHED with a typed
  // 503 — an unbounded pool with no time cap turns a burst of slow
  // queries into a self-inflicted DoS (the bounded-pool + shed shape)
  private val queryGate =
    new java.util.concurrent.Semaphore(math.max(1, limits.maxConcurrentQueries))
  private val queueWaiters = new java.util.concurrent.atomic.AtomicInteger(0)
  // one shared timer arms the per-request execution-time cap; cancelled
  // tasks are removed eagerly so a busy server doesn't accumulate them
  // (plain val: the executor starts no thread until the first schedule)
  private val capTimer = {
    val t = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      (r: Runnable) => {
        val th = new Thread(r, "graft-http-cap"); th.setDaemon(true); th
      })
    t.setRemoveOnCancelPolicy(true)
    t
  }

  /** Starts on `port` (0 = ephemeral); returns the bound port.
    * The JDK server picks the LONGEST matching context prefix, so the
    * more specific routes shadow their parents.
    */
  def start(port: Int = 0): Int = {
    // read-header timeout, the reference's http.Server
    // ReadHeaderTimeout 15s (app.go:233-236) — must precede create()
    HttpApi.tuneServerDefaults()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // the JDK server's default (null) executor runs handlers on the
    // dispatch thread, serializing ALL requests. BOUNDED pool: enough
    // threads for every executing query + every queued waiter + slack
    // for shed responses and static routes; anything beyond parks in
    // the executor queue briefly until a shed/response thread frees
    // (never a new unbounded thread — the r14 probe showed pile-up,
    // not errors, past saturation).
    val poolSize =
      math.max(1, limits.maxConcurrentQueries) + math.max(0, limits.queueDepth) + 8
    val pool = new java.util.concurrent.ThreadPoolExecutor(
      poolSize, poolSize, 60L, java.util.concurrent.TimeUnit.SECONDS,
      new java.util.concurrent.LinkedBlockingQueue[Runnable](),
      (r: Runnable) => {
        val t = new Thread(r, "graft-http"); t.setDaemon(true); t
      })
    pool.allowCoreThreadTimeOut(true)
    server.setExecutor(pool)
    server.createContext("/loki/api/v1/query_range",
      handler(ex => cachedEnvelope(ex, "loki/range")(lokiQueryRange(ex))))
    server.createContext("/loki/api/v1/query",
      handler(ex => cachedEnvelope(ex, "loki/instant")(lokiInstant(ex))))
    server.createContext("/loki/api/v1/labels", handler(lokiLabels))
    server.createContext("/loki/api/v1/label/", handler(lokiLabelValues))
    server.createContext("/loki/api/v1/series", handler(lokiSeries))
    server.createContext("/loki/api/v1/index/volume",
      handler(ex => cachedEnvelope(ex, "loki/volume")(lokiVolume(ex))))
    server.createContext("/loki/api/v1/index/volume_range",
      handler(ex => cachedEnvelope(ex, "loki/volume_range")(lokiVolumeRange(ex))))
    // index stats: the reference serves empty stats
    // (lokihandler.go:234-238); computed for real here (parity-plus)
    server.createContext("/loki/api/v1/index/stats", handler(lokiIndexStats))
    // reference-faithful static response (lokihandler.go:220-232:
    // DrilldownLimits advertises the volume capability)
    server.createContext("/loki/api/v1/drilldown-limits",
      lightHandler(_ => """{"limits":{"volume_enabled":true},"version":"v3.6.0"}"""))
    server.createContext("/loki/api/v1/detected_labels", handler(lokiDetectedLabels))
    server.createContext("/loki/api/v1/detected_fields", handler(lokiDetectedFields))
    server.createContext("/loki/api/v1/detected_field/", handler(lokiDetectedFieldValues))
    server.createContext("/api/v1/query_range",
      handler(ex => cachedEnvelope(ex, "prom/range")(promQueryRange(ex))))
    server.createContext("/api/v1/query",
      handler(ex => cachedEnvelope(ex, "prom/instant")(promInstant(ex))))
    server.createContext("/api/v1/labels", handler(promLabels))
    server.createContext("/api/v1/label/", handler(promLabelValues))
    server.createContext("/api/v1/series", handler(promSeries))
    exemplars.foreach { _ =>
      server.createContext("/api/v1/query_exemplars", handler(promQueryExemplars))
    }
    server.createContext("/api/v1/metadata", handler(promMetadataHandler))
    // rules: faithful 501 when none are configured (promhandler.go:
    // 494-497 GetRules → ErrNotImplemented); with configured groups,
    // served for real — recording + alerting rules with live alert
    // states from the Rules evaluator (parity-plus)
    server.createContext("/api/v1/rules", handler { ex =>
      if (rules.isEmpty) notImplemented("rules are not implemented")
      else promRules(ex)
    })
    server.createContext("/api/search", handler(tempoSearchHandler))
    // TraceQL metrics engine over HTTP — the reference serves
    // ErrNotImplemented here (tempohandler.go:88-120); we serve the
    // full engine (parity-plus), in the tempoapi envelope shapes
    server.createContext("/api/metrics/query_range",
      handler(ex => cachedEnvelope(ex, "tempo/range")(tempoMetricsRange(ex))))
    server.createContext("/api/metrics/query",
      handler(ex => cachedEnvelope(ex, "tempo/instant")(tempoMetricsInstant(ex))))
    // Grafana health/version probes (tempohandler.go:62-80)
    server.createContext("/api/status/buildinfo", lightHandler(_ =>
      s"""{"version":"2.1.0","revision":"","branch":"","buildUser":"",""" +
        s""""buildDate":"","goVersion":${jsonStr(
          "java" + System.getProperty("java.version", ""))}}"""))
    server.createContext("/api/echo", rawHandler(_ =>
      (200, "text/plain; charset=utf-8", "echo")))
    server.createContext("/api/v2/traces/", handler(tempoTraceByIdV2))
    // patterns: the reference stubs this to an empty series set
    // (lokihandler.go:605-610); served for real here (parity-plus)
    // by the PatternMine masking aggregation
    server.createContext("/loki/api/v1/patterns", handler(lokiPatterns))
    // the QUERY server declines push like the reference
    // (lokihandler.go:611-616); the ingest listener (OtlpReceiver)
    // accepts the same path for real — parity-plus lives there
    server.createContext("/loki/api/v1/push",
      lightHandler(_ => notImplemented("push is not implemented")))
    server.createContext("/api/search/tags", handler(tempoTags))
    server.createContext("/api/v2/search/tags", handler(tempoTagsV2))
    server.createContext("/api/search/tag/", handler(tempoTagValues(_, v2 = false)))
    server.createContext("/api/v2/search/tag/", handler(tempoTagValues(_, v2 = true)))
    server.createContext("/api/traces/", handler(tempoTraceById))
    // Pyroscope front-end (reference profilehandler.go:54-223) — only
    // mounted when a profiles frame is wired in
    profiles.foreach { _ =>
      server.createContext("/pyroscope/render", handler(pyroRender))
      server.createContext("/pyroscope/render-diff", handler(pyroRenderDiff))
      server.createContext("/pyroscope/labels", handler(pyroLabels))
      server.createContext("/pyroscope/label-values", handler(pyroLabelValues))
      server.createContext("/pyroscope/apps", handler(pyroApps))
      // ingestion rides the OTLP receiver; the push endpoint is a typed
      // 501 like the reference (profilehandler.go:78-82)
      server.createContext("/pyroscope/ingest", lightHandler(_ =>
        notImplemented("profile ingestion is handled by the OTLP receiver")))
    }
    server.start()
    server.getAddress.getPort
  }

  /** Stops the server; `gracefulSeconds` bounds the wait for in-flight
    * exchanges (the reference shuts down with a 30 s context,
    * app.go:240-247 — the JDK server's stop(delay) returns as soon as
    * the in-flight exchanges drain, the delay is only the bound).
    */
  def stop(gracefulSeconds: Int = 0): Unit = {
    if (server != null) server.stop(gracefulSeconds)
    // the cap timer is per-instance: without this, every started API
    // in a long-lived JVM (suites, embedded use) leaks one
    // graft-http-cap thread
    capTimer.shutdownNow(): Unit
  }

  // ---------- time bounds ----------

  /** Unix time param → ns. Floats are seconds (Prom convention);
    * integers are seconds up to 10 digits, nanoseconds beyond (Loki
    * sends ns epochs, Tempo seconds — digit count disambiguates, the
    * same heuristic as the template `unixToTime`).
    */
  private def toNs(v: String): Long =
    // RFC3339 first (the Prom HTTP API accepts unix OR RFC3339 — the
    // date shape is unambiguous vs every numeric form): promtool and
    // the client libraries send "2026-08-16T00:00:00Z"/"+02:00"/.frac
    if (v.length >= 10 && v.charAt(4) == '-' && v.charAt(7) == '-') {
      val inst = java.time.OffsetDateTime.parse(v).toInstant
      inst.getEpochSecond * 1000000000L + inst.getNano
    }
    else if (v.exists(c => c == '.' || c == 'e' || c == 'E'))
      (v.toDouble * 1e9).toLong
    else {
      val digits = if (v.startsWith("-")) v.length - 1 else v.length
      if (digits <= 10) v.toLong * 1000000000L else v.toLong
    }

  /** `step` param: seconds as a number, or a duration string ("30s",
    * "1m") — the Prom/Loki APIs accept both; promtool sends the
    * duration form.
    */
  private def stepSec(s: String): Double =
    s.toDoubleOption.getOrElse(
      graft.functions.Kernels.parseDurationSeconds(s).getOrElse(
        throw new IllegalArgumentException(s"bad step '$s'")))

  /** The request's [lo, hi) window in ns: explicit start/end params,
    * with `since` computing a missing start as (end | now) − since —
    * the Loki/Tempo relative-window param (reference tempohandler/
    * params.go:35-80, lokihandler.go:74); an explicit start wins.
    */
  private def boundsNs(p: Map[String, String])
      : (Option[Long], Option[Long]) = {
    val sinceNs = p.get("since").filter(_.nonEmpty).map { s =>
      val sec = graft.functions.Kernels.parseDurationSeconds(s)
        .getOrElse(throw new IllegalArgumentException(s"bad since '$s'"))
      require(sec >= 0, s"since=$s could not be negative")
      (sec * 1e9).toLong
    }
    val hiNs = p.get("end").filter(_.nonEmpty).map(toNs)
    val loNs = p.get("start").filter(_.nonEmpty).map(toNs)
      .orElse(sinceNs.map { d =>
        val nowNs = System.currentTimeMillis() * 1000000L
        math.min(hiNs.getOrElse(nowNs), nowNs) - d
      })
    (loNs, hiNs)
  }

  /** start/end → pushed scan predicate on `tsCol` (ns/`divisor`),
    * half-open [start, end) like the reference's range handling.
    * `loExtendNs` widens the LOWER bound by a query's needed history
    * (range+offset+lookback) so a range function at the first grid
    * point sees its full window; `hiInclusive` makes the UPPER bound
    * end-inclusive — the engine's windows are (t−range, t], so the
    * grid point AT `end` needs the sample landing exactly there, which
    * the log-listing half-open cut would truncate (the trailing-edge
    * twin of the history extension; also what keeps tier-served and
    * raw answers bit-equal on boundary samples). `unbounded` drops
    * BOTH bounds (an `@`-pinned or future-offset leaf can reach
    * anywhere — the output grid filter still bounds what the client
    * sees).
    */
  private def windowed(df: DataFrame, p: Map[String, String],
      tsCol: String, divisor: Long, loExtendNs: Long = 0L,
      unbounded: Boolean = false, hiInclusive: Boolean = false): DataFrame =
    if (unbounded) df
    else windowedAt(df, boundsNs(p), tsCol, divisor, loExtendNs, hiInclusive)

  /** [[windowed]] over PRE-COMPUTED bounds — callers that also need the
    * bounds for output clamping must evaluate them ONCE (`since` is
    * wall-clock-derived, so two evaluations yield two windows).
    */
  private def windowedAt(df: DataFrame, bnds: (Option[Long], Option[Long]),
      tsCol: String, divisor: Long, loExtendNs: Long = 0L,
      hiInclusive: Boolean = false): DataFrame = {
    val (loNs, hiNs) = bnds
    val f1 = loNs.map(v => (v - loExtendNs) / divisor)
      .fold(df)(v => df.filter(col(tsCol) >= v))
    hiNs.map(_ / divisor).fold(f1)(v =>
      if (hiInclusive) f1.filter(col(tsCol) <= v)
      else f1.filter(col(tsCol) < v))
  }

  // ---------- Loki handlers ----------

  private def lokiQueryRange(ex: HttpExchange): String = {
    val p = params(ex)
    val stepNs = p.get("step").map(s => (stepSec(s) * 1e9).toLong)
    // the maintained log-volume sidecar serves grain-aligned
    // count/bytes/rate aggregations without scanning a single log line
    // (the BucketedSampleQuery offload); anything unservable falls
    // through to the raw path, same results
    val volumePlan =
      if (logTiers.isEmpty) None
      else for {
        s <- p.get("start").filter(_.nonEmpty)
        e <- p.get("end").filter(_.nonEmpty)
        st <- stepNs
        df <- graft.logql.Planner.volumeTierPlan(p("query"),
          toNs(s), toNs(e), st, logTiers)
      } yield df
    volumePlan match {
      case Some(df) =>
        return ApiEncoders.lokiMatrix(df,
          maxBytes = limits.maxResultBytes,
          maxRows = limits.maxSampleRows)
      case None => // raw path below
    }
    // metric queries read range+offset of history before the first
    // grid point (windows are (t−range, t]): extend the scan's lower
    // bound by it and clamp the output grid back to ≥ start below.
    // Bounds evaluate ONCE — the clamp must use the same window as the
    // scan (a `since` window derives from the wall clock).
    val histNs = graft.logql.Planner.scanHistoryNs(p("query"))
    val bnds = boundsNs(p)
    // metric queries (histNs > 0) are end-INCLUSIVE like their windows
    // (t−range, t]; the log-listing path keeps the Loki half-open cut
    val src = windowedAt(logs, bnds, "ts_ns", 1L, loExtendNs = histNs,
      hiInclusive = histNs > 0)
    // log-query knobs (lokihandler.go QueryRange params): `limit` caps
    // entries, `direction=backward` keeps the NEWEST limit entries —
    // both reach the plan as TakeOrderedAndProject, so the cap rides
    // the scan instead of trimming a full result
    val limit = p.get("limit").flatMap(_.toIntOption)
      .getOrElse(graft.logql.Planner.DefaultLogLimit)
    val backward = p.get("direction").contains("backward")
    val df = graft.logql.Planner.query(p("query"), src, stepNs = stepNs,
      logLimit = Some(limit), newestFirst = backward)
    // typed guard rails on the unbounded (sample/matrix) path: the log
    // listing path is already limit-capped inside the plan
    if (df.columns.contains("value")) {
      // grid points fanned out of the history slack fall before the
      // requested window: clamp them (samples ≥ the window's lower
      // bound always fan to grid points ≥ it, so this only cuts
      // slack-born buckets); a `since`-derived window clamps exactly
      // like an explicit start, from the ONE bounds evaluation above
      val gLo = bnds._1
        .filter(_ => df.columns.contains("bucket_ns"))
        .fold(df)(v => df.filter(col("bucket_ns") >= v))
      // the end-INCLUSIVE scan lets samples at/near `end` fan out to
      // grid points past it (up to end+range−step): clamp the upper
      // grid edge too, mirroring the volume-tier path and the Prom
      // range path — tier-served and raw grids must match in extent
      val clamped = bnds._2
        .filter(_ => gLo.columns.contains("bucket_ns"))
        .fold(gLo)(v => gLo.filter(col("bucket_ns") <= v))
      ApiEncoders.lokiMatrix(clamped,
        maxBytes = limits.maxResultBytes, maxRows = limits.maxSampleRows)
    }
    else ApiEncoders.lokiStreams(df, newestFirst = backward,
      maxBytes = limits.maxResultBytes)
  }

  /** Loki instant query (lokihandler.go Query): metric queries
    * evaluate at `time` and render a vector; log queries return the
    * newest `limit` entries at or before `time` as streams.
    */
  private def lokiInstant(ex: HttpExchange): String = {
    val p = params(ex)
    val q = p("query")
    // `@explain` serves the decision stream on the instant endpoint
    // too (the reference explains through both Query and QueryRange)
    if (q.trim.startsWith(graft.logql.Explain.Prefix))
      return ApiEncoders.lokiStreams(graft.logql.Planner.query(q, logs))
    val tNs = p.get("time").filter(_.nonEmpty).map(toNs).getOrElse {
      val newest = logs.agg(max(col("ts_ns"))).head()
      // an empty log store with no time param: empty result, not NPE
      if (newest.isNullAt(0)) return """{"status":"success","data":{"resultType":"streams","result":[]}}"""
      newest.getLong(0)
    }
    graft.logql.Parser.parse(q) match {
      case graft.logql.Ast.LogExpr(_) =>
        val limit = p.get("limit").map(_.toInt).getOrElse(100)
        val df = graft.logql.Planner.query(q, logs.filter(col("ts_ns") <= tNs))
          .orderBy(col("ts_ns").desc).limit(limit)
        ApiEncoders.lokiStreams(df)
      case _ =>
        // aligned volume aggregations ride the maintained sidecar
        val df = graft.logql.Planner.volumeInstantPlan(q, tNs, logTiers)
          .getOrElse(graft.logql.Planner.instant(q, logs, tNs)
            .select(col("labels"), col("value")))
        ApiEncoders.lokiVector(df, tNs / 1000000000L)
    }
  }

  private def lokiLabels(ex: HttpExchange): String =
    ApiEncoders.labelNames(windowed(logs, params(ex), "ts_ns", 1L), None)

  private def lokiLabelValues(ex: HttpExchange): String = {
    val p = params(ex)
    val name = pathSegment(ex, "/label/", "/values")
    val src0 = windowed(logs, p, "ts_ns", 1L)
    val src = p.get("query").filter(_.nonEmpty)
      .fold(src0)(graft.logql.Planner.selectorFilter(_, src0))
    ApiEncoders.labelValues(src, element_at(col("labels"), name))
  }

  private def lokiSeries(ex: HttpExchange): String = {
    val src = windowed(logs, params(ex), "ts_ns", 1L)
    val matched = multiParams(ex, "match[]") match {
      case Nil  => src
      case sels => sels.map(graft.logql.Planner.selectorFilter(_, src))
        .reduce(_ unionAll _)
    }
    ApiEncoders.seriesSet(matched, col("labels"))
  }

  /** Log volume (Grafana drilldown): counts per targetLabels group,
    * rendered as a Loki instant vector at the window end
    * (lokihandler.go:404-551).
    */
  private def lokiVolume(ex: HttpExchange): String = {
    val p = params(ex)
    val src = windowed(logs, p, "ts_ns", 1L)
    val targets = p.get("targetLabels").filter(_.nonEmpty)
      .map(_.split(",").toSeq).getOrElse(Nil)
    val evalSec = p.get("end").filter(_.nonEmpty).map(toNs(_) / 1000000000L)
      .getOrElse(0L)
    ApiEncoders.lokiVector(
      graft.logql.Discovery.volume(src, p.getOrElse("query", "{}"), targets),
      evalSec)
  }

  /** Volume timeline (drilldown): per-step counts per targetLabels
    * group as a Loki matrix (lokihandler.go:447-551 QueryVolumeRange).
    */
  private def lokiVolumeRange(ex: HttpExchange): String = {
    val p = params(ex)
    val src = windowed(logs, p, "ts_ns", 1L)
    val targets = p.get("targetLabels").filter(_.nonEmpty)
      .map(_.split(",").toSeq).getOrElse(Nil)
    val stepNs = p.get("step").filter(_.nonEmpty)
      .map(s => (stepSec(s) * 1e9).toLong).getOrElse(3600000000000L)
    ApiEncoders.lokiMatrix(
      graft.logql.Discovery.volumeRange(src, p.getOrElse("query", "{}"),
        stepNs, targets))
  }

  private def lokiDetectedLabels(ex: HttpExchange): String = {
    val src = lokiDiscoverySrc(ex)
    val items = graft.logql.Discovery.detectedLabels(src).collect()
      .map(r => s"""{"label":${jsonStr(r.getString(0))},"cardinality":${r.getLong(1)}}""")
    s"""{"detectedLabels":[${items.mkString(",")}]}"""
  }

  private def lokiDetectedFields(ex: HttpExchange): String = {
    val src = lokiDiscoverySrc(ex)
    val items = graft.logql.Discovery.detectedFields(src).collect()
      .map(r => s"""{"label":${jsonStr(r.getString(0))},"type":${jsonStr(
        r.getString(1))},"cardinality":${r.getLong(2)}}""")
    s"""{"fields":[${items.mkString(",")}],"limit":${items.length}}"""
  }

  private def lokiDetectedFieldValues(ex: HttpExchange): String = {
    val field = pathSegment(ex, "/detected_field/", "/values")
    val src = lokiDiscoverySrc(ex)
    val vals = graft.logql.Discovery.detectedFieldValues(src, field)
      .collect().map(r => jsonStr(r.getString(0)))
    s"""{"values":[${vals.mkString(",")}],"limit":${vals.length}}"""
  }

  /** Index statistics over the selector-matched window (Grafana uses
    * this to size queries before running them). The reference serves
    * zeros (lokihandler.go:234-238) — computed for real here
    * (parity-plus): one aggregate pass; streams = distinct label sets,
    * chunks = distinct (stream, day) — the daily-part proxy for the
    * stored layout's chunk count.
    */
  private def lokiIndexStats(ex: HttpExchange): String = {
    val src = lokiDiscoverySrc(ex)
    val key = graft.logql.VectorMatching.streamKey(col("labels"))
    val r = src
      .select(key.as("__k"), expr("ts_ns div 86400000000000").as("__d"),
        octet_length(col("body")).as("__b"))
      .agg(countDistinct(col("__k")).as("streams"),
        countDistinct(col("__k"), col("__d")).as("chunks"),
        count(lit(1)).as("entries"),
        coalesce(sum(col("__b")), lit(0L)).as("bytes"))
      .head()
    s"""{"streams":${r.getLong(0)},"chunks":${r.getLong(1)},""" +
      s""""entries":${r.getLong(2)},"bytes":${r.getLong(3)}}"""
  }

  /** Detected log patterns (Loki patterns API; the reference serves an
    * empty set, lokihandler.go:605-610 — parity-plus). Templates come
    * from the PatternMine masking aggregation over the selector-matched
    * window; series are capped at the top 100 patterns by volume so the
    * envelope collect stays bounded whatever the corpus size.
    */
  private def lokiPatterns(ex: HttpExchange): String = {
    val p = params(ex)
    val src = lokiDiscoverySrc(ex)
    val stepNs = p.get("step").filter(_.nonEmpty)
      .map(s => (stepSec(s) * 1e9).toLong).getOrElse(3600000000000L)
    val series = graft.logql.PatternMine.mine(src, stepNs)
      .groupBy(col("pattern"), col("level"))
      .agg(sum(col("n")).as("total"),
        sort_array(collect_list(struct(col("bucket_ns"), col("n"))))
          .as("samples"))
      .orderBy(col("total").desc, col("pattern"))
      .limit(100)
      .collect()
      .map { r =>
        val samples = r.getSeq[org.apache.spark.sql.Row](3)
          .map(s => "[%.3f,%d".formatLocal(java.util.Locale.ROOT,
            s.getLong(0) / 1e9, s.getLong(1)) + "]")
        s"""{"pattern":${jsonStr(r.getString(0))},"level":${jsonStr(
          r.getString(1))},"samples":[${samples.mkString(",")}]}"""
      }
    s"""{"series":[${series.mkString(",")}]}"""
  }

  /** Windowed + optionally selector-narrowed logs for the discovery
    * endpoints (they all take `query=` as a selector).
    */
  private def lokiDiscoverySrc(ex: HttpExchange): DataFrame = {
    val p = params(ex)
    val src = windowed(logs, p, "ts_ns", 1L)
    p.get("query").filter(_.nonEmpty)
      .fold(src)(graft.logql.Planner.selectorFilter(_, src))
  }

  // ---------- Prometheus handlers ----------

  /** Series-resolution cache over the metadata endpoints (reference
    * internal/metricscache + querier_metrics_timeseries.go:43-147):
    * key = xxh3 of route + sorted match[] selectors + window; repeated
    * dashboard refreshes serve the encoded envelope without
    * re-running the scan, and concurrent identical lookups coalesce
    * into one Spark job. The backing frames are static per API
    * instance, so window-keyed entries never go stale.
    */
  private val seriesCache = new graft.util.SeriesCache[String]()

  private def cachedResolution(ex: HttpExchange, route: String)
      (body: => String): String = {
    val p = params(ex)
    // layout generation is part of the key: under a live deployment a
    // committed batch bumps it, so a window cached before the batch
    // never serves after it (the "static backing frames" premise this
    // cache was built on, restored per generation)
    val triples = ("route", route, "") +:
      ("gen", generation().toString, "") +:
      multiParams(ex, "match[]").sorted.map(("match", "", _))
    // a `since` window derives from the WALL CLOCK (boundsNs): the
    // same params an hour later mean a different window, so such
    // requests must re-evaluate (the cachedEnvelope rule, applied to
    // every wall-clock-derived cache)
    if (p.contains("since")) return body
    val key = seriesCache.keyOf(triples,
      p.get("start").filter(_.nonEmpty).map(toNs).getOrElse(Long.MinValue),
      p.get("end").filter(_.nonEmpty).map(toNs).getOrElse(Long.MaxValue))
    seriesCache.get(key)(body)
  }

  /** Result-envelope cache over the explicit-window query endpoints —
    * what the ServeProbe FloorDecomp showed the dashboard-refresh p50
    * is made of: an IDENTICAL request (same params) re-pays Catalyst
    * analysis + the job floor (~300-450 ms on the tier path for a
    * KB-sized sidecar aggregate) on every refresh. The key is the full
    * sorted param set + route + layout GENERATION, so late-arriving
    * data invalidates by key; only requests with an explicit window
    * (start+end, or time) and no `since` are cacheable — anything
    * wall-clock-derived must re-evaluate. Values are the final JSON
    * strings (singleflight coalesces concurrent identical refreshes);
    * oversized envelopes are served but not stored.
    */
  private val envelopeCache = new graft.util.SeriesCache[String](64,
    admit = (s: String) => s.length <= (4 << 20))
  private def cachedEnvelope(ex: HttpExchange, route: String)
      (body: => String): String = {
    val p = params(ex)
    val explicitWindow =
      (p.get("start").exists(_.nonEmpty) && p.get("end").exists(_.nonEmpty)) ||
        p.get("time").exists(_.nonEmpty)
    if (!explicitWindow || p.contains("since")) body
    else {
      val triples = ("gen", generation().toString, route) +:
        p.toSeq.sorted.map { case (k, v) => ("p", k, v) }
      // a coalesced waiter is outside job-group reach (it runs no
      // Spark jobs to cancel) — bound its wait at the execution cap
      // and surface the same typed 503 the cap produces
      try envelopeCache.get(envelopeCache.keyOf(triples, 0L, 0L),
        waitMs = limits.maxExecutionMs)(body)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          throw new HttpStatus(503,
            s"query execution time exceeded ${limits.maxExecutionMs}ms " +
              "(waiting on an identical in-flight query)")
      }
    }
  }

  /** Query-path series-resolution cache (reference
    * querier_metrics_timeseries.go:43-147 caches the matcher→series
    * resolution for POINT scans too, not just metadata endpoints):
    * a single-selector range query's point set is resolved once per
    * (matcher-set, window), MATERIALIZED into the in-memory columnar
    * cache, and every identical later query plans an
    * InMemoryTableScan instead of a second parquet resolution scan.
    * LRU-bounded; eviction unpersists.
    */
  private[graft] val resolutionCache =
    new graft.util.SeriesCache[DataFrame](64, onEvict = _.unpersist())

  private def promQueryRange(ex: HttpExchange): String = {
    val p = params(ex)
    val stepUs = p.get("step").map(s => (stepSec(s) * 1e6).toLong)
    val q = p("query")
    // the maintained rollup tiers serve a grain-aligned
    // `*_over_time` dashboard grid without touching raw points (the
    // whole reason the ingest listener maintains the sidecar); any
    // unservable query/alignment falls through to the raw path below,
    // same results
    val tierPlan =
      if (tiers.isEmpty) None
      else for {
        s <- p.get("start").filter(_.nonEmpty)
        e <- p.get("end").filter(_.nonEmpty)
        st <- stepUs
        // one timestamp parse for both paths: toNs accepts sec/ms/ns
        // formats — a seconds-only parse here would read a ns-formatted
        // bound ~1e9× wrong instead of matching the raw path
        df <- graft.promql.PromQL.rangeTierPlan(q,
          toNs(s) / 1000L, toNs(e) / 1000L, st, tiers)
      } yield df
    tierPlan match {
      case Some(df) =>
        return ApiEncoders.promMatrix(df, tsCol = "ts_us",
          maxBytes = limits.maxResultBytes,
          maxRows = limits.maxSampleRows)
      case None => // raw path below
    }
    // the scan's lower bound extends by the query's needed history
    // (range+offset+lookback) — without the slack a range function at
    // the FIRST grid points evaluates over truncated data; the output
    // grid filters back to [start, end] below
    val histUs = graft.promql.PromQL.scanHistoryUs(q)
    val src0 = windowed(points, p, "ts_us", 1000L,
      loExtendNs = histUs.getOrElse(0L) * 1000L,
      unbounded = histUs.isEmpty,
      hiInclusive = true) // (t−range, t] at t = end needs the end sample
    // only a query with exactly ONE distinct selector and no
    // table-extent-gridded node (absent/time()/vector()) can
    // pre-resolve: its label predicate then bounds the whole point set
    // the plan may read (the filter re-applies idempotently inside the
    // planner)
    val src = graft.promql.PromQL.cacheableSelector(q) match {
      // a `since`-derived scan window comes from the wall clock — the
      // same key an hour later would serve an hour-stale frame
      case Some(sel) if !p.contains("since") =>
        // history is part of the key: two queries sharing a selector
        // but needing different slack must not share a resolved frame
        val triples = ("hist", histUs.fold("inf")(_.toString), "") +:
          ("gen", generation().toString, "") +: // live-layout freshness
          (("=", "__name__", sel.name)) +:
          sel.matchers.map(m => (m.op, m.label, m.value))
        val key = resolutionCache.keyOf(triples,
          p.get("start").filter(_.nonEmpty).map(toNs).getOrElse(Long.MinValue),
          p.get("end").filter(_.nonEmpty).map(toNs).getOrElse(Long.MaxValue))
        resolutionCache.get(key) {
          val df = src0.filter(graft.promql.PromQL.selectorFilter(sel))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          // a failed/cancelled materialization must release its
          // CacheManager entry — onEvict only covers entries that
          // made it INTO the cache
          try df.count() // materialize: the cache stores results, not plans
          catch { case e: Throwable => df.unpersist(); throw e }
          df
        }
      case _ => src0
    }
    // @ start() / @ end() resolve to the request's range bounds
    val atRange = for {
      s <- p.get("start").filter(_.nonEmpty)
      e <- p.get("end").filter(_.nonEmpty)
    } yield (toNs(s) / 1000L, toNs(e) / 1000L)
    val res = graft.promql.PromQL.range(q, src, stepUs, atRange)
    val gLo = p.get("start").filter(_.nonEmpty).map(toNs(_) / 1000L)
    val gHi = p.get("end").filter(_.nonEmpty).map(toNs(_) / 1000L)
    val res1 = gLo.fold(res)(v => res.filter(col("bucket_us") >= v))
    val res2 = gHi.fold(res1)(v => res1.filter(col("bucket_us") <= v))
    ApiEncoders.promMatrix(res2,
      maxBytes = limits.maxResultBytes, maxRows = limits.maxSampleRows)
  }

  private def promInstant(ex: HttpExchange): String = {
    val p = params(ex)
    // default eval time: the store's newest sample (a static store has
    // no "now"; reference promhandler defaults to time.Now()). A
    // raw-less store (tier-only deployment) with no time param serves
    // the empty vector instead of NPEing on the null max.
    val newest = p.get("time").filter(_.nonEmpty) match {
      case Some(_) => null
      case None    => points.agg(max(col("ts_us"))).head()
    }
    if (newest != null && newest.isNullAt(0))
      return """{"status":"success","data":{"resultType":"vector","result":[]}}"""
    val tUs = p.get("time").filter(_.nonEmpty).map(toNs(_) / 1000L)
      .getOrElse(newest.getLong(0))
    // aligned `*_over_time` instants read the maintained rollup tiers;
    // anything unservable falls back to the raw evaluation
    val df = graft.promql.PromQL.instantTierPlan(p("query"), tUs, tiers)
      .getOrElse(graft.promql.PromQL.instant(p("query"), points, tUs))
    ApiEncoders.promVector(df)
  }

  private def promLabels(ex: HttpExchange): String =
    cachedResolution(ex, "prom/labels") {
      ApiEncoders.labelNames(windowed(points, params(ex), "ts_us", 1000L),
        Some("__name__"))
    }

  private def promLabelValues(ex: HttpExchange): String = {
    val name = pathSegment(ex, "/label/", "/values")
    cachedResolution(ex, s"prom/label/$name/values") {
      val src = promMatched(ex)
      val value =
        if (name == "__name__") col("name") else element_at(col("labels"), name)
      ApiEncoders.labelValues(src, value)
    }
  }

  private def promSeries(ex: HttpExchange): String =
    cachedResolution(ex, "prom/series") {
      ApiEncoders.seriesSet(promMatched(ex),
        map_concat(map(lit("__name__"), col("name")), col("labels")))
    }

  /** Windowed points, optionally narrowed by match[] selectors. */
  private def promMatched(ex: HttpExchange): DataFrame = {
    val src = windowed(points, params(ex), "ts_us", 1000L)
    multiParams(ex, "match[]") match {
      case Nil  => src
      case sels => sels.map(graft.promql.PromQL.selectorFilter(_, src))
        .reduce(_ unionAll _)
    }
  }

  // ---------- Tempo handlers ----------

  /** Tempo search: per-trace rollups of the traces with ≥1 span
    * matching the TraceQL selector, newest first, default limit 20
    * (reference traceqlengine/engine.go:220-222). `start`/`end`
    * (unix seconds) bound the span scan BEFORE the semi-join.
    */
  private def tempoSearchHandler(ex: HttpExchange): String = {
    val p = params(ex)
    val limit = p.get("limit").map(_.toInt).getOrElse(20)
    val sp = windowed(spans, p, "start_ns", 1L)
    val q = p.get("q").filter(_.nonEmpty)
    val matched = q match {
      case Some(qq) => graft.traceql.TraceQL.matchSpans(qq, sp)
      case None     => sp
    }
    // the TraceQL path echoes only query-referenced attributes on
    // spanSet rows; the tags/match-all path echoes them all
    // (reference traceqlengine/attrs.go, tempohandler/collector.go)
    val allowed = q.map(graft.traceql.TraceQL.referencedAttrs)
    ApiEncoders.tempoSearch(sp, matched, allowed, limit)
  }

  private def tempoTags(ex: HttpExchange): String = {
    val sp = windowed(spans, params(ex), "start_ns", 1L)
    val tags = graft.traceql.TraceQL.tagNames(sp)
      .collect().map(r => jsonStr(r.getString(0)))
    s"""{"tagNames":[${tags.mkString(",")}]}"""
  }

  /** SearchTagsV2: tag names grouped into per-scope blocks, plus the
    * engine's intrinsic names when all scopes are requested
    * (reference tempohandler.go:448-531). `scope` narrows to
    * span|resource|intrinsic; the intrinsic block short-circuits
    * without touching storage.
    */
  private def tempoTagsV2(ex: HttpExchange): String = {
    val p = params(ex)
    val scope = p.getOrElse("scope", "")
    def block(name: String, tags: Seq[String]): String =
      s"""{"name":${jsonStr(name)},"tags":[${tags.map(jsonStr).mkString(",")}]}"""
    val intrinsic = block("intrinsic", graft.traceql.TraceQL.intrinsicNames)
    if (scope == "intrinsic") return s"""{"scopes":[$intrinsic]}"""
    val sp = windowed(spans, p, "start_ns", 1L)
    val scoped = graft.traceql.TraceQL.tagNamesScoped(sp)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val wanted = scope match {
      case "span" | "resource" => scoped.filter(_._1 == scope)
      case _                   => scoped
    }
    val blocks = wanted.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, ts) => block(s, ts.map(_._2)) }
    val all = if (scope.isEmpty || scope == "none") intrinsic +: blocks else blocks
    s"""{"scopes":[${all.mkString(",")}]}"""
  }

  /** SearchTagValues (v1: bare strings) / V2 (typed objects, optional
    * `q` spanset pre-filter) — reference tempohandler.go:247-536.
    */
  private def tempoTagValues(ex: HttpExchange, v2: Boolean): String = {
    val p = params(ex)
    val prefix = if (v2) "/v2/search/tag/" else "/search/tag/"
    val tag = pathSegment(ex, prefix, "/values")
    val sp = windowed(spans, p, "start_ns", 1L)
    val sel = p.get("q").filter(_.nonEmpty).getOrElse("{}")
    val vals = graft.traceql.TraceQL.tagValues(sel, tag, sp)
      .collect().map(_.getString(0))
    if (v2) {
      val items = vals.map(v =>
        s"""{"type":"string","value":${jsonStr(v)}}""")
      s"""{"tagValues":[${items.mkString(",")}]}"""
    } else
      s"""{"tagValues":[${vals.map(jsonStr).mkString(",")}]}"""
  }

  private def tempoTraceById(ex: HttpExchange): String = {
    val path = ex.getRequestURI.getPath
    val hex = path.substring(path.lastIndexOf('/') + 1)
    ApiEncoders.tempoTrace(spans, java.lang.Long.parseUnsignedLong(hex, 16))
  }

  /** TraceByIDv2 (/api/v2/traces/{id}, reference tempohandler.go:
    * 587-674): the {"trace":…} wrapper, start/end-windowed, 404 when
    * the trace has no spans in range.
    */
  private def tempoTraceByIdV2(ex: HttpExchange): String = {
    val path = ex.getRequestURI.getPath
    val hex = path.substring(path.lastIndexOf('/') + 1)
    val sp = windowed(spans, params(ex), "start_ns", 1L)
    ApiEncoders.tempoTraceV2(sp, java.lang.Long.parseUnsignedLong(hex, 16))
      .getOrElse(notFound("trace not found"))
  }

  /** The maintained attr-count cube, pre-filtered to the request
    * window when that window is expressible on it: with [start, end)
    * grain-aligned, bucket ∈ [s, e) ⟺ span start ∈ [s, e), so the
    * cube filter is exactly the span window filter. Unaligned or
    * `since`-relative windows (wall-clock-derived, never aligned)
    * return None and the engine takes the explode path over the
    * already-windowed spans — same results, slower plan.
    */
  private def cubeFor(p: Map[String, String])
      : Option[graft.traceql.TraceQL.AttrCube] =
    cube.flatMap { c =>
      val lo = p.get("start").filter(_.nonEmpty).map(toNs)
      val hi = p.get("end").filter(_.nonEmpty).map(toNs)
      val sinceSet = p.get("since").exists(_.nonEmpty)
      val aligned = !sinceSet &&
        lo.forall(_ % c.grainNs == 0) && hi.forall(_ % c.grainNs == 0)
      if (!aligned) None
      else {
        val f1 = lo.fold(c.df)(v => c.df.filter(col("bucket_ns") >= v))
        val f2 = hi.fold(f1)(v => f1.filter(col("bucket_ns") < v))
        Some(c.copy(df = f2))
      }
    }

  /** /api/metrics/query_range — TraceQL metrics over HTTP. The
    * reference parses the params then returns ErrNotImplemented
    * (tempohandler.go:101-120); we run the engine. start/end bound the
    * span scan BEFORE planning, like every other route.
    */
  private def tempoMetricsRange(ex: HttpExchange): String = {
    val p = params(ex)
    val stepNs = p.get("step").filter(_.nonEmpty)
      .map(s => (stepSec(s) * 1e9).toLong).getOrElse(60000000000L)
    val sp = windowed(spans, p, "start_ns", 1L)
    val (df, byKey) = graft.traceql.TraceQL.metricsRange(p("q"), sp, stepNs,
      cube = cubeFor(p))
    ApiEncoders.tempoRangeMetrics(df, byKey,
      maxRows = limits.maxSampleRows)
  }

  /** /api/metrics/query — the instant form: ONE step spanning
    * [start, end), anchored at the window start, so each series
    * reduces to a single value (reference tempohandler.go:82-100,
    * ErrNotImplemented there).
    */
  private def tempoMetricsInstant(ex: HttpExchange): String = {
    val p = params(ex)
    def bound(k: String): Option[Long] =
      p.get(k).filter(_.nonEmpty).map(toNs)
    // a static store has no "now": absent bounds fall back to the
    // table's extent (one bounded min/max aggregate, not a full pull)
    lazy val extent = spans.agg(min(col("start_ns")), max(col("start_ns"))).head()
    if ((bound("start").isEmpty || bound("end").isEmpty) && extent.isNullAt(0))
      return """{"series":[]}"""
    val startNs = bound("start").getOrElse(extent.getLong(0))
    val endNs = bound("end").getOrElse(extent.getLong(1) + 1)
    val sp = spans.filter(col("start_ns") >= startNs && col("start_ns") < endNs)
    // explicit grain-aligned bounds ride the cube like the range path;
    // extent-derived bounds are unaligned so cubeFor falls through and
    // planCompare's own origin/step alignment check rejects the rest
    val (df, byKey) = graft.traceql.TraceQL.metricsRange(
      p("q"), sp, endNs - startNs, originNs = startNs, cube = cubeFor(p))
    ApiEncoders.tempoInstantMetrics(df, byKey)
  }

  /** /api/v1/metadata (reference promhandler.go:460-496): metric name
    * → [{type, help, unit}] from the series-identity frame when wired,
    * else from distinct point names with empty unit/help.
    */
  private def promMetadataHandler(ex: HttpExchange): String = {
    val p = params(ex)
    val src = series.getOrElse(points.select(col("name")))
    ApiEncoders.promMetadata(src, p.get("metric"),
      p.get("limit").map(_.toInt))
  }

  /** Configured rule groups with live evaluation (the reference 501s
    * this endpoint): recording rules list their definition; alerting
    * rules evaluate via [[graft.promql.Rules.alertStates]] and report
    * the per-series state at the NEWEST grid evaluation, worst state
    * first, active series capped at 100 per rule for the envelope.
    */
  private def promRules(ex: HttpExchange): String = {
    val groups = rules.map { g =>
      val rec = g.recording.map(r =>
        s"""{"type":"recording","name":${jsonStr(r.record)},""" +
          s""""query":${jsonStr(r.expr)},"health":"ok","labels":{}}""")
      val al = g.alerting.map { a =>
        val states = graft.promql.Rules.alertStates(points, a, g.intervalUs)
        val newest = states.agg(max(col("bucket_us"))).head()
        val current =
          if (newest.isNullAt(0)) Array.empty[org.apache.spark.sql.Row]
          else states
            .filter(col("bucket_us") === newest.getLong(0) &&
              col("state") =!= "inactive")
            .limit(100).collect()
        val worst =
          if (current.exists(_.getString(2) == "firing")) "firing"
          else if (current.nonEmpty) "pending" else "inactive"
        val alerts = current.map { r =>
          val lbls = r.getMap[String, String](1).toSeq.sortBy(_._1)
            .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }
            .mkString("{", ",", "}")
          s"""{"labels":$lbls,"state":${jsonStr(r.getString(2))}}"""
        }
        s"""{"type":"alerting","name":${jsonStr(a.alert)},""" +
          s""""query":${jsonStr(a.expr)},""" +
          s""""duration":${a.forSteps * (g.intervalUs / 1000000)},""" +
          s""""state":${jsonStr(worst)},"health":"ok",""" +
          s""""alerts":[${alerts.mkString(",")}]}"""
      }
      s"""{"name":${jsonStr(g.name)},"interval":${g.intervalUs / 1000000},""" +
        s""""rules":[${(rec ++ al).mkString(",")}]}"""
    }
    s"""{"status":"success","data":{"groups":[${groups.mkString(",")}]}}"""
  }

  /** /api/v1/query_exemplars: series matching ANY selector of the
    * query, each with its ts-sorted exemplars in [start, end)
    * (reference promhandler.go:392-460).
    */
  private def promQueryExemplars(ex: HttpExchange): String = {
    val p = params(ex)
    val sels = graft.promql.PromQL.extractSelectors(
      graft.promql.PromQL.parse(p("query")))
    require(sels.nonEmpty, "query has no vector selector")
    val matched = sels.map(graft.promql.PromQL.selectorColumn).reduce(_ || _)
    ApiEncoders.promExemplars(
      windowed(exemplars.get, p, "ts_us", 1000L).filter(matched))
  }

  // ---------- Pyroscope ----------

  /** /pyroscope/render: ProfileQL selector → merged flamegraph →
    * flamebearer JSON (reference profilehandler.go:164-223). `from` /
    * `until` are unix seconds, `maxNodes` folds the tail.
    */
  private def pyroRender(ex: HttpExchange): String = {
    val p = params(ex)
    val query = p.getOrElse("query",
      throw new IllegalArgumentException("\"query\" is required"))
    def sec(k: String): Option[Long] =
      p.get(k).filter(_.nonEmpty).map(s => s.toLong * 1000000L)
    graft.profileql.Flame.flamebearer(profiles.get, query,
      fromUs = sec("from"), untilUs = sec("until"),
      maxNodes = p.get("maxNodes").map(_.toInt).getOrElse(0))
  }

  /** /pyroscope/render-diff: baseline vs comparison selection as a
    * "double"-format flamebearer (the reference declines diffs —
    * profilehandler/querier.go:33; parity-plus).
    */
  private def pyroRenderDiff(ex: HttpExchange): String = {
    val p = params(ex)
    def req(k: String): String = p.getOrElse(k,
      throw new IllegalArgumentException(s""""$k" is required"""))
    def sec(k: String): Option[Long] =
      p.get(k).filter(_.nonEmpty).map(s => s.toLong * 1000000L)
    graft.profileql.Flame.flamebearerDiff(profiles.get,
      req("leftQuery"), req("rightQuery"),
      leftFromUs = sec("leftFrom"), leftUntilUs = sec("leftUntil"),
      rightFromUs = sec("rightFrom"), rightUntilUs = sec("rightUntil"))
  }

  private def pyroLabels(ex: HttpExchange): String =
    graft.profileql.Flame.labelNames(profiles.get)
      .map(jsonStr).mkString("[", ",", "]")

  private def pyroLabelValues(ex: HttpExchange): String = {
    val label = params(ex).getOrElse("label",
      throw new IllegalArgumentException("\"label\" is required"))
    graft.profileql.Flame.labelValues(profiles.get, label)
      .map(jsonStr).mkString("[", ",", "]")
  }

  private def pyroApps(ex: HttpExchange): String =
    graft.profileql.Flame.apps(profiles.get)
      .map(n => s"""{"name":${jsonStr(n)}}""").mkString("[", ",", "]")

  // ---------- plumbing ----------

  /** `{base}{segment}{suffix}` path parameter (e.g. the label name in
    * `/loki/api/v1/label/app/values`).
    */
  private def pathSegment(ex: HttpExchange, base: String,
      suffix: String): String = {
    // RAW path: getPath is already percent-decoded — decoding it AGAIN
    // breaks names containing '%' (spurious 400 on the re-decode) and
    // rewrites literal '+' to a space
    val path = ex.getRequestURI.getRawPath
    val i = path.indexOf(base)
    require(i >= 0 && path.endsWith(suffix), s"bad path $path")
    urlDec(path.substring(i + base.length, path.length - suffix.length))
  }

  /** Query string plus, on POST with a form content type, the body
    * params — the Prom POST variants (promhandler.go:267-376,619-646
    * PostQuery/PostQueryRange/PostLabels/PostSeries…) accept the same
    * fields via application/x-www-form-urlencoded. The body is read
    * once per exchange and cached (streams are single-shot).
    */
  private def rawQuery(ex: HttpExchange): String = {
    val qs = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    if (ex.getRequestMethod != "POST" ||
        !ct.startsWith("application/x-www-form-urlencoded")) qs
    else {
      val body = ex.getAttribute("graft.form") match {
        case s: String => s
        case _ =>
          val b = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          ex.setAttribute("graft.form", b); b
      }
      if (qs.isEmpty) body else qs + "&" + body
    }
  }

  private def params(ex: HttpExchange): Map[String, String] =
    rawQuery(ex)
      .split("&").iterator.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) urlDec(kv) -> ""
        else urlDec(kv.take(i)) -> urlDec(kv.drop(i + 1))
      }.toMap

  /** All values of a repeatable param (match[]=a&match[]=b). */
  private def multiParams(ex: HttpExchange, key: String): List[String] =
    rawQuery(ex)
      .split("&").iterator.filter(_.nonEmpty).flatMap { kv =>
        val i = kv.indexOf('=')
        if (i < 0) None
        else if (urlDec(kv.take(i)) == key) Some(urlDec(kv.drop(i + 1)))
        else None
      }.filter(_.nonEmpty).toList

  private def urlDec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  // one escaper for the whole package (divergent copies would skew on
  // the next escaping fix)
  private def jsonStr(s: String): String = ApiEncoders.jsonString(s)

  private def errJson(e: Throwable): String =
    s"""{"status":"error","error":${jsonStr(
      Option(e.getMessage).getOrElse(e.getClass.getSimpleName))}}"""

  /** A read planned against a file listing that background compaction
    * superseded mid-flight fails with Spark's stale-file read error
    * (the merge deleted the listed input after the scan planned). The
    * layout generation has already moved by then, so ONE re-plan reads
    * the fresh listing — the parquet analogue of ClickHouse holding a
    * refcount on in-use parts across a merge, paid as a bounded retry
    * instead of reference counting.
    */
  private def staleListing(e: Throwable): Boolean = {
    var t = e
    var hops = 0
    // hop bound: a cause CYCLE of length ≥ 2 (possible via initCause
    // in wrapping frameworks) would otherwise spin this walk forever
    // on a handler thread
    while (t != null && hops < 16) {
      val m = Option(t.getMessage).getOrElse("")
      if (m.contains("FAILED_READ_FILE") ||
          t.isInstanceOf[java.io.FileNotFoundException]) return true
      t = if (t.getCause eq t) null else t.getCause
      hops += 1
    }
    false
  }

  /** SparkContext for the job-group cap, memoized on FIRST success:
    * the context is JVM-stable for the server's lifetime, but resolving
    * it through the logs view evaluates the Live supplier — per-request
    * resolution made every route (prom/tempo included) pay the logs
    * layout re-open (with its distributed mergeSchema footer job) after
    * each committed logs micro-batch, outside the job-group cap, and a
    * transient open failure silently ran that request uncapped. Failed
    * resolution retries on the next request (a not-yet-initialized
    * deployment runs uncapped — its queries would fail on the same
    * missing context anyway).
    */
  @volatile private var memoSc: org.apache.spark.SparkContext = _
  private def sparkCtx(): Option[org.apache.spark.SparkContext] = {
    val m = memoSc
    // revalidate the memo (ADVICE r16): a stopped-and-recreated session
    // in the same JVM (test harnesses, embedded restarts) would
    // otherwise bind setJobGroup/cancelJobGroup and the profiler to the
    // stale stopped context — requests silently run uncapped/unprofiled
    if (m != null && !m.isStopped) Some(m)
    else {
      val r =
        try Some(logs.sparkSession.sparkContext)
        catch { case scala.util.control.NonFatal(_) => None }
      r.foreach(memoSc = _)
      r
    }
  }

  /** Waits for an execution slot: immediate grant, bounded queue, or
    * shed. Returns false = shed (503). The queue is DEPTH-bounded and
    * WAIT-bounded — past saturation the server sheds instead of
    * queueing unboundedly (the r14 probe's pile-up shape).
    */
  private def tryAcquireSlot(): Boolean =
    queryGate.tryAcquire() || {
      if (queueWaiters.incrementAndGet() > limits.queueDepth) {
        queueWaiters.decrementAndGet(); false
      } else
        try queryGate.tryAcquire(math.max(0L, limits.queueWaitMs),
          java.util.concurrent.TimeUnit.MILLISECONDS)
        finally queueWaiters.decrementAndGet()
    }

  /** Constant/stub responses bypass the admission gate and the
    * job-group/cap machinery — they run NO Spark work, and a saturated
    * query pool must not 503 a health/version probe (Grafana marks the
    * datasource down on exactly the day operators need it up) or pay a
    * gate slot + timer for a static string.
    */
  private def lightHandler(f: HttpExchange => String): HttpHandler =
    rawHandler { ex =>
      try (200, "application/json", f(ex))
      catch {
        case e: HttpStatus => (e.code, "application/json", errJson(e))
        case e: Throwable  => (400, "application/json", errJson(e))
      }
    }

  private def handler(f: HttpExchange => String): HttpHandler =
    rawHandler { ex =>
      if (!tryAcquireSlot())
        (503, "application/json", errJson(new RuntimeException(
          s"server overloaded: ${limits.maxConcurrentQueries} queries " +
            s"executing and ${limits.queueDepth} queued; retry later")))
      else try {
        // per-query execution-time cap (reference MaxExecutionTime,
        // default 30 s — chstorage/querier.go:119-120): the request's
        // Spark jobs run under their own job group; a timer cancels
        // the group at the deadline and the request surfaces the typed
        // 503 instead of holding its slot forever. setJobGroup is
        // thread-local, so concurrent requests don't cross-cancel.
        // The context comes from the backing frame on FIRST use only
        // (handler pool threads don't reliably carry the session
        // thread-local) and is memoized — see sparkCtx().
        val scOpt = sparkCtx()
        val groupId = s"graft-http-${HttpApi.reqCounter.incrementAndGet()}"
        val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
        scOpt.foreach(_.setJobGroup(groupId, "graft http request",
          interruptOnCancel = true))
        // EXPLAIN ANALYZE on request (reference httpmiddleware.Explain,
        // explain.go:14-55): a truthy X-Graft-Profile header profiles
        // THIS request's job group and renders the job→stage tree to
        // the request log after the handler runs; zero overhead
        // without the header
        val profileT0 = System.nanoTime()
        val profiling = ExplainProfile.requested(
          ex.getRequestHeaders.getFirst(HttpApi.ProfileHeader)) &&
          scOpt.nonEmpty
        if (profiling) ExplainProfile.begin(scOpt.get, groupId)
        val capTask =
          for (sc <- scOpt if limits.maxExecutionMs > 0 && !capTimer.isShutdown)
            yield capTimer.schedule(new Runnable {
              def run(): Unit = {
                timedOut.set(true)
                // cancel is idempotent; failures (no active jobs yet)
                // are fine — the flag alone converts the next error
                try sc.cancelJobGroup(groupId)
                catch { case scala.util.control.NonFatal(_) => () }
              }
            }, limits.maxExecutionMs,
              java.util.concurrent.TimeUnit.MILLISECONDS)
        def attempt(retriesLeft: Int): (Int, String, String) =
          try (200, "application/json", f(ex))
          catch {
            case e: HttpStatus  => (e.code, "application/json", errJson(e))
            case e: Limits.LimitExceeded =>
              // the typed "limit exceeded" path (reference
              // ErrLogsTooManySamples / ErrLogsResultTooLarge)
              (422, "application/json", errJson(e))
            case _: Throwable if timedOut.get =>
              // the cancelled job group surfaces as a SparkException —
              // report the CAUSE (the cap), typed like the reference's
              // MaxExecutionTime overrun
              (503, "application/json", errJson(new RuntimeException(
                s"query execution time exceeded ${limits.maxExecutionMs}ms")))
            case e: Throwable if retriesLeft > 0 && staleListing(e) =>
              // mid-pass staleness: the maintenance pass may still be
              // running (its generation bump lands at pass end) — force
              // the live deployment to re-open before the re-plan
              refreshOnStale()
              attempt(retriesLeft - 1)
            case e: Throwable   => (400, "application/json", errJson(e))
          }
        try {
          val res = attempt(1)
          if (profiling)
            ExplainProfile.render(groupId, ex.getRequestMethod,
              ex.getRequestURI.getPath,
              (System.nanoTime() - profileT0) / 1e6, res._1)
              .foreach(line =>
                metrics.logSink.getOrElse((s: String) =>
                  System.err.println(s)).apply(line))
          res
        } finally {
          // releases the profile registrations even when attempt threw
          // (no-op after the success path's render)
          if (profiling) ExplainProfile.release(groupId)
          capTask.foreach(_.cancel(false))
          scOpt.foreach(_.clearJobGroup())
        }
      } finally queryGate.release()
    }

  /** Every route flows through here, so the auth middleware wraps the
    * WHOLE server like the reference's per-server `addOgen` wiring
    * (cmd/oteldb/app.go:215-236: the auth middleware sits in front of
    * every ogen route, health probes included) — and runs BEFORE any
    * body read or Spark work. The request-metrics middleware wraps
    * OUTSIDE auth (the reference's Instrument/LogRequests stack order),
    * so 401s and sheds are measured per route too.
    */
  private def rawHandler(
      f: HttpExchange => (Int, String, String)): HttpHandler =
    metrics.measure(Auth.guard(auth, (ex: HttpExchange) => {
      val (code, contentType, body) =
        try {
          // receive + close the request body FIRST: the JDK server
          // keeps a connection inside its read-timeout window until
          // the request stream is closed, so a slow query on an open
          // stream would be killed by maxReqTime (tuneServerDefaults)
          // even though the request arrived instantly. The body lands
          // where rawQuery's form parser looks for it. BOUNDED read:
          // query-API bodies are form params — a multi-GB POST must
          // 413, not buffer onto the driver heap.
          val bodyCap = 16 << 20
          val raw = ex.getRequestBody.readNBytes(bodyCap + 1)
          ex.getRequestBody.close()
          if (raw.length > bodyCap)
            (413, "application/json", errJson(new RuntimeException(
              s"request body exceeds $bodyCap bytes")))
          else {
            ex.setAttribute("graft.form", new String(raw, "UTF-8"))
            f(ex)
          }
        }
        catch { case e: Throwable => (400, "application/json", errJson(e)) }
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }))
}

object HttpApi {
  /** Job-group ids are JVM-global (one SparkContext serves every API
    * instance) — a per-instance counter would collide across servers.
    */
  private[graft] val reqCounter =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-request EXPLAIN ANALYZE trigger (the reference's
    * `X-Oteldb-Profile` convention, httpmiddleware/explain.go:18).
    */
  val ProfileHeader = "X-Graft-Profile"

  /** JDK built-in server hardening, the analogue of the reference's
    * `http.Server{ReadHeaderTimeout: 15s}` (cmd/oteldb/app.go:233-236):
    * `sun.net.httpserver.maxReqTime` bounds how long a connection may
    * sit receiving its request (seconds, enforced by the server's 1 s
    * timer). The JDK reads these properties ONCE (ServerConfig static
    * init), so this must run before the first HttpServer.create in the
    * JVM — every server this library starts calls it first. Handlers
    * close the request stream up-front (see rawHandler), which moves
    * the connection OUT of the request window, so the cap covers
    * request receipt only — slow QUERIES are governed by the job-group
    * execution cap, not this.
    */
  private[graft] def tuneServerDefaults(): Unit = {
    if (System.getProperty("sun.net.httpserver.maxReqTime") == null) {
      System.setProperty("sun.net.httpserver.maxReqTime", "15")
      ()
    }
    // TCP_NODELAY: the JDK server writes response headers and body as
    // separate small writes — with Nagle on, the body write waits for
    // the header segment's ACK, and the client's delayed ACK turns
    // EVERY small response (instant vectors, labels, health) into a
    // ~40 ms floor (the ServeProbe instant regime measured a uniform
    // 44 ms p50 that vanished with nodelay). Go's net/http sets
    // TCP_NODELAY by default, so this also matches the reference's
    // wire behavior.
    if (System.getProperty("sun.net.httpserver.nodelay") == null) {
      System.setProperty("sun.net.httpserver.nodelay", "true")
      ()
    }
  }
}
