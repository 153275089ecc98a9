package graft

import java.net.{HttpURLConnection, URI}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.AdminApi
import graft.sources.{Admission, Layout}

/** Admin/health API (reference adminhandler.go:84-255): instance info,
  * component health with degraded reporting, JVM runtime stats,
  * layout-metadata storage stats, efficiency, and actions.
  */
class AdminApiSpec extends SparkTestBase {
  import spark.implicits._

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), "UTF-8")
    is.close()
    (code, body)
  }

  private def post(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), "UTF-8")
    is.close()
    (code, body)
  }

  test("info and runtime report instance identity and JVM stats") {
    val api = new AdminApi(spark,
      signals = Seq(
        AdminApi.SignalInfo("metrics", "parquet-layout", queryable = true,
          bind = Some("127.0.0.1:9090")),
        AdminApi.SignalInfo("logs", "parquet-layout")))
    val port = api.start()
    try {
      val (c1, info) = get(s"http://127.0.0.1:$port/api/v1/info")
      assert(c1 == 200)
      assert(info.contains(s""""version":"${AdminApi.Version}""""))
      assert(info.contains(""""signal":"metrics""""))
      assert(info.contains(""""bind":"127.0.0.1:9090""""))
      assert(info.contains(""""storage_enabled":false"""))
      assert(info.contains(""""uptime_seconds""""))
      assert(info.contains(s""""spark_version":"${spark.version}""""))
      val (c2, rt) = get(s"http://127.0.0.1:$port/api/v1/runtime")
      assert(c2 == 200)
      for (f <- Seq("threads", "num_cpu", "parallelism", "heap_used_bytes",
        "heap_max_bytes", "gc_count"))
        assert(rt.contains(s""""$f":"""), s"missing $f in $rt")
    } finally api.stop()
  }

  test("health: all checks pass = healthy; a failing check degrades with its error") {
    val api = new AdminApi(spark, components = Seq(
      AdminApi.Component("loki", Some("127.0.0.1:3100")),
      AdminApi.Component("otelcol", check = Some(() => ())),
      AdminApi.Component("flaky",
        check = Some(() => throw new RuntimeException("conn refused")))))
    val port = api.start()
    try {
      val (code, body) = get(s"http://127.0.0.1:$port/api/v1/health")
      assert(code == 200, "a degraded instance still reports, never 500s")
      assert(body.contains(""""status":"degraded""""))
      assert(body.contains(
        """{"name":"loki","addr":"127.0.0.1:3100","status":"healthy"}"""))
      assert(body.contains("""{"name":"otelcol","status":"healthy"}"""))
      assert(body.contains(
        """{"name":"flaky","status":"unhealthy","error":"conn refused"}"""))
    } finally api.stop()

    val healthy = new AdminApi(spark,
      components = Seq(AdminApi.Component("otelcol")))
    val p2 = healthy.start()
    try {
      val (_, body) = get(s"http://127.0.0.1:$p2/api/v1/health")
      assert(body.contains(""""status":"healthy""""))
    } finally healthy.stop()
  }

  test("receiver-wired admin: live sinks report healthy, stopped sink degrades") {
    import graft.sources.OtlpReceiver
    val dir = Files.createTempDirectory("graftadminrecv").toString
    val recv = new OtlpReceiver(spark, dir)
    recv.start()
    val aport = recv.startAdmin()
    try {
      // gRPC transport NOT started: its liveness check fails, the
      // instance reports degraded, and every live component (HTTP
      // listener, all streaming sinks) still shows healthy
      val (c1, h1) = get(s"http://127.0.0.1:$aport/api/v1/health")
      assert(c1 == 200)
      assert(h1.contains(""""status":"degraded""""), h1)
      assert(h1.contains(""""name":"otlp-grpc","status":"unhealthy""""), h1)
      assert(h1.contains(""""name":"otlp-http","addr":"""), h1)
      assert(h1.contains("sink-"), h1)
      assert(!h1.contains(""""name":"sink-"""") ||
        !h1.matches(""".*"name":"sink-[^"]*","status":"unhealthy".*"""),
        s"live sinks must be healthy: $h1")
      recv.startGrpc(): Unit
      val (_, h2) = get(s"http://127.0.0.1:$aport/api/v1/health")
      assert(h2.contains(""""status":"healthy""""), h2)
      val (_, info) = get(s"http://127.0.0.1:$aport/api/v1/info")
      assert(info.contains(""""storage_enabled":true"""))
      assert(info.contains(""""signal":"profiles""""))
    } finally recv.stop()
  }

  test("storage and efficiency walk layout metadata; actions run") {
    val root = Files.createTempDirectory("graftadmin").toString
    val pts = Seq(
      (1704067200000000L, "cpu", Map("h" -> "a"), 1.0),
      (1704067260000000L, "cpu", Map("h" -> "a"), 2.0),
      (1704153600000000L, "cpu", Map("h" -> "b"), 3.0)
    ).toDF("ts_us", "name", "labels", "value")
    Layout.writePoints(pts, s"$root/points")
    val adm = new Admission.Stats
    adm.shedRequests.set(2); adm.activeSeries.set(5)
    var maintained = 0
    val safety = new graft.streaming.LogSafety.Metrics(spark.sparkContext)
    safety.droppedRateLimit.add(7); safety.collapsed.add(3)
    val api = new AdminApi(spark,
      layouts = Map("metrics" -> s"$root/points"),
      admission = Some(adm),
      safety = Some(safety),
      maintain = Some(() => { maintained += 1; "compacted 2 partitions" }))
    val port = api.start()
    try {
      val (c1, st) = get(s"http://127.0.0.1:$port/api/v1/storage")
      assert(c1 == 200)
      assert(st.contains(""""storage_enabled":true"""))
      assert(st.contains(""""signal":"metrics""""))
      assert(st.contains(""""partitions":2"""))
      assert(st.contains(""""min_date":"20240101""""))
      assert(st.contains(""""max_date":"20240102""""))
      assert(st.contains(""""rejected_rate":2"""))
      assert(st.contains(""""active_series":5"""))
      assert(st.contains(""""log_safety":{"""), st)
      assert(st.contains(""""dropped_rate_limit":7"""))
      assert(st.contains(""""collapsed":3"""))
      val (c2, eff) = get(s"http://127.0.0.1:$port/api/v1/storage/efficiency")
      assert(c2 == 200)
      assert(eff.contains(""""points":3""") && eff.contains(""""bytes_per_point""""))
      val (c3, gc) = post(s"http://127.0.0.1:$port/api/v1/actions/gc")
      assert(c3 == 200 && gc.contains(""""ok":true""") && gc.contains("freed_bytes"))
      val (c4, mt) = post(s"http://127.0.0.1:$port/api/v1/actions/storage_maintain")
      assert(c4 == 200 && mt.contains("compacted 2 partitions") && maintained == 1)
      // client errors are client codes (reference router semantics):
      // unknown action → 400, wrong method → 405, never 500
      val (c5, bad) = post(s"http://127.0.0.1:$port/api/v1/actions/explode")
      assert(c5 == 400 && bad.contains("unknown action"))
      val (c6, meth) = get(s"http://127.0.0.1:$port/api/v1/actions/gc")
      assert(c6 == 405 && meth.contains("not allowed"))
      // debug pages (the reference's autozpages surface)
      val (c7, tz) = get(s"http://127.0.0.1:$port/debug/threadz")
      assert(c7 == 200 && tz.contains(""""thread_count":""") &&
        tz.contains("graft-admin"), tz.take(200))
      val (c8, qz) = get(s"http://127.0.0.1:$port/debug/queryz")
      assert(c8 == 200 && qz.contains(""""active_jobs":""") &&
        qz.contains(""""default_parallelism":"""), qz)
    } finally api.stop()
  }

  test("status page at /, 404 fallback, repair action wiring") {
    var repaired = 0
    val api = new AdminApi(spark,
      repair = Some(() => { repaired += 1; "rollup/date=20240101 repaired -> 1 file(s)" }))
    val port = api.start()
    try {
      // the static status page renders over the admin JSON endpoints
      val (c1, page) = get(s"http://127.0.0.1:$port/")
      assert(c1 == 200)
      for (marker <- Seq("<!doctype html>", "/api/v1/routes",
        "/api/v1/storage", "id=\"health\""))
        assert(page.contains(marker), s"missing $marker")
      // "/" is the JDK fallback context: unknown paths 404, not page
      val (c2, nf) = get(s"http://127.0.0.1:$port/no/such/route")
      assert(c2 == 404 && nf.contains("no route"), s"$c2 $nf")
      // opt-in NaN-partials repair action round-trips its summary
      val (c3, rep) = post(s"http://127.0.0.1:$port/api/v1/actions/repair_nan_partials")
      assert(c3 == 200 && rep.contains("repaired") && repaired == 1, rep)
    } finally api.stop()

    // unwired repair is a client error, not a 500
    val bare = new AdminApi(spark)
    val port2 = bare.start()
    try {
      val (c, b) = post(s"http://127.0.0.1:$port2/api/v1/actions/repair_nan_partials")
      assert(c == 400 && b.contains("not wired"), s"$c $b")
    } finally bare.stop()
  }

  test("routes endpoint round-trips per-route metrics of every wired server") {
    // a "query" server's registry with known traffic, wired in the way
    // the composition root wires it (routeMetrics), plus the admin
    // server's own middleware measuring its own routes
    val queryMetrics = new graft.api.RequestMetrics("query")
    queryMetrics.record("/api/v1/query_range", "GET", 200, 2500L)
    queryMetrics.record("/api/v1/query_range", "GET", 200, 3500L)
    queryMetrics.record("/api/v1/query_range", "GET", 503, 100L)
    queryMetrics.record("/loki/api/v1/labels", "GET", 401, 50L)
    val api = new AdminApi(spark, routeMetrics = Seq(queryMetrics))
    val port = api.start()
    try {
      val (c1, _) = get(s"http://127.0.0.1:$port/api/v1/info")
      assert(c1 == 200)
      val (c2, routes) = get(s"http://127.0.0.1:$port/api/v1/routes")
      assert(c2 == 200)
      // the query server's counters round-trip exactly
      assert(routes.contains(""""server":"query""""), routes)
      assert(routes.contains(
        """"route":"/api/v1/query_range","count":3"""), routes)
      assert(routes.contains(""""200":2""") &&
        routes.contains(""""503":1"""), routes)
      assert(routes.contains(
        """"route":"/loki/api/v1/labels","count":1"""), routes)
      // the admin server measures ITSELF: the /api/v1/info hit above
      // is already visible in its own section
      assert(routes.contains(""""server":"admin""""), routes)
      assert(routes.contains(""""route":"/api/v1/info","count":1"""),
        routes)
      // a second read sees the FIRST /api/v1/routes request measured
      val (_, routes2) = get(s"http://127.0.0.1:$port/api/v1/routes")
      assert(routes2.contains(""""route":"/api/v1/routes","count":1"""),
        routes2)
      // latency summary fields present and sane (2.5ms and 3.5ms land
      // in the (2048us, 4096us] bucket; the 503 in the first)
      assert(routes.contains(""""p95_ms":"""), routes)
      assert(routes.contains(""""mean_ms":"""), routes)
    } finally api.stop()
  }
}
