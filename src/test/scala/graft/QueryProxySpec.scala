package graft

import org.apache.spark.sql.functions._

import graft.api.{HttpApi, QueryProxy}

/** The query-routing proxy (reference otelproxy + httpmiddleware) in
  * front of a REAL HttpApi instance: pass-through responses,
  * route-template metrics, 404/502 handling.
  */
class QueryProxySpec extends SparkTestBase {
  import spark.implicits._

  private def get(url: String): (Int, String) = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    (code, Option(is).map(i => new String(i.readAllBytes(), "UTF-8")).getOrElse(""))
  }

  test("proxy forwards LogQL/PromQL queries to the engine and counts routes") {
    val logs = Seq(
      (1704103200000000000L, "proxy line one", Map("app" -> "px")),
      (1704103201000000000L, "proxy line two", Map("app" -> "px")))
      .toDF("ts_ns", "body", "labels")
    val points = Seq((1704103200000000L, "px_cpu", Map("h" -> "a"), 4.0))
      .toDF("ts_us", "name", "labels", "value")
    val api = new HttpApi(logs, points,
      spark.emptyDataFrame.select(lit(0L).as("trace_id"), lit(0L).as("span_id"),
        lit(null).cast("long").as("parent_span_id"), lit("x").as("name"),
        lit(0).as("kind"), lit(0).as("status_code"), lit(0L).as("duration_ns"),
        lit(0L).as("start_ns"),
        map().cast("map<string,string>").as("attrs")).limit(0))
    val apiPort = api.start()
    val proxy = new QueryProxy(Map(
      "/loki/" -> s"http://127.0.0.1:$apiPort",
      "/api/" -> s"http://127.0.0.1:$apiPort"))
    val port = proxy.start()
    try {
      // LogQL through the proxy = the engine's own answer
      val q = java.net.URLEncoder.encode("""{app="px"} |= "two"""", "UTF-8")
      val (c1, viaProxy) =
        get(s"http://127.0.0.1:$port/loki/api/v1/query_range?query=$q")
      val (_, direct) =
        get(s"http://127.0.0.1:$apiPort/loki/api/v1/query_range?query=$q")
      assert(c1 == 200 && viaProxy == direct && viaProxy.contains("proxy line two"))
      // PromQL label values: path parameter normalizes into the route
      val (c2, vals) =
        get(s"http://127.0.0.1:$port/api/v1/label/h/values")
      assert(c2 == 200 && vals.contains("\"a\""), vals)
      // unknown route → 404 at the proxy, still counted; a path with
      // quotes must come back as VALID JSON (escaped, not injected)
      val (c3, nf) = get(s"http://127.0.0.1:$port/nothing/here")
      assert(c3 == 404)
      val (c3b, inj) = get(s"http://127.0.0.1:$port/no%22,%22x%22:%22y")
      assert(c3b == 404 && inj.contains("\\\"") && !inj.contains("\"x\":\"y\""),
        s"quotes must be escaped: $inj")
      val st = proxy.routeStats
      assert(st("/loki/api/v1/query_range")._1 == 1L)
      assert(st("/api/v1/label/{name}/values")._1 == 1L,
        s"route template should absorb the label name: ${st.keySet}")
      assert(st("/nothing/here")._1 == 1L)
      // metrics endpoint reports the same counters
      val (c4, metrics) = get(s"http://127.0.0.1:$port/proxy/metrics")
      assert(c4 == 200 && metrics.contains("/api/v1/label/{name}/values"))
    } finally { proxy.stop(); api.stop() }
  }

  test("dead upstream surfaces as 502 and counts as an error") {
    val proxy = new QueryProxy(Map("/api/" -> "http://127.0.0.1:1"))
    val port = proxy.start()
    try {
      val (c, body) = get(s"http://127.0.0.1:$port/api/v1/query?query=up")
      assert(c == 502 && body.contains("error_message"))
      val (n, errs, _) = proxy.routeStats("/api/v1/query")
      assert(n == 1L && errs == 1L)
    } finally proxy.stop()
  }
}
