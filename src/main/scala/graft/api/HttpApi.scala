package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal in-process HTTP facade over the four query front-ends —
  * the reference's entire user surface is HTTP
  * (internal/lokihandler/lokihandler.go:67-645, promhandler.go:72-646,
  * tempohandler.go:66-697); this closes the same loop
  * parser → plan → encode → serve on the JDK's built-in server, no
  * extra dependencies.
  *
  * Endpoints (GET, query-string params):
  *   - /loki/api/v1/query_range?query=&step=   (LogQL; streams or matrix)
  *   - /api/v1/query_range?query=&step=        (PromQL; matrix)
  *   - /api/search?q=&limit=                   (TraceQL spanset search)
  *   - /api/traces/{hexTraceId}                (trace by id)
  *
  * Spark is the execution engine behind every handler; the HTTP layer
  * only parses params and serializes the already-distributed result
  * (ApiEncoders collects bounded envelopes: per-series rows, capped
  * trace lists).
  */
final class HttpApi(logs: DataFrame, points: DataFrame, spans: DataFrame) {

  private var server: HttpServer = _

  /** Starts on `port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/loki/api/v1/query_range", handler(lokiQueryRange))
    server.createContext("/api/v1/query_range", handler(promQueryRange))
    server.createContext("/api/search", handler(tempoSearchHandler))
    server.createContext("/api/traces/", handler(tempoTraceById))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ---------- handlers ----------

  private def lokiQueryRange(ex: HttpExchange): String = {
    val p = params(ex)
    val stepNs = p.get("step").map(s => (s.toDouble * 1e9).toLong)
    val df = graft.logql.Planner.query(p("query"), logs, stepNs = stepNs)
    if (df.columns.contains("value")) ApiEncoders.lokiMatrix(df)
    else ApiEncoders.lokiStreams(df)
  }

  private def promQueryRange(ex: HttpExchange): String = {
    val p = params(ex)
    val stepUs = p.get("step").map(s => (s.toDouble * 1e6).toLong)
    ApiEncoders.promMatrix(
      graft.promql.PromQL.range(p("query"), points, stepUs))
  }

  /** Tempo search: per-trace rollups of the traces with ≥1 span
    * matching the TraceQL selector, newest first, default limit 20
    * (reference traceqlengine/engine.go:220-222).
    */
  private def tempoSearchHandler(ex: HttpExchange): String = {
    val p = params(ex)
    val limit = p.get("limit").map(_.toInt).getOrElse(20)
    val matched = p.get("q").filter(_.nonEmpty) match {
      case Some(q) =>
        graft.traceql.TraceQL.matchSpans(q, spans).select(col("trace_id"))
      case None => spans.select(col("trace_id"))
    }
    val hasAttrs = spans.columns.contains("attrs")
    val rootService =
      if (hasAttrs) element_at(col("attrs"), "service.name") else lit(null)
    val rollup = spans
      .join(matched.distinct(), Seq("trace_id"), "left_semi")
      .groupBy(col("trace_id"))
      .agg(
        min(col("start_ns")).as("start_ns"),
        (max(col("start_ns") + col("duration_ns")) - min(col("start_ns")))
          .as("duration_ns"),
        min(when(col("parent_span_id").isNull, col("name"))).as("root_name"),
        min(when(col("parent_span_id").isNull, rootService)).as("root_service"))
    ApiEncoders.tempoSearch(rollup, limit)
  }

  private def tempoTraceById(ex: HttpExchange): String = {
    val path = ex.getRequestURI.getPath
    val hex = path.substring(path.lastIndexOf('/') + 1)
    ApiEncoders.tempoTrace(spans, java.lang.Long.parseUnsignedLong(hex, 16))
  }

  // ---------- plumbing ----------

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split("&").iterator.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) urlDec(kv) -> ""
        else urlDec(kv.take(i)) -> urlDec(kv.drop(i + 1))
      }.toMap

  private def urlDec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def handler(f: HttpExchange => String): HttpHandler =
    (ex: HttpExchange) => {
      val (code, body) =
        try (200, f(ex))
        catch {
          case e: Throwable =>
            (400, s"""{"status":"error","error":${jsonStr(
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName))}}""")
        }
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
}
