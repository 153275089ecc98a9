package graft.api

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Query-routing proxy — the reference's `otelproxy` binary (a Grafana
  * datasource proxy: every PromQL/LogQL/Tempo/Pyroscope query endpoint
  * forwards verbatim to an upstream, cmd/otelproxy/main.go +
  * internal/{prom,loki,tempo,pyro}proxy pass-through handlers) with
  * its `httpmiddleware` route instrumentation: each request is matched
  * to a route TEMPLATE (path parameters normalized out) and counted —
  * requests, upstream/transport errors, total latency — plus an
  * optional request log line.
  *
  * Routing is by longest matching path prefix → upstream base URL, so
  * one proxy can front all four signal APIs of a single engine
  * instance or fan different prefixes out to different instances (the
  * reference runs one service per signal; prefixes subsume that).
  * Bodies stream through bounded by `maxBodyBytes` — the proxy never
  * interprets them.
  */
final class QueryProxy(
    upstreams: Map[String, String], // path prefix -> upstream base URL
    log: String => Unit = _ => (),
    maxBodyBytes: Int = 16 * 1024 * 1024) {

  private var server: HttpServer = _

  private final class BodyTooLarge(msg: String) extends RuntimeException(msg)

  final class RouteStats {
    val requests = new LongAdder
    val errors = new LongAdder
    val totalMs = new LongAdder
    val lastStatus = new AtomicLong
  }
  private val stats = new ConcurrentHashMap[String, RouteStats]()

  /** Per-route-template counters (the httpmiddleware metrics). */
  def routeStats: Map[String, (Long, Long, Long)] = {
    val out = Map.newBuilder[String, (Long, Long, Long)]
    stats.forEach { (k, v) =>
      out += k -> ((v.requests.sum(), v.errors.sum(), v.totalMs.sum()))
    }
    out.result()
  }

  /** Path-parameter normalization — the RouteFinder role: the metric
    * label is the route TEMPLATE, not the concrete path, so label
    * names / trace ids / profile types don't explode the cardinality
    * (reference httpmiddleware matches the ogen route for the same
    * reason).
    */
  private[api] def routeTemplate(path: String): String = {
    val segs = path.split("/").toSeq
    val out = segs.zipWithIndex.map { case (s, i) =>
      val prev = if (i > 0) segs(i - 1) else ""
      prev match {
        case "label" | "field" | "tag" if s.nonEmpty && s != "values" => "{name}"
        case "traces" | "trace" if s.nonEmpty => "{traceID}"
        case "detected_field" if s.nonEmpty => "{field}"
        case _ => s
      }
    }
    out.mkString("/")
  }

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
      r => { val t = new Thread(r, "graft-proxy"); t.setDaemon(true); t }))
    server.createContext("/proxy/metrics", (ex: HttpExchange) => {
      val body = routeStats.toSeq.sortBy(_._1).map { case (r, (n, e, ms)) =>
        s"""{"route":${ApiEncoders.jsonString(r)},"requests":$n,""" +
          s""""errors":$e,"total_ms":$ms}"""
      }.mkString("[", ",", "]")
      val b = body.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, b.length.toLong)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
    })
    server.createContext("/", forward)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def forward: com.sun.net.httpserver.HttpHandler = {
    (ex: HttpExchange) =>
      val path = ex.getRequestURI.getPath
      val route = routeTemplate(path)
      val st = stats.computeIfAbsent(route, _ => new RouteStats)
      st.requests.increment()
      val t0 = System.nanoTime()
      val (code, cType, body): (Int, String, Array[Byte]) =
        upstreams.toSeq.sortBy(-_._1.length)
          .find { case (prefix, _) => path.startsWith(prefix) } match {
          case None =>
            (404, "application/json",
              s"""{"error_message":${ApiEncoders.jsonString(
                s"no route for $route")}}""".getBytes("UTF-8"))
          case Some((_, base)) =>
            try {
              val q = Option(ex.getRequestURI.getRawQuery)
                .map("?" + _).getOrElse("")
              val conn = java.net.URI.create(base + path + q).toURL
                .openConnection().asInstanceOf[java.net.HttpURLConnection]
              conn.setRequestMethod(ex.getRequestMethod)
              // Authorization forwards too: an auth-enabled upstream
              // (HttpApi/AdminApi with a middleware) must see the
              // client's credentials or every proxied query 401s
              Seq("Content-Type", "Accept", "Content-Encoding",
                "Authorization").foreach { h =>
                Option(ex.getRequestHeaders.getFirst(h))
                  .foreach(conn.setRequestProperty(h, _))
              }
              if (ex.getRequestMethod == "POST" || ex.getRequestMethod == "PUT") {
                conn.setDoOutput(true)
                // never forward a silently-truncated body: over-cap
                // requests fail typed at the proxy edge
                val in = ex.getRequestBody.readNBytes(maxBodyBytes + 1)
                if (in.length > maxBodyBytes)
                  throw new BodyTooLarge(s"request body exceeds $maxBodyBytes bytes")
                val os = conn.getOutputStream
                try os.write(in) finally os.close()
              }
              val c = conn.getResponseCode
              val is = if (c >= 400) conn.getErrorStream else conn.getInputStream
              val b = Option(is).map(_.readNBytes(maxBodyBytes + 1))
                .getOrElse(Array.emptyByteArray)
              // a truncated upstream response with a 200 would hand the
              // client corrupt JSON: surface it as a gateway error
              if (b.length > maxBodyBytes)
                throw new java.io.IOException(
                  s"upstream response exceeds $maxBodyBytes bytes")
              (c, Option(conn.getContentType).getOrElse("application/json"), b)
            } catch {
              case e: BodyTooLarge =>
                (413, "application/json",
                  s"""{"error_message":${ApiEncoders.jsonString(e.getMessage)}}"""
                    .getBytes("UTF-8"))
              case e: Exception => // transport failure → 502, counted
                (502, "application/json",
                  s"""{"error_message":${ApiEncoders.jsonString(
                    Option(e.getMessage).getOrElse("upstream unreachable"))}}"""
                    .getBytes("UTF-8"))
            }
        }
      if (code >= 500) st.errors.increment()
      st.lastStatus.set(code.toLong)
      st.totalMs.add((System.nanoTime() - t0) / 1000000L)
      log(s"${ex.getRequestMethod} $route -> $code")
      ex.getResponseHeaders.set("Content-Type", cType)
      ex.sendResponseHeaders(code, if (body.isEmpty) -1L else body.length.toLong)
      if (body.nonEmpty) {
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
      } else ex.close()
  }
}
