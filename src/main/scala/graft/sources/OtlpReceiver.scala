package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.Streams

/** OTLP/HTTP ingest listener: accepts protobuf `Export*ServiceRequest`
  * POSTs on the standard collector paths and feeds them to the
  * per-signal streaming consumers (reference
  * internal/otelreceiver/receiver.go:45-93 — the receiver fans out to
  * the trace/log/metric consumers, which batch into the inserters):
  *
  *   POST /v1/traces   → spansFromOtlp  → date-partitioned span layout
  *   POST /v1/logs     → logsFromOtlp → enrichLogs → log layout
  *   POST /v1/metrics  → metricsFromOtlp → point layout
  *
  * Spark-first shape: the HTTP handler only ENQUEUES the raw payload
  * into a per-signal streaming source; decode (distributed
  * mapPartitions over [[OtlpProto]]) and the layout append run inside
  * Structured Streaming micro-batches with checkpointing — swap the
  * in-memory source for a durable bus (Kafka source, same payload
  * column) and the pipeline is the deployment topology. Payload decode
  * failures poison only their micro-batch, never the listener.
  */
final class OtlpReceiver(spark: SparkSession, dataDir: String) {

  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val traceIn = MemoryStream[Array[Byte]]
  private val logIn = MemoryStream[Array[Byte]]
  private val metricIn = MemoryStream[Array[Byte]]
  private val promIn = MemoryStream[Array[Byte]]
  private val lokiIn = MemoryStream[Array[Byte]]
  private val profileIn = MemoryStream[Array[Byte]]
  private val pyroIn = MemoryStream[(String, Long, Array[Byte])]

  private var queries: Seq[StreamingQuery] = Nil
  private var server: HttpServer = _
  private var grpc: GrpcIngest = _

  /** resource attrs merged under point attrs, point side winning on
    * duplicate keys (valid OTLP may repeat a key on both levels).
    */
  private def mergedLabels = map_concat(
    map_filter(col("resource_attrs"),
      (k, _) => !map_contains_key(col("attrs"), k)),
    col("attrs"))

  def start(port: Int = 0): Int = {
    val spans = Streams.spansFromOtlp(
      traceIn.toDF().withColumnRenamed("value", "payload"))
    // ONE SINK PER LAYOUT DIRECTORY: streams that share a stored layout
    // union BEFORE the sink. Two independent foreachBatch writers on one
    // parquet dir would share the FileOutputCommitter's _temporary
    // staging dir — one job's commit can delete the other's in-flight
    // task files — and the exactly-once batch markers
    // (Layout.commitBatch) assume one writer's batch-id sequence.
    val logs = Streams.enrichLogs(Streams.logsFromOtlp(
      logIn.toDF().withColumnRenamed("value", "payload")))
      // Loki push shares the log layout with OTLP logs (the reference
      // declines that endpoint — lokihandler.go:611-616)
      .unionByName(Streams.enrichLogs(Streams.logsFromLokiPush(
        lokiIn.toDF().withColumnRenamed("value", "payload"))))
    // raw decoded records (attrs still a map — metricsFromOtlp
    // canonicalizes them to the hash string the inserter keys on);
    // Prometheus remote-write shares the point layout (reference
    // /api/v1/write → inserter_metrics.go) — wire bodies are
    // snappy-block-compressed, undone at the HTTP edge
    val promFrames = promIn.toDF().withColumnRenamed("value", "payload")
    val points = metricIn.toDF().select(col("value").as[Array[Byte]])
      .mapPartitions(_.flatMap(OtlpProto.decodeMetrics))
      .toDF()
      .filter(col("gauge").isNotNull)
      .select(expr("ts_ns div 1000").as("ts_us"), col("name"),
        mergedLabels.as("labels"), col("gauge").as("value"))
      .unionByName(Streams.pointsFromPrompb(promFrames))
    val promExemplars = Streams.exemplarsFromPrompb(promFrames)
    // the fourth signal: stack samples for the flame-tree engine
    // (reference oteldbexporter.go:53-80); Pyroscope agent push
    // (collapsed format) shares the profile layout — the reference
    // declines that endpoint (profilehandler.go:78-82)
    val profiles = Streams.profilesFromOtlp(
        profileIn.toDF().withColumnRenamed("value", "payload"))
      .unionByName(Streams.profilesFromCollapsed(
        pyroIn.toDF().toDF("app", "ts_us", "payload")))
    queries = Seq(
      Streams.spansSink(spans, s"$dataDir/spans", s"$dataDir/ckpt/spans",
        Trigger.ProcessingTime(0)),
      Streams.logsSink(logs, s"$dataDir/logs", s"$dataDir/ckpt/logs",
        Trigger.ProcessingTime(0)),
      Streams.pointsSink(points, s"$dataDir/points", s"$dataDir/ckpt/points",
        Trigger.ProcessingTime(0)),
      Streams.exemplarsSink(promExemplars, s"$dataDir/exemplars",
        s"$dataDir/ckpt/promexemplars", Trigger.ProcessingTime(0)),
      // the aggregate sidecar the *_over_time rollup pushdown reads —
      // maintained at ingest (over BOTH metric ingest paths), emitted
      // once per finalized hour
      Streams.rollupSink(
        Streams.hourlyRollup(points.withColumn("timestamp",
          timestamp_micros(col("ts_us")))),
        s"$dataDir/rollup", s"$dataDir/ckpt/rollup",
        Trigger.ProcessingTime(0)),
      Streams.profilesSink(profiles,
        s"$dataDir/profiles", s"$dataDir/ckpt/profiles",
        Trigger.ProcessingTime(0)))
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/v1/traces", accept(traceIn))
    server.createContext("/v1/logs", accept(logIn))
    server.createContext("/v1/metrics", accept(metricIn))
    server.createContext("/api/v1/write", accept(promIn, snappyBody = true))
    server.createContext("/loki/api/v1/push", accept(lokiIn))
    // OTLP/HTTP profiles: the development-signal path (dictionary/
    // stack-table payloads per the v1development proto revision —
    // decode auto-detects and also accepts classic pprof-shaped
    // requests) plus the plain /v1/ alias local producers use
    server.createContext("/v1development/profiles", accept(profileIn))
    server.createContext("/v1/profiles", accept(profileIn))
    server.createContext("/pyroscope/ingest", acceptPyro())
    server.start()
    server.getAddress.getPort
  }

  /** OTLP/gRPC transport (the collector-default export) for all four
    * signals: the standard collector service methods route into the
    * SAME MemoryStream sources as the HTTP listener, so decode and the
    * layout appends are shared — only the framing differs
    * (reference internal/otelreceiver/receiver.go:45-93 embeds the
    * collector's gRPC receivers the same way). Call after [[start]];
    * returns the bound gRPC port.
    */
  def startGrpc(port: Int = 0): Int = {
    grpc = new GrpcIngest(Map(
      "/opentelemetry.proto.collector.trace.v1.TraceService/Export" ->
        (traceIn.addData(_)),
      "/opentelemetry.proto.collector.logs.v1.LogsService/Export" ->
        (logIn.addData(_)),
      "/opentelemetry.proto.collector.metrics.v1.MetricsService/Export" ->
        (metricIn.addData(_)),
      "/opentelemetry.proto.collector.profiles.v1development.ProfilesService/Export" ->
        (profileIn.addData(_))))
    grpc.start(port)
  }

  private def accept(sink: MemoryStream[Array[Byte]],
      snappyBody: Boolean = false)
      : com.sun.net.httpserver.HttpHandler = { (ex: HttpExchange) =>
    val (code, body): (Int, Array[Byte]) =
      try {
        if (ex.getRequestMethod != "POST")
          (405, errJson("POST only"))
        else {
          val raw = ex.getRequestBody.readAllBytes()
          // remote-write bodies are snappy-block-compressed (the spec
          // mandates it; `identity` is tolerated for local producers)
          val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
            .getOrElse(if (snappyBody) "snappy" else "identity")
          val payload = enc.toLowerCase match {
            case "snappy"       => Snappy.decode(raw)
            case "gzip"         => // OTLP/HTTP's standard compression
              new java.util.zip.GZIPInputStream(
                new java.io.ByteArrayInputStream(raw)).readAllBytes()
            case "identity" | "" => raw
            case other =>
              throw new IllegalArgumentException(
                s"unsupported Content-Encoding: $other")
          }
          sink.addData(payload)
          // success: an empty ExportXServiceResponse (zero-field
          // protobuf message = zero bytes)
          (200, Array.emptyByteArray)
        }
      } catch { case e: Throwable => (400, errJson(e.getMessage)) }
    ex.getResponseHeaders.set("Content-Type",
      if (code == 200) "application/x-protobuf" else "application/json")
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) {
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    } else ex.getResponseBody.close()
  }

  /** Pyroscope agent push: `?name=app{k=v}&from=<unix-sec>` with a
    * collapsed-format body. Enqueues (app, ts_us, body); decode and
    * the layout append run in the micro-batch like every other signal.
    */
  private def acceptPyro(): com.sun.net.httpserver.HttpHandler = {
    (ex: HttpExchange) =>
      val (code, body): (Int, Array[Byte]) =
        try {
          if (ex.getRequestMethod != "POST") (405, errJson("POST only"))
          else {
            val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
            val params = q.split("&").iterator.filter(_.contains("="))
              .map { kv =>
                val i = kv.indexOf('=')
                java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
                  java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
              }.toMap
            val name = params.getOrElse("name",
              throw new IllegalArgumentException("missing name"))
            val fromSec = params.get("from").flatMap(_.toLongOption)
              .getOrElse(throw new IllegalArgumentException(
                "missing or bad from"))
            pyroIn.addData((name, fromSec * 1000000L,
              ex.getRequestBody.readAllBytes()))
            (200, Array.emptyByteArray)
          }
        } catch { case e: Throwable => (400, errJson(e.getMessage)) }
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
      if (body.nonEmpty) {
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
      } else ex.getResponseBody.close()
  }

  private def errJson(msg: String): Array[Byte] =
    s"""{"error":${graft.api.ApiEncoders.jsonString(msg)}}""".getBytes("UTF-8")

  /** Block until every enqueued payload is decoded and stored. */
  def flush(): Unit = queries.foreach(_.processAllAvailable())

  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (grpc != null) grpc.stop()
    queries.foreach(_.stop())
  }
}
