package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** eBPF network-flow / process-event ingest — the reference's Hubble
  * and Tetragon collector receivers (otelcolmod/hubblereceiver/
  * translator.go:14-180, otelcolmod/tetragonreceiver/
  * translator.go:14-145): both subscribe to a gRPC event stream and
  * translate each event into ONE log record with typed attributes,
  * landing in the ordinary log storage.
  *
  * Here the wire format is the protojson rendering of the same
  * messages (`GetFlowsResponse` / `GetEventsResponse` — what `hubble
  * observe -o json` and Tetragon's JSON event export emit), and the
  * translation is a single `from_json` + column expressions — schema
  * declared once, decode fully codegen'd, no per-row callbacks. The
  * output matches [[OtlpProto.OtlpLog]]'s column set, so flow records
  * ride the existing enrich → sink → LogQL path unchanged.
  *
  * Divergences from the collector translators, both rendering-level:
  * list-valued attributes (labels, workloads, DNS answer IPs) are
  * stored as JSON strings in the string-map attrs column, and
  * timestamps keep µs precision (the layout's clock).
  */
object FlowIngest {

  // ---------- Hubble flows ----------

  private val workloadT = ArrayType(StructType(Seq(
    StructField("name", StringType), StructField("kind", StringType))))
  private val endpointT = StructType(Seq(
    StructField("namespace", StringType),
    StructField("podName", StringType),
    StructField("labels", ArrayType(StringType)),
    StructField("workloads", workloadT)))
  private def portsT = StructType(Seq(
    StructField("sourcePort", LongType),
    StructField("destinationPort", LongType)))
  private def icmpT = StructType(Seq(
    StructField("type", LongType), StructField("code", LongType)))

  /** `GetFlowsResponse` protojson schema, the fields translator.go
    * maps (unknown fields are ignored by from_json).
    */
  val hubbleSchema: StructType = StructType(Seq(
    StructField("flow", StructType(Seq(
      StructField("time", StringType),
      StructField("verdict", StringType),
      StructField("type", StringType),
      StructField("nodeName", StringType),
      StructField("trafficDirection", StringType),
      StructField("traceObservationPoint", StringType),
      StructField("dropReasonDesc", StringType),
      StructField("isReply", BooleanType),
      StructField("source", endpointT),
      StructField("destination", endpointT),
      StructField("IP", StructType(Seq(
        StructField("source", StringType),
        StructField("destination", StringType),
        StructField("ipVersion", StringType)))),
      StructField("l4", StructType(Seq(
        StructField("TCP", portsT), StructField("UDP", portsT),
        StructField("SCTP", portsT),
        StructField("ICMPv4", icmpT), StructField("ICMPv6", icmpT)))),
      StructField("l7", StructType(Seq(
        // protojson renders 64-bit ints as JSON strings; StringType
        // also accepts plain numbers (Jackson coercion)
        StructField("latencyNs", StringType),
        StructField("http", StructType(Seq(
          StructField("method", StringType), StructField("url", StringType),
          StructField("code", LongType), StructField("protocol", StringType)))),
        StructField("dns", StructType(Seq(
          StructField("query", StringType), StructField("rcode", LongType),
          StructField("ips", ArrayType(StringType))))),
        StructField("kafka", StructType(Seq(
          StructField("apiKey", StringType), StructField("topic", StringType),
          StructField("errorCode", LongType))))))),
      StructField("traceContext", StructType(Seq(
        StructField("parent", StructType(Seq(
          StructField("traceId", StringType))))))),
      StructField("interface", StructType(Seq(
        StructField("name", StringType), StructField("index", LongType)))))))))

  /** Attr-map builder: entries with null values are dropped, matching
    * the collector translators' conditional Put calls.
    */
  private def attrMap(entries: (String, Column)*): Column =
    map_filter(
      map(entries.flatMap { case (k, v) => Seq(lit(k), v.cast("string")) }: _*),
      (_, v) => v.isNotNull)

  /** Hubble flow records (wrapped `{"flow": {...}}` responses) → log
    * rows. Severity from the verdict (translator.go:167-180), body
    * from the flow description (translator.go:163-165), attribute
    * names exactly the receiver's.
    */
  def hubbleLogs(frames: DataFrame, payloadCol: String = "payload",
      clusterName: String = "", clusterId: Long = 0L): DataFrame = {
    val f = from_json(col(payloadCol).cast("string"), hubbleSchema)
      .getField("flow")
    def g(path: String): Column =
      path.split('.').foldLeft(f)((c, p) => c.getField(p))
    val verdict = g("verdict")
    val sevNum = when(verdict === "DROPPED", 13)
      .when(verdict === "ERROR", 17)
      .when(verdict === "AUDIT", 9)
      .when(verdict.isin("REDIRECTED", "TRACED", "TRANSLATED"), 5)
      .otherwise(9)
    val sevText = when(verdict === "DROPPED", "WARN")
      .when(verdict === "ERROR", "ERROR")
      .when(verdict.isin("REDIRECTED", "TRACED", "TRANSLATED"), "DEBUG")
      .otherwise("INFO")
    val l4 = g("l4")
    val tcp = l4.getField("TCP"); val udp = l4.getField("UDP")
    val sctp = l4.getField("SCTP")
    val ic4 = l4.getField("ICMPv4"); val ic6 = l4.getField("ICMPv6")
    val transport = when(tcp.isNotNull, "tcp").when(udp.isNotNull, "udp")
      .when(sctp.isNotNull, "sctp").when(ic4.isNotNull, "icmp")
      .when(ic6.isNotNull, "icmpv6")
    def port(field: String): Column = coalesce(
      tcp.getField(field), udp.getField(field), sctp.getField(field))
    val icmp = coalesce(ic4, ic6)
    val l7 = g("l7")
    val http = l7.getField("http"); val dns = l7.getField("dns")
    val kafka = l7.getField("kafka")
    def jsonOrNull(c: Column): Column = when(c.isNotNull, to_json(c))
    val attrs = attrMap(
      "event.name" -> when(f.isNotNull, lit("hubble.flow")),
      "hubble.flow.type" -> g("type"),
      "hubble.verdict" -> verdict,
      "hubble.node_name" -> g("nodeName"),
      "hubble.traffic_direction" -> g("trafficDirection"),
      "hubble.trace_observation_point" -> g("traceObservationPoint"),
      "hubble.drop_reason" -> g("dropReasonDesc"),
      "hubble.is_reply" -> g("isReply"),
      // NB: source LABELS are deliberately not mapped — the reference
      // receiver maps only destination labels (translator.go:57-83
      // puts src workloads but no src labels); the schema still parses
      // them for forward-compat
      "hubble.src.workload.names" ->
        jsonOrNull(g("source.workloads").getField("name")),
      "hubble.src.workload.kinds" ->
        jsonOrNull(g("source.workloads").getField("kind")),
      "hubble.dst.namespace" -> g("destination.namespace"),
      "hubble.dst.pod" -> g("destination.podName"),
      "hubble.dst.labels" -> jsonOrNull(g("destination.labels")),
      "hubble.dst.workload.names" ->
        jsonOrNull(g("destination.workloads").getField("name")),
      "hubble.dst.workload.kinds" ->
        jsonOrNull(g("destination.workloads").getField("kind")),
      "network.source.address" -> g("IP.source"),
      "network.destination.address" -> g("IP.destination"),
      "network.type" -> when(g("IP.ipVersion") === "IPv4", "ipv4")
        .when(g("IP.ipVersion") === "IPv6", "ipv6"),
      "network.transport" -> transport,
      "network.source.port" -> port("sourcePort"),
      "network.destination.port" -> port("destinationPort"),
      "hubble.icmp.type" -> icmp.getField("type"),
      "hubble.icmp.code" -> icmp.getField("code"),
      "hubble.l7.latency_ns" -> l7.getField("latencyNs"),
      "http.request.method" -> http.getField("method"),
      "url.full" -> http.getField("url"),
      "http.response.status_code" -> http.getField("code"),
      "network.protocol.name" -> when(http.isNotNull, lit("http")),
      "network.protocol.version" -> http.getField("protocol"),
      "dns.question.name" -> dns.getField("query"),
      "hubble.dns.response_code" -> dns.getField("rcode"),
      "hubble.dns.response_ips" -> jsonOrNull(dns.getField("ips")),
      "hubble.kafka.api_key" -> kafka.getField("apiKey"),
      "hubble.kafka.topic" -> kafka.getField("topic"),
      "hubble.kafka.error_code" -> kafka.getField("errorCode"),
      "hubble.interface.name" -> g("interface.name"),
      "hubble.interface.index" -> g("interface.index"))
    val resourceAttrs = attrMap(
      "k8s.namespace.name" -> g("source.namespace"),
      "k8s.pod.name" -> g("source.podName"),
      "k8s.cluster.name" ->
        (if (clusterName.nonEmpty) lit(clusterName) else lit(null)),
      "hubble.cluster.id" ->
        (if (clusterId != 0) lit(clusterId.toString) else lit(null)))
    frames
      .filter(f.isNotNull)
      .select(
        (unix_micros(to_timestamp(g("time"))) * 1000L).as("ts_ns"),
        sevNum.as("severity_number"),
        sevText.as("severity_text"),
        concat(lit("Hubble "), coalesce(g("type"), lit("UNKNOWN")),
          lit(" flow "), coalesce(verdict, lit("VERDICT_UNKNOWN"))).as("body"),
        coalesce(g("traceContext.parent.traceId"), lit("")).as("trace_id_hex"),
        lit(null).cast("long").as("trace_id"),
        lit(null).cast("long").as("span_id"),
        lit(0).as("flags"),
        attrs.as("attrs"),
        resourceAttrs.as("resource_attrs"),
        lit("hubblereceiver").as("scope_name"),
        lit("").as("scope_version"))
  }

  // ---------- Tetragon process events ----------

  private val processT = StructType(Seq(
    StructField("pid", LongType),
    StructField("binary", StringType),
    StructField("arguments", StringType),
    StructField("uid", LongType),
    StructField("execId", StringType),
    StructField("cwd", StringType),
    StructField("flags", StringType),
    StructField("docker", StringType),
    StructField("startTime", StringType),
    StructField("pod", StructType(Seq(
      StructField("namespace", StringType),
      StructField("name", StringType),
      StructField("container", StructType(Seq(
        StructField("name", StringType),
        StructField("image", StructType(Seq(
          StructField("id", StringType))))))))))))

  private def eventT(extra: StructField*) = StructType(Seq(
    StructField("process", processT),
    StructField("parent", processT)) ++ extra)

  /** `GetEventsResponse` protojson schema — the five process-event
    * variants the reference translates (translator.go:22-59).
    */
  val tetragonSchema: StructType = StructType(Seq(
    StructField("processExec", eventT(
      StructField("ancestors", ArrayType(processT)))),
    StructField("processExit", eventT()),
    StructField("processKprobe", eventT(
      StructField("functionName", StringType))),
    StructField("processTracepoint", eventT()),
    StructField("processLoader", StructType(Seq(
      StructField("process", processT)))),
    StructField("nodeName", StringType),
    StructField("time", StringType),
    StructField("clusterName", StringType)))

  /** Tetragon process events → log rows; event name by the populated
    * variant, process/parent attribute sets exactly the receiver's
    * appendProcess (translator.go:121-136).
    */
  def tetragonLogs(frames: DataFrame, payloadCol: String = "payload",
      clusterId: Long = 0L): DataFrame = {
    val p = from_json(col(payloadCol).cast("string"), tetragonSchema)
    def v(name: String) = p.getField(name)
    val eventName = when(v("processExec").isNotNull, "process_exec")
      .when(v("processExit").isNotNull, "process_exit")
      .when(v("processKprobe").isNotNull, "process_kprobe")
      .when(v("processTracepoint").isNotNull, "process_tracepoint")
      .when(v("processLoader").isNotNull, "process_loader")
    // the variants differ in extra fields, so coalesce runs on their
    // SHARED process/parent members (identical struct types)
    val proc = coalesce(
      v("processExec").getField("process"),
      v("processExit").getField("process"),
      v("processKprobe").getField("process"),
      v("processTracepoint").getField("process"),
      v("processLoader").getField("process"))
    // loader events carry no parent (translator.go:53-56)
    val parent = coalesce(
      v("processExec").getField("parent"),
      v("processExit").getField("parent"),
      v("processKprobe").getField("parent"),
      v("processTracepoint").getField("parent"))
    def procAttrs(prefix: String, pr: Column): Seq[(String, Column)] = Seq(
      s"${prefix}process.pid" -> pr.getField("pid"),
      s"${prefix}process.executable.path" -> pr.getField("binary"),
      s"${prefix}process.command_args" -> pr.getField("arguments"),
      s"${prefix}process.owner.id" -> pr.getField("uid"),
      s"${prefix}tetragon.process.exec_id" -> pr.getField("execId"),
      s"${prefix}tetragon.process.cwd" -> pr.getField("cwd"),
      s"${prefix}tetragon.process.flags" -> pr.getField("flags"),
      s"${prefix}tetragon.process.docker" -> pr.getField("docker"),
      s"${prefix}tetragon.process.start_time" -> pr.getField("startTime"))
    val pod = proc.getField("pod")
    val attrs = attrMap(Seq(
      "event.name" -> eventName,
      "tetragon.node_name" -> v("nodeName"),
      "tetragon.kprobe.function_name" ->
        v("processKprobe").getField("functionName"),
      "tetragon.ancestors_json" ->
        when(v("processExec").getField("ancestors").isNotNull,
          to_json(v("processExec").getField("ancestors"))),
      "k8s.container.name" -> pod.getField("container").getField("name"),
      "container.image.id" ->
        pod.getField("container").getField("image").getField("id")) ++
      procAttrs("", proc) ++ procAttrs("tetragon.parent.", parent): _*)
    val resourceAttrs = attrMap(
      "k8s.namespace.name" -> pod.getField("namespace"),
      "k8s.pod.name" -> pod.getField("name"),
      "k8s.cluster.name" -> v("clusterName"),
      "tetragon.cluster.id" ->
        (if (clusterId != 0) lit(clusterId.toString) else lit(null)))
    val sev = when(eventName.isin("process_kprobe", "process_tracepoint"), 5)
      .otherwise(9)
    val sevText = when(sev === 5, "DEBUG").otherwise("INFO")
    frames
      .filter(eventName.isNotNull)
      .select(
        (unix_micros(to_timestamp(v("time"))) * 1000L).as("ts_ns"),
        sev.as("severity_number"),
        sevText.as("severity_text"),
        concat(lit("Tetragon "),
          regexp_replace(eventName, "_", " "), lit(" event")).as("body"),
        lit("").as("trace_id_hex"),
        lit(null).cast("long").as("trace_id"),
        lit(null).cast("long").as("span_id"),
        lit(0).as("flags"),
        attrs.as("attrs"),
        resourceAttrs.as("resource_attrs"),
        lit("tetragonreceiver").as("scope_name"),
        lit("").as("scope_version"))
  }
}
