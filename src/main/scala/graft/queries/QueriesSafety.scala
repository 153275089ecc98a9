package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata
import graft.streaming.LogSafety

/** Excess-log safety handling (reference internal/odbsafety/ +
  * otelcolmod/odbsafetyprocessor/) over the events stream, oracle-
  * replayed in DuckDB: the deterministic event-time decision rules are
  * plain window functions, so the oracle runs the SAME rules.
  *
  * The events table is sparse in real time (~1 event / few minutes),
  * so the log view compresses time to 10 ms spacing via event_id —
  * ~100 records/s, enough to trip per-key per-second limits.
  */
object QueriesSafety extends QueryPack {

  private def logsView(td: Testdata): DataFrame =
    td.events.select(
      (col("event_id") * 10000000L).as("ts_ns"),
      col("props").as("body"),
      map(
        lit("et"), col("event_type"),
        lit("uid"), col("user_id").cast("string")).as("attrs"))

  private val oracleBase =
    """SELECT event_id * 10000000 AS ts_ns, props AS body,
      |    event_type AS et
      |  FROM events""".stripMargin

  /** soft=5/sample(first 3, then 1-in-4), hard=15/drop, keyed by
    * event_type: the Metrics-interface decision counts
    * (odbsafety/handler.go:10-15, sampler.go:13-22).
    */
  val safetySample: Q = Q(
    "src_safety_sample",
    (s: SparkSession, dir: String) =>
      LogSafety.decisions(logsView(Testdata(s, dir)),
          LogSafety.Config(
            softMaxRatePerSecond = 5, hardMaxRatePerSecond = 15,
            onExcess = "sample", hardOnExcess = "drop",
            sampleFirst = 3, sampleThereafter = 4,
            keyFields = Seq("et")))
        .orderBy("decision"),
    Some(
      s"""WITH base AS ($oracleBase),
         |pos AS (
         |  SELECT *, row_number() OVER (
         |      PARTITION BY et, ts_ns // 1000000000
         |      ORDER BY ts_ns, body) AS pos
         |  FROM base),
         |dec AS (
         |  SELECT CASE
         |    WHEN pos > 15 THEN 'dropped_rate_limit'
         |    WHEN pos > 5 THEN CASE
         |      WHEN (pos - 5) <= 3 OR (pos - 5) % 4 = 0
         |      THEN 'sampled' ELSE 'dropped_sample' END
         |    ELSE 'kept' END AS decision
         |  FROM pos)
         |SELECT decision, CAST(COUNT(*) AS BIGINT) AS n FROM dec
         |WHERE decision <> 'kept'
         |GROUP BY decision ORDER BY decision""".stripMargin))

  /** soft=10/compact(threshold 3) keyed by event_type over 1-minute
    * windows: the synthetic "N collapsed" records, each cloning its
    * bucket's first record (odbsafety/handler.go:157-224,
    * odbsafetyprocessor/excess.go:64-68).
    */
  val safetyCompact: Q = Q(
    "src_safety_compact",
    (s: SparkSession, dir: String) =>
      LogSafety(logsView(Testdata(s, dir)),
          LogSafety.Config(
            softMaxRatePerSecond = 10, onExcess = "compact",
            compactWindowNs = 60000000000L, compactThreshold = 3,
            keyFields = Seq("et")))
        .filter(map_contains_key(col("attrs"), LogSafety.CollapsedAttr))
        .select(col("ts_ns"),
          element_at(col("attrs"), "et").as("et"),
          element_at(col("attrs"), LogSafety.CollapsedAttr)
            .cast("long").as("collapsed"))
        .orderBy("ts_ns", "et"),
    Some(
      s"""WITH base AS ($oracleBase),
         |pos AS (
         |  SELECT *, row_number() OVER (
         |      PARTITION BY et, ts_ns // 1000000000
         |      ORDER BY ts_ns, body) AS pos
         |  FROM base),
         |cmp AS (
         |  SELECT *, ts_ns - ts_ns % 60000000000 AS slot
         |  FROM pos WHERE pos > 10),
         |co AS (
         |  SELECT *, row_number() OVER (
         |      PARTITION BY et, slot ORDER BY ts_ns, body) AS co
         |  FROM cmp),
         |drops AS (
         |  SELECT et, slot, CAST(COUNT(*) AS BIGINT) AS collapsed
         |  FROM co WHERE co >= 3 GROUP BY et, slot)
         |SELECT f.ts_ns, f.et, d.collapsed
         |FROM (SELECT et, slot, ts_ns FROM co WHERE co = 1) f
         |JOIN drops d ON f.et = d.et AND f.slot = d.slot
         |ORDER BY f.ts_ns, f.et""".stripMargin))

  /** Docker json-file envelope unwrap — the fifth ingest auto-format
    * (reference internal/dockerlog/daemonlog.go:112-129: stream label
    * + RFC3339Nano timestamp + raw line per entry; the json-file log
    * driver stores the same triple as {"log","stream","time"}). The
    * fixture wraps each event in the envelope exactly as the driver
    * would write it; [[graft.streaming.Streams.unwrapDockerLogs]]
    * recovers line / stream / epoch-ns time, and DuckDB replays the
    * recovery from the raw columns — byte-equal lines, µs-exact
    * timestamps. Scale: one scan-fused projection per record, no
    * shuffle at all.
    */
  val dockerUnwrap: Q = Q(
    "src_docker_log_unwrap",
    (s: SparkSession, dir: String) => {
      val td = Testdata(s, dir)
      val wrapped = td.events.select(
        col("event_id"),
        lit(0L).as("ts_ns"),
        concat(
          lit("{\"log\":\"evt "), col("event_type"),
          lit(" user "), col("user_id").cast("string"),
          lit("\\n\",\"stream\":\""),
          when(col("event_id") % 2 === 0, lit("stdout")).otherwise(lit("stderr")),
          lit("\",\"time\":\""),
          date_format(timestamp_micros(expr("ts div 1000")),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
          lit("\"}")).as("body"))
      graft.streaming.Streams.unwrapDockerLogs(wrapped)
        .select(col("event_id"), col("ts_ns"),
          col("docker_stream").as("stream"), col("body").as("line"))
        .orderBy("event_id")
    },
    Some(
      """SELECT event_id, epoch_ns(ts)//1000*1000 AS ts_ns,
        |  CASE WHEN event_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS stream,
        |  'evt ' || event_type || ' user ' || user_id AS line
        |FROM events ORDER BY event_id""".stripMargin))

  /** ClickHouse span-log consumer (reference chreceiver +
    * internal/chotel): include/exclude glob filter then per-trace
    * same-name collapse over a span-log-shaped view of events —
    * min-start/max-finish extents and per-key LAST-wins attribute
    * merge (filter.go:89-116), replayed in DuckDB with arg-max
    * structs. Det: integral µs math throughout; (finish, span_id)
    * ties broken by the unique span_id on both sides.
    */
  val chSpanLogCollapse: Q = {
    import graft.sources.ChSpanLog
    Q(
      "src_chspanlog_collapse",
      (s: SparkSession, dir: String) => {
        val sl = Testdata(s, dir).events.select(
          col("user_id").as("trace_id"),
          col("event_id").as("span_id"),
          lit(0L).as("parent_span_id"),
          col("event_type").as("operation_name"),
          lit(1).as("kind"),
          expr("ts div 1000").as("start_time_us"),
          (expr("ts div 1000") +
            round(col("value") * 1000, 0).cast("long")).as("finish_time_us"),
          map(
            lit("read_rows"), (col("user_id") % 100).cast("string"),
            lit("host"), concat(lit("ch-"), (col("event_id") % 3).cast("string")))
            .as("attribute"))
        val filtered = ChSpanLog.filterSpans(sl,
          ChSpanLog.FilterConfig(include = Seq("*e*"), exclude = Seq("v*"),
            collapse = true))
        ChSpanLog.collapseSpans(filtered)
          .select(col("trace_id"), col("operation_name").as("name"),
            col("start_time_us"), col("finish_time_us"),
            element_at(col("attribute"), "read_rows").as("read_rows"),
            element_at(col("attribute"), "host").as("host"))
          .orderBy("trace_id", "name")
      },
      Some(
        """WITH sl AS (
          |  SELECT user_id AS trace_id, event_id AS span_id,
          |    event_type AS name,
          |    epoch_ns(ts)//1000 AS start_us,
          |    epoch_ns(ts)//1000 + CAST(round(value*1000,0) AS BIGINT) AS finish_us,
          |    CAST(user_id % 100 AS VARCHAR) AS read_rows,
          |    'ch-' || CAST(event_id % 3 AS VARCHAR) AS host
          |  FROM events),
          |f AS (SELECT * FROM sl WHERE name LIKE '%e%' AND name NOT LIKE 'v%')
          |SELECT trace_id, name, MIN(start_us) AS start_time_us,
          |  MAX(finish_us) AS finish_time_us,
          |  (max({'f': finish_us, 's': span_id, 'r': read_rows})).r AS read_rows,
          |  (max({'f': finish_us, 's': span_id, 'h': host})).h AS host
          |FROM f GROUP BY trace_id, name ORDER BY trace_id, name""".stripMargin))
  }

  /** Hubble flow-receiver translation (reference otelcolmod/
    * hubblereceiver/translator.go:14-180), DuckDB-replayed: the fixture
    * renders each event as the protojson `GetFlowsResponse` the wire
    * carries (to_json of the exact message shape — verdict, L3
    * addresses, L4 TCP ports, a conditional L7 HTTP block), then
    * [[graft.sources.FlowIngest.hubbleLogs]] decodes it; the oracle
    * recomputes every typed attribute and the verdict→severity mapping
    * straight from the raw columns. Scale: one scan-fused
    * from_json + projection per record, no shuffle.
    */
  val flowTranslate: Q = Q(
    "src_flow_translate",
    (s: SparkSession, dir: String) => {
      val td = Testdata(s, dir)
      val verdict = when(col("event_id") % 4 === 0, "FORWARDED")
        .when(col("event_id") % 4 === 1, "DROPPED")
        .when(col("event_id") % 4 === 2, "ERROR")
        .otherwise("AUDIT")
      val http = when(col("event_id") % 3 === 0, struct(
        struct(lit("GET").as("method"),
          lit("/api").as("url"),
          (lit(200L) + col("user_id") % 3).as("code"),
          lit("HTTP/1.1").as("protocol")).as("http")))
      val payload = to_json(struct(struct(
        date_format(timestamp_micros(expr("ts div 1000")),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("time"),
        verdict.as("verdict"),
        lit("L3_L4").as("type"),
        concat(lit("node-"), (col("user_id") % 5).cast("string")).as("nodeName"),
        struct(
          concat(lit("10.0."), (col("user_id") % 256).cast("string"),
            lit(".1")).as("source"),
          lit("10.1.0.2").as("destination"),
          lit("IPv4").as("ipVersion")).as("IP"),
        struct(struct(
          (lit(30000L) + col("event_id") % 1000).as("sourcePort"),
          (lit(1000L) + col("user_id") % 100).as("destinationPort"))
          .as("TCP")).as("l4"),
        http.as("l7"),
        struct(
          lit("ns-a").as("namespace"),
          concat(lit("pod-"), (col("user_id") % 7).cast("string"))
            .as("podName")).as("source")).as("flow")))
      graft.sources.FlowIngest.hubbleLogs(
          td.events.select(col("event_id"), payload.as("payload")))
        .select(
          expr("ts_ns div 1000").as("ts_us"),
          col("severity_number").as("sev"),
          col("severity_text").as("sev_text"),
          element_at(col("attrs"), "hubble.verdict").as("verdict"),
          element_at(col("attrs"), "network.source.address").as("src_ip"),
          element_at(col("attrs"), "network.transport").as("transport"),
          element_at(col("attrs"), "network.destination.port").as("dport"),
          element_at(col("attrs"), "http.response.status_code").as("http_code"),
          element_at(col("resource_attrs"), "k8s.pod.name").as("pod"),
          col("body"))
        .orderBy("ts_us", "src_ip", "dport")
    },
    Some(
      """WITH f AS (
        |  SELECT epoch_ns(ts)//1000 AS ts_us,
        |    CASE event_id % 4 WHEN 0 THEN 'FORWARDED' WHEN 1 THEN 'DROPPED'
        |      WHEN 2 THEN 'ERROR' ELSE 'AUDIT' END AS verdict,
        |    '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.1' AS src_ip,
        |    CAST(1000 + user_id % 100 AS VARCHAR) AS dport,
        |    CASE WHEN event_id % 3 = 0
        |      THEN CAST(200 + user_id % 3 AS VARCHAR) END AS http_code,
        |    'pod-' || CAST(user_id % 7 AS VARCHAR) AS pod
        |  FROM events)
        |SELECT ts_us,
        |  CASE verdict WHEN 'DROPPED' THEN 13 WHEN 'ERROR' THEN 17
        |    ELSE 9 END AS sev,
        |  CASE verdict WHEN 'DROPPED' THEN 'WARN' WHEN 'ERROR' THEN 'ERROR'
        |    ELSE 'INFO' END AS sev_text,
        |  verdict, src_ip, 'tcp' AS transport, dport, http_code, pod,
        |  'Hubble L3_L4 flow ' || verdict AS body
        |FROM f ORDER BY ts_us, src_ip, dport""".stripMargin))

  /** Tetragon process-event translation (reference otelcolmod/
    * tetragonreceiver/translator.go:14-145): protojson `GetEventsResponse`
    * fixtures alternate exec/exit variants; the decode must pick the
    * populated variant, build the parent-prefixed process attribute
    * tree, and map kprobe/tracepoint events to DEBUG — all replayed by
    * DuckDB from the raw columns.
    */
  val processTranslate: Q = Q(
    "src_flow_process",
    (s: SparkSession, dir: String) => {
      val td = Testdata(s, dir)
      def proc(pid: Column, binary: Column) = struct(
        pid.as("pid"), binary.as("binary"),
        lit("-v").as("arguments"), (col("user_id") % 1000).as("uid"),
        struct(
          lit("ns-b").as("namespace"),
          concat(lit("pod-"), (col("user_id") % 7).cast("string")).as("name"))
          .as("pod"))
      val p = proc(col("user_id"), concat(lit("/bin/"), col("event_type")))
      val parent = proc(expr("user_id div 2"), lit("/sbin/init"))
      val timeStr = date_format(timestamp_micros(expr("ts div 1000")),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      val payload = to_json(struct(
        when(col("event_id") % 3 === 0,
          struct(p.as("process"), parent.as("parent"))).as("processExec"),
        when(col("event_id") % 3 === 1,
          struct(p.as("process"), parent.as("parent"))).as("processExit"),
        when(col("event_id") % 3 === 2,
          struct(p.as("process"), parent.as("parent"),
            lit("tcp_connect").as("functionName"))).as("processKprobe"),
        concat(lit("node-"), (col("user_id") % 5).cast("string"))
          .as("nodeName"),
        timeStr.as("time"),
        lit("c1").as("clusterName")))
      graft.sources.FlowIngest.tetragonLogs(
          td.events.select(col("event_id"), col("user_id"),
            payload.as("payload")))
        .select(
          expr("ts_ns div 1000").as("ts_us"),
          col("severity_number").as("sev"),
          element_at(col("attrs"), "event.name").as("event_name"),
          element_at(col("attrs"), "process.pid").as("pid"),
          element_at(col("attrs"), "process.executable.path").as("bin"),
          element_at(col("attrs"), "tetragon.parent.process.pid")
            .as("parent_pid"),
          element_at(col("attrs"), "tetragon.kprobe.function_name")
            .as("kprobe_fn"),
          element_at(col("resource_attrs"), "k8s.namespace.name").as("ns"),
          col("body"))
        .orderBy("ts_us", "pid", "event_name")
    },
    Some(
      """WITH e AS (
        |  SELECT epoch_ns(ts)//1000 AS ts_us,
        |    CASE event_id % 3 WHEN 0 THEN 'process_exec'
        |      WHEN 1 THEN 'process_exit' ELSE 'process_kprobe' END AS event_name,
        |    CAST(user_id AS VARCHAR) AS pid,
        |    '/bin/' || event_type AS bin,
        |    CAST(user_id // 2 AS VARCHAR) AS parent_pid,
        |    CASE WHEN event_id % 3 = 2 THEN 'tcp_connect' END AS kprobe_fn
        |  FROM events)
        |SELECT ts_us,
        |  CASE WHEN event_name = 'process_kprobe' THEN 5 ELSE 9 END AS sev,
        |  event_name, pid, bin, parent_pid, kprobe_fn, 'ns-b' AS ns,
        |  'Tetragon ' || replace(event_name, '_', ' ') || ' event' AS body
        |FROM e ORDER BY ts_us, pid, event_name""".stripMargin))

  def queries: Seq[Q] =
    Seq(safetySample, safetyCompact, dockerUnwrap, chSpanLogCollapse,
      flowTranslate, processTranslate)
}
