package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{RequestMetrics, SelfTelemetry}
import graft.sources.OtlpProto

/** The self-telemetry payload builders, validated against the repo's
  * OWN OTLP decoder (the wire format the exporter must speak is the
  * one the ingest path reads — encode and decode are independent
  * implementations, so the round-trip is a real check, not an inverse).
  */
class SelfTelemetrySpec extends AnyFunSuite {

  private def emitter(regs: RequestMetrics*): SelfTelemetry =
    new SelfTelemetry(() => regs.toSeq, () => "http://127.0.0.1:1",
      Nil, 60000L)

  test("metrics payload round-trips: counters, le buckets, count/sum") {
    val reg = new RequestMetrics("query")
    reg.record("/api/v1/query", "GET", 200, 100L)   // bucket 0 (≤128µs)
    reg.record("/api/v1/query", "GET", 200, 300L)   // bucket 2 (≤512µs)
    reg.record("/api/v1/query", "GET", 400, 100L)
    reg.record("/loki/api/v1/query_range", "GET", 200, 1000L)
    val nowNs = 1755350000000000000L
    val ms = OtlpProto.decodeMetrics(emitter(reg).metricsPayload(nowNs))
    assert(ms.nonEmpty)
    // every datapoint stamped now and resourced; every REQUEST metric
    // a cumulative monotonic sum (runtime gauges are, well, gauges)
    ms.foreach { m =>
      assert(m.ts_ns == nowNs)
      assert(m.resource_attrs("service.name") == "graft")
      // service.instance.id distinguishes instances on a shared sink
      assert(m.resource_attrs("service.instance.id").nonEmpty)
      if (m.name.startsWith("graft_http_"))
        assert(m.temporality == 2 && m.is_monotonic, m.name)
    }
    def of(name: String) = ms.filter(_.name == name)
    val totals = of("graft_http_requests_total")
    def total(route: String, status: String): Double =
      totals.find(m => m.attrs("route") == route &&
        m.attrs("status") == status).get.gauge.get
    assert(total("/api/v1/query", "200") == 2.0)
    assert(total("/api/v1/query", "400") == 1.0)
    assert(total("/loki/api/v1/query_range", "200") == 1.0)
    assert(totals.forall(_.attrs("server") == "query"))

    // le buckets are CUMULATIVE and end at +Inf == _count
    val buckets = of("graft_http_request_duration_seconds_bucket")
      .filter(_.attrs("route") == "/api/v1/query")
    assert(buckets.size == 26)
    def le(l: String): Double =
      buckets.find(_.attrs("le") == l).get.gauge.get
    assert(le("0.000128") == 2.0) // the two 100µs requests
    assert(le("0.000256") == 2.0)
    assert(le("0.000512") == 3.0) // + the 300µs one
    assert(le("+Inf") == 3.0)
    val lev = buckets.map(m => SelfTelemetrySpec.leVal(m.attrs("le")))
    assert(lev.sorted == lev, "le series must render in ascending order")
    val count = of("graft_http_request_duration_seconds_count")
      .find(_.attrs("route") == "/api/v1/query").get
    assert(count.gauge.get == 3.0)
    val sum = of("graft_http_request_duration_seconds_sum")
      .find(_.attrs("route") == "/api/v1/query").get
    assert(math.abs(sum.gauge.get - 500e-6) < 1e-12) // 100+300+100 µs
  }

  test("process-runtime metrics ride the same payload") {
    val ms = OtlpProto.decodeMetrics(emitter().metricsPayload(9L))
    def one(n: String) = {
      val found = ms.filter(_.name == n)
      assert(found.size == 1, n)
      found.head
    }
    assert(one("graft_jvm_heap_used_bytes").gauge.exists(_ > 0))
    assert(one("graft_jvm_heap_max_bytes").gauge.exists(_ > 0))
    assert(one("graft_process_uptime_seconds").gauge.exists(_ > 0))
    val gc = one("graft_jvm_gc_count_total")
    assert(gc.temporality == 2 && gc.is_monotonic) // cumulative counter
    assert(one("graft_jvm_gc_time_ms_total").gauge.exists(_ >= 0))
  }

  test("undefined JVM heap max (-1) skips the series, not emits it") {
    val st = emitter()
    st.readHeapMax = _ => -1L // the containerized no--Xmx shape
    val ms = OtlpProto.decodeMetrics(st.metricsPayload(9L))
    // a -1-byte gauge would drive used/max dashboards negative — the
    // datapoint must be ABSENT, mirroring the getCollectionCount guard
    assert(!ms.exists(_.name == "graft_jvm_heap_max_bytes"))
    assert(ms.exists(_.name == "graft_jvm_heap_used_bytes"))
  }

  test("instance ids are distinct across emitters in one process") {
    assert(emitter().instanceId != emitter().instanceId)
  }

  test("multiple registries export under their server label") {
    val q = new RequestMetrics("query")
    val i = new RequestMetrics("ingest")
    q.record("/a", "GET", 200, 10L)
    i.record("/v1/metrics", "POST", 200, 10L)
    val ms = OtlpProto.decodeMetrics(
      emitter(q, i).metricsPayload(1L))
    val servers = ms.filter(_.name == "graft_http_requests_total")
      .map(_.attrs("server")).toSet
    assert(servers == Set("query", "ingest"))
  }

  test("logs payload round-trips as INFO records with the line as body") {
    val lines = Seq(
      """{"server":"query","route":"/a","status":200}""",
      """{"server":"ingest","route":"/v1/logs","status":200}""")
    val logs = OtlpProto.decodeLogs(emitter().logsPayload(lines, 7L))
    assert(logs.map(_.body) == lines)
    assert(logs.forall(l => l.severity_number == 9 &&
      l.severity_text == "INFO" && l.ts_ns == 7L &&
      l.resource_attrs("service.name") == "graft" &&
      l.resource_attrs("service.instance.id").nonEmpty))
  }

  test("log ring is bounded, drop-oldest, drops counted") {
    val st = emitter()
    (1 to 5000).foreach(i => st.offerLog(s"line-$i"))
    // 4096 capacity: the NEWEST 4096 survive, 904 oldest dropped
    assert(st.droppedLogs.sum() == 904L)
    // drain through a tick against a dead port must not throw (export
    // failure is counted + logged, never propagated)
    st.tick()
  }

  test("traces payload round-trips: one SERVER span per sampled request") {
    import graft.api.SelfTelemetry.SpanRec
    val st = emitter()
    val recs = Seq(
      SpanRec("query", "/api/v1/query", "GET", 200, 1000000000L, 2500L, 1L),
      SpanRec("ingest", "/v1/logs", "POST", 503, 2000000000L, 100L, 2L))
    val spans = OtlpProto.decodeSpans(st.tracesPayload(recs))
    assert(spans.size == 2)
    val q = spans.find(_.name == "/api/v1/query").get
    assert(q.kind == 2)
    assert(q.duration_ns == 2500000L)
    assert(q.attrs == Map("server" -> "query", "method" -> "GET",
      "status" -> "200"))
    assert(q.resource_attrs("service.name") == "graft")
    assert(q.resource_attrs("service.instance.id") == st.instanceId)
    assert(q.status_code == 0, "2xx is UNSET, not ERROR")
    val e = spans.find(_.name == "/v1/logs").get
    assert(e.status_code == 2, "5xx maps to STATUS_CODE_ERROR")
    // ids derive from (startNs, seq): distinct across records
    assert(spans.map(_.span_id).distinct.size == 2)
    assert(spans.map(_.trace_id_hex).distinct.size == 2)
  }

  test("span ring is bounded and drops are counted") {
    import graft.api.SelfTelemetry.SpanRec
    val st = emitter()
    (1 to 5000).foreach(i =>
      st.offerSpan("query", "/r", "GET", 200, i.toLong, 1L))
    assert(st.droppedSpans.sum() == 904L)
    st.tick() // dead port: must not throw; spans re-queue bounded
  }

  test("le labels render Prometheus-style") {
    assert(SelfTelemetry.leLabel(0.000128) == "0.000128")
    assert(SelfTelemetry.leLabel(0.016384) == "0.016384")
    assert(SelfTelemetry.leLabel(1.048576) == "1.048576")
    assert(SelfTelemetry.leLabel(Double.PositiveInfinity) == "+Inf")
  }
}

object SelfTelemetrySpec {
  def leVal(s: String): Double =
    if (s == "+Inf") Double.PositiveInfinity else s.toDouble
}
