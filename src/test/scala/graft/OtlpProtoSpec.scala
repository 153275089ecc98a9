package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.sources.OtlpProto
import graft.streaming.Streams

/** OTLP wire-format decode: the payload is built BY HAND with a tiny
  * protobuf writer (varints, tags, length-delimited submessages), so
  * the test validates the decoder against the wire format itself, not
  * against its own inverse.
  */
class OtlpProtoSpec extends SparkTestBase {

  // ---- minimal protobuf writer ----
  private class W {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): W = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt); this
    }
    def tag(field: Int, wire: Int): W = varint((field.toLong << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): W = { tag(field, 2); varint(b.length); out.write(b); this }
    def str(field: Int, s: String): W = bytes(field, s.getBytes(UTF_8))
    def msg(field: Int, m: W): W = bytes(field, m.out.toByteArray)
    def vint(field: Int, v: Long): W = { tag(field, 0); varint(v) }
    def fix64(field: Int, v: Long): W = {
      tag(field, 1)
      var i = 0; while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
  }

  private def kv(k: String, v: W): W = new W().str(1, k).msg(2, v)
  private def strVal(s: String): W = new W().str(1, s)
  private def intVal(v: Long): W = new W().vint(3, v)

  private def tid16(low: Long): Array[Byte] = {
    val b = new Array[Byte](16)
    var i = 0; while (i < 8) { b(15 - i) = ((low >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }
  private def sid8(v: Long): Array[Byte] = tid16(v).drop(8)

  private def samplePayload: Array[Byte] = {
    val span1 = new W()
      .bytes(1, tid16(0x1234L)).bytes(2, sid8(1L))
      .str(5, "root-op").vint(6, 2)
      .fix64(7, 1704103200000000000L).fix64(8, 1704103200000500000L)
      .msg(9, kv("http.method", strVal("GET")))
      .msg(9, kv("http.status_code", intVal(200)))
      .msg(11, new W().fix64(1, 1704103200000000100L).str(2, "ev-a"))
      .msg(15, new W().str(2, "boom").vint(3, 2))
    val span2 = new W()
      .bytes(1, tid16(0x1234L)).bytes(2, sid8(2L)).bytes(4, sid8(1L))
      .str(5, "child-op").vint(6, 3)
      .fix64(7, 1704103200000000200L).fix64(8, 1704103200000000300L)
      .msg(13, new W().bytes(1, tid16(0x9999L)).bytes(2, sid8(7L)))
    val scope = new W().str(1, "my-lib").str(2, "1.2.3")
    val scopeSpans = new W().msg(1, scope).msg(2, span1).msg(2, span2)
    val resource = new W().msg(1, kv("service.name", strVal("api")))
    val resourceSpans = new W().msg(1, resource).msg(2, scopeSpans)
    new W().msg(1, resourceSpans).out.toByteArray
  }

  test("decodeSpans reads ids, times, attrs, events, links, status") {
    val spans = OtlpProto.decodeSpans(samplePayload)
    assert(spans.size == 2)
    val root = spans.find(_.name == "root-op").get
    assert(root.trace_id == 0x1234L)
    assert(root.trace_id_hex == "0000000000000000" + "0000000000001234")
    assert(root.span_id == 1L && root.parent_span_id.isEmpty)
    assert(root.kind == 2 && root.status_code == 2 && root.status_message == "boom")
    assert(root.duration_ns == 500000L)
    assert(root.attrs == Map("http.method" -> "GET", "http.status_code" -> "200"))
    assert(root.resource_attrs == Map("service.name" -> "api"))
    assert(root.scope_name == "my-lib" && root.scope_version == "1.2.3")
    assert(root.events == Seq(OtlpProto.SpanEvent("ev-a", 1704103200000000100L)))

    val child = spans.find(_.name == "child-op").get
    assert(child.parent_span_id.contains(1L))
    assert(child.links == Seq(OtlpProto.SpanLink(0x9999L, 7L)))
    assert(child.duration_ns == 100L)
  }

  test("spansFromOtlp decodes distributed and feeds the span schema") {
    import spark.implicits._
    val df = Seq(samplePayload).toDF("payload")
    val spans = Streams.spansFromOtlp(df)
    assert(spans.count() == 2)
    assert(spans.columns.toSet.contains("resource_attrs"))
    // TraceQL runs directly on the decoded frame, resource scope intact
    val matched = graft.traceql.TraceQL.matchSpans(
      """{ resource.service.name = "api" && span:parentID = 1 }""", spans)
    assert(matched.select("name").as[String].collect().toSeq == Seq("child-op"))
  }

  // ---- logs ----

  private def fix32(w: W, field: Int, v: Int): W = {
    w.tag(field, 5)
    var i = 0; while (i < 4) { w.out.write((v >>> (8 * i)) & 0xff); i += 1 }
    w
  }

  private def logsPayload: Array[Byte] = {
    val rec1 = new W()
      .fix64(1, 1704103200000000000L) // time
      .vint(2, 17).str(3, "ERROR")    // severity
      .msg(5, strVal("boom happened"))
      .msg(6, kv("code", intVal(500)))
    fix32(rec1, 8, 1)
    rec1.bytes(9, tid16(0xabcL)).bytes(10, sid8(3L))
    val rec2 = new W()
      .vint(2, 9).str(3, "INFO")
      .msg(5, strVal("all good"))
      .fix64(11, 1704103201000000000L) // observed only → ts fallback
    val scope = new W().str(1, "applog").str(2, "0.1")
    val scopeLogs = new W().msg(1, scope).msg(2, rec1).msg(2, rec2)
    val resource = new W().msg(1, kv("service.name", strVal("api")))
    val resourceLogs = new W().msg(1, resource).msg(2, scopeLogs)
    new W().msg(1, resourceLogs).out.toByteArray
  }

  test("decodeLogs reads body, severity, ids, flags, attrs, ts fallback") {
    val logs = OtlpProto.decodeLogs(logsPayload)
    assert(logs.size == 2)
    val err = logs.find(_.severity_text == "ERROR").get
    assert(err.ts_ns == 1704103200000000000L)
    assert(err.severity_number == 17 && err.body == "boom happened")
    assert(err.attrs == Map("code" -> "500"))
    assert(err.resource_attrs == Map("service.name" -> "api"))
    assert(err.trace_id.contains(0xabcL) && err.span_id.contains(3L))
    assert(err.flags == 1)
    assert(err.scope_name == "applog" && err.scope_version == "0.1")
    val info = logs.find(_.severity_text == "INFO").get
    assert(info.ts_ns == 1704103201000000000L) // observed_time fallback
    assert(info.trace_id.isEmpty && info.span_id.isEmpty)
  }

  test("logsFromOtlp bridges into enrichLogs") {
    import spark.implicits._
    val frames = Seq(logsPayload).toDF("payload")
    val enriched = Streams.enrichLogs(Streams.logsFromOtlp(frames))
    val rows = enriched.select("service_name", "severity_number", "body")
      .orderBy("body").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getString(0) == "api"))
  }

  // ---- metrics ----

  private def dbl(w: W, field: Int, v: Double): W =
    w.fix64(field, java.lang.Double.doubleToLongBits(v))

  private def packedDoubles(field: Int, vs: Seq[Double]): W = {
    val inner = new java.io.ByteArrayOutputStream()
    vs.foreach { v =>
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0; while (i < 8) { inner.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    new W().bytes(field, inner.toByteArray)
  }

  private def packedFix64(field: Int, vs: Seq[Long]): W = {
    val inner = new java.io.ByteArrayOutputStream()
    vs.foreach { v =>
      var i = 0; while (i < 8) { inner.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    new W().bytes(field, inner.toByteArray)
  }

  private def metricsPayload: Array[Byte] = {
    // gauge: one double point + an exemplar linking to a trace
    val gaugePoint = new W().fix64(2, 1L).fix64(3, 1704103200000000000L)
    dbl(gaugePoint, 4, 0.75)
    gaugePoint.msg(7, kv("core", intVal(0)))
    val gaugeEx = new W().fix64(2, 1704103200000000050L)
    dbl(gaugeEx, 3, 0.9)
    gaugeEx.bytes(4, sid8(0xabL)).bytes(5, tid16(0xbeefL))
      .msg(7, kv("req", strVal("r-1")))
    gaugePoint.msg(5, gaugeEx)
    val gauge = new W().str(1, "cpu_usage").str(3, "1")
      .msg(5, new W().msg(1, gaugePoint))
    // monotonic cumulative sum: one as_int point
    val sumPoint = new W().fix64(3, 1704103200000000000L)
    sumPoint.tag(6, 1) // as_int, sfixed64
    var x = 42L
    var i = 0; while (i < 8) { sumPoint.out.write(((x >>> (8 * i)) & 0xff).toInt); i += 1 }
    val sum = new W().str(1, "requests_total")
      .msg(7, new W().msg(1, sumPoint).vint(2, 2).vint(3, 1))
    // histogram: count/sum/bounds/buckets
    val histPoint = new W().fix64(3, 1704103200000000000L).fix64(4, 10L)
    dbl(histPoint, 5, 99.5)
    histPoint.out.write(packedFix64(6, Seq(1L, 4L, 5L)).out.toByteArray)
    histPoint.out.write(packedDoubles(7, Seq(0.1, 1.0)).out.toByteArray)
    histPoint.msg(9, kv("route", strVal("/api")))
    // histogram exemplar uses as_int (field 6)
    val histEx = new W().fix64(2, 1704103200000000060L)
    histEx.tag(6, 1)
    var hx = 7L
    var hi = 0; while (hi < 8) { histEx.out.write(((hx >>> (8 * hi)) & 0xff).toInt); hi += 1 }
    histPoint.msg(8, histEx)
    val hist = new W().str(1, "latency").msg(9, new W().msg(1, histPoint).vint(2, 2))
    // exponential histogram: scale -2 (zigzag), offset 3, counts varint
    val pos = new W().vint(1, 6 /* zigzag(3) */)
    val counts = new java.io.ByteArrayOutputStream()
    Seq(2L, 7L).foreach { v => counts.write(v.toInt) } // single-byte varints
    pos.bytes(2, counts.toByteArray)
    val expPoint = new W().msg(1, kv("svc", strVal("a")))
      .fix64(3, 1704103200000000000L).fix64(4, 9L)
      .fix64(5, java.lang.Double.doubleToLongBits(33.25)) // sum field
    expPoint.vint(6, 3 /* zigzag(-2) */).fix64(7, 5L).msg(8, pos)
    val exp = new W().str(1, "lat_exp").msg(10, new W().msg(1, expPoint))
    // summary: quantiles
    val q1 = new W(); dbl(q1, 1, 0.5); dbl(q1, 2, 1.5)
    val q2 = new W(); dbl(q2, 1, 0.99); dbl(q2, 2, 9.9)
    val sumPointS = new W().fix64(3, 1704103200000000000L).fix64(4, 100L)
    dbl(sumPointS, 5, 123.0)
    sumPointS.msg(6, q1).msg(6, q2).msg(7, kv("job", strVal("api")))
    val summary = new W().str(1, "rpc_ms").msg(11, new W().msg(1, sumPointS))

    val scope = new W().str(1, "meter")
    val scopeMetrics = new W().msg(1, scope)
      .msg(2, gauge).msg(2, sum).msg(2, hist).msg(2, exp).msg(2, summary)
    val resource = new W().msg(1, kv("service.name", strVal("api")))
    val resourceMetrics = new W().msg(1, resource).msg(2, scopeMetrics)
    new W().msg(1, resourceMetrics).out.toByteArray
  }

  test("decodeMetrics reads all five metric kinds") {
    val ms = OtlpProto.decodeMetrics(metricsPayload)
    assert(ms.size == 5)
    val g = ms.find(_.name == "cpu_usage").get
    assert(g.gauge.contains(0.75) && g.attrs == Map("core" -> "0"))
    assert(g.start_ns == 1L && g.ts_ns == 1704103200000000000L)
    assert(g.resource_attrs == Map("service.name" -> "api"))

    val s = ms.find(_.name == "requests_total").get
    assert(s.gauge.contains(42.0) && s.is_monotonic && s.temporality == 2)

    val h = ms.find(_.name == "latency").get
    assert(h.hist_count.contains(10L) && h.hist_sum.contains(99.5))
    assert(h.hist_bounds.contains(Seq(0.1, 1.0)))
    assert(h.hist_counts.contains(Seq(1L, 4L, 5L)))
    assert(h.attrs == Map("route" -> "/api"))

    val e = ms.find(_.name == "lat_exp").get
    assert(e.exp_scale.contains(-2) && e.exp_zerocount.contains(5L))
    assert(e.exp_positive_offset.contains(3))
    assert(e.exp_positive_counts.contains(Seq(2L, 7L)))
    assert(e.exp_sum.contains(33.25))
    assert(e.hist_count.isEmpty) // count rides the exp-hist row only via field 4
    assert(e.attrs == Map("svc" -> "a"))

    val q = ms.find(_.name == "rpc_ms").get
    assert(q.hist_count.contains(100L) && q.hist_sum.contains(123.0))
    assert(q.summary_quantiles.contains(Seq(
      OtlpProto.QuantileValue(0.5, 1.5), OtlpProto.QuantileValue(0.99, 9.9))))

    // exemplars: gauge's as_double + trace/span link + filtered attrs;
    // histogram's as_int form
    val gex = g.exemplars.get
    assert(gex == Seq(OtlpProto.ExemplarValue(1704103200000000050L, 0.9,
      Some("00000000000000ab"), Some("0000000000000000000000000000beef"),
      Map("req" -> "r-1"))))
    val hex = h.exemplars.get
    assert(hex == Seq(OtlpProto.ExemplarValue(1704103200000000060L, 7.0,
      None, None, Map.empty)))
    assert(s.exemplars.isEmpty && e.exemplars.isEmpty && q.exemplars.isEmpty)
  }

  // ---- prompb remote-write ----

  private def writeRequestPayload: Array[Byte] = {
    def label(n: String, v: String): W = new W().str(1, n).str(2, v)
    def sample(v: Double, tsMs: Long): W = {
      val w = new W(); dbl(w, 1, v); w.vint(2, tsMs)
    }
    val ts1 = new W()
      .msg(1, label("__name__", "http_requests_total"))
      .msg(1, label("job", "api")).msg(1, label("instance", "i1"))
      .msg(2, sample(1.0, 1704103200000L))
      .msg(2, sample(4.0, 1704103260000L))
    val ts2 = new W()
      .msg(1, label("__name__", "http_requests_total"))
      .msg(1, label("job", "api")).msg(1, label("instance", "i2"))
      .msg(2, sample(7.0, 1704103200000L))
      .msg(3, dbl(new W().msg(1, label("trace_id", "cafe01"))
        .msg(1, label("span_id", "beef02")), 2, 6.5).vint(3, 1704103230000L))
    new W().msg(1, ts1).msg(1, ts2).out.toByteArray
  }

  test("prompb exemplars decode with series identity and trace link") {
    import graft.sources.Prompb
    val exs = Prompb.decodeWriteRequestExemplars(writeRequestPayload)
    assert(exs.size == 1)
    val e = exs.head
    assert(e.name == "http_requests_total")
    assert(e.labels == Map("job" -> "api", "instance" -> "i2"))
    assert(e.exemplar_labels == Map("trace_id" -> "cafe01", "span_id" -> "beef02"))
    assert(e.ts_ms == 1704103230000L && e.value == 6.5)
  }

  test("prompb WriteRequest decodes and feeds the PromQL points schema") {
    import graft.sources.Prompb
    val samples = Prompb.decodeWriteRequest(writeRequestPayload)
    assert(samples.size == 3)
    assert(samples.forall(_.name == "http_requests_total"))
    assert(samples.count(_.labels("instance") == "i1") == 2)
    assert(samples.find(_.labels("instance") == "i2").get.value == 7.0)
    assert(samples.forall(!_.labels.contains("__name__")))

    import spark.implicits._
    val points = Streams.pointsFromPrompb(Seq(writeRequestPayload).toDF("payload"))
    assert(points.columns.toSeq == Seq("ts_us", "name", "labels", "value"))
    // the decoded frame IS queryable: instant vector at the last sample
    val vec = graft.promql.PromQL.instant(
      """http_requests_total{job="api"}""", points, 1704103260000000L)
    val byInst = vec.collect()
      .map(r => (r.getAs[Map[String, String]]("labels")("instance"),
        r.getAs[Double]("value"))).toMap
    assert(byInst == Map("i1" -> 4.0, "i2" -> 7.0))
  }

  test("pointsFromOtlp/expHistFromOtlp bridge into the decomposers") {
    import spark.implicits._
    val frames = Seq(metricsPayload).toDF("payload")
    val flat = Streams.decomposePoints(Streams.pointsFromOtlp(frames))
      .select("mapping", "value").orderBy("mapping", "value")
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    // gauges/sums → mapping 0; hist+summary counts → 1; sums → 2
    assert(flat.toSeq == Seq((0, 0.75), (0, 42.0),
      (1, 10.0), (1, 100.0), (2, 99.5), (2, 123.0)))

    val expFlat = Streams.decomposeExpHist(Streams.expHistFromOtlp(frames))
      .select("mapping", "bucket_idx", "value")
      .orderBy("mapping", "bucket_idx").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1), r.getDouble(2)))
    assert(expFlat.toSeq == Seq(
      (10, -1, 5.0),          // zero-count
      (11, 3, 2.0), (11, 4, 7.0), // positive buckets at offset 3
      (12, -1, 33.25),        // sum field
      (20, 50, 1.5), (20, 99, 9.9))) // summary quantiles
  }

  test("exemplarsFromOtlp feeds the query_exemplars frame") {
    import spark.implicits._
    val frames = Seq(metricsPayload).toDF("payload")
    val rows = Streams.exemplarsFromOtlp(frames)
      .select("ts_us", "name", "labels", "exemplar_labels", "value")
      .orderBy("name").collect()
    assert(rows.length == 2)
    val g = rows(0)
    assert(g.getLong(0) == 1704103200000000L && g.getString(1) == "cpu_usage")
    assert(g.getMap[String, String](2).toMap ==
      Map("service.name" -> "api", "core" -> "0"))
    assert(g.getMap[String, String](3).toMap == Map("req" -> "r-1",
      "span_id" -> "00000000000000ab",
      "trace_id" -> "0000000000000000000000000000beef"))
    assert(g.getDouble(4) == 0.9)
    val h = rows(1)
    assert(h.getString(1) == "latency" && h.getDouble(4) == 7.0)
    assert(h.getMap[String, String](3).isEmpty)
  }

  test("OTLP profiles v1development: dictionary + stack_index decode") {
    import graft.sources.OtlpProfiles
    // packed repeated varint field
    def packed(w: W, field: Int, vs: Seq[Long]): W = {
      val inner = new W()
      vs.foreach(inner.varint)
      w.bytes(field, inner.out.toByteArray)
    }
    val T0 = 1704103200000000000L
    // ProfilesDictionary: string/function/location/stack/attribute tables
    val dict = new W()
    // location_table (field 2): loc_i -> Line{function_index = i}
    Seq(0L, 1L, 2L).foreach(i =>
      dict.msg(2, new W().msg(3, new W().vint(1, i))))
    // function_table (field 3): fn_i -> name_strindex
    Seq(2L, 3L, 4L).foreach(n => dict.msg(3, new W().vint(1, n)))
    // string_table (field 5)
    Seq("", "cpu", "main", "handler", "parse", "region", "eu")
      .foreach(dict.str(5, _))
    // attribute_table (field 6): KeyValueAndUnit{key_strindex=5(region),
    // value AnyValue{string "eu"}}
    dict.msg(6, new W().vint(1, 5L).msg(2, new W().str(1, "eu")))
    // stack_table (field 7): leaf-first location indices
    dict.msg(7, packed(new W(), 1, Seq(2L, 1L, 0L))) // parse,handler,main
    dict.msg(7, packed(new W(), 1, Seq(1L, 0L)))     // handler,main
    // Profile: sample_type ValueType{type_strindex=1(cpu)}, samples,
    // time_unix_nano (field 3); sample 1 references stack 0 + carries
    // attribute_indices=[0], sample 2 references stack 1
    val sample1 = packed(packed(new W().vint(1, 0L), 2, Seq(7L)), 3, Seq(0L))
    val profileFull = new W()
      .msg(1, new W().vint(1, 1L))
      .msg(2, sample1)
      .msg(2, packed(new W().vint(1, 1L), 2, Seq(3L)))
      .vint(3, T0)
    val payload = new W()
      .msg(1, new W()
        .msg(1, new W().msg(1, kv("service.name", strVal("api"))))
        .msg(2, new W().msg(2, profileFull)))
      .msg(2, dict)
      .out.toByteArray
    val rows = OtlpProfiles.decodeProfiles(payload).sortBy(-_.value)
    assert(rows.map(r => (r.name, r.stack, r.value, r.ts_us)) == Seq(
      ("cpu", Seq("main", "handler", "parse"), 7L, T0 / 1000L),
      ("cpu", Seq("main", "handler"), 3L, T0 / 1000L)))
    // resource attrs + dictionary attribute_table labels both land
    assert(rows.head.labels == Map("service.name" -> "api", "region" -> "eu"))
    assert(rows(1).labels == Map("service.name" -> "api"))
    // a classic pprof-shaped request (no dictionary) still decodes via
    // the fallback path — covered by the e2e profiles test; here just
    // assert the v1dev path did NOT claim it
    assert(OtlpProfiles.decodeProfiles(
      new W().msg(1, new W()).out.toByteArray).isEmpty)
  }

  test("LokiPush.parseLabels: exact-match selector form incl. escapes") {
    import graft.sources.LokiPush.parseLabels
    assert(parseLabels("""{app="api", job="svc"}""") ==
      Map("app" -> "api", "job" -> "svc"))
    assert(parseLabels("{}") == Map.empty)
    // escaped quote and backslash inside a value
    assert(parseLabels("""{msg="say \"hi\"", p="a\\b"}""") ==
      Map("msg" -> "say \"hi\"", "p" -> "a\\b"))
    // malformed input raises (the micro-batch drops the frame)
    intercept[IllegalArgumentException](parseLabels("""app="x""""))
    intercept[IllegalArgumentException](parseLabels("""{app=x}"""))
  }
}
