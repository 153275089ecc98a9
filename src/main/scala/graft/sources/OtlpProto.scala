package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Hand-rolled OTLP trace protobuf decoder — the production ingest
  * entry point (the reference ingests through the collector's OTLP
  * receiver, internal/otelreceiver/receiver.go:45-93). No protobuf
  * runtime: the OTLP wire format is decoded directly from the public
  * opentelemetry-proto schema (trace/v1/trace.proto,
  * common/v1/common.proto), which keeps the decoder a pure function
  * usable inside mapPartitions with zero library dependencies.
  *
  * Field numbers (from the public .proto):
  *   ExportTraceServiceRequest: 1 resource_spans
  *   ResourceSpans:  1 resource, 2 scope_spans
  *   Resource:       1 attributes (KeyValue)
  *   ScopeSpans:     1 scope (InstrumentationScope), 2 spans
  *   InstrumentationScope: 1 name, 2 version
  *   Span: 1 trace_id, 2 span_id, 4 parent_span_id, 5 name, 6 kind,
  *         7 start_time_unix_nano, 8 end_time_unix_nano, 9 attributes,
  *         11 events, 13 links, 15 status
  *   Span.Event: 1 time_unix_nano, 2 name
  *   Span.Link:  1 trace_id, 2 span_id
  *   Status:     2 message, 3 code
  *   KeyValue:   1 key, 2 value (AnyValue)
  *   AnyValue:   1 string, 2 bool, 3 int, 4 double, 5 array, 6 kvlist,
  *               7 bytes
  *
  * Id mapping: OTel ids are 16/8 raw bytes; the engine's join keys are
  * int64 (the low 64 bits for trace ids — collision odds 2⁻⁶⁴ per pair)
  * while the full id is retained as `trace_id_hex` for display and
  * exact lookup.
  */
object OtlpProto {

  final case class QuantileValue(q: Double, value: Double)

  /** Exemplar (metrics.proto Exemplar: 2 time, 3 as_double, 4 span_id,
    * 5 trace_id, 6 as_int, 7 filtered_attributes) — the metric↔trace
    * correlation rows /api/v1/query_exemplars serves.
    */
  final case class ExemplarValue(
      ts_ns: Long,
      value: Double,
      span_id_hex: Option[String],
      trace_id_hex: Option[String],
      attrs: Map[String, String])

  /** One LogRecord (logs/v1/logs.proto):
    *   ExportLogsServiceRequest: 1 resource_logs
    *   ResourceLogs: 1 resource, 2 scope_logs
    *   ScopeLogs:    1 scope, 2 log_records
    *   LogRecord: 1 time_unix_nano, 2 severity_number, 3 severity_text,
    *              5 body (AnyValue), 6 attributes, 8 flags (fixed32),
    *              9 trace_id, 10 span_id, 11 observed_time_unix_nano
    */
  final case class OtlpLog(
      ts_ns: Long, // time_unix_nano, falling back to observed time
      severity_number: Int,
      severity_text: String,
      body: String,
      trace_id_hex: String,
      trace_id: Option[Long],
      span_id: Option[Long],
      flags: Int,
      attrs: Map[String, String],
      resource_attrs: Map[String, String],
      scope_name: String,
      scope_version: String)

  /** One metric data point, flattened across the five OTLP metric
    * kinds (metrics/v1/metrics.proto):
    *   ExportMetricsServiceRequest: 1 resource_metrics
    *   ResourceMetrics: 1 resource, 2 scope_metrics
    *   ScopeMetrics:    1 scope, 2 metrics
    *   Metric: 1 name, 3 unit, 5 gauge, 7 sum, 9 histogram,
    *           10 exponential_histogram, 11 summary
    *   NumberDataPoint: 2 start, 3 time, 4 as_double, 6 as_int,
    *                    7 attributes
    *   HistogramDataPoint: 2 start, 3 time, 4 count, 5 sum,
    *                    6 bucket_counts (packed fixed64),
    *                    7 explicit_bounds (packed double), 9 attributes
    *   ExponentialHistogramDataPoint: 1 attributes, 2 start, 3 time,
    *                    4 count, 5 sum, 6 scale (sint32),
    *                    7 zero_count, 8 positive (1 offset sint32,
    *                    2 bucket_counts packed varint)
    *   SummaryDataPoint: 2 start, 3 time, 4 count, 5 sum,
    *                    6 quantile_values (1 quantile, 2 value),
    *                    7 attributes
    * Gauge/sum values land in `gauge`; the discriminating fields for
    * histogram/exp-hist/summary mirror the decomposePoints /
    * decomposeExpHist input shapes (Streams.scala).
    */
  final case class OtlpMetric(
      name: String,
      unit: String,
      ts_ns: Long,
      start_ns: Long,
      attrs: Map[String, String],
      resource_attrs: Map[String, String],
      temporality: Int, // 0 unspec, 1 delta, 2 cumulative
      is_monotonic: Boolean,
      gauge: Option[Double],
      hist_count: Option[Long],
      hist_sum: Option[Double],
      hist_bounds: Option[Seq[Double]],
      hist_counts: Option[Seq[Long]],
      exp_scale: Option[Int],
      exp_zerocount: Option[Long],
      exp_positive_offset: Option[Int],
      exp_positive_counts: Option[Seq[Long]],
      summary_quantiles: Option[Seq[QuantileValue]],
      exemplars: Option[Seq[ExemplarValue]] = None,
      // the exp-histogram's sum field (declared last so the positional
      // 18-arg base constructor stays valid)
      exp_sum: Option[Double] = None)

  final case class SpanEvent(name: String, ts_ns: Long)
  final case class SpanLink(trace_id: Long, span_id: Long)
  final case class OtlpSpan(
      trace_id_hex: String,
      trace_id: Long,
      span_id: Long,
      parent_span_id: Option[Long],
      name: String,
      kind: Int,
      start_ns: Long,
      duration_ns: Long,
      status_code: Int,
      status_message: String,
      attrs: Map[String, String],
      resource_attrs: Map[String, String],
      scope_name: String,
      scope_version: String,
      events: Seq[SpanEvent],
      links: Seq[SpanLink])

  /** Minimal protobuf wire reader over a byte-range (shared with the
    * prompb decoder, [[Prompb]]).
    */
  private[sources] final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var out = 0L
      var b = 0
      do {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        b = buf(pos) & 0xff
        pos += 1
        out |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0 && shift < 70)
      out
    }
    def tag(): (Int, Int) = { val v = varint(); ((v >>> 3).toInt, (v & 7).toInt) }
    def lenBytes(): Array[Byte] = {
      val n = varint().toInt
      if (pos + n > end) throw new IllegalArgumentException("truncated bytes")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      a
    }
    def sub(): Reader = {
      val n = varint().toInt
      if (pos + n > end) throw new IllegalArgumentException("truncated message")
      val r = new Reader(buf, pos, pos + n)
      pos += n
      r
    }
    def fixed64(): Long = {
      var out = 0L
      var i = 0
      while (i < 8) { out |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      out
    }
    def fixed32(): Int = {
      var out = 0
      var i = 0
      while (i < 4) { out |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4
      out
    }
    def string(): String = new String(lenBytes(), UTF_8)
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(): Unit
      case 1 => pos += 8
      case 2 => lenBytes(): Unit
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }

  private def idLong(b: Array[Byte]): Long = {
    // low 8 bytes, big-endian (OTel ids are big-endian byte strings)
    var out = 0L
    val from = math.max(0, b.length - 8)
    var i = from
    while (i < b.length) { out = (out << 8) | (b(i) & 0xffL); i += 1 }
    out
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  /** AnyValue → string (primitives verbatim; nested values as a compact
    * JSON-ish rendering — the engine's attr maps are string-valued like
    * the reference's attribute columns).
    */
  private def anyValue(r: Reader): String = {
    var out = ""
    while (r.hasMore) {
      val (f, wt) = r.tag()
      f match {
        case 1 => out = r.string()
        case 2 => out = (r.varint() != 0).toString
        case 3 => out = r.varint().toString
        case 4 => out = java.lang.Double.longBitsToDouble(r.fixed64()).toString
        case 5 => // array of AnyValue
          val arr = r.sub()
          val items = Seq.newBuilder[String]
          while (arr.hasMore) {
            val (af, awt) = arr.tag()
            if (af == 1 && awt == 2) items += anyValue(arr.sub()) else arr.skip(awt)
          }
          out = items.result().mkString("[", ",", "]")
        case 6 => // kvlist
          val kv = r.sub()
          val items = Seq.newBuilder[String]
          while (kv.hasMore) {
            val (kf, kwt) = kv.tag()
            if (kf == 1 && kwt == 2) {
              val (k, v) = keyValue(kv.sub())
              items += s"$k=$v"
            } else kv.skip(kwt)
          }
          out = items.result().mkString("{", ",", "}")
        case 7 => out = java.util.Base64.getEncoder.encodeToString(r.lenBytes())
        case _ => r.skip(wt)
      }
    }
    out
  }

  private def keyValue(r: Reader): (String, String) = {
    var k = ""
    var v = ""
    while (r.hasMore) {
      val (f, wt) = r.tag()
      f match {
        case 1 => k = r.string()
        case 2 => v = anyValue(r.sub())
        case _ => r.skip(wt)
      }
    }
    (k, v)
  }

  private def attrMap(rs: Seq[Reader]): Map[String, String] =
    rs.map(keyValue).toMap

  /** Package seam for sibling decoders (profiles). */
  private[sources] def attrMapOf(rs: Seq[Reader]): Map[String, String] =
    attrMap(rs)

  /** Decodes one ExportTraceServiceRequest payload into span rows. */
  def decodeSpans(payload: Array[Byte]): Seq[OtlpSpan] = {
    val out = Seq.newBuilder[OtlpSpan]
    val root = new Reader(payload, 0, payload.length)
    while (root.hasMore) {
      val (f, wt) = root.tag()
      if (f == 1 && wt == 2) decodeResourceSpans(root.sub(), out)
      else root.skip(wt)
    }
    out.result()
  }

  private def decodeResourceSpans(r: Reader,
      out: scala.collection.mutable.Builder[OtlpSpan, Seq[OtlpSpan]]): Unit = {
    var resourceAttrs = Map.empty[String, String]
    val scopeSpans = Seq.newBuilder[Reader]
    while (r.hasMore) {
      val (f, wt) = r.tag()
      f match {
        case 1 => // Resource
          val res = r.sub()
          val kvs = Seq.newBuilder[Reader]
          while (res.hasMore) {
            val (rf, rwt) = res.tag()
            if (rf == 1 && rwt == 2) kvs += res.sub() else res.skip(rwt)
          }
          resourceAttrs = attrMap(kvs.result())
        case 2 => scopeSpans += r.sub()
        case _ => r.skip(wt)
      }
    }
    scopeSpans.result().foreach { ss =>
      var scopeName = ""
      var scopeVersion = ""
      val spans = Seq.newBuilder[Reader]
      while (ss.hasMore) {
        val (f, wt) = ss.tag()
        f match {
          case 1 =>
            val sc = ss.sub()
            while (sc.hasMore) {
              val (sf, swt) = sc.tag()
              sf match {
                case 1 => scopeName = sc.string()
                case 2 => scopeVersion = sc.string()
                case _ => sc.skip(swt)
              }
            }
          case 2 => spans += ss.sub()
          case _ => ss.skip(wt)
        }
      }
      spans.result().foreach(s =>
        out += decodeSpan(s, resourceAttrs, scopeName, scopeVersion))
    }
  }

  private def decodeSpan(r: Reader, resourceAttrs: Map[String, String],
      scopeName: String, scopeVersion: String): OtlpSpan = {
    var traceId = Array.emptyByteArray
    var spanId = Array.emptyByteArray
    var parentId = Array.emptyByteArray
    var name = ""
    var kind = 0
    var startNs = 0L
    var endNs = 0L
    var statusCode = 0
    var statusMessage = ""
    val attrs = Seq.newBuilder[Reader]
    val events = Seq.newBuilder[SpanEvent]
    val links = Seq.newBuilder[SpanLink]
    while (r.hasMore) {
      val (f, wt) = r.tag()
      f match {
        case 1  => traceId = r.lenBytes()
        case 2  => spanId = r.lenBytes()
        case 4  => parentId = r.lenBytes()
        case 5  => name = r.string()
        case 6  => kind = r.varint().toInt
        case 7  => startNs = r.fixed64()
        case 8  => endNs = r.fixed64()
        case 9  => attrs += r.sub()
        case 11 =>
          val ev = r.sub()
          var evName = ""
          var evTs = 0L
          while (ev.hasMore) {
            val (ef, ewt) = ev.tag()
            ef match {
              case 1 => evTs = ev.fixed64()
              case 2 => evName = ev.string()
              case _ => ev.skip(ewt)
            }
          }
          events += SpanEvent(evName, evTs)
        case 13 =>
          val ln = r.sub()
          var lTid = 0L
          var lSid = 0L
          while (ln.hasMore) {
            val (lf, lwt) = ln.tag()
            lf match {
              case 1 => lTid = idLong(ln.lenBytes())
              case 2 => lSid = idLong(ln.lenBytes())
              case _ => ln.skip(lwt)
            }
          }
          links += SpanLink(lTid, lSid)
        case 15 =>
          val st = r.sub()
          while (st.hasMore) {
            val (sf, swt) = st.tag()
            sf match {
              case 2 => statusMessage = st.string()
              case 3 => statusCode = st.varint().toInt
              case _ => st.skip(swt)
            }
          }
        case _ => r.skip(wt)
      }
    }
    OtlpSpan(
      trace_id_hex = hex(traceId),
      trace_id = idLong(traceId),
      span_id = idLong(spanId),
      parent_span_id = if (parentId.isEmpty) None else Some(idLong(parentId)),
      name = name,
      kind = kind,
      start_ns = startNs,
      duration_ns = math.max(0L, endNs - startNs),
      status_code = statusCode,
      status_message = statusMessage,
      attrs = attrMap(attrs.result()),
      resource_attrs = resourceAttrs,
      scope_name = scopeName,
      scope_version = scopeVersion,
      events = events.result(),
      links = links.result())
  }

  // ---------- logs ----------

  /** Decodes one ExportLogsServiceRequest payload into log rows. */
  def decodeLogs(payload: Array[Byte]): Seq[OtlpLog] = {
    val out = Seq.newBuilder[OtlpLog]
    val root = new Reader(payload, 0, payload.length)
    while (root.hasMore) {
      val (f, wt) = root.tag()
      if (f == 1 && wt == 2) decodeResourceScoped(root.sub()) {
        (rec, resAttrs, scopeName, scopeVer) =>
          out += decodeLogRecord(rec, resAttrs, scopeName, scopeVer)
      }
      else root.skip(wt)
    }
    out.result()
  }

  /** Shared ResourceLogs/ResourceMetrics walk: both nest
    * resource(1) → scope list(2) → [scope(1), records(2)].
    */
  private def decodeResourceScoped(r: Reader)(
      each: (Reader, Map[String, String], String, String) => Unit): Unit = {
    var resourceAttrs = Map.empty[String, String]
    val scoped = Seq.newBuilder[Reader]
    while (r.hasMore) {
      val (f, wt) = r.tag()
      f match {
        case 1 =>
          val res = r.sub()
          val kvs = Seq.newBuilder[Reader]
          while (res.hasMore) {
            val (rf, rwt) = res.tag()
            if (rf == 1 && rwt == 2) kvs += res.sub() else res.skip(rwt)
          }
          resourceAttrs = attrMap(kvs.result())
        case 2 => scoped += r.sub()
        case _ => r.skip(wt)
      }
    }
    scoped.result().foreach { ss =>
      var scopeName = ""
      var scopeVersion = ""
      val records = Seq.newBuilder[Reader]
      while (ss.hasMore) {
        val (f, wt) = ss.tag()
        f match {
          case 1 =>
            val sc = ss.sub()
            while (sc.hasMore) {
              val (sf, swt) = sc.tag()
              sf match {
                case 1 => scopeName = sc.string()
                case 2 => scopeVersion = sc.string()
                case _ => sc.skip(swt)
              }
            }
          case 2 => records += ss.sub()
          case _ => ss.skip(wt)
        }
      }
      records.result().foreach(each(_, resourceAttrs, scopeName, scopeVersion))
    }
  }

  private def decodeLogRecord(r: Reader, resourceAttrs: Map[String, String],
      scopeName: String, scopeVersion: String): OtlpLog = {
    var tsNs = 0L
    var observedNs = 0L
    var sevNum = 0
    var sevText = ""
    var body = ""
    var traceId = Array.emptyByteArray
    var spanId = Array.emptyByteArray
    var flags = 0
    val attrs = Seq.newBuilder[Reader]
    while (r.hasMore) {
      val (f, wt) = r.tag()
      f match {
        case 1  => tsNs = r.fixed64()
        case 2  => sevNum = r.varint().toInt
        case 3  => sevText = r.string()
        case 5  => body = anyValue(r.sub())
        case 6  => attrs += r.sub()
        case 8  => flags = r.fixed32()
        case 9  => traceId = r.lenBytes()
        case 10 => spanId = r.lenBytes()
        case 11 => observedNs = r.fixed64()
        case _  => r.skip(wt)
      }
    }
    OtlpLog(
      ts_ns = if (tsNs != 0) tsNs else observedNs,
      severity_number = sevNum,
      severity_text = sevText,
      body = body,
      trace_id_hex = hex(traceId),
      trace_id = if (traceId.isEmpty) None else Some(idLong(traceId)),
      span_id = if (spanId.isEmpty) None else Some(idLong(spanId)),
      flags = flags,
      attrs = attrMap(attrs.result()),
      resource_attrs = resourceAttrs,
      scope_name = scopeName,
      scope_version = scopeVersion)
  }

  // ---------- metrics ----------

  private def zigzag(v: Long): Int = ((v >>> 1) ^ -(v & 1)).toInt

  /** Packed or singular repeated fixed64 doubles (wire type 2 or 1). */
  private def doubles(r: Reader, wt: Int,
      acc: scala.collection.mutable.Builder[Double, Seq[Double]]): Unit =
    if (wt == 2) {
      val p = r.sub()
      while (p.hasMore) acc += java.lang.Double.longBitsToDouble(p.fixed64())
    } else acc += java.lang.Double.longBitsToDouble(r.fixed64())

  /** Packed or singular repeated fixed64 longs. */
  private def fixed64s(r: Reader, wt: Int,
      acc: scala.collection.mutable.Builder[Long, Seq[Long]]): Unit =
    if (wt == 2) {
      val p = r.sub()
      while (p.hasMore) acc += p.fixed64()
    } else acc += r.fixed64()

  /** Packed or singular repeated varints. */
  private def varints(r: Reader, wt: Int,
      acc: scala.collection.mutable.Builder[Long, Seq[Long]]): Unit =
    if (wt == 2) {
      val p = r.sub()
      while (p.hasMore) acc += p.varint()
    } else acc += r.varint()

  /** Decodes one ExportMetricsServiceRequest payload into one row per
    * data point.
    */
  def decodeMetrics(payload: Array[Byte]): Seq[OtlpMetric] = {
    val out = Seq.newBuilder[OtlpMetric]
    val root = new Reader(payload, 0, payload.length)
    while (root.hasMore) {
      val (f, wt) = root.tag()
      if (f == 1 && wt == 2) decodeResourceScoped(root.sub()) {
        (metric, resAttrs, _, _) => decodeMetric(metric, resAttrs, out)
      }
      else root.skip(wt)
    }
    out.result()
  }

  private def decodeMetric(r: Reader, resourceAttrs: Map[String, String],
      out: scala.collection.mutable.Builder[OtlpMetric, Seq[OtlpMetric]]): Unit = {
    var name = ""
    var unit = ""
    // (kind, temporality, monotonic, data-point readers) — points are
    // buffered because name/unit fields may follow the data oneof
    var kind = 0 // 5 gauge, 7 sum, 9 hist, 10 exp-hist, 11 summary
    var temporality = 0
    var monotonic = false
    val points = Seq.newBuilder[Reader]
    while (r.hasMore) {
      val (f, wt) = r.tag()
      f match {
        case 1 => name = r.string()
        case 3 => unit = r.string()
        case 5 | 7 | 9 | 10 | 11 =>
          kind = f
          val data = r.sub()
          while (data.hasMore) {
            val (df, dwt) = data.tag()
            df match {
              case 1 => points += data.sub()
              case 2 => temporality = data.varint().toInt
              case 3 => monotonic = data.varint() != 0
              case _ => data.skip(dwt)
            }
          }
        case _ => r.skip(wt)
      }
    }
    val base = OtlpMetric(name, unit, 0L, 0L, Map.empty, resourceAttrs,
      temporality, monotonic, None, None, None, None, None, None, None,
      None, None, None)
    points.result().foreach(p => out += decodeDataPoint(p, kind, base))
  }

  private def decodeDataPoint(r: Reader, kind: Int,
      base: OtlpMetric): OtlpMetric = {
    var startNs = 0L
    var tsNs = 0L
    var num = Option.empty[Double]
    var count = Option.empty[Long]
    var sum = Option.empty[Double]
    val bounds = Seq.newBuilder[Double]
    val counts = Seq.newBuilder[Long]
    var scale = Option.empty[Int]
    var zero = Option.empty[Long]
    var posOffset = Option.empty[Int]
    val posCounts = Seq.newBuilder[Long]
    val quantiles = Seq.newBuilder[QuantileValue]
    val exemplars = Seq.newBuilder[ExemplarValue]
    val attrs = Seq.newBuilder[Reader]
    // Exemplar: 2 time, 3 as_double, 4 span_id, 5 trace_id, 6 as_int,
    // 7 filtered_attributes — attached at kind-specific field numbers
    // (NumberDataPoint 5, HistogramDataPoint 8, ExpHistogram 11)
    def parseExemplar(er: Reader): ExemplarValue = {
      var ts = 0L
      var v = 0.0
      var spanId = Option.empty[String]
      var traceId = Option.empty[String]
      val eAttrs = Seq.newBuilder[Reader]
      while (er.hasMore) {
        val (ef, ewt) = er.tag()
        ef match {
          case 2 => ts = er.fixed64()
          case 3 => v = java.lang.Double.longBitsToDouble(er.fixed64())
          case 4 => spanId = Some(hex(er.lenBytes()))
          case 5 => traceId = Some(hex(er.lenBytes()))
          case 6 => v = er.fixed64().toDouble // as_int
          case 7 if ewt == 2 => eAttrs += er.sub()
          case _ => er.skip(ewt)
        }
      }
      ExemplarValue(ts, v, spanId, traceId, attrMap(eAttrs.result()))
    }
    // field meanings diverge by kind: NumberDataPoint's 4/6 are the
    // value; Histogram/Summary's 4/5 are count/sum; ExpHist adds 6/7/8.
    // attributes: ExpHist 1, Histogram 9, Number/Summary 7
    val attrField = kind match {
      case 10 => 1
      case 9  => 9
      case _  => 7
    }
    while (r.hasMore) {
      val (f, wt) = r.tag()
      f match {
        case 2 => startNs = r.fixed64()
        case 3 => tsNs = r.fixed64()
        case `attrField` if wt == 2 => attrs += r.sub()
        case 4 =>
          if (kind == 5 || kind == 7)
            num = Some(java.lang.Double.longBitsToDouble(r.fixed64()))
          else count = Some(r.fixed64())
        case 5 if (kind == 5 || kind == 7) && wt == 2 =>
          exemplars += parseExemplar(r.sub()) // NumberDataPoint.exemplars
        case 5 if kind != 5 && kind != 7 =>
          sum = Some(java.lang.Double.longBitsToDouble(r.fixed64()))
        case 8 if kind == 9 && wt == 2 =>
          exemplars += parseExemplar(r.sub()) // HistogramDataPoint.exemplars
        case 11 if kind == 10 && wt == 2 =>
          exemplars += parseExemplar(r.sub()) // ExpHistogramDataPoint.exemplars
        case 6 =>
          if (kind == 5 || kind == 7) num = Some(r.fixed64().toDouble) // as_int
          else if (kind == 9) fixed64s(r, wt, counts) // bucket_counts
          else if (kind == 10) scale = Some(zigzag(r.varint())) // sint32
          else if (kind == 11) { // quantile_values
            val qv = r.sub()
            var q = 0.0
            var v = 0.0
            while (qv.hasMore) {
              val (qf, qwt) = qv.tag()
              qf match {
                case 1 => q = java.lang.Double.longBitsToDouble(qv.fixed64())
                case 2 => v = java.lang.Double.longBitsToDouble(qv.fixed64())
                case _ => qv.skip(qwt)
              }
            }
            quantiles += QuantileValue(q, v)
          } else r.skip(wt)
        case 7 if kind == 9 => doubles(r, wt, bounds) // explicit_bounds
        case 7 if kind == 10 => zero = Some(r.fixed64())
        case 8 if kind == 10 => // positive Buckets
          val b = r.sub()
          while (b.hasMore) {
            val (bf, bwt) = b.tag()
            bf match {
              case 1 => posOffset = Some(zigzag(b.varint()))
              case 2 => varints(b, bwt, posCounts)
              case _ => b.skip(bwt)
            }
          }
        case _ => r.skip(wt)
      }
    }
    val boundsOut = bounds.result()
    val countsOut = counts.result()
    val posOut = posCounts.result()
    val qsOut = quantiles.result()
    base.copy(
      ts_ns = tsNs,
      start_ns = startNs,
      attrs = attrMap(attrs.result()),
      gauge = num,
      hist_count = if (kind == 9 || kind == 11) count else None,
      hist_sum = if (kind == 9 || kind == 11) sum else None,
      hist_bounds = if (boundsOut.nonEmpty) Some(boundsOut) else None,
      hist_counts = if (countsOut.nonEmpty) Some(countsOut) else None,
      exp_scale = scale,
      exp_zerocount = zero,
      exp_positive_offset = posOffset,
      exp_positive_counts = if (posOut.nonEmpty) Some(posOut) else None,
      exp_sum = if (kind == 10) sum else None,
      summary_quantiles = if (qsOut.nonEmpty) Some(qsOut) else None,
      exemplars = {
        val es = exemplars.result()
        if (es.nonEmpty) Some(es) else None
      })
  }

}
