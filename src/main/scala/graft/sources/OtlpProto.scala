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

  /** Minimal protobuf wire reader over a byte-range. */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
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
}
