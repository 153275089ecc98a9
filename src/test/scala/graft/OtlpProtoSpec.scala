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
}
