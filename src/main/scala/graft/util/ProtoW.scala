package graft.util

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal protobuf WRITER (varints, tags, length-delimited
  * submessages, fixed64) — the encode twin of
  * [[graft.sources.OtlpProto]]'s hand-rolled reader, used by the
  * self-telemetry exporter to render OTLP payloads without a protobuf
  * dependency. Same builder shape the wire-format test suites use, so
  * the encoder is exercised against the decoder, not against itself.
  */
final class ProtoW {
  private val out = new ByteArrayOutputStream()

  def varint(v: Long): ProtoW = {
    var x = v
    while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt); this
  }
  def tag(field: Int, wire: Int): ProtoW = varint((field.toLong << 3) | wire)
  def bytes(field: Int, b: Array[Byte]): ProtoW = {
    tag(field, 2); varint(b.length.toLong); out.write(b); this
  }
  def str(field: Int, s: String): ProtoW = bytes(field, s.getBytes(UTF_8))
  def msg(field: Int, m: ProtoW): ProtoW = bytes(field, m.toByteArray)
  def vint(field: Int, v: Long): ProtoW = { tag(field, 0); varint(v) }
  def fix64(field: Int, v: Long): ProtoW = {
    tag(field, 1)
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    this
  }
  def double(field: Int, v: Double): ProtoW =
    fix64(field, java.lang.Double.doubleToLongBits(v))

  def toByteArray: Array[Byte] = out.toByteArray
}
