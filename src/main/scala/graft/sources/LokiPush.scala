package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Loki push PROTOBUF decoder — promtail's default wire encoding
  * (snappy-compressed `logproto.PushRequest`; the JSON body our
  * listener also accepts is the fallback encoding). Field numbers from
  * the public logproto (grafana/loki pkg/push/push.proto):
  *
  *   PushRequest: 1 streams (StreamAdapter)
  *   StreamAdapter: 1 labels (string, `{k="v",...}`), 2 entries
  *   EntryAdapter: 1 timestamp (google.protobuf.Timestamp:
  *                   1 seconds, 2 nanos), 2 line
  *
  * The labels string is the push contract's exact-match selector form;
  * a tiny dedicated parser lifts it to the label map (no regex ops —
  * the matcher grammar here is fixed to `=`).
  */
object LokiPush {

  final case class PushEntry(
      ts_ns: Long,
      body: String,
      attrs: Map[String, String])

  /** `{a="b", c="d\"e"}` → Map(a -> b, c -> d"e). Malformed input
    * raises — the micro-batch drops the frame, the listener survives.
    */
  private[graft] def parseLabels(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c)
        throw new IllegalArgumentException(s"expected '$c' at $i in $s")
      i += 1
    }
    expect('{')
    ws()
    if (i < s.length && s.charAt(i) == '}') return out.result()
    var done = false
    while (!done) {
      ws()
      val k0 = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_'))
        i += 1
      val key = s.substring(k0, i)
      if (key.isEmpty) throw new IllegalArgumentException(s"empty key at $i")
      expect('=')
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          sb.append(s.charAt(i + 1)); i += 2
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      expect('"')
      out += (key -> sb.toString)
      ws()
      if (i < s.length && s.charAt(i) == ',') i += 1
      else { expect('}'); done = true }
    }
    out.result()
  }

  /** Decodes one (already snappy-undone) PushRequest payload. */
  def decodePush(payload: Array[Byte]): Seq[PushEntry] = {
    val out = Seq.newBuilder[PushEntry]
    val top = new OtlpProto.Reader(payload, 0, payload.length)
    while (top.hasMore) {
      val (f, wt) = top.tag()
      if (f == 1 && wt == 2) {
        val st = top.sub()
        var attrs = Map.empty[String, String]
        val entries = Seq.newBuilder[(Long, String)]
        while (st.hasMore) {
          val (sf, swt) = st.tag()
          (sf, swt) match {
            case (1, 2) => attrs = parseLabels(new String(st.lenBytes(), UTF_8))
            case (2, 2) =>
              val e = st.sub()
              var sec = 0L
              var nanos = 0L
              var line = ""
              while (e.hasMore) {
                val (ef, ewt) = e.tag()
                (ef, ewt) match {
                  case (1, 2) =>
                    val t = e.sub()
                    while (t.hasMore) {
                      val (tf, twt) = t.tag()
                      if (tf == 1 && twt == 0) sec = t.varint()
                      else if (tf == 2 && twt == 0) nanos = t.varint()
                      else t.skip(twt)
                    }
                  case (2, 2) => line = e.string()
                  case _      => e.skip(ewt)
                }
              }
              entries += ((sec * 1000000000L + nanos, line))
            case _ => st.skip(swt)
          }
        }
        val a = attrs
        entries.result().foreach { case (ts, line) =>
          out += PushEntry(ts, line, a)
        }
      } else top.skip(wt)
    }
    out.result()
  }
}
