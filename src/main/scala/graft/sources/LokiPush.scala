package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Loki push decoders — promtail's default wire encoding
  * (snappy-compressed `logproto.PushRequest`) and the JSON fallback
  * body. Field numbers from the public logproto (grafana/loki
  * pkg/push/push.proto):
  *
  *   PushRequest: 1 streams (StreamAdapter)
  *   StreamAdapter: 1 labels (string, `{k="v",...}`), 2 entries
  *   EntryAdapter: 1 timestamp (google.protobuf.Timestamp:
  *                   1 seconds, 2 nanos), 2 line,
  *                 3 structuredMetadata (LabelPairAdapter:
  *                   1 name, 2 value) — per-entry labels promtail/
  *                   alloy attach since Loki 2.9
  *
  * The labels string is the push contract's exact-match selector form;
  * a tiny dedicated parser lifts it to the label map (no regex ops —
  * the matcher grammar here is fixed to `=`). JSON bodies may carry a
  * third per-entry element `[ts, line, {meta}]` — the same structured
  * metadata in object form.
  */
object LokiPush {

  final case class PushEntry(
      ts_ns: Long,
      body: String,
      attrs: Map[String, String],
      metadata: Map[String, String] = Map.empty)

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

  /** Decodes one Loki push JSON body:
    * `{"streams":[{"stream":{labels},"values":[[ts, line, {meta}?], …]}]}`
    * — the third per-entry element (structured metadata, Loki ≥2.9) is
    * optional and must not break entries without it. Runs distributed
    * inside the ingest micro-batch (mapPartitions); a malformed body
    * decodes to zero rows rather than poisoning the listener (Jackson
    * is on the Spark classpath — public dependency).
    */
  def decodePushJson(payload: Array[Byte]): Seq[PushEntry] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(payload)
      val out = Seq.newBuilder[PushEntry]
      def toMap(n: com.fasterxml.jackson.databind.JsonNode): Map[String, String] = {
        val b = Map.newBuilder[String, String]
        val it = n.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isValueNode) b += (e.getKey -> e.getValue.asText())
        }
        b.result()
      }
      val streams = root.path("streams").elements()
      while (streams.hasNext) {
        val s = streams.next()
        val attrs = toMap(s.path("stream"))
        val values = s.path("values").elements()
        while (values.hasNext) {
          val v = values.next()
          if (v.isArray && v.size() >= 2) {
            val ts = v.get(0).asText().toLongOption
            val meta =
              if (v.size() >= 3 && v.get(2).isObject) toMap(v.get(2))
              else Map.empty[String, String]
            ts.foreach(t => out += PushEntry(t, v.get(1).asText(), attrs, meta))
          }
        }
      }
      out.result()
    } catch { case _: Exception => Seq.empty }

  /** Decodes one (already snappy-undone) PushRequest payload. */
  def decodePush(payload: Array[Byte]): Seq[PushEntry] = {
    val out = Seq.newBuilder[PushEntry]
    val top = new OtlpProto.Reader(payload, 0, payload.length)
    while (top.hasMore) {
      val (f, wt) = top.tag()
      if (f == 1 && wt == 2) {
        val st = top.sub()
        var attrs = Map.empty[String, String]
        val entries = Seq.newBuilder[(Long, String, Map[String, String])]
        while (st.hasMore) {
          val (sf, swt) = st.tag()
          (sf, swt) match {
            case (1, 2) => attrs = parseLabels(new String(st.lenBytes(), UTF_8))
            case (2, 2) =>
              val e = st.sub()
              var sec = 0L
              var nanos = 0L
              var line = ""
              val meta = Map.newBuilder[String, String]
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
                  case (3, 2) => // structuredMetadata LabelPairAdapter
                    val lp = e.sub()
                    var k = ""
                    var v = ""
                    while (lp.hasMore) {
                      val (lf, lwt) = lp.tag()
                      if (lf == 1 && lwt == 2) k = lp.string()
                      else if (lf == 2 && lwt == 2) v = lp.string()
                      else lp.skip(lwt)
                    }
                    if (k.nonEmpty) meta += (k -> v)
                  case _ => e.skip(ewt)
                }
              }
              entries += ((sec * 1000000000L + nanos, line, meta.result()))
            case _ => st.skip(swt)
          }
        }
        val a = attrs
        entries.result().foreach { case (ts, line, meta) =>
          out += PushEntry(ts, line, a, meta)
        }
      } else top.skip(wt)
    }
    out.result()
  }
}
