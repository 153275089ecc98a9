package graft.sources

/** Hand-rolled OTLP profiles decoder — the fourth signal's wire entry
  * (the reference routes the profiles signal to its embedded storage
  * via a collector exporter sink,
  * internal/otelreceiver/oteldbexporter/oteldbexporter.go:53-80; the
  * ClickHouse backend has no profiles implementation). Same
  * zero-dependency discipline as [[OtlpProto]].
  *
  * Field numbers (public .proto sources):
  *   ExportProfilesServiceRequest: 1 resource_profiles
  *   ResourceProfiles: 1 resource, 2 scope_profiles
  *   ScopeProfiles:    1 scope, 2 profiles
  *   Profile — the pprof-shaped message the OTLP profiles signal
  *   embeds (numbering from the public pprof.proto,
  *   github.com/google/pprof proto/profile.proto):
  *     1 sample_type (ValueType: 1 type strindex, 2 unit strindex)
  *     2 sample      (Sample: 1 location_id*, 2 value*, 3 label)
  *     4 location    (Location: 1 id, 4 line (Line: 1 function_id))
  *     5 function    (Function: 1 id, 2 name strindex)
  *     6 string_table
  *     9 time_nanos
  *   Sample.Label: 1 key strindex, 2 str strindex
  *
  * Stacks arrive LEAF-FIRST (pprof convention) and are reversed to the
  * engine's root-first `stack` column; each location resolves through
  * its first Line's function name. Samples carry the FIRST value (the
  * first sample_type names the series, e.g. "cpu").
  */
object OtlpProfiles {

  final case class OtlpProfileSample(
      ts_us: Long,
      name: String,
      labels: Map[String, String],
      stack: Seq[String],
      value: Long)

  def decodeProfiles(payload: Array[Byte]): Seq[OtlpProfileSample] = {
    val out = Seq.newBuilder[OtlpProfileSample]
    val top = new OtlpProto.Reader(payload, 0, payload.length)
    while (top.hasMore) {
      val (f, wt) = top.tag()
      if (f == 1 && wt == 2) decodeResourceProfiles(top.sub(), out)
      else top.skip(wt)
    }
    out.result()
  }

  private def decodeResourceProfiles(r: OtlpProto.Reader,
      out: scala.collection.mutable.Builder[OtlpProfileSample, Seq[OtlpProfileSample]]): Unit = {
    var resourceAttrs = Map.empty[String, String]
    val scopes = Seq.newBuilder[OtlpProto.Reader]
    while (r.hasMore) {
      val (f, wt) = r.tag()
      (f, wt) match {
        case (1, 2) => // Resource: 1 attributes
          val res = r.sub()
          val kvs = Seq.newBuilder[OtlpProto.Reader]
          while (res.hasMore) {
            val (rf, rwt) = res.tag()
            if (rf == 1 && rwt == 2) kvs += res.sub() else res.skip(rwt)
          }
          resourceAttrs = OtlpProto.attrMapOf(kvs.result())
        case (2, 2) => scopes += r.sub()
        case _      => r.skip(wt)
      }
    }
    scopes.result().foreach { sc =>
      while (sc.hasMore) {
        val (f, wt) = sc.tag()
        if (f == 2 && wt == 2) decodeProfile(sc.sub(), resourceAttrs, out)
        else sc.skip(wt)
      }
    }
  }

  private final case class RawSample(
      locs: Seq[Long], values: Seq[Long], labels: Map[Long, Long])

  private def decodeProfile(r: OtlpProto.Reader,
      resourceAttrs: Map[String, String],
      out: scala.collection.mutable.Builder[OtlpProfileSample, Seq[OtlpProfileSample]]): Unit = {
    var sampleTypeStr = -1L
    val samples = Seq.newBuilder[RawSample]
    val locLine = scala.collection.mutable.Map.empty[Long, Long] // loc id → function id
    val funcName = scala.collection.mutable.Map.empty[Long, Long] // fn id → name strindex
    val strings = Seq.newBuilder[String]
    var timeNanos = 0L
    while (r.hasMore) {
      val (f, wt) = r.tag()
      (f, wt) match {
        case (1, 2) => // first sample_type wins (names the series)
          val vt = r.sub()
          var t = -1L
          while (vt.hasMore) {
            val (vf, vwt) = vt.tag()
            if (vf == 1 && vwt == 0) t = vt.varint() else vt.skip(vwt)
          }
          if (sampleTypeStr < 0) sampleTypeStr = t
        case (2, 2) =>
          val s = r.sub()
          val locs = Seq.newBuilder[Long]
          val vals = Seq.newBuilder[Long]
          val lbls = Map.newBuilder[Long, Long]
          while (s.hasMore) {
            val (sf, swt) = s.tag()
            (sf, swt) match {
              case (1, _) => packedVarints(s, swt, locs)
              case (2, _) => packedVarints(s, swt, vals)
              case (3, 2) =>
                val l = s.sub()
                var k = -1L; var v = -1L
                while (l.hasMore) {
                  val (lf, lwt) = l.tag()
                  if (lf == 1 && lwt == 0) k = l.varint()
                  else if (lf == 2 && lwt == 0) v = l.varint()
                  else l.skip(lwt)
                }
                if (k >= 0 && v >= 0) lbls += (k -> v)
              case _ => s.skip(swt)
            }
          }
          samples += RawSample(locs.result(), vals.result(), lbls.result())
        case (4, 2) => // Location: 1 id, 4 line → first function_id
          val l = r.sub()
          var id = -1L
          var fn = -1L
          while (l.hasMore) {
            val (lf, lwt) = l.tag()
            (lf, lwt) match {
              case (1, 0) => id = l.varint()
              case (4, 2) =>
                val ln = l.sub()
                while (ln.hasMore) {
                  val (nf, nwt) = ln.tag()
                  if (nf == 1 && nwt == 0) { val v = ln.varint(); if (fn < 0) fn = v }
                  else ln.skip(nwt)
                }
              case _ => l.skip(lwt)
            }
          }
          if (id >= 0 && fn >= 0) locLine(id) = fn
        case (5, 2) => // Function: 1 id, 2 name strindex
          val fr = r.sub()
          var id = -1L
          var name = -1L
          while (fr.hasMore) {
            val (ff, fwt) = fr.tag()
            if (ff == 1 && fwt == 0) id = fr.varint()
            else if (ff == 2 && fwt == 0) name = fr.varint()
            else fr.skip(fwt)
          }
          if (id >= 0 && name >= 0) funcName(id) = name
        case (6, 2) => strings += r.string()
        case (9, 0) => timeNanos = r.varint()
        case _      => r.skip(wt)
      }
    }
    val strTable = strings.result().toIndexedSeq
    def str(i: Long): String =
      if (i >= 0 && i < strTable.length) strTable(i.toInt) else ""
    val seriesName = str(sampleTypeStr) match {
      case "" => "samples"
      case s  => s
    }
    samples.result().foreach { s =>
      val stack = s.locs
        .flatMap(id => locLine.get(id).flatMap(funcName.get).map(str))
        .filter(_.nonEmpty)
        .reverse // pprof leaf-first → engine root-first
      val sampleLabels = s.labels.map { case (k, v) => str(k) -> str(v) }
        .filter { case (k, _) => k.nonEmpty }
      if (stack.nonEmpty && s.values.nonEmpty)
        out += OtlpProfileSample(timeNanos / 1000L, seriesName,
          resourceAttrs ++ sampleLabels, stack, s.values.head)
    }
  }

  /** Repeated uint64 field, packed (wire 2) or expanded (wire 0). */
  private def packedVarints(r: OtlpProto.Reader, wt: Int,
      out: scala.collection.mutable.Builder[Long, Seq[Long]]): Unit =
    wt match {
      case 0 => out += r.varint()
      case 2 =>
        val sub = r.sub()
        while (sub.hasMore) out += sub.varint()
      case other => r.skip(other)
    }
}
