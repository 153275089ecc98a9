package graft.sources

/** Hand-rolled OTLP profiles decoder — the fourth signal's wire entry
  * (the reference routes the profiles signal to its embedded storage
  * via a collector exporter sink,
  * internal/otelreceiver/oteldbexporter/oteldbexporter.go:53-80; the
  * ClickHouse backend has no profiles implementation). Same
  * zero-dependency discipline as [[OtlpProto]].
  *
  * TWO wire shapes are accepted, auto-detected per request:
  *
  * 1. The OTLP profiles v1development format (public
  *    opentelemetry-proto development/profiles/v1development/
  *    profiles.proto, the dictionary/stack-table revision the
  *    reference's pinned pdata v0.157.0 implements): symbol tables
  *    live in a request-level ProfilesDictionary and samples reference
  *    a stack_index —
  *      ExportProfilesServiceRequest: 1 resource_profiles,
  *                                    2 dictionary
  *      ProfilesDictionary: 1 mapping_table, 2 location_table,
  *        3 function_table, 4 link_table, 5 string_table,
  *        6 attribute_table (KeyValueAndUnit: 1 key_strindex,
  *          2 value AnyValue, 3 unit_strindex), 7 stack_table
  *      Stack: 1 location_indices (packed int32, leaf-first)
  *      Location: 3 line (Line: 1 function_index)
  *      Function: 1 name_strindex
  *      Profile: 1 sample_type (ValueType: 1 type_strindex),
  *        2 sample, 3 time_unix_nano
  *      Sample: 1 stack_index, 2 values (packed int64),
  *        3 attribute_indices (packed int32)
  *    (development-signal caveat: this revision is pre-1.0 by
  *    definition; the decode is pinned to the dictionary/stack-table
  *    shape above and a request without field-2 dictionary falls back
  *    to the classic decode.)
  *
  * 2. Classic pprof-shaped payloads (numbering from the public
  *    pprof.proto, github.com/google/pprof proto/profile.proto) with
  *    tables embedded in each Profile:
  *      Profile: 1 sample_type (ValueType: 1 type strindex, 2 unit),
  *        2 sample (Sample: 1 location_id*, 2 value*, 3 label),
  *        4 location (Location: 1 id, 4 line (Line: 1 function_id)),
  *        5 function (Function: 1 id, 2 name strindex),
  *        6 string_table, 9 time_nanos
  *      Sample.Label: 1 key strindex, 2 str strindex
  *
  * Stacks arrive LEAF-FIRST (pprof convention, kept by the stack
  * table) and are reversed to the engine's root-first `stack` column;
  * each location resolves through its first Line's function name.
  * Samples carry the FIRST value (the first sample_type names the
  * series, e.g. "cpu").
  */
object OtlpProfiles {

  final case class OtlpProfileSample(
      ts_us: Long,
      name: String,
      labels: Map[String, String],
      stack: Seq[String],
      value: Long)

  def decodeProfiles(payload: Array[Byte]): Seq[OtlpProfileSample] = {
    // detection pass: a v1development request carries the
    // ProfilesDictionary at field 2
    val probe = new OtlpProto.Reader(payload, 0, payload.length)
    var hasDict = false
    while (probe.hasMore) {
      val (f, wt) = probe.tag()
      if (f == 2 && wt == 2) { hasDict = true; probe.skip(wt) }
      else probe.skip(wt)
    }
    if (hasDict) return decodeProfilesV1Dev(payload)
    val out = Seq.newBuilder[OtlpProfileSample]
    val top = new OtlpProto.Reader(payload, 0, payload.length)
    while (top.hasMore) {
      val (f, wt) = top.tag()
      if (f == 1 && wt == 2) decodeResourceProfiles(top.sub(), out)
      else top.skip(wt)
    }
    out.result()
  }

  /** The dictionary/stack-table decode path (shape 1 above). */
  private def decodeProfilesV1Dev(payload: Array[Byte]): Seq[OtlpProfileSample] = {
    val strings = Seq.newBuilder[String]
    val locFn = Seq.newBuilder[Int]      // location idx → function index
    val fnName = Seq.newBuilder[Long]    // function idx → name strindex
    val stacks = Seq.newBuilder[Seq[Int]] // stack idx → location indices
    val attrs = Seq.newBuilder[(Long, String)] // attr idx → (key strindex, value)
    // pass 1: the dictionary
    val dictScan = new OtlpProto.Reader(payload, 0, payload.length)
    while (dictScan.hasMore) {
      val (f, wt) = dictScan.tag()
      if (f == 2 && wt == 2) {
        val d = dictScan.sub()
        while (d.hasMore) {
          val (df, dwt) = d.tag()
          (df, dwt) match {
            case (2, 2) => // Location: 3 line → first function_index
              val l = d.sub()
              var fn = -1
              while (l.hasMore) {
                val (lf, lwt) = l.tag()
                if (lf == 3 && lwt == 2) {
                  val ln = l.sub()
                  while (ln.hasMore) {
                    val (nf, nwt) = ln.tag()
                    if (nf == 1 && nwt == 0) {
                      val v = ln.varint(); if (fn < 0) fn = v.toInt
                    } else ln.skip(nwt)
                  }
                } else l.skip(lwt)
              }
              locFn += fn
            case (3, 2) => // Function: 1 name_strindex
              val fr = d.sub()
              var name = 0L
              while (fr.hasMore) {
                val (ff, fwt) = fr.tag()
                if (ff == 1 && fwt == 0) name = fr.varint() else fr.skip(fwt)
              }
              fnName += name
            case (5, 2) => strings += d.string()
            case (6, 2) => // KeyValueAndUnit: 1 key_strindex, 2 AnyValue
              val a = d.sub()
              var key = 0L
              var value = ""
              while (a.hasMore) {
                val (af, awt) = a.tag()
                if (af == 1 && awt == 0) key = a.varint()
                else if (af == 2 && awt == 2) {
                  val v = a.sub() // AnyValue: 1 string_value (string-typed
                  while (v.hasMore) { // attrs; other kinds render empty)
                    val (vf, vwt) = v.tag()
                    if (vf == 1 && vwt == 2) value = v.string() else v.skip(vwt)
                  }
                } else a.skip(awt)
              }
              attrs += ((key, value))
            case (7, 2) => // Stack: 1 location_indices (packed int32)
              val st = d.sub()
              val idx = Seq.newBuilder[Long]
              while (st.hasMore) {
                val (sf, swt) = st.tag()
                if (sf == 1) packedVarints(st, swt, idx) else st.skip(swt)
              }
              stacks += idx.result().map(_.toInt)
            case _ => d.skip(dwt)
          }
        }
      } else dictScan.skip(wt)
    }
    val strT = strings.result().toIndexedSeq
    val locFnT = locFn.result().toIndexedSeq
    val fnNameT = fnName.result().toIndexedSeq
    val stackT = stacks.result().toIndexedSeq
    val attrT = attrs.result().toIndexedSeq
    def str(i: Long): String =
      if (i >= 0 && i < strT.length) strT(i.toInt) else ""
    def stackNames(stackIdx: Int): Seq[String] =
      if (stackIdx < 0 || stackIdx >= stackT.length) Nil
      else stackT(stackIdx).flatMap { li =>
        if (li >= 0 && li < locFnT.length) {
          val fi = locFnT(li)
          if (fi >= 0 && fi < fnNameT.length) Some(str(fnNameT(fi))) else None
        } else None
      }.filter(_.nonEmpty).reverse // leaf-first table → root-first column
    // pass 2: the profiles
    val out = Seq.newBuilder[OtlpProfileSample]
    val top = new OtlpProto.Reader(payload, 0, payload.length)
    while (top.hasMore) {
      val (f, wt) = top.tag()
      if (f == 1 && wt == 2) {
        val rp = top.sub()
        var resourceAttrs = Map.empty[String, String]
        val scopes = Seq.newBuilder[OtlpProto.Reader]
        while (rp.hasMore) {
          val (rf, rwt) = rp.tag()
          (rf, rwt) match {
            case (1, 2) =>
              val res = rp.sub()
              val kvs = Seq.newBuilder[OtlpProto.Reader]
              while (res.hasMore) {
                val (xf, xwt) = res.tag()
                if (xf == 1 && xwt == 2) kvs += res.sub() else res.skip(xwt)
              }
              resourceAttrs = OtlpProto.attrMapOf(kvs.result())
            case (2, 2) => scopes += rp.sub()
            case _      => rp.skip(rwt)
          }
        }
        scopes.result().foreach { sc =>
          while (sc.hasMore) {
            val (sf, swt) = sc.tag()
            if (sf == 2 && swt == 2) {
              val p = sc.sub()
              var sampleTypeStr = -1L
              var timeNanos = 0L
              val samples = Seq.newBuilder[(Int, Long, Seq[Int])]
              while (p.hasMore) {
                val (pf, pwt) = p.tag()
                (pf, pwt) match {
                  case (1, 2) => // ValueType: 1 type_strindex
                    val vt = p.sub()
                    while (vt.hasMore) {
                      val (vf, vwt) = vt.tag()
                      if (vf == 1 && vwt == 0) {
                        val t = vt.varint()
                        if (sampleTypeStr < 0) sampleTypeStr = t
                      } else vt.skip(vwt)
                    }
                  case (2, 2) => // Sample
                    val s = p.sub()
                    // proto3 default: an absent stack_index means 0
                    // (the first stack-table entry), NOT "no stack"
                    var stackIdx = 0
                    val vals = Seq.newBuilder[Long]
                    val ai = Seq.newBuilder[Long]
                    while (s.hasMore) {
                      val (sf2, swt2) = s.tag()
                      (sf2, swt2) match {
                        case (1, 0) => stackIdx = s.varint().toInt
                        case (2, _) => packedVarints(s, swt2, vals)
                        case (3, _) => packedVarints(s, swt2, ai)
                        case _      => s.skip(swt2)
                      }
                    }
                    val vs = vals.result()
                    if (vs.nonEmpty)
                      samples += ((stackIdx, vs.head,
                        ai.result().map(_.toInt)))
                  case (3, 0) => timeNanos = p.varint()
                  case (3, 1) => timeNanos = p.fixed64()
                  case _      => p.skip(pwt)
                }
              }
              val seriesName = str(sampleTypeStr) match {
                case "" => "samples"
                case n  => n
              }
              samples.result().foreach { case (si, v, ais) =>
                val stack = stackNames(si)
                val sampleLabels = ais.flatMap { i =>
                  if (i >= 0 && i < attrT.length) {
                    val (k, value) = attrT(i)
                    val key = str(k)
                    if (key.nonEmpty) Some(key -> value) else None
                  } else None
                }.toMap
                if (stack.nonEmpty)
                  out += OtlpProfileSample(timeNanos / 1000L, seriesName,
                    resourceAttrs ++ sampleLabels, stack, v)
              }
            } else sc.skip(swt)
          }
        }
      } else top.skip(wt)
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
