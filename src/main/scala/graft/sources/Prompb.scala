package graft.sources

/** Prometheus remote-write (prompb) wire decoder — the metrics-side
  * ingest entry the reference exposes at /api/v1/write
  * (internal/prometheusremotewrite/, internal/prompb/ — vendored
  * protobuf there; a hand-rolled reader here, same approach as
  * [[OtlpProto]]).
  *
  * Takes the UNCOMPRESSED protobuf body: real remote-write frames are
  * snappy-block-compressed on the wire; decompression is the HTTP
  * layer's one-line concern, not the decoder's.
  *
  * Field numbers (public prometheus/prompb schema):
  *   WriteRequest: 1 timeseries
  *   TimeSeries:   1 labels, 2 samples, 3 exemplars, 4 histograms
  *   Label:        1 name, 2 value
  *   Sample:       1 value (double), 2 timestamp (int64 ms)
  *
  * Exemplars and native histograms are skipped (the reference's
  * writer path inserts samples; OTLP is the histogram route here).
  */
object Prompb {

  import OtlpProto.Reader

  /** One sample row: the series labels INCLUDE `__name__`. */
  final case class PromSample(
      name: String,
      labels: Map[String, String],
      ts_ms: Long,
      value: Double)

  /** Decodes one WriteRequest payload into sample rows. */
  def decodeWriteRequest(payload: Array[Byte]): Seq[PromSample] = {
    val out = Seq.newBuilder[PromSample]
    val root = new Reader(payload, 0, payload.length)
    while (root.hasMore) {
      val (f, wt) = root.tag()
      if (f == 1 && wt == 2) decodeTimeSeries(root.sub(), out)
      else root.skip(wt)
    }
    out.result()
  }

  private def decodeTimeSeries(r: Reader,
      out: scala.collection.mutable.Builder[PromSample, Seq[PromSample]]): Unit = {
    val labels = Map.newBuilder[String, String]
    val samples = Seq.newBuilder[(Long, Double)]
    while (r.hasMore) {
      val (f, wt) = r.tag()
      f match {
        case 1 =>
          val lb = r.sub()
          var n = ""
          var v = ""
          while (lb.hasMore) {
            val (lf, lwt) = lb.tag()
            lf match {
              case 1 => n = lb.string()
              case 2 => v = lb.string()
              case _ => lb.skip(lwt)
            }
          }
          labels += (n -> v)
        case 2 =>
          val sm = r.sub()
          var value = 0.0
          var tsMs = 0L
          while (sm.hasMore) {
            val (sf, swt) = sm.tag()
            sf match {
              case 1 => value = java.lang.Double.longBitsToDouble(sm.fixed64())
              case 2 => tsMs = sm.varint()
              case _ => sm.skip(swt)
            }
          }
          samples += ((tsMs, value))
        case _ => r.skip(wt)
      }
    }
    val lm = labels.result()
    val name = lm.getOrElse("__name__", "")
    val rest = lm - "__name__"
    samples.result().foreach { case (ts, v) =>
      out += PromSample(name, rest, ts, v)
    }
  }
}
