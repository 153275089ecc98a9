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
  *   Exemplar:     1 labels, 2 value (double), 3 timestamp (int64 ms)
  *
  * Native histograms are skipped (the reference's writer path inserts
  * samples; OTLP is the histogram route here).
  */
object Prompb {

  import OtlpProto.Reader

  /** One sample row: the series labels INCLUDE `__name__`. */
  final case class PromSample(
      name: String,
      labels: Map[String, String],
      ts_ms: Long,
      value: Double)

  /** One exemplar row: series identity plus the exemplar's own labels
    * (trace_id/span_id ride there by Prometheus convention).
    */
  final case class PromExemplar(
      name: String,
      labels: Map[String, String],
      exemplar_labels: Map[String, String],
      ts_ms: Long,
      value: Double)

  /** Decodes one WriteRequest payload into sample rows. */
  def decodeWriteRequest(payload: Array[Byte]): Seq[PromSample] =
    decodeFull(payload)._1

  /** Decodes one WriteRequest payload into exemplar rows. */
  def decodeWriteRequestExemplars(payload: Array[Byte]): Seq[PromExemplar] =
    decodeFull(payload)._2

  private def decodeFull(payload: Array[Byte])
      : (Seq[PromSample], Seq[PromExemplar]) = {
    val out = Seq.newBuilder[PromSample]
    val exOut = Seq.newBuilder[PromExemplar]
    val root = new Reader(payload, 0, payload.length)
    while (root.hasMore) {
      val (f, wt) = root.tag()
      if (f == 1 && wt == 2) decodeTimeSeries(root.sub(), out, exOut)
      else root.skip(wt)
    }
    (out.result(), exOut.result())
  }

  private def decodeLabel(lb: Reader): (String, String) = {
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
    (n, v)
  }

  private def decodeTimeSeries(r: Reader,
      out: scala.collection.mutable.Builder[PromSample, Seq[PromSample]],
      exOut: scala.collection.mutable.Builder[PromExemplar, Seq[PromExemplar]])
      : Unit = {
    val labels = Map.newBuilder[String, String]
    val samples = Seq.newBuilder[(Long, Double)]
    val exemplars = Seq.newBuilder[(Map[String, String], Long, Double)]
    while (r.hasMore) {
      val (f, wt) = r.tag()
      f match {
        case 1 =>
          labels += decodeLabel(r.sub())
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
        case 3 =>
          val em = r.sub()
          val exLabels = Map.newBuilder[String, String]
          var value = 0.0
          var tsMs = 0L
          while (em.hasMore) {
            val (ef, ewt) = em.tag()
            ef match {
              case 1 => exLabels += decodeLabel(em.sub())
              case 2 => value = java.lang.Double.longBitsToDouble(em.fixed64())
              case 3 => tsMs = em.varint()
              case _ => em.skip(ewt)
            }
          }
          exemplars += ((exLabels.result(), tsMs, value))
        case _ => r.skip(wt)
      }
    }
    val lm = labels.result()
    val name = lm.getOrElse("__name__", "")
    val rest = lm - "__name__"
    samples.result().foreach { case (ts, v) =>
      out += PromSample(name, rest, ts, v)
    }
    exemplars.result().foreach { case (el, ts, v) =>
      exOut += PromExemplar(name, rest, el, ts, v)
    }
  }
}
