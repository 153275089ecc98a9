package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for the training-data pipeline (builder
  * contract): media items are opaque `binary` payloads plus typed
  * metadata; decode / feature-extraction runs batched per partition.
  *
  * All three kinds decode for REAL through [[CodecDecoder]] (BMP/PNM
  * images, RIFF/WAVE PCM audio, RIFF/AVI uncompressed-DIB video —
  * header AND payload, [[Codecs]], no libraries). [[StubDecoder]]
  * remains as the deterministic fake for synthetic corpora whose
  * payloads are not real media (e.g. [[mediaFromDocuments]]);
  * everything around the seam — the schema, the Dataset[MediaItem]
  * encoder, the mapPartitions batch shape, the partitioning strategy
  * — is the production plumbing and is tested (MultimodalSpec).
  *
  * Scale notes: featurize runs mapPartitions so a real decoder amortizes
  * model/codec init once per partition (the per-batch pattern a Python
  * stack gets from mapInPandas); media tables should be repartitioned by
  * media_id range so payload bytes spread evenly and no partition
  * exceeds executor memory (payloads stream off parquet row-groups).
  */
object Multimodal {

  /** One media item: payload is the opaque bytes, meta is typed sidecar. */
  final case class MediaItem(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      source: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("source", StringType)
  ))

  /** Decoder seam. Production binds an actual codec; tests and this
    * container use [[StubDecoder]].
    */
  trait MediaDecoder extends Serializable {
    /** (width, height, n_frames) of a decoded payload. */
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int)
  }

  /** STUB: deterministic fake decode — real image/audio libs are not in
    * this container. Derives plausible dimensions from the payload's
    * leading bytes so the pipeline shape (schema, batching, joins) is
    * fully exercisable and reproducible.
    */
  object StubDecoder extends MediaDecoder {
    override def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val b0 = if (payload.nonEmpty) payload(0) & 0xFF else 0
      val b1 = if (payload.length > 1) payload(1) & 0xFF else 0
      val width = b0 % 64 + 16
      val height = b1 % 64 + 16
      val frames = kind match {
        case "video" => b0 % 30 + 1
        case "audio" => b1 % 100 + 1
        case _       => 1
      }
      (width, height, frames)
    }
  }

  /** REAL image decode behind the seam: BMP and binary PNM payloads
    * decode header+pixels ([[Codecs]]); audio/video kinds remain on
    * the stub arithmetic (their codecs are not in this container).
    * Unknown image bytes fail loudly — a production corpus must not
    * silently produce fake dimensions.
    */
  object ImageDecoder extends MediaDecoder {
    override def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
      kind match {
        case "image" =>
          val img =
            if (Codecs.isBmp(payload)) Codecs.decodeBmp(payload)
            else if (Codecs.isPnm(payload)) Codecs.decodePnm(payload)
            else if (Codecs.isPng(payload)) Codecs.decodePng(payload)
            else throw new IllegalArgumentException(
              s"unknown image payload (${payload.length} bytes): not BMP/PNM/PNG")
          (img.width, img.height, 1)
        case other => StubDecoder.decode(other, payload)
      }
  }

  /** REAL codecs behind the seam for all three kinds: BMP/PNM images
    * ([[ImageDecoder]]), RIFF/WAVE integer-PCM audio
    * ([[Codecs.decodeWav]]), and RIFF/AVI uncompressed-DIB video
    * ([[Codecs.decodeAvi]]). Audio maps to the (w, h, frames)
    * contract as (channels, bits_per_sample, frames_per_channel);
    * video as (width, height, n_frames). Unknown bytes fail loudly —
    * a production corpus must not silently produce fake features.
    */
  object CodecDecoder extends MediaDecoder {
    override def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
      kind match {
        case "image" => ImageDecoder.decode(kind, payload)
        case "audio" =>
          if (!Codecs.isWav(payload))
            throw new IllegalArgumentException(
              s"unknown audio payload (${payload.length} bytes): not RIFF/WAVE")
          val a = Codecs.decodeWav(payload)
          (a.channels, a.bitsPerSample, a.framesPerChannel)
        case "video" =>
          if (!Codecs.isAvi(payload))
            throw new IllegalArgumentException(
              s"unknown video payload (${payload.length} bytes): not RIFF/AVI")
          val v = Codecs.decodeAvi(payload)
          (v.width, v.height, v.nFrames)
        case other => StubDecoder.decode(other, payload)
      }
  }

  /** Batched feature extraction: one decoder instance per partition,
    * streamed row-at-a-time within the partition (the mapInPandas batch
    * shape, minus Python).
    */
  def featurize(items: Dataset[MediaItem], decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // decoder init happens here ONCE per partition in a real codec
      it.map { m =>
        val (w, h, f) = decoder.decode(m.kind, m.payload)
        MediaFeatures(m.media_id, m.kind, m.source, m.payload.length, w, h, f)
      }
    }
  }

  /** Payload-rewriting image resize: decode → nearest-neighbor kernel
    * ([[Codecs.resize]]) → re-encode as BMP, batched per partition
    * like [[featurize]] (one codec init per partition, payloads stream
    * row-at-a-time so executor memory holds one decoded raster, not a
    * partition of them). Non-image kinds pass through untouched, so
    * the op composes over a mixed media table. Unknown image bytes
    * fail loudly, same policy as the decoders.
    */
  def resizeImages(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map {
        case m if m.kind == "image" =>
          val img =
            if (Codecs.isBmp(m.payload)) Codecs.decodeBmp(m.payload)
            else if (Codecs.isPnm(m.payload)) Codecs.decodePnm(m.payload)
            else if (Codecs.isPng(m.payload)) Codecs.decodePng(m.payload)
            else throw new IllegalArgumentException(
              s"unknown image payload (${m.payload.length} bytes): not BMP/PNM/PNG")
          m.copy(payload = Codecs.encodeBmp(Codecs.resize(img, w, h)))
        case other => other
      }
    }
  }

  /** Payload-rewriting video frame-sampling: decode → every k-th frame
    * ([[Codecs.sampleFrames]], frame clock stretched so duration is
    * preserved) → re-encode as AVI. Same batch shape and pass-through
    * policy as [[resizeImages]].
    */
  def sampleVideoFrames(items: Dataset[MediaItem], every: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map {
        case m if m.kind == "video" =>
          if (!Codecs.isAvi(m.payload))
            throw new IllegalArgumentException(
              s"unknown video payload (${m.payload.length} bytes): not RIFF/AVI")
          m.copy(payload =
            Codecs.encodeAvi(Codecs.sampleFrames(Codecs.decodeAvi(m.payload), every)))
        case other => other
      }
    }
  }

  /** Derive a deterministic media table from the documents corpus (the
    * container has no real binaries): payload = md5(text) bytes. Used by
    * tests and the oracle-backed query.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      unhex(md5(col("text"))).as("payload"),
      col("source")
    ).as[MediaItem]
  }
}
