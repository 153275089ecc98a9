package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.{MediaItem, StubDecoder}

/** Plumbing tests for the multimodal pipeline: encoder round-trip,
  * partition-batched featurize, determinism, schema.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def items = Seq(
    MediaItem(1L, "image", Array[Byte](100, 7, 1, 2), "a"),
    MediaItem(2L, "video", Array[Byte](33, 5), "a"),
    MediaItem(3L, "audio", Array[Byte](-1, -2, 3), "b"),
    MediaItem(4L, "image", Array.emptyByteArray, "b")
  ).toDS()

  test("featurize is deterministic and batch-shaped") {
    val out = Multimodal.featurize(items.repartition(3), StubDecoder)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.n_bytes).toSeq == Seq(4, 2, 3, 0))
    // stub decode: width = b0 % 64 + 16
    assert(out(0).width == 100 % 64 + 16)
    assert(out(1).n_frames == 33 % 30 + 1) // video frames from b0
    assert(out(2).n_frames == (254 % 100) + 1) // audio frames from b1 (unsigned)
    assert(out(3).width == 16 && out(3).height == 16 && out(3).n_frames == 1)
    // running twice yields identical results (stub is pure)
    val again = Multimodal.featurize(items, StubDecoder).collect().sortBy(_.media_id)
    assert(out.toSeq == again.toSeq)
  }

  test("mediaFromDocuments produces 16-byte md5 payloads with cycling kinds") {
    val docs = Seq((0L, "hello", "s0"), (1L, "world", "s1"), (2L, "again", "s2"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.mediaFromDocuments(spark, docs).collect().sortBy(_.media_id)
    assert(media.map(_.kind).toSeq == Seq("image", "audio", "video"))
    assert(media.forall(_.payload.length == 16))
    // payload equals unhex(md5(text))
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8"))
    assert(media(0).payload.toSeq == expect.toSeq)
  }
}
