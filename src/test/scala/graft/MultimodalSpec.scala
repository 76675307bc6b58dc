package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: decode schema/validity, feature shape and
  * determinism, frame sampling counts, corrupt-blob quarantine. */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val corpus = Multimodal.fakeCorpus(spark, 30)

  test("decode parses kind/dims and flags corrupt blobs") {
    val meta = Multimodal.metaTable(Multimodal.decode(corpus, "media_id", "content"))
    assert(meta.count() === 30)
    assert(meta.where(!col("valid")).count() === 0)
    val kinds = meta.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds === Map("image" -> 10, "audio" -> 10, "video" -> 10))

    val corrupt = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "content")
    val cm = Multimodal.decode(corrupt, "media_id", "content").collect()
    assert(!cm.head.meta.valid)
  }

  test("features are deterministic with fixed dim") {
    val f1 = Multimodal.features(corpus, "media_id", "content", dim = 8).collect()
      .map(f => f.id -> f.embedding.toSeq).toMap
    val f2 = Multimodal.features(corpus, "media_id", "content", dim = 8).collect()
      .map(f => f.id -> f.embedding.toSeq).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.length === 8))
  }

  test("frame sampling yields every stride-th frame of video blobs only") {
    // video blob with 6 frames of 32 bytes
    val payload = Array.tabulate[Byte](6 * 32)(i => i.toByte)
    val vid = Seq((1L, Multimodal.encodeFake("video", 4, 4, 6, payload)),
        (2L, Multimodal.encodeFake("image", 4, 4, 1, payload)))
      .toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(vid, "media_id", "content",
      frameBytes = 32, stride = 2).collect()
    assert(frames.map(_.id).distinct.toSeq === Seq(1L))
    assert(frames.map(_.frameIdx).sorted.toSeq === Seq(0, 2, 4))
    assert(frames.forall(_.frame.length === 32))
  }

  test("resize maps nearest-neighbor pixels and skips non-images") {
    // 4x4 gradient: pixel (y,x) = y*4+x; 2x2 nearest-neighbor picks
    // source pixels (0,0) (0,2) (2,0) (2,2) -> bytes 0, 2, 8, 10
    val px = Array.tabulate[Byte](16)(_.toByte)
    val df = Seq(
        (1L, Multimodal.encodeFake("image", 4, 4, 1, px)),
        (2L, Multimodal.encodeFake("audio", 4, 4, 1, px)),
        (3L, Array[Byte](1, 2)))
      .toDF("media_id", "content")
    val out = Multimodal.resize(df, "media_id", "content", 2, 2).collect()
    assert(out.map(_.id).toSeq === Seq(1L))
    val r = out.head
    assert((r.width, r.height) === (2, 2))
    assert(r.content.drop(Multimodal.HeaderLen).toSeq === Seq[Byte](0, 2, 8, 10))
  }

  test("resized blobs flow back through decode with the new dimensions") {
    val images = corpus.where(col("media_id") % 3 === 0) // fakeCorpus kind cycle
    val n = images.count()
    assert(n > 0)
    val resized = Multimodal.resize(images, "media_id", "content", 8, 6)
      .toDF().withColumnRenamed("content", "c")
    val meta = Multimodal.decode(resized, "id", "c").collect()
    assert(meta.length.toLong === n)
    assert(meta.forall(d => d.meta.valid && d.meta.kind == "image" &&
      d.meta.width == 8 && d.meta.height == 6))
  }
}
