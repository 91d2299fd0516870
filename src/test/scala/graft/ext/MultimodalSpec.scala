package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeFeatures: deterministic, bytes preserved, features bounded") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val f1 = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(spark, media, batchSize = 7).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "batch size must not affect results")
    val lens = docs.selectExpr("doc_id", "length(text) AS l").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    f1.foreach { f =>
      assert(f.n_bytes == lens(f.media_id))
      assert(f.width >= 1 && f.width <= 1920 && f.height >= 1 && f.height <= 1080)
    }
  }

  test("frameSample: deterministic even-spaced frames covering the payload") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents").limit(50)
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(spark, media, nFrames = 4).collect()
    val byDoc = frames.groupBy(_.media_id)
    assert(byDoc.values.forall(_.length == 4)) // all fixture docs are > 4 bytes
    byDoc.values.foreach { fs =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.offset).toSeq == sorted.map(_.offset).toSeq.sorted)
      assert(sorted.forall(f => f.n_bytes > 0))
    }
    // determinism across batch sizes
    val again = Multimodal.frameSample(spark, media, nFrames = 4, batchSize = 7)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(again.toSeq == frames.sortBy(f => (f.media_id, f.frame_idx)).toSeq)
  }

  test("resizeFit: aspect-preserving downscale, never upscale") {
    import spark.implicits._
    val feats = Seq(
      (1L, 1920, 1080), (2L, 100, 50), (3L, 4000, 500), (4L, 500, 4000)
    ).toDF("media_id", "width", "height")
    val out = Multimodal.resizeFit(feats, 640, 480)
      .collect().map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) == ((640, 360)))   // 1920x1080 -> fit width
    assert(out(2L) == ((100, 50)))    // already fits: no upscale
    assert(out(3L) == ((640, 80)))    // extreme wide
    assert(out(4L) == ((60, 480)))    // extreme tall
  }
}
