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
}
