package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel
import graft.TestSpark

class CacheSlotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("swap persists the new frame and releases the previous occupant") {
    import spark.implicits._
    val slot = new CacheSlot
    val a = slot.swap(Seq(1, 2, 3).toDF("x"))
    a.count()
    assert(a.storageLevel != StorageLevel.NONE, "first swap must persist")
    val b = slot.swap(Seq(4, 5).toDF("x"))
    b.count()
    assert(a.storageLevel == StorageLevel.NONE,
      "second swap must unpersist the first occupant")
    assert(b.storageLevel != StorageLevel.NONE)
    // releasing never breaks correctness — the evicted frame recomputes
    assert(a.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("train-twice leaves one live model cache, not two (TextLm)") {
    import spark.implicits._
    // two DIFFERENT corpora: identical plans share one CacheManager
    // entry by construction (already bounded), so the release path is
    // only observable across distinct plans
    val docs1 = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("doc_id", "text")
    val docs2 = Seq((1L, "p q r s"), (2L, "q r s t")).toDF("doc_id", "text")
    val lm1 = TextLm.train(docs1, "doc_id", "text")
    lm1.c12.count()
    val lm2 = TextLm.train(docs2, "doc_id", "text")
    lm2.c12.count()
    assert(lm1.c12.storageLevel == StorageLevel.NONE,
      "the previous train's pair table must be released")
    assert(lm2.c12.storageLevel != StorageLevel.NONE)
  }
}
