package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learns the classic merges on the Sennrich vocabulary") {
    // {"low":5,"lower":2,"newest":6,"widest":3} — the worked example
    // from the BPE paper. Hand computation:
    //   r1: es=9 ties st=9 → (e,s) by pair order;  apply: new es t / wid es t
    //   r2: (es,t)=9 → est
    //   r3: lo=7 ties ow=7 → (l,o)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val m = Bpe.train(words, rounds = 3)
    assert(m === Seq(
      Bpe.Merge(1, "e", "s", "es", 9L),
      Bpe.Merge(2, "es", "t", "est", 9L),
      Bpe.Merge(3, "l", "o", "lo", 7L)))
  }

  test("merge application is greedy leftmost-first, non-overlapping") {
    // "aaaa": r1 counts (a,a)=3 but applies only twice → "aa aa";
    // r2 then merges (aa,aa)=1. A naive space-delimited replace would
    // produce "aa a aa"-style off-by-one placements on odd runs.
    val even = Seq(("aaaa", 1L)).toDF("word", "freq")
    assert(Bpe.train(even, 2) === Seq(
      Bpe.Merge(1, "a", "a", "aa", 3L),
      Bpe.Merge(2, "aa", "aa", "aaaa", 1L)))

    // "aaa": greedy pairs the LEFT two → "aa a", so round 2 must see
    // exactly one (aa,a) pair and no (a,aa)
    val odd = Seq(("aaa", 1L)).toDF("word", "freq")
    assert(Bpe.train(odd, 2) === Seq(
      Bpe.Merge(1, "a", "a", "aa", 2L),
      Bpe.Merge(2, "aa", "a", "aaa", 1L)))
  }

  test("trainTable runs end-to-end from documents and orders rounds") {
    val docs = Seq((0L, "low low lower newest"), (1L, "newest widest low"))
      .toDF("doc_id", "text")
    val t = Bpe.trainTable(docs, "text", rounds = 4).collect()
    assert(t.length === 4)
    assert(t.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    // every merged form is the concatenation of its pair
    assert(t.forall(r => r.getString(3) === r.getString(1) + r.getString(2)))
  }
}
