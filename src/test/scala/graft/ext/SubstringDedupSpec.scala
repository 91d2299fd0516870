package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randText(seed: Int, n: Int): String = {
    // mix the seed: java.util.Random's first outputs correlate strongly
    // across sequential seeds, which plants accidental shared runs
    val r = new scala.util.Random(seed * 2654435761L + 0x9e3779b9L)
    (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  test("planted verbatim run is found by the exact variant; disjoint docs are not paired") {
    val shared = randText(99, 60) // one 60-char run shared by docs 1 and 2
    val docs = Seq(
      (1L, randText(1, 100) + shared + randText(2, 100)),
      (2L, randText(3, 100) + shared + randText(4, 100)),
      (3L, randText(5, 300))).toDF("doc_id", "text")
    val pairs = SubstringDedup.sharedGramPairs(docs, "doc_id", "text",
        L = 40, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 60-char shared run → 21 overlapping 40-grams ≥ minShared
    assert(pairs == Set((1L, 2L)))
  }

  test("winnowing guarantee: runs of length >= L+w-1 survive the sample") {
    // run length exactly L+w-1 = 47 — the winnowing boundary case
    val shared = randText(7, 47)
    val docs = Seq(
      (1L, randText(11, 80) + shared + randText(12, 80)),
      (2L, randText(13, 80) + shared + randText(14, 80)),
      (3L, randText(15, 200))).toDF("doc_id", "text")
    val pairs = SubstringDedup.winnowedGramPairs(docs, "doc_id", "text",
        L = 40, w = 8, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "a run of exactly L+w-1 chars must share a surviving fingerprint")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("hub fingerprints above the df cap never reach the pair join") {
    // the same 40-char template in ALL docs; pairwise-unique remainder.
    // With maxDf below the doc count the template is dropped and no
    // pair survives — the quadratic-fanout guard.
    val template = randText(21, 40)
    // per-doc remainder = one repeated character unique to the doc: every
    // non-template gram is doc-unique BY CONSTRUCTION (no randomness to
    // collide), so the only cross-doc grams are the template's
    val docs = (1L to 10L).map(i =>
        (i, template + (('a' + i).toChar).toString * 100))
      .toDF("doc_id", "text")
    val pairs = SubstringDedup.sharedGramPairs(docs, "doc_id", "text",
        L = 40, minShared = 1, maxDf = 5)
      .collect()
    assert(pairs.isEmpty, s"template gram must be capped out, got ${pairs.length} pairs")
  }

  test("winnowed pairs are a high-recall subset of exact pairs on the fixture corpus") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val exact = SubstringDedup.sharedGramPairs(docs, "doc_id", "text",
        L = 40, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnowed = SubstringDedup.winnowedGramPairs(docs, "doc_id", "text",
        L = 40, w = 8, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must contain substring-duplicated docs")
    // every exact pair shares ≥ 21 grams (a ≥ 60-char run) — far past the
    // winnowing guarantee, so recall on the fixture should be total; allow
    // one stray for boundary runs between 40 and 46 chars
    val missed = exact -- winnowed
    assert(missed.size <= math.max(1, exact.size / 10),
      s"winnowed variant missed ${missed.size} of ${exact.size} exact pairs")
  }
}
