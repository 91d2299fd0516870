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

  test("md5 oracle variant: same winnow guarantee, same pair decisions as the kernel path") {
    val shared = randText(41, 47) // exactly L+w-1 — the boundary case
    val docs = Seq(
      (1L, randText(42, 80) + shared + randText(43, 80)),
      (2L, randText(44, 80) + shared + randText(45, 80)),
      (3L, randText(46, 200))).toDF("doc_id", "text")
    val pairs = SubstringDedup.winnowedGramPairsMd5(docs, "doc_id", "text",
        L = 40, w = 8, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "a run of exactly L+w-1 chars must share a surviving md5 fingerprint")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // short-doc path: fewer than w grams ⇒ the single partial window's min
    val short = Seq((7L, shared.take(42)), (8L, shared.take(42))).toDF("doc_id", "text")
    val sp = SubstringDedup.winnowedGramPairsMd5(short, "doc_id", "text",
        L = 40, w = 8, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sp == Set((7L, 8L)), "identical short docs must pair via the partial window")
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

  test("capped distinct aggregate: sorted distinct under cap, NULL over cap, across merges") {
    // 40 partitions over 3 keys forces the partial/serialize/merge path;
    // key "big" has 12 distinct ids (> cap 10) spread across partitions so
    // overflow must be detected at MERGE time, not just update time
    val rows = (1L to 12L).map(i => ("big", i)) ++
      Seq(("small", 5L), ("small", 3L), ("small", 5L), ("one", 9L))
    val df = rows.toDF("k", "id").repartition(40)
      .groupBy("k")
      .agg(graft.functions.text.capped_distinct_longs(col("id"), 10).as("ids"))
    val out = df.collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out("big").isEmpty, "12 distinct ids over cap 10 must eval to NULL")
    assert(out("small").contains(Seq(3L, 5L)), "under-cap group must be sorted distinct")
    assert(out("one").contains(Seq(9L)))
  }

  test("mega-hub gram present in EVERY doc: bounded state, correct pairs and span stats") {
    // one 60-char boilerplate prefix in all 500 docs (the license-header
    // shape), plus one genuine 60-char run shared by docs 1 and 2 only.
    // With maxDf = 20 << 500 the hub must cap out inside the aggregate
    // (per-key state never exceeds maxDf) and ONLY the genuine pair
    // survives.
    val hub = randText(31, 60)
    val planted = randText(32, 60)
    val docs = (1L to 500L).map { i =>
      val extra = if (i <= 2) planted else ""
      (i, hub + randText(1000 + i.toInt, 60) + extra)
    }.toDF("doc_id", "text")
    val pairs = SubstringDedup.sharedGramPairs(docs, "doc_id", "text",
        L = 40, minShared = 5, maxDf = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"hub gram must cap out, planted pair must survive; got $pairs")
    // dupSpanStats has no cap BY DESIGN (a hub gram genuinely duplicates
    // every doc it touches) — but its state is a per-gram COUNT, never a
    // posting list; every doc's 21 hub-gram positions must be counted
    val stats = SubstringDedup.dupSpanStats(docs, "doc_id", "text", L = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats.size == 500)
    assert(stats.forall(_._2 >= 21),
      "every doc shares the 60-char hub run = 21 duplicated 40-gram positions")
  }

  test("span stats use the kernel's byte basis: multibyte text keeps dup_frac <= 1") {
    // 'é' is 2 UTF-8 bytes: 60 chars = 120 octets → 81 byte-windows, all
    // duplicated across the two copies. Char-based n_grams (60-39=21)
    // would yield dup_frac ≈ 3.9 — the ADVICE r7 unit-mix defect.
    val t = "é" * 60
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val rows = SubstringDedup.dupSpanStats(docs, "doc_id", "text", L = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 2)
    rows.foreach { case (_, nGrams, nDup, frac) =>
      assert(nGrams == 81L, s"n_grams must be octet-based (120-39), got $nGrams")
      assert(nDup == 81L && frac == 1.0, s"all windows duplicated, got $nDup / $frac")
    }
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

  test("non-long ids: numeric strings widen, non-numeric ids fail FAST (no silent zero pairs)") {
    val shared = randText(55, 60)
    // castable string ids: the capped aggregate widens them to long and
    // the pair path works (documented widening, values preserved)
    val numeric = Seq(
      ("100", randText(61, 80) + shared + randText(62, 80)),
      ("101", randText(63, 80) + shared + randText(64, 80))).toDF("doc_id", "text")
    val got = SubstringDedup.sharedGramPairs(numeric, "doc_id", "text",
        L = 40, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L)))
    // NON-numeric ids: a silent cast-to-null would mean ZERO pairs with
    // no error (the regression review flagged) — the guard must raise.
    val bad = Seq(
      ("docA", randText(65, 80) + shared + randText(66, 80)),
      ("docB", randText(67, 80) + shared + randText(68, 80))).toDF("doc_id", "text")
    val ex = intercept[Throwable] {
      SubstringDedup.sharedGramPairs(bad, "doc_id", "text",
        L = 40, minShared = 1).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${messages(t.getCause)}"
    assert(messages(ex).contains("capped_distinct_longs") ||
      messages(ex).toUpperCase.contains("CAST"),
      s"expected a loud id-cast failure, got: ${messages(ex).take(400)}")
  }
}
