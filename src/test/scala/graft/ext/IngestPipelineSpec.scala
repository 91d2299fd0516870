package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class IngestPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randText(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed * 2654435761L + 0x9e3779b9L)
    (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  // wave-0 LM corpus: 10 words, 9 bigrams. Fluent wave docs reuse these
  // bigrams with per-doc unique words inserted every ~20 chars so no
  // 40-byte run is ever shared by construction (the substring stage must
  // only fire on the EXPLICITLY planted 60-char runs).
  private val seedText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private def fluent(u1: String, u2: String, tail: String = "") =
    (s"alpha beta gamma $u1 delta epsilon zeta $u2 eta theta" +
      (if (tail.isEmpty) "" else s" $tail"))
  private def garbage(tail: String = "") =
    ("alpha qq alpha rr alpha ss alpha tt" + (if (tail.isEmpty) "" else s" $tail"))

  private def fates(docs: Seq[(Long, String)]): Map[Long, (Int, Int, String)] =
    IngestPipeline.waveFates(docs.toDF("doc_id", "text"), "doc_id", "text",
        nWaves = 3, maxAvgNllFrac = 0.98, L = 40, w = 8, minShared = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap

  test("stage precedence: first failing stage names the reason") {
    val run = randText(1, 60)
    val f = fates(Seq(
      0L -> seedText,                      // seed: trains the LM
      3L -> s"$seedText $run",             // seed: holds the planted run
      1L -> "zz",                          // wave 1: 1 token -> lm_short
      4L -> garbage(),                     // wave 1: seen-w1/unseen-w2 bigrams -> lm
      7L -> fluent("uaa", "ubb"),          // wave 1: fluent -> ok
      2L -> fluent("uaa", "ubb"),          // wave 2: EXACT clone of admitted 7
      5L -> fluent("ucc", "udd", run),     // wave 2: shares the run with seed 3
      8L -> fluent("uee", "uff")))         // wave 2: fluent, unique -> ok
    assert(f(1L) == ((1, 0, "lm_short")))
    assert(f(4L) == ((1, 0, "lm")))
    assert(f(7L) == ((1, 1, "ok")))
    assert(f(2L) == ((2, 0, "exact")), s"verbatim clone of an admitted doc: ${f(2L)}")
    assert(f(5L) == ((2, 0, "substring")), s"shares a 60-char run with the seed: ${f(5L)}")
    assert(f(8L) == ((2, 1, "ok")))
  }

  test("in-batch exact keep-first and substring CC keep min id") {
    val run = randText(9, 60)
    val twin = fluent("twina", "twinb")
    val f = fates(Seq(
      0L -> seedText,
      1L -> twin,                          // wave 1: kept (min id of the sig)
      4L -> twin,                          // wave 1: exact drop
      7L -> fluent("uaa", "ubb", run),     // wave 1: CC with 10 -> 7 kept
      10L -> fluent("ucc", "udd", run)))   // wave 1: CC drop (not min)
    assert(f(1L)._3 == "ok")
    assert(f(4L) == ((1, 0, "exact")))
    assert(f(7L)._3 == "ok", s"min id of the substring component must survive: ${f(7L)}")
    assert(f(10L) == ((1, 0, "substring")))
  }

  test("production xxhash mode reproduces the md5-mode fates exactly") {
    // waveFates' two modes differ ONLY in hash encoding (md5 text sigs +
    // md5 winnowed grams vs the xxhash64 codegen kernels); fates depend
    // on hash EQUALITY, which both spaces decide identically modulo
    // 64-bit collisions — so the planted-overlap fixture must produce
    // byte-identical fates. This pins the 100 TB deployment mode against
    // the oracle-gated mode (the oracle itself stays md5-only).
    val run = randText(33, 60)
    val docs = Seq(
      0L -> seedText, 3L -> s"$seedText $run",
      1L -> "zz", 4L -> garbage(), 7L -> fluent("uaa", "ubb"),
      2L -> fluent("uaa", "ubb"), 5L -> fluent("ucc", "udd", run),
      8L -> fluent("uee", "uff")).toDF("doc_id", "text")
    def run1(md5: Boolean) =
      IngestPipeline.waveFates(docs, "doc_id", "text",
          nWaves = 3, maxAvgNllFrac = 0.98, L = 40, w = 8, minShared = 1,
          md5Mode = md5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSet
    val md5Fates = run1(md5 = true)
    val xxFates = run1(md5 = false)
    assert(md5Fates.nonEmpty && md5Fates.exists(_._4 == "substring"),
      s"fixture sanity: the substring stage must fire: $md5Fates")
    assert(xxFates == md5Fates,
      s"mode parity broken:\n  md5: $md5Fates\n  xx:  $xxFates")
  }

  test("rejected docs never join the admitted state") {
    val run = randText(21, 60)
    // doc 4 (wave 1) is lm-rejected but carries the run; doc 2 (wave 2)
    // shares the run ONLY with doc 4 — since 4 was never admitted, 2
    // must pass the substring stage
    val f = fates(Seq(
      0L -> seedText,
      4L -> garbage(run),
      2L -> fluent("uaa", "ubb", run)))
    assert(f(4L) == ((1, 0, "lm")))
    assert(f(2L) == ((2, 1, "ok")),
      s"overlap with a REJECTED doc must not block admission: ${f(2L)}")
  }
}
