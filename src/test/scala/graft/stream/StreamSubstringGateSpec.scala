package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StreamSubstringGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randText(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed * 2654435761L + 0x9e3779b9L)
    (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  // one 60-char verbatim run (> L+w-1 = 47) planted across specific docs
  private val run = randText(70, 60)
  private def withRun(seed: Int) = randText(seed, 80) + run + randText(seed + 500, 80)

  test("seed + two batches: overlap vs seed, vs earlier batch, within batch; replay idempotent") {
    val st = java.nio.file.Files.createTempDirectory("graft_ssg").toString
    StreamSubstringGate.seedCorpus(
      Seq(1L -> withRun(1), 2L -> randText(2, 200)).toDF("doc_id", "text"), st,
      StreamSubstringGate.Params(minShared = 1))

    def pairSet() = StreamSubstringGate.pairs(spark, st)
      .select("id_a", "id_b", "ingest_version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val otherRun = randText(71, 60)
    val b1 = Seq(10L -> withRun(10), // shares the run with seed doc 1
      11L -> (randText(11, 80) + otherRun + randText(511, 80))).toDF("doc_id", "text")
    StreamSubstringGate.processBatch(b1, st, 1L)
    assert(pairSet() == Set((1L, 10L, 1L)))

    val b2 = Seq(
      20L -> (randText(20, 80) + otherRun + randText(520, 80)), // dups doc 11 from batch 1
      21L -> withRun(21), // dups seed doc 1 AND doc 10
      22L -> randText(22, 200)).toDF("doc_id", "text")
    StreamSubstringGate.processBatch(b2, st, 2L)
    assert(pairSet() == Set((1L, 10L, 1L), (11L, 20L, 2L), (1L, 21L, 2L), (10L, 21L, 2L)))

    // crash-replay of batch 2 after absorption: identical pairs, no dups
    StreamSubstringGate.processBatch(b2, st, 2L)
    assert(pairSet() == Set((1L, 10L, 1L), (11L, 20L, 2L), (1L, 21L, 2L), (10L, 21L, 2L)))
    assert(StreamSubstringGate.pairs(spark, st).count() == 4)
  }

  test("in-batch twins are detected through the capped posting path") {
    val st = java.nio.file.Files.createTempDirectory("graft_ssg2").toString
    StreamSubstringGate.seedCorpus(
      Seq(1L -> randText(31, 200)).toDF("doc_id", "text"), st,
      StreamSubstringGate.Params(minShared = 1))
    val twin = withRun(40)
    StreamSubstringGate.processBatch(
      Seq(40L -> twin, 41L -> twin).toDF("doc_id", "text"), st, 1L)
    val got = StreamSubstringGate.pairs(spark, st)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((40L, 41L)))
  }

  test("hub fingerprints are capped at probe time: boilerplate shared by all docs pairs nothing") {
    val st = java.nio.file.Files.createTempDirectory("graft_ssg3").toString
    val boiler = randText(50, 104)
    // 8 seed docs + 4 delta docs all carry the boilerplate prefix; with
    // maxDf = 5 < 12 every boilerplate fingerprint is template noise and
    // must be dropped BEFORE the pair join — only the genuinely planted
    // run may pair
    val seed = (1L to 8L).map(i => (i, boiler + randText(100 + i.toInt, 80)))
      .toDF("doc_id", "text")
    StreamSubstringGate.seedCorpus(seed, st,
      StreamSubstringGate.Params(minShared = 1, maxDf = 5))
    val delta = Seq(
      20L -> (boiler + withRun(20)),
      21L -> (boiler + withRun(21)),
      22L -> (boiler + randText(122, 160)),
      23L -> (boiler + randText(123, 160))).toDF("doc_id", "text")
    StreamSubstringGate.processBatch(delta, st, 1L)
    val got = StreamSubstringGate.pairs(spark, st)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((20L, 21L)),
      s"boilerplate must cap out, only the planted run may pair; got $got")
  }

  test("md5 mode and the geometry manifest: a caller's divergent params are overridden") {
    val st = java.nio.file.Files.createTempDirectory("graft_ssg4").toString
    StreamSubstringGate.seedCorpus(
      Seq(1L -> withRun(60)).toDF("doc_id", "text"), st,
      StreamSubstringGate.Params(minShared = 1, md5Mode = true))
    // caller passes DIFFERENT geometry — the seed manifest must win, so
    // the probe still matches the seeded md5 fingerprint space
    StreamSubstringGate.processBatch(
      Seq(10L -> withRun(61)).toDF("doc_id", "text"), st, 1L,
      StreamSubstringGate.Params(minShared = 5, md5Mode = false, L = 20, w = 2))
    val got = StreamSubstringGate.pairs(spark, st)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("compaction folds deltas into the partitioned seed without changing future probes") {
    val st = java.nio.file.Files.createTempDirectory("graft_ssg5").toString
    StreamSubstringGate.seedCorpus(
      Seq(1L -> withRun(80)).toDF("doc_id", "text"), st,
      StreamSubstringGate.Params(minShared = 1))
    StreamSubstringGate.processBatch(
      Seq(10L -> randText(81, 200)).toDF("doc_id", "text"), st, 1L)
    StreamSubstringGate.compactIndex(spark, st, 2L)
    // post-compaction probe still sees both the seed and batch-1 rows
    StreamSubstringGate.processBatch(
      Seq(20L -> withRun(82)).toDF("doc_id", "text"), st, 2L)
    val got = StreamSubstringGate.pairs(spark, st)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 20L)))
  }
}
