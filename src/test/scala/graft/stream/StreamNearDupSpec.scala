package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val tB = "one two three four five six seven eight nine ten eleven"
  private val tC = "entirely different filler sentence with many unique tokens in it"

  test("seed + two ingest batches: dups vs seed, vs earlier batch, within batch; replay is idempotent") {
    val st = java.nio.file.Files.createTempDirectory("graft_snd").toString
    StreamNearDup.seedCorpus(Seq(1L -> tA, 2L -> tB).toDF("doc_id", "text"), st)

    val b1 = Seq(10L -> tA, 11L -> tC).toDF("doc_id", "text") // 10 dups seed doc 1
    StreamNearDup.processBatch(b1, st, 1L)
    def pairSet() = StreamNearDup.pairs(spark, st)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet() == Set((1L, 10L)))

    val b2 = Seq(
      20L -> tC, // dups doc 11 from the PREVIOUS batch — the index grew
      21L -> "twin text planted twice inside one single ingest batch here",
      22L -> "twin text planted twice inside one single ingest batch here")
      .toDF("doc_id", "text")
    StreamNearDup.processBatch(b2, st, 2L)
    assert(pairSet() == Set((1L, 10L), (11L, 20L), (21L, 22L)))

    // crash-replay of batch 2 after its state was already absorbed:
    // identical pairs, no duplicate rows, no self-pairs
    StreamNearDup.processBatch(b2, st, 2L)
    assert(pairSet() == Set((1L, 10L), (11L, 20L), (21L, 22L)))
    assert(StreamNearDup.pairs(spark, st).count() == 3)
  }

  test("file-stream wiring: a streamed batch is gated against the seeded corpus") {
    val st = java.nio.file.Files.createTempDirectory("graft_snd2").toString
    val in = java.nio.file.Files.createTempDirectory("graft_snd_in").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_snd_ck").toString
    StreamNearDup.seedCorpus(Seq(1L -> tA, 2L -> tB).toDF("doc_id", "text"), st)
    Seq(100L -> tB, 101L -> tC).toDF("doc_id", "text").write.parquet(s"$in/data")
    StreamNearDup.runIngestDedup(spark, s"$in/data", ck, st)
    val got = StreamNearDup.pairs(spark, st)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 100L)))
  }
}
