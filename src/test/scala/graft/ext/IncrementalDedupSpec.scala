package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ingest-time incremental dedup: delta docs probed against a persisted
  * corpus LSH index ([[Dedup.lshIndex]] / [[Dedup.incrementalVerifiedPairs]]).
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("planted near-dups: delta-corpus and delta-delta pairs found, corpus-corpus excluded") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val u = "one two three four five six seven eight nine ten"
    val corpus = mkDocs(Seq(
      10L -> t, 20L -> u, 21L -> u, // 20/21: corpus-internal dup pair
      30L -> "unrelated words entirely distinct tokens appear here only once"))
    val delta = mkDocs(Seq(
      100L -> t,                    // near-dup of corpus doc 10
      101L -> "nothing matches this sentence anywhere in the corpus at all",
      102L -> "shared duplicate text planted twice in the delta batch",
      103L -> "shared duplicate text planted twice in the delta batch"))
    val idx = Dedup.lshIndex(corpus, "doc_id", "text")
    val got = Dedup.incrementalVerifiedPairs(idx, corpus, delta, "doc_id", "text", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 100L), (102L, 103L)))
  }

  test("parity with the full recompute on the real documents table") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val idx = Dedup.lshIndex(corpus, "doc_id", "text")
    val inc = Dedup.incrementalVerifiedPairs(idx, corpus, delta, "doc_id", "text", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.lshVerifiedPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
    assert(inc == full)
    assert(inc.nonEmpty, "fixture must exercise the incremental path")
  }

  test("persisted index round-trip: corpus is never re-sketched") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_incdedup").toString
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mkDocs(Seq(10L -> t, 20L -> "some other words making a corpus document here today",
        30L -> "third corpus document with yet more distinct filler words inside"))
      .write.parquet(s"$tmp/corpus_docs")
    val corpus = spark.read.parquet(s"$tmp/corpus_docs")
    Dedup.lshIndex(corpus, "doc_id", "text").write.parquet(s"$tmp/corpus_index")
    val idx = spark.read.parquet(s"$tmp/corpus_index")
    mkDocs(Seq(100L -> t, 101L -> "delta only text with no corpus match at all whatsoever"))
      .write.parquet(s"$tmp/delta_docs")
    val delta = spark.read.parquet(s"$tmp/delta_docs")

    val res = Dedup.incrementalVerifiedPairs(idx, corpus, delta, "doc_id", "text", 0.5)
    val got = res.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 100L)))

    // structural: every MinHashSig in the optimized plan is fed by the
    // delta relation only — neither the corpus docs nor the index are
    // ever re-sketched at ingest time
    val lp = res.queryExecution.optimizedPlan
    val sketchNodes = lp.collect {
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.graft.MinHashSig])) => p
    }
    assert(sketchNodes.nonEmpty, "expected the delta to be sketched in-plan")
    def scanPaths(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] =
      p.collectLeaves().flatMap {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Nil
          }
        case _ => Nil
      }
    sketchNodes.foreach { p =>
      val paths = scanPaths(p)
      assert(!paths.exists(_.contains("corpus_docs")) &&
        !paths.exists(_.contains("corpus_index")), s"corpus re-sketched:\n$p")
      assert(paths.exists(_.contains("delta_docs")),
        s"sketch fed by unexpected source ($paths):\n$p")
    }
  }
}
