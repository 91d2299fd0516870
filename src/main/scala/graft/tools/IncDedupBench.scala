package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev benchmark: ingest-time incremental dedup vs full-corpus recompute.
  * Builds a synthetic corpus once (index persisted to parquet like a real
  * committed state), then times (a) probing a small delta against the
  * index and (b) re-running the full LSH pipeline over corpus+delta. The
  * point at scale: (a) sketches only the delta — its cost is flat in the
  * corpus size except for the keyed text-fetch join — while (b) re-reads
  * and re-sketches everything.
  */
object IncDedupBench {
  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toInt).getOrElse(1000000)
    val nDelta = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def mkDocs(ids: org.apache.spark.sql.Dataset[java.lang.Long]) = ids.selectExpr("id AS doc_id",
      // ~1% of docs share a text with a neighbor (planted near-dups)
      """concat_ws(' ', transform(sequence(0, 39),
        |  i -> concat('w', pmod(hash(CASE WHEN pmod(id, 100) = 0 THEN id + 1 ELSE id END, i), 5000)))) AS text""".stripMargin)

    val base = java.nio.file.Files.createTempDirectory("graft_incbench").toString
    val corpus = mkDocs(spark.range(nCorpus))
    corpus.write.parquet(s"$base/docs")
    Dedup.lshIndex(corpus, "doc_id", "text").write.parquet(s"$base/index")
    val corpusBack = spark.read.parquet(s"$base/docs")
    val indexBack = spark.read.parquet(s"$base/index")
    val delta = mkDocs(spark.range(nCorpus, nCorpus + nDelta)).persist()
    delta.count()

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[incdedup] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n pairs)")
    }
    timed(s"incremental probe ($nDelta)") {
      Dedup.incrementalVerifiedPairs(indexBack, corpusBack, delta,
        "doc_id", "text", 0.5).count()
    }
    timed(s"full recompute (${nCorpus + nDelta})") {
      Dedup.lshVerifiedPairs(corpusBack.unionByName(delta), "doc_id", "text", 0.5).count()
    }
    spark.stop()
  }
}
