package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: stage-by-stage cost of the LSH dedup path. */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s  -> $r")
      r
    }
    val sigs = graft.ext.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8, 4)
    timed("signatures") { sigs.count() }
    val cands = graft.ext.Dedup.lshCandidatePairs(sigs, "doc_id")
    timed("candidates") { cands.count() }
    val ver = graft.ext.Dedup.lshVerifiedPairs(docs, "doc_id", "text", 0.5, 3, 8, 4)
    timed("verified") { ver.count() }
    val cl = timed("clusters") { graft.ext.Dedup.dupClusters(ver) }
    timed("distinct") { cl.select("cluster_id").distinct().count() }
    spark.stop()
  }
}
