package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: measure how the heavy dedup/text/ANN paths SCALE by
  * running them at the bench corpus (sf0.1 → 500k docs / 200k vectors)
  * and at 4× that (an sf0.4-shaped dir → 2M docs / 800k vectors), same
  * warm JVM. Linear paths should show ~4× wall; anything super-linear is
  * a scale bug the 500k corpus hid. Results land in PERFORMANCE.md.
  *
  * Usage: build an sf0.4-shaped dir of symlinks to the sf0.1 testdata
  * (ScaledFixtures keys the multiplier off the dir NAME), then
  *   SPARK_GRAFT_SCALE_DIRS=/root/testdata/sf0.1,/tmp/sfscale/sf0.4 \
  *     sbt "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {
  private val Probes = sys.env.get("SPARK_GRAFT_SCALE_PROBES")
    .map(_.split(",").toSeq)
    .getOrElse(Seq(
      "dedup_minhash_lsh", "dedup_clusters", "dedup_embedding_cosine",
      "text_quality", "pack_sequences", "sim_ivf", "mm_image_dedup_check"))

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIRS",
      "/root/testdata/sf0.1").split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.memory", "32g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val scaled = graft.queries.ScaledFixtures.ensure(spark, dir)
      val nDocs = spark.read.parquet(s"$scaled/documents.parquet").count()
      println(s"[scale] $dir -> $scaled ($nDocs docs)")
      for (name <- Probes ++ args) {
        val t0 = System.nanoTime()
        // materialize through the noop sink exactly like Bench: count()
        // lets Catalyst PRUNE projected expressions, so a pure-projection
        // probe (e.g. text_quality) would time only the parquet scan
        val df = graft.SparkEntry.queries(name)(spark, scaled)
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[scale] ${new java.io.File(dir).getName}%-8s $name%-24s $t%8.1f s")
      }
    }
    spark.stop()
  }
}
