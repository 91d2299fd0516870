package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every declared query
  * on SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  * Queries are fully materialized via the noop sink — `count()` would let
  * Catalyst prune projections and skip most of the work being measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/scan paths before timing: without this the
    // alphabetically-first query absorbs several seconds of one-time
    // session setup and the per-query numbers misattribute it
    try graft.core.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // documents/embeddings-only queries run against the sf-scaled corpus
    // (~50k docs at sf0.1) so the dedup/text/ANN numbers measure data,
    // not fixed overhead; materialization happens ONCE here, outside any
    // per-query timing. Correctness (Verify) still runs the raw fixtures.
    val scaledDir =
      try graft.queries.ScaledFixtures.ensure(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] fixture scaling failed, using raw: ${e.getMessage}")
        sfDir
      }
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val dir = if (graft.queries.ScaledFixtures.appliesTo(name)) scaledDir else sfDir
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failures += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fails = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    // report the scale the docs/emb queries actually ran at: 1 when
    // scaling fell back to the raw fixtures, so a fallback run can't be
    // mistaken for a scaled one in round-over-round comparisons
    val docsScale =
      if (scaledDir == sfDir) 1 else graft.queries.ScaledFixtures.multiplier(sfDir)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fails,"docs_scale":$docsScale,"sf":"$sfDir"}""")
    spark.stop()
  }
}
