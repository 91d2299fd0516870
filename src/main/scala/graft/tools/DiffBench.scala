package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev benchmark: the CDC diff algebra at synthetic scale (default 10M
  * keys, ~1% changed / 0.5% new / 0.5% deleted) — validates that diff
  * cost scales with rows, not with fixture-specific shapes, and gives a
  * rows/s figure comparable to BASELINE.md's 150k rows/s single-core
  * reference number.
  */
object DiffBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Diff
    val key = Seq("id")
    val cols = Seq("a", "b")
    // internal: ids 0..n-1 (minus the "new" tail); external: perturbed
    val internal = spark.range(n).selectExpr("id",
      "hash(id, 1) AS a", "hash(id, 2) AS b")
      .filter(col("id") % 200 =!= 0) // 0.5% of keys exist only externally -> new
      .persist()
    val external = spark.range(n).selectExpr("id",
      "CASE WHEN id % 100 = 1 THEN hash(id, 99) ELSE hash(id, 1) END AS a", // 1% changed
      "hash(id, 2) AS b")
      .filter(col("id") % 200 =!= 3) // 0.5% of internal keys vanish -> deleted
      .persist()
    internal.count(); external.count()
    def timed(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[diff] $label%-12s $s%7.2f s  (${(n / s / 1e6)}%.1f M keys/s)  -> $r")
    }
    timed("classify") {
      Diff.classify(internal, external, key, cols)
        .groupBy("kind").count().collect().toSeq.sortBy(_.toString)
    }
    timed("diffApply") {
      Diff.diffApply(internal, external, key, cols).count()
    }
    spark.stop()
  }
}
