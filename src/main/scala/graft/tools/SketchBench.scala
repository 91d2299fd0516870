package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev benchmark: native sketch expressions vs their relational plans on
  * a synthetic corpus large enough that fixed overhead is noise.
  */
object SketchBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ~40-word synthetic docs, deterministic
    val docs = spark.range(nDocs).selectExpr("id",
      """concat_ws(' ', transform(sequence(0, 39),
        |  i -> concat('w', pmod(hash(id, i), 5000)))) AS text""".stripMargin)
      .persist()
    docs.count()
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[sketch] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    // native expression: map-side only
    timed("minhash_native") {
      docs.select(graft.functions.text.minhash_sig(col("text"), 3, 8).as("mh"))
        .filter(col("mh").isNotNull).count()
    }
    // relational form: explode shingles -> 8 salted md5 minima
    timed("minhash_explode") {
      val tok = docs.select(col("id"), split(col("text"), " ").as("ws"))
      val sh = tok.filter(size(col("ws")) >= 3)
        .select(col("id"), explode(expr(
          "transform(sequence(1, size(ws) - 2), __i -> " +
            "concat_ws(' ', element_at(ws, __i), element_at(ws, __i + 1), element_at(ws, __i + 2)))"))
          .as("sh"))
      val aggs = (0 until 8).map(i =>
        min(md5(concat(lit(s"$i|"), col("sh")))).as(s"m$i"))
      sh.groupBy("id").agg(aggs.head, aggs.tail: _*).count()
    }
    timed("simhash_native") {
      docs.select(graft.functions.text.simhash64(col("text")).as("sh")).count()
    }
    timed("simhash_explode") {
      docs.select(col("id"), explode(split(col("text"), " ")).as("w"))
        .select(col("id"), xxhash64(col("w")).as("h"),
          explode(sequence(lit(0), lit(63))).as("b"))
        .groupBy("id", "b")
        .agg(sum(when(expr("(shiftright(h, b) & 1) = 1"), 1L).otherwise(-1L)).as("s"))
        .groupBy("id")
        .agg(sum(when(col("s") > 0, expr("shiftleft(1L, b)")).otherwise(0L)).as("sim"))
        .count()
    }
    spark.stop()
  }
}
