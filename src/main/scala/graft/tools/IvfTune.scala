package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: sweep IVF (nlist, nprobe) at the scaled corpus to pick
  * the default configuration (recall@5 >= 0.9 at < brute-force time).
  * Run: sbt "runMain graft.tools.IvfTune" (SPARK_GRAFT_SF_DIR selects sf).
  */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaled = graft.queries.ScaledFixtures.ensure(spark, sfDir)
    val e = spark.read.parquet(s"$scaled/embeddings.parquet").cache()
    val n = e.count()
    println(s"[ivf] corpus n=$n")
    val queries = e.filter(col("vec_id") < 10)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val bruteDf = graft.ext.Similarity.bruteTopK(e, queries, "vec_id", "embedding", k = 5).cache()
    val (brute, tBrute) = timed { bruteDf.count() }
    println(f"[ivf] brute ground truth: $brute rows in $tBrute%6.2f s")

    val nlists = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(8, 64, math.sqrt(n.toDouble).round.toInt, 1024))
    val maxIter = sys.env.getOrElse("IVF_MAXITER", "20").toInt
    val initMode = sys.env.getOrElse("IVF_INIT", "k-means||")
    val perList = sys.env.getOrElse("IVF_TRAIN_PER_LIST", "256").toInt
    println(s"[ivf] maxIter=$maxIter initMode=$initMode trainPerList=$perList")
    for (nlist <- nlists) {
      val (idx, tBuild) = timed {
        val i = graft.ext.IvfIndex.build(spark, e, "vec_id", "embedding", nlist = nlist,
          maxIter = maxIter, initMode = initMode, trainPerList = perList)
        i.assigned.cache().count()
        i
      }
      for (nprobe <- Seq(1, 2, 4, 8, 16, 32, 64).filter(_ <= nlist)) {
        val (res, tQuery) = timed {
          graft.ext.IvfIndex.topK(spark, idx, queries, "vec_id", "embedding",
            k = 5, nprobe = nprobe).cache()
        }
        res.count()
        val rec = graft.ext.Similarity.recallAtK(bruteDf, res, 5)
          .agg(avg(col("recall_at_5"))).first().getDouble(0)
        println(f"[ivf] nlist=$nlist%5d nprobe=$nprobe%3d  build=$tBuild%6.2f s  query=$tQuery%6.2f s  recall@5=$rec%.3f  frac=${nprobe.toDouble / nlist}%.3f")
        res.unpersist()
      }
      idx.assigned.unpersist()
    }
    spark.stop()
  }
}
