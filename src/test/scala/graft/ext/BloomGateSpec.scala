package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every inserted string probes true") {
    val members = (0 until 5000).map(i => s"member shingle $i")
    val df = members.toDF("s")
    val bf = BloomGate.build(spark, df, "s", expected = 5000)
    val passed = df.filter(BloomGate.mightContain(col("s"), bf)).count()
    assert(passed == 5000L, "Bloom must pass every true member")
  }

  test("false-positive rate on disjoint probes is near the built fpp") {
    val members = (0 until 20000).map(i => s"in $i")
    val bf = BloomGate.build(spark, members.toDF("s"), "s",
      expected = 20000, fpp = 0.01)
    val probes = (0 until 20000).map(i => s"out $i").toDF("s")
    val fp = probes.filter(BloomGate.mightContain(col("s"), bf)).count()
    // deterministic given the fixed strings; 5x headroom on the target
    assert(fp <= 20000 * 0.05, s"fp=$fp too high for fpp=0.01")
  }

  test("interpreted eval agrees with codegen") {
    val members = (0 until 100).map(i => s"m $i")
    val bf = BloomGate.build(spark, members.toDF("s"), "s", expected = 100)
    val mixed = ((0 until 100).map(i => s"m $i") ++
      (0 until 100).map(i => s"x $i")).toDF("s")
    val viaExpr = mixed.filter(BloomGate.mightContain(col("s"), bf))
      .as[String].collect().toSet
    val local = bf.value
    val viaDirect = mixed.as[String].collect()
      .filter(s => local.mightContainBinary(s.getBytes("UTF-8"))).toSet
    assert(viaExpr == viaDirect)
  }

  test("text_contamination_bloom output == text_contamination (sf0.001)") {
    val plain = graft.SparkEntry.queries("text_contamination")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val bloom = graft.SparkEntry.queries("text_contamination_bloom")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    assert(plain.nonEmpty, "fixture must produce contaminated docs")
    assert(bloom == plain, "Bloom prefilter must not change the exact result")
  }
}
