package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ScoresSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("score_stats formula matches hand computation") {
    // (l_extendedprice + l_quantity*3) / pow(l_orderkey+1, 0.25)
    val df = Seq((15L, 100L, 10L, 1, 2.0, 100.0, 0.1, 0.2))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = Scores.withScores(df).select("score_stats").first().getDouble(0)
    val want = (100.0 + 2.0 * 3) / math.pow(16.0, 0.25)
    assert(math.abs(got - want) < 1e-12)
  }

  test("score_overall is the weighted sum of the five scores") {
    val df = Seq((0L, 0L, 0L, 1, 1.0, 1.0, 0.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val row = Scores.withOverall(Scores.withScores(df))
      .select("score_stats", "score_shaman", "score_survivor", "score_racing",
        "score_defilante", "score_overall").first()
    val want = Scores.OverallWeights.zipWithIndex
      .map { case ((_, w), i) => row.getDouble(i) / w }.sum
    assert(math.abs(row.getDouble(5) - want) < 1e-12)
  }

  test("name normalization edge cases (reference download.py:548-555)") {
    val df = Seq("plain", "has#tag", "#", "", "end#").toDF("name")
    val got = df.select(Scores.normalizeName(col("name"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("plain#0000", "has#tag", "#", "#0000", "end#"))
  }
}
