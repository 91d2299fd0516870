package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def round9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("weights and log-odds match the closed form exactly on a hand-computed fixture") {
    val train = Seq((1L, "the a the", true), (2L, "el la el", false))
      .toDF("id", "text", "lab")
    val nb = TextClassifier.train(train, "id", "text", col("lab"))
    // cw: the(2,0) a(1,0) el(0,2) la(0,1); tp=tn=3, v=4 → denom 7
    def w(cp: Long, cn: Long) =
      round9(math.log((cp + 1.0) / 7.0) - math.log((cn + 1.0) / 7.0))
    val weights = nb.weights.collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(BigDecimal(weights("the")) == w(2, 0))   // +ln 3
    assert(BigDecimal(weights("a")) == w(1, 0))     // +ln 2
    assert(BigDecimal(weights("el")) == w(0, 2))    // −ln 3
    assert(BigDecimal(weights("la")) == w(0, 1))    // −ln 2
    assert(nb.bias == round9(0.0), "balanced priors → zero bias")
    // score "the el the": 3 vocab hits, 2·w(the) + w(el) = +ln 3
    val s = TextClassifier.score(nb, Seq((9L, "the el the")).toDF("id", "text"),
      "id", "text").head()
    assert(s.getLong(1) == 3L)
    val expected = (w(2, 0) * 2 + w(0, 2) + round9(0.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s.getDouble(2) == expected)
  }

  test("prior imbalance shifts every score by exactly the bias term") {
    val balanced = Seq((1L, "up x", true), (2L, "down y", false))
      .toDF("id", "text", "lab")
    val skewed = Seq((1L, "up x", true), (2L, "up x", true), (3L, "up x", true),
      (4L, "down y", false)).toDF("id", "text", "lab")
    val nbSkew = TextClassifier.train(skewed, "id", "text", col("lab"))
    assert(nbSkew.bias == round9(math.log(3.0)), "bias = ln(np/nn) = ln 3")
    assert(TextClassifier.train(balanced, "id", "text", col("lab")).bias == round9(0.0))
  }

  test("decimal score sums are partition-order independent") {
    val train = (1 to 400).map { i =>
      (i.toLong, if (i % 2 == 0) "good solid fine ok" else "bad worse awful no",
        i % 2 == 0)
    }.toDF("id", "text", "lab")
    val corpus = (1 to 300).map(i =>
      (1000L + i, if (i % 3 == 0) "good fine bad" else "awful no good")).toDF("id", "text")
    val nb = TextClassifier.train(train, "id", "text", col("lab"))
    def scores(df: org.apache.spark.sql.DataFrame) =
      TextClassifier.score(nb, df, "id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(scores(corpus.repartition(1)) == scores(corpus.repartition(17)),
      "DECIMAL(28,9) sums must not depend on partitioning")
  }

  test("the classifier separates English from Spanish on held-out langId labels") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val label = TextStats.langId(col("text")) === "en"
    val nb = TextClassifier.train(docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", label)
    val scored = TextClassifier.score(nb, docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text")
      .join(docs.select(col("doc_id"), label.cast("int").as("actual")), Seq("doc_id"))
      .select(((col("log_odds") > 0).cast("int") === col("actual")).cast("long").as("ok"))
      .agg(avg("ok")).head().getDouble(0)
    // stopword-driven labels make this nearly separable; anything below
    // 0.9 means the weights aren't learning the vocabulary signal
    assert(scored >= 0.9, s"held-out accuracy $scored < 0.9")
  }

  test("training requires both classes") {
    val onePos = Seq((1L, "a b", true), (2L, "c d", true)).toDF("id", "text", "lab")
    val e = intercept[IllegalArgumentException] {
      TextClassifier.train(onePos, "id", "text", col("lab"))
    }
    assert(e.getMessage.contains("both classes"))
  }
}
