package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.Tables

class RulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scored = Tables.load(spark, TestSpark.Sf, "lineitem")
    .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  test("group-key filter is pushed below TopKPerGroup into the scan") {
    val top = TopK.perGroup(scored, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
    val filtered = top.filter(col("l_suppkey") === 3)
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(l_suppkey), EqualTo(l_suppkey,3)]"),
      physical) // reached the parquet scan => it sank through TopKPerGroup
    // and results equal filtering the input first
    val expected = TopK.perGroup(scored.filter(col("l_suppkey") === 3), Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
    assert(filtered.exceptAll(expected).isEmpty && expected.exceptAll(filtered).isEmpty)
  }

  test("nondeterministic predicates are not pushed") {
    val top = TopK.perGroup(scored, Seq("l_suppkey"), Seq(("l_extendedprice", false)), 3)
    val filtered = top.filter(rand(42) < 0.99)
    val physical = filtered.queryExecution.executedPlan.toString
    // rand must evaluate ABOVE TopKPerGroup (sampling winners, not input);
    // plans print parents first, so the Filter's index must be smaller
    val topKIdx = physical.indexOf("TopKPerGroup")
    val randIdx = physical.indexOf("rand(")
    assert(randIdx >= 0 && topKIdx > randIdx,
      s"rand filter must stay above the operator:\n$physical")
  }

  test("non-group filters stay above the operator") {
    val top = TopK.perGroup(scored, Seq("l_suppkey"), Seq(("l_extendedprice", false)), 3)
    val filtered = top.filter(col("l_extendedprice") > 1000.0)
    val physical = filtered.queryExecution.executedPlan.toString
    // the price filter must NOT reach the scan (it would change which rows win)
    assert(!physical.contains("GreaterThan(l_extendedprice,1000.0)]"), physical)
  }

  test("GraftExtensions wires strategy, rule, and SQL functions at session build") {
    spark.version // ensure an active session exists for the probe
    val checks = org.apache.spark.sql.graft.ExtensionProbe.probe(new graft.GraftExtensions)
    assert(checks("strategy") && checks("rule") && checks("functions"))
  }

  test("native kernels callable from SQL text") {
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "float_dot",
      exprs => org.apache.spark.sql.graft.FloatArrayDot(exprs(0), exprs(1)))
    Tables.load(spark, TestSpark.Sf, "embeddings").createOrReplaceTempView("emb_sql")
    val d = spark.sql(
      "SELECT float_dot(embedding, embedding) AS d FROM emb_sql WHERE vec_id = 0").first().getDouble(0)
    assert(d > 0.0)
  }

  test("text sketch kernels callable from SQL text") {
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "minhash_sig",
      exprs => org.apache.spark.sql.graft.MinHashSig(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]))
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "simhash64",
      exprs => org.apache.spark.sql.graft.SimHash64(exprs(0)))
    val r = spark.sql(
      """SELECT minhash_sig('the quick brown fox jumps over it', 3, 4) AS mh,
        |       simhash64('the quick brown fox') AS sh""".stripMargin).first()
    assert(r.getSeq[String](0).length == 4 && r.getSeq[String](0).forall(_.length == 32))
    assert(r.getLong(1) != 0L)
  }
}
