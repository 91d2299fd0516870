package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.Fixture

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-bucketed state join plans without Exchange") {
    val e = Fixture.external(spark, TestSpark.Sf)
    val state = e.select(Fixture.Key.map(col) :+
      Signatures.md5Sig(Fixture.DataCols.map(col)).as("sig"): _*)
    Bucketing.writeBucketed(e, "b_snapshot", Fixture.Key, 4)
    Bucketing.writeBucketed(state, "b_state", Fixture.Key, 4)

    // at sf0.001 the planner would broadcast instead; force the SMJ path
    // the plan takes at scale, where bucket co-location must kick in
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "b_snapshot", "b_state", Fixture.Key)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == e.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("non-bucketed equivalent does shuffle (sanity of the assertion above)") {
    val e = Fixture.external(spark, TestSpark.Sf)
    val state = e.select(Fixture.Key.map(col) :+
      Signatures.md5Sig(Fixture.DataCols.map(col)).as("sig"): _*)
    val plan = e.join(state, Fixture.Key).queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"))
  }
}
