package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Tables

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals plain join (inner and left)") {
    val li = Tables.load(spark, TestSpark.Sf, "lineitem")
    val ps = Tables.load(spark, TestSpark.Sf, "part")
      .selectExpr("p_partkey AS l_partkey", "p_name")
    for (jt <- Seq("inner", "left")) {
      val plain = li.join(ps, Seq("l_partkey"), jt)
      val salted = Skew.saltedJoin(li, ps, Seq("l_partkey"), salts = 7, joinType = jt)
      assert(salted.count() == plain.count(), jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty, jt)
    }
  }

  test("hot-key salted join equals plain join; only hot keys fan out") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one mega-key (90% of rows) + a uniform tail — the shape that pins a task
    val large = ((1 to 9000).map(i => (42L, s"v$i")) ++
      (1 to 1000).map(i => (i.toLong % 50, s"w$i"))).toDF("k", "payload")
    val small = (0L to 60L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val hot = Seq(Tuple1(42L)).toDF("k")
    for (jt <- Seq("inner", "left")) {
      val plain = large.join(small, Seq("k"), jt)
      val salted = Skew.saltedJoinHot(large, small, Seq("k"), hot, salts = 8, joinType = jt)
      assert(salted.count() == plain.count(), jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty, jt)
    }
    // the hot key's rows really spread: distinct salts > 1 for k=42,
    // exactly 1 for every cold key
    val saltsSeen = large
      .withColumn("__salt", pmod(xxhash64(large.columns.map(col): _*), lit(8)).cast("int"))
      .filter(col("k") === 42L).select("__salt").distinct().count()
    assert(saltsSeen > 1)
  }

  test("autoSaltJoin: skewed input detects + salts, uniform input takes the plain join") {
    import spark.implicits._
    val skewed = ((1 to 9000).map(i => (42L, i)) ++
      (1 to 1000).map(i => (i.toLong % 50, i))).toDF("k", "x")
    val uniform = (1 to 5000).map(i => (i.toLong % 500, i)).toDF("k", "x")
    val small = (0L to 500L).map(k => (k, s"dim$k")).toDF("k", "dim")
    for (large <- Seq(skewed, uniform)) {
      val plain = large.join(small, Seq("k"), "inner")
      val auto = Skew.autoSaltJoin(large, small, Seq("k"), salts = 8)
      assert(auto.count() == plain.count())
      assert(auto.exceptAll(plain).isEmpty && plain.exceptAll(auto).isEmpty)
    }
  }
}
