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
}
