package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minDf: Int = 3) =
    LineDedup.dropBoilerplate(rows.toDF("id", "text"), "id", "text", minDf)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("planted boilerplate vanishes, unique content survives in order") {
    val hdr = "== site header =="
    val docs = (1L to 5L).map(i => (i, s"$hdr\nunique first $i\nunique second $i"))
    val out = run(docs)
    assert(out.forall { case (_, nl, nd, _) => nl == 3 && nd == 1 })
    out.foreach { case (i, _, _, clean) =>
      assert(clean == s"unique first $i\nunique second $i")
    }
  }

  test("a fully-boilerplate document stays as an empty row") {
    val docs = (1L to 4L).map(i => (i, "repeated line")) :+ (9L, "repeated line\nkeep me")
    val out = run(docs)
    assert(out.length == 5, "removal must never drop the document row")
    assert(out.filter(_._1 <= 4).forall { case (_, nl, nd, clean) =>
      nl == 1 && nd == 1 && clean == "" })
    assert(out.find(_._1 == 9L).get._4 == "keep me")
  }

  test("line identity is the TRIMMED content; whitespace-only lines are layout") {
    // "  nav  " and "nav" are the same boilerplate line; the blank line
    // is never counted toward df and never dropped
    val docs = Seq(
      (1L, "  nav  \n\nbody one"),
      (2L, "nav\n\nbody two"),
      (3L, "nav \n\nbody three"))
    val out = run(docs, minDf = 3)
    assert(out.forall(_._3 == 1), "only the nav line drops")
    assert(out.map(_._4).toSeq == Seq("\nbody one", "\nbody two", "\nbody three"),
      "the blank layout line must survive reassembly")
  }

  test("below-threshold repeats survive; within-doc repeats count once") {
    // the same line twice in ONE doc is df=1 (distinct docs), not df=2
    val docs = Seq((1L, "chorus\nchorus\nverse"), (2L, "solo"))
    val out = run(docs, minDf = 2)
    assert(out.find(_._1 == 1L).get._4 == "chorus\nchorus\nverse")
  }

  test("partition-order independent") {
    val docs = (1L to 40L).map(i =>
      (i, s"== header ==\ncontent $i\n-- footer --"))
    val df = docs.toDF("id", "text")
    def go(d: org.apache.spark.sql.DataFrame) =
      LineDedup.dropBoilerplate(d, "id", "text", 3)
        .orderBy("id").collect().map(_.toSeq).toSeq
    assert(go(df.repartition(1)) == go(df.repartition(13)))
  }

  test("xxhash production mode equals the md5 oracle mode on the fixture") {
    // the key is engine-internal either way; absent collisions the two
    // modes must agree on every drop decision (the substring family's
    // mode-parity discipline)
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id").as("id"),
        concat_ws("\n", concat(lit("== "), col("source"), lit(" ==")),
          col("text")).as("text"))
    val md5Out = LineDedup.dropBoilerplate(docs, "id", "text", minDf = 3)
      .orderBy("id").collect().toSeq
    val xxOut = LineDedup.dropBoilerplate(docs, "id", "text", minDf = 3,
        md5Mode = false)
      .orderBy("id").collect().toSeq
    assert(md5Out == xxOut)
  }

  test("plan shape: no windows, no cartesians — aggregations and an anti join only") {
    val df = (1L to 20L).map(i => (i, s"h\nc $i")).toDF("id", "text")
    val plan = LineDedup.dropBoilerplate(df, "id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "reassembly must be an aggregation, not a window")
    assert(!plan.contains("CartesianProduct"))
  }
}
