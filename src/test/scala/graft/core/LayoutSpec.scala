package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.Fixture

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("range-sorted layout: disjoint key ranges per file enable min/max pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val e = Fixture.external(spark, TestSpark.Sf)
    Layout.writeSorted(e, dir, Seq("l_orderkey"), numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == e.count())
    // per-file key ranges must be (nearly) disjoint: collect (file, min, max)
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(lo2 >= hi1, s"file ranges overlap: $ranges") // range partitioner boundary
    }
    // a key-range filter must prune files at the scan
    val pruned = spark.read.parquet(dir).filter(col("l_orderkey") < ranges.head._2)
    assert(pruned.count() > 0)
  }

  test("crash safety: a half-written next version is invisible until the pointer moves") {
    val dir = java.nio.file.Files.createTempDirectory("graft_crash").toString
    val e = Fixture.external(spark, TestSpark.Sf)
    val i = Fixture.internal(spark, TestSpark.Sf)
    val r = Pipeline.warm(i, e, Fixture.Key, Fixture.DataCols)
    Pipeline.commitVersioned(r, dir)
    val v1Rows = Pipeline.readLatest(spark, dir, "snapshot").count()
    // simulate a crash mid-commit: v=2 data lands but VERSION is never moved
    r.newSnapshot.limit(10).write.parquet(s"$dir/snapshot/v=2")
    assert(Pipeline.currentVersion(dir).contains(1L))
    assert(Pipeline.readLatest(spark, dir, "snapshot").count() == v1Rows)
  }
}
