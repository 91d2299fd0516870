package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Tables

class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming tumbling counts equal the batch form") {
    val batch = CdcStream.tumblingCountsBatch(Tables.loadEvents(spark, TestSpark.Sf))
    val stream = CdcStream.runTumblingCounts(spark, TestSpark.Sf, "t_counts_spec")
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("streaming session windows equal the batch form") {
    val batch = CdcStream.sessionizeBatch(Tables.loadEvents(spark, TestSpark.Sf))
    val stream = CdcStream.runSessionize(spark, TestSpark.Sf, "t_sessions_spec")
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("stream-stream attribution join equals the batch form") {
    val batch = CdcStream.attributionJoinBatch(Tables.loadEvents(spark, TestSpark.Sf))
    val stream = CdcStream.runAttributionJoin(spark, TestSpark.Sf, "t_attrib_spec")
    assert(stream.count() == batch.count() && batch.count() > 0)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }
}
