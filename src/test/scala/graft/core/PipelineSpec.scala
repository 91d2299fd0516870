package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.Fixture

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("warm pipeline: snapshot converges to external, changelog holds old rows") {
    val e = Fixture.external(spark, TestSpark.Sf)
    val i = Fixture.internal(spark, TestSpark.Sf)
    val r = Pipeline.warm(i, e, Fixture.Key, Fixture.DataCols)
    assert(r.newSnapshot.exceptAll(e).isEmpty && e.exceptAll(r.newSnapshot).isEmpty)
    // changelog rows are exactly the internal (pre-update) versions of changed keys
    val changedKeys = r.kinds.filter(col("kind") === "changed").select(Fixture.Key.map(col): _*)
    val expected = i.join(changedKeys, Fixture.Key, "left_semi")
    assert(r.changelog.exceptAll(expected).isEmpty && expected.exceptAll(r.changelog).isEmpty)
  }

  test("delete circuit breaker: maxDeletes=0 keeps phantom rows") {
    val e = Fixture.external(spark, TestSpark.Sf)
    val i = Fixture.internal(spark, TestSpark.Sf)
    val r = Pipeline.warm(i, e, Fixture.Key, Fixture.DataCols, maxDeletes = 0L)
    val phantoms = r.newSnapshot.filter(col("l_linenumber") > 100).count()
    assert(phantoms > 0, "phantom 'deleted' rows must survive when the breaker trips")
  }

  test("commit writes changelog, snapshot, state in order; state matches snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft_commit").toString
    val e = Fixture.external(spark, TestSpark.Sf)
    val i = Fixture.internal(spark, TestSpark.Sf)
    val r = Pipeline.warm(i, e, Fixture.Key, Fixture.DataCols)
    Pipeline.commit(r, dir)
    val snap = spark.read.parquet(s"$dir/snapshot")
    val state = spark.read.parquet(s"$dir/state")
    assert(snap.count() == e.count())
    assert(state.count() == e.count())
    assert(state.columns.toSet == (Fixture.Key :+ Diff.SigCol).toSet)
    // a second warm run from the committed state finds nothing to do
    val r2 = Pipeline.warm(snap, e, Fixture.Key, Fixture.DataCols)
    assert(r2.kinds.filter(col("kind") =!= "unchanged").count() == 0)
  }

  test("versioned commit: pointer advances, readers see the committed version") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vcommit").toString
    val e = Fixture.external(spark, TestSpark.Sf)
    val i = Fixture.internal(spark, TestSpark.Sf)
    val r = Pipeline.warm(i, e, Fixture.Key, Fixture.DataCols)
    assert(Pipeline.currentVersion(dir).isEmpty)
    assert(Pipeline.commitVersioned(r, dir) == 1L)
    assert(Pipeline.commitVersioned(r, dir) == 2L)
    assert(Pipeline.currentVersion(dir).contains(2L))
    assert(Pipeline.readLatest(spark, dir, "snapshot").count() == e.count())
    assert(Pipeline.readLatest(spark, dir, "state").count() == e.count())
    // changelog history readable with the v partition as version column;
    // orphan versions past the pointer are invisible
    val clog = Pipeline.readChangelog(spark, dir)
    assert(clog.count() == 2 * r.changelog.count())
    r.changelog.limit(5).write.mode("overwrite").parquet(s"$dir/changelog/v=9")
    assert(Pipeline.readChangelog(spark, dir).count() == 2 * r.changelog.count())
  }

  test("commitVersionedAt is idempotent: a replayed version is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idem").toString
    val e = Fixture.external(spark, TestSpark.Sf)
    val i = Fixture.internal(spark, TestSpark.Sf)
    val r = Pipeline.warm(i, e, Fixture.Key, Fixture.DataCols)
    assert(Pipeline.commitVersionedAt(r, dir, 1L) == 1L)
    assert(Pipeline.commitVersionedAt(r, dir, 1L) == 1L) // replay: no-op
    assert(Pipeline.currentVersion(dir).contains(1L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/snapshot/v=2")))
    r.release()
  }

  test("vacuum keeps the newest versions and time travel within the window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vacuum").toString
    val e = Fixture.external(spark, TestSpark.Sf)
    val i = Fixture.internal(spark, TestSpark.Sf)
    val r = Pipeline.warm(i, e, Fixture.Key, Fixture.DataCols)
    (1 to 3).foreach(_ => Pipeline.commitVersioned(r, dir))
    Pipeline.vacuum(dir, keepVersions = 2)
    assert(Pipeline.readVersion(spark, dir, "snapshot", 3).count() == e.count())
    assert(Pipeline.readVersion(spark, dir, "snapshot", 2).count() == e.count())
    intercept[Exception] { Pipeline.readVersion(spark, dir, "snapshot", 1).count() }
    // changelog reads only retained versions
    assert(Pipeline.readChangelog(spark, dir).select("v").distinct().count() == 2)
  }

  test("runParallel: all jobs run; first failure propagates") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    Pipeline.runParallel(spark, Seq(
      "a" -> (() => { spark.range(10).count(); counter.incrementAndGet(); () }),
      "b" -> (() => { spark.range(10).count(); counter.incrementAndGet(); () })))
    assert(counter.get() == 2)
    val ex = intercept[Exception] {
      Pipeline.runParallel(spark, Seq(
        "ok" -> (() => ()),
        "boom" -> (() => throw new RuntimeException("table failed"))))
    }
    assert(ex.getMessage.contains("table failed"))
  }

  test("commitCold fans one pass out to snapshot + state sinks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cold").toString
    val e = Fixture.external(spark, TestSpark.Sf)
    Pipeline.commitCold(e, Fixture.Key, Fixture.DataCols, dir)
    val snap = spark.read.parquet(s"$dir/snapshot")
    val state = spark.read.parquet(s"$dir/state")
    assert(snap.count() == e.count() && state.count() == e.count())
    assert(snap.columns.contains("score_overall"))
    // a warm run consumes the scored snapshot directly (deriveFetched
    // re-applies the score columns to incoming rows) and finds no changes
    val r = Pipeline.warm(snap, e, Fixture.Key, Fixture.DataCols,
      deriveFetched = df => Scores.withOverall(Scores.withScores(df)))
    assert(r.kinds.filter(col("kind") =!= "unchanged").count() == 0)
    assert(r.newSnapshot.columns.contains("score_overall"))
  }

  test("cold load emits scored snapshot + signature state") {
    val e = Fixture.external(spark, TestSpark.Sf)
    val (scored, state) = Pipeline.cold(e, Fixture.Key, Fixture.DataCols)
    assert(scored.columns.contains("score_overall"))
    assert(state.columns.toSet == (Fixture.Key :+ Diff.SigCol).toSet)
    assert(state.count() == e.count())
  }
}
