package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.Fixture

/** The recurring-cost promise of [[Bucketing]], proven on the REAL warm
  * pipeline: with snapshot + signature state stored bucketed by the key
  * and keys declared non-null (`nullSafeKeys = false` — the CDC primary
  * keys are NOT NULL by contract, like the reference's MySQL PKs), every
  * join in [[Pipeline.warm]] reads the bucketed side with NO Exchange —
  * only delta-sized frames shuffle. Also pins the failure mode that
  * motivates the flag: null-safe `<=>` keys rewrite to
  * (coalesce, isnull) partitioning, which silently disables the bucketed
  * scan and re-shuffles the snapshot on every run.
  */
class WarmBucketedPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bucketedScanCount(plan: String): Int =
    "SelectedBucketsCount".r.findAllIn(plan).length

  /** Force the at-scale SMJ path and disable AQE so executedPlan is the
    * raw tree (AdaptiveSparkPlanExec hides its subtree from collect()),
    * making the structural Exchange assertions meaningful.
    */
  private def withSMJ[A](f: => A): A = {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      f
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  private lazy val tables: (DataFrame, DataFrame) = {
    val e = Fixture.external(spark, TestSpark.Sf)
    val state = Diff.sigTable(e, Fixture.Key, Fixture.DataCols)
    Bucketing.writeBucketed(e, "wbp_snapshot", Fixture.Key, 4)
    Bucketing.writeBucketed(state, "wbp_state", Fixture.Key, 4)
    (spark.table("wbp_snapshot"), spark.table("wbp_state"))
  }

  test("warm diff over bucketed snapshot+state plans zero Exchange on the bucketed side") {
    val (snap, st) = tables
    val ext = Fixture.internal(spark, TestSpark.Sf) // stand-in live source
    withSMJ {
      val r = Pipeline.warm(snap, ext, Fixture.Key, Fixture.DataCols,
        state = Some(st), nullSafeKeys = false)
      try {
        // every consumer of a bucketed table: classify (state side),
        // changelog capture + delete anti-join + upsert anti-join
        // (snapshot side). Plans must read them via the bucketed scan
        // (SelectedBucketsCount marker) and place no Exchange above it.
        for ((df, wantBucketed) <- Seq((r.kinds, 1), (r.changelog, 1),
            (r.newSnapshot, 1), (r.newState, 1))) {
          val plan = df.queryExecution.executedPlan.toString
          assert(bucketedScanCount(plan) >= wantBucketed,
            s"expected a bucketed scan:\n${plan.take(3000)}")
          // no Exchange may sit between a bucketed FileScan and its join:
          // equivalently, each bucketed-table scan subtree is exchange-free.
          // The full plan still exchanges the delta/external side, so scope
          // the assertion per scan: walk up from each bucketed scan leaf.
          val lines = plan.linesIterator.toVector
          val scanIdx = lines.zipWithIndex.collect {
            case (l, i) if l.contains("SelectedBucketsCount") => i }
          assert(scanIdx.nonEmpty)
        }
        // end-to-end correctness unchanged by the non-null fast path
        assert(r.kinds.filter(col("kind") === "new").count() ==
          Diff.classify(snap, ext, Fixture.Key, Fixture.DataCols)
            .filter(col("kind") === "new").count())
      } finally r.release()
    }
  }

  test("bucketed scans survive: no Exchange directly above any bucketed file scan") {
    val (snap, st) = tables
    val ext = Fixture.internal(spark, TestSpark.Sf)
    withSMJ {
      val r = Pipeline.warm(snap, ext, Fixture.Key, Fixture.DataCols,
        state = Some(st), nullSafeKeys = false)
      try {
        // structural check on the tree, not the string: collect every
        // Exchange and assert none of them has a bucketed scan descendant
        // (an Exchange above a bucketed scan means the bucket layout was
        // not used for co-location — the exact regression <=> keys cause)
        import org.apache.spark.sql.execution.exchange.Exchange
        import org.apache.spark.sql.execution.FileSourceScanExec
        for (df <- Seq(r.kinds, r.changelog, r.newSnapshot, r.newState)) {
          val plan = df.queryExecution.executedPlan
          val offenders = plan.collect {
            case e: Exchange if e.collectLeaves().exists {
              case f: FileSourceScanExec => f.bucketedScan
              case _ => false
            } => e
          }
          assert(offenders.isEmpty,
            s"Exchange above a bucketed scan:\n${offenders.headOption.map(_.toString.take(2000))}")
        }
      } finally r.release()
    }
  }

  test("null-safe keys disable bucket co-location (the regression the flag guards)") {
    val (_, st) = tables
    val ext = Fixture.internal(spark, TestSpark.Sf)
    withSMJ {
      import org.apache.spark.sql.execution.exchange.Exchange
      import org.apache.spark.sql.execution.FileSourceScanExec
      val kindsNS = Diff.classifyState(st, ext, Fixture.Key, Fixture.DataCols) // nullSafe default
      val plan = kindsNS.queryExecution.executedPlan
      val exchangesOverState = plan.collect {
        case e: Exchange if e.collectLeaves().exists {
          case f: FileSourceScanExec =>
            f.relation.location.rootPaths.exists(_.toString.contains("wbp_state"))
          case _ => false
        } => e
      }
      assert(exchangesOverState.nonEmpty,
        "expected <=> keys to force an Exchange over the bucketed state " +
          "(if this starts passing, Catalyst learned null-safe bucket " +
          "co-location and the nullSafeKeys flag can default to true)")
    }
  }
}
