package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every oracle key has a query") {
    assert(Catalog.oracles.keySet.subsetOf(Catalog.queries.keySet))
  }

  test("entry names are unique") {
    assert(Catalog.entries.map(_.name).distinct.size == Catalog.entries.size)
  }

  test("flagship entry returns the four diff kinds") {
    val kinds = graft.SparkEntry.entry(spark).collect().map(_.getString(0)).toSet
    assert(kinds == Set("changed", "deleted", "new", "unchanged"))
  }

  test("every declared query analyzes against the current fixtures") {
    // The r6 regression: the driver regenerated events.parquet with a new
    // physical type and 8 declared queries silently threw AnalysisException
    // — nothing in `sbt test` exercised the whole declared surface. This
    // sweep forces construction + analysis (no execution) of every entry at
    // sf0.001, so a fixture/env change turns `sbt test` red immediately.
    // Eagerly-materializing harness entries (streaming state machines,
    // versioned commits) are skipped here: they run real pipelines when
    // invoked and have their own dedicated specs.
    val eager = Set("cdc_bucketed_apply", "changelog_latest_compacted",
      "dedup_ingest_gate", "dedup_vec_ingest_gate", "dedup_incremental_lsh",
      "dedup_substring_gate", "sim_ivf_persisted", "sim_ivf_delta",
      "text_idf_incremental", "diff_apply_scaled", "stream_lm_gate")
    val failures = Catalog.entries.filterNot(e => eager(e.name)).flatMap { e =>
      try { e.q(spark, graft.TestSpark.Sf).queryExecution.analyzed; None }
      catch { case ex: Exception => Some(s"${e.name}: ${ex.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, s"queries failing analysis:\n${failures.mkString("\n")}")
  }

  test("plan shapes: filters push to the parquet scan, projections prune ReadSchema") {
    // the scan-efficiency claims PERFORMANCE.md makes, pinned as
    // assertions: a selective predicate must reach PushedFilters (row
    // groups skipped at the source), and a narrow projection must shrink
    // ReadSchema (columns never read) — on the REAL declared queries
    val fik = Catalog.queries("filter_in_keys")(spark, graft.TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(fik.contains("PushedFilters: [In(o_custkey"),
      s"filter_in_keys must push its IN predicate to the scan:\n${fik.take(1500)}")
    val pc = Catalog.queries("project_columns")(spark, graft.TestSpark.Sf)
      .queryExecution.executedPlan.toString
    val readSchema = pc.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      s"project_columns must prune unread columns from ReadSchema: $readSchema")
  }
}
