package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Structural plan audit over the WHOLE declared surface: no query may
  * plan a data-sized cartesian. A CartesianProduct (or an unlisted
  * BroadcastNestedLoopJoin) that slips into one of 120+ queries is
  * invisible at sf0.001 correctness scale and fatal at 100 TB — this
  * sweep pins the absence CLASS-wide instead of query-by-query.
  *
  * Two named exemption sets, both bounded by construction:
  *  - `tinyBroadcastCross`: plans that broadcast a CONSTANT-sized frame
  *    against the corpus (k centroids, a 1-row dangling-mass total, a
  *    merge-rank vocab, quantizer codebooks) — the explicit
  *    broadcast-against-tiny designs the plan-audit sections of
  *    PERFORMANCE.md record. Never data-sized.
  *  - `harnessStateMachines`: queries whose CONSTRUCTION drives a
  *    multi-wave state machine (ingest gates, persisted-index deltas,
  *    CDC replays); their returned frame is a state read and their
  *    internals are audited by their own specs — re-driving them here
  *    would re-run Verify, not add plan coverage.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tinyBroadcastCross = Set(
    "emb_centroids",          // k=8 centroid frame joined to every vector
    "dedup_semantic",         // constant-k cell centroids
    "dedup_semantic_md5",     // 6 deterministic axis cells
    "sim_ivf",                // nlist quantizer rows
    "sim_recall_ivf",         // same quantizer, recall twin
    "sim_recall_pq",          // PQ codebook (16x256 rows)
    "sim_pq_rerank",          // PQ codebook + ADC table
    "sim_pq_rerank_md5",      // same shape, sign-grid codebooks (oracle twin)
    "graph_pagerank",         // 1-row dangling-mass total per iteration
    "text_bpe_train",         // 1-row argmax merge per round
    "agg_distinct_hll",       // scalar lgK literal frame from Datasketches agg
    "text_contamination",     // probe-set broadcast (fixed benchmark set)
    "sim_decontaminate",      // fixed-size decontamination set
    "sim_topk_brute",         // brute-force ANN baseline: the bounded
                              // query set broadcast against the corpus
                              // is the DEFINITION of the operator
                              // (Similarity.bruteTopK requires it small)
    "sim_topk_int8",          // same baseline, int8-quantized scoring
    "sim_topk_native",        // same baseline through TopKPerGroup
    "sim_recall_lsh",         // recall pin: LSH results vs the same
                              // bounded brute-force ground truth
    "sim_recall_lsh_md5",     // axis-plane twin's recall: same bounded
                              // brute-force truth side (r11)
    "sim_recall_pq_md5")      // sign-grid PQ recall: same bounded
                              // brute-force truth side (r13)

  private val harnessStateMachines = Set(
    "corpus_ingest_e2e", "corpus_ingest_e2e_xx", "corpus_prep_e2e",
    "dedup_ingest_gate", "dedup_vec_ingest_gate", "dedup_vec_ingest_gate_md5",
    "dedup_substring_gate", "stream_lm_gate",
    "cdc_bucketed_apply", "cdc_bucketed_replay", "changelog_latest_compacted",
    "sim_ivf_persisted", "sim_ivf_delta", "sim_ivf_md5", "sim_recall_ivf_md5",
    "sim_ivf_persisted_md5", "sim_ivf_delta_md5",
    "dedup_substring_gate_xx",
    "text_idf_incremental", "group_tribe_stats_incremental",
    "diff_apply_scaled",
    "stream_tumbling_counts", "stream_sliding_counts", "stream_join_attrib",
    "sessionize_users", "dedup_incremental_lsh", "dedup_multimodal")

  test("no declared query plans a data-sized cartesian or unlisted nested-loop join") {
    val names = Catalog.queries.keys.toSeq.sorted.filterNot(harnessStateMachines)
    // operator markers a REAL audited plan carries; a body that ends in
    // .localCheckpoint(true) erases them all, leaving a bare ExistingRDD
    // scan — which also means this sweep's cartesian check is vacuous for
    // that query (the r12 DSIR entries did exactly that, ADVICE r12)
    val realWork = Seq("Exchange", "Join", "Aggregate", "Scan parquet",
      "Project", "Filter", "Sort", "Window", "Generate")
    val offenders = names.flatMap { name =>
      val plan = Catalog.queries(name)(spark, TestSpark.Sf)
        .queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        Some(s"$name: CartesianProduct")
      else if (plan.contains("BroadcastNestedLoopJoin") && !tinyBroadcastCross(name))
        Some(s"$name: unlisted BroadcastNestedLoopJoin")
      else if (plan.contains("ExistingRDD") && !realWork.exists(plan.contains))
        // either drop the checkpoint or move the query to
        // harnessStateMachines with its own real-plan spec
        Some(s"$name: audit-vacuous checkpointed plan (bare RDDScan)")
      else None
    }
    assert(offenders.isEmpty,
      s"data-sized cartesian risk in: ${offenders.mkString("; ")}")
    assert(names.size > 90, s"audit swept only ${names.size} queries — skip list too broad?")
  }
}
