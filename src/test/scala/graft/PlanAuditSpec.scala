package graft

/** Engine-wide plan hygiene: build every SparkEntry query's physical plan
  * at sf0.001 and reject accidental Cartesian products / nested-loop
  * joins — the plans that stop scaling first. Queries whose SEMANTICS are
  * all-pairs (exact greedy dedup, brute-force ANN baseline, the composed
  * reference pipeline that contains the greedy stage) are allowed. */
class PlanAuditSpec extends SparkSpec {

  private val allowAllPairs = Set(
    "q36_dedup_greedy",     // reference-exact greedy: distributed all-pairs ratio
    "q38_knn_brute",        // brute-force baseline: corpus × broadcast probes
    "q40_knn_lsh",          // embeds the q38 baseline for its recall_at_k column
    "q56_knn_ivf",          // same recall baseline
    "q81_knn_sq8",          // quantized first pass scans codes × broadcast probes
    "q50_news_pipeline",    // composes the greedy dedup stage
    "q119_kmeans_step",     // Lloyd assignment IS corpus × broadcast centroids (k rows)
    "q121_ann_recall_audit", // composes the q38 ground truth + q40/q56/q81 baselines
    "q132_nmf_step",        // NMF init fans docs × k topics (k-row broadcast)
    "q134_semdedup",        // composes the q119 Lloyd assignment stage
    "q226_news_pipeline_gate", // composes the q119 Lloyd assignment stage
    "q233_cluster_nmi",     // composes the q119 Lloyd assignment stage
    "q234_cluster_ari",     // composes the q119 Lloyd assignment stage
    "q137_knn_pq",          // ADC scan: codes × broadcast probes (q38 contract)
    "q153_kcenter",         // Gonzalez coverage IS corpus × broadcast centers (k rows)
    "q157_silhouette",      // a/b distances ARE corpus × broadcast centroids (k rows)
    "q166_knn_binary",      // Hamming scan: codes × broadcast probes (q38 contract)
    "q165_retrieval_metrics", // composes the q166 scan + the q38 ground truth
    "q251_semantic_decontamination", // train scan × broadcast eval holdout (benchmark-sized by construction)
    "q259_knn_shapley",     // valuation scan: train corpus × broadcast probes (q38 contract)
    "q266_embedding_outliers", // composes the q119 Lloyd assignment stage
    "q271_facility_location", // coverage gains ARE corpus × broadcast pool (q153 class)
    "q272_blocking_recall", // recall audit IS all-pairs by semantics (q36/q121 class)
    "q274_dim_budget",      // prefix-dim scan: corpus × broadcast probes (q38 contract)
    "q277_cluster_labels",  // composes the q119 Lloyd assignment stage
    "q282_mmr_rerank",      // candidate generation: corpus × broadcast probes (q38 contract)
    "q308_wasserstein",     // CDF grid: token-count support × broadcast sources, both census-bounded
    "q315_cramer_von_mises", // same CDF grid as q308
    "q319_burrows_delta",   // stopword × broadcast sources grid, both bounded
    "q322_nn_descent_gate", // embeds the q38 exact baseline for its oracled recall column
    "q323_knn_graph")       // embeds the q38 baseline for recall_at_k (q40 contract)

  test("no query plans an accidental cartesian / nested-loop join") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (allowAllPairs(name)) None
      else {
        val plan = fn(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    }
    assert(bad.isEmpty, s"unexpected all-pairs plans: ${bad.mkString(", ")}")
  }
}
