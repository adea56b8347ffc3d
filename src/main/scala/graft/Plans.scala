package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the formatted physical plan of named harness
  * queries (default: the flagship set). Used to keep PLANS.md honest —
  * run `sbt "runMain graft.Plans [names...]"` after touching an
  * operator and check the shuffle/broadcast/pushdown shape still holds.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("w1_dedup_keep_latest", "q5_local_volume", "x1_asof_last_click",
        "llm_dedup_minhash_lsh", "llm_ngram_jaccard", "llm_ann_ivf",
        "q1_pricing_summary", "llm_dedup_keep_one", "llm_dedup_lsh_tightcap",
        "llm_dedup_incremental", "llm_budget_mix", "llm_substring_dedup",
        "llm_ngram_lm_score", "llm_global_shuffle", "llm_interleave",
        "llm_interleave_wide",
        "llm_curriculum", "llm_top_ngrams", "llm_dedup_keep_best",
        "llm_snapshot_delta", "llm_decontaminate_bloom",
        "k9_zorder_keys", "llm_ann_int8", "llm_temperature_mix",
        "llm_domain_blocklist", "llm_contamination_report",
        "llm_rrf_hybrid", "llm_dsir_weights", "llm_hard_negatives",
        "llm_triplets", "llm_bpe_pairs", "llm_bpe_encode",
        "llm_source_overlap",
        "llm_ann_rerank", "llm_rank_normalize", "llm_padding_stats",
        "llm_heavy_hitters", "llm_robust_outliers", "llm_ann_pq",
        "llm_ann_pq_indexed", "x13_sft_assembly", "x14_triangles",
        "x15_sft_pairs", "x16_join_blowup", "llm_e2e_web",
        "llm_fuzzy_linkage", "llm_inverted_index", "llm_char_entropy",
        "x1b_asof_next_view", "llm_shard_stats_merge",
        "llm_sketch_profile", "llm_hll_union", "llm_ann_ivfpq",
        "llm_cms_estimate")
    // GRAFT_PLANS_MODE=executed runs each query through the noop sink
    // first and prints the FINAL adaptive plan — the only form that
    // shows the WholeStageCodegen span markers (formatted/simple on an
    // unexecuted AQE plan print isFinalPlan=false without them) — the
    // codegen-coverage audit face. Any other value is passed to
    // explain() as-is (default formatted).
    val mode = sys.env.getOrElse("GRAFT_PLANS_MODE", "formatted")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (mode == "executed") {
        // collect() drives df's OWN QueryExecution (a noop write or
        // count() would plan a fresh one and leave this plan initial)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain(mode)
    }
    spark.stop()
  }
}
