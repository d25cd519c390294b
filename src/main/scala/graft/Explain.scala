package graft

/** Plan auditor: prints the formatted physical plan of named queries so the
  * pushdown/broadcast/codegen story can be inspected (`runMain graft.Explain
  * q1_pricing_summary ...`; no args = a representative headline set). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.io.EngineSession.local(8, "ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
        "j1_sync_classify", "d4_array_object_table", "dedup_exact",
        "dedup_minhash_pairs", "ann_bruteforce_topk", "ann_ivf_topk",
        "ann_rp_topk", "s7_point_lookup", "st_sessionize", "st_click_purchase",
        "p2_profile_docs", "tx_top_ngrams", "samp_weighted", "bf_semi_prune",
        "sk_hll_rollup", "tx_drift", "tx_lm_perplexity", "dedup_incr_minhash",
        // NOTE: only fully-lazy queries belong in this default set — ones
        // whose fn collects driver-side model state (samp_length_decile,
        // emb_pca_top, dedup_incr_components, layout_zorder) would execute
        // real jobs from a plan-printing tool; name them explicitly if
        // that cost is intended
        "tx_lang_id_ngram", "samp_repeat_epochs",
        "ann_hamming_topk", "ann_hamming_band", "ann_pq_topk",
        "ann_sq_topk", "sk_cms_counts")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
