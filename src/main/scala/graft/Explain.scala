package graft

import graft.core.Sessions

/** Plan introspection CLI: prints the formatted physical plan for the
  * named queries (default: a representative set) so pushdown, broadcast
  * choices, and codegen spans can be audited quickly.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q03_shipping_priority",
        "q05_local_supplier_volume", "q06_forecast_revenue",
        "d05_minhash_lsh_dup", "d12_cosine_banded_lsh_dup",
        "s01_ann_brute_topk", "s06_ann_ivf_topk", "c01_corpus_build",
        "c04_incremental_dedup", "d14_bloom_membership", "d15_repeated_passages",
        "d17_containment_dup", "d18_hll_slice_merge", "s09_kmeans",
        "s10_pq_encode", "s11_pq_adc_topk", "s12_ivf_pq_topk",
        "t16_bm25_topk", "w08_quantile_sketch",
        "c05_incremental_containment", "c06_incremental_cosine_dedup",
        "s13_semdedup", "s14_cluster_sample", "d22_neardup_resolution",
        "c08_target_select", "w09_trending_props",
        "s17_jl_recall", "s19_filtered_ivf", "m05_phash_neardup",
        "g01_pagerank", "t17_bpe_merges", "d24_table_diff",
        "d26_edit_distance_dup", "c13_shard_plan",
        "d31_minhash_dup_capped", "d34_containment_asym_capped",
        "d09b_dedup_clusters_distributed", "w14_skew_salted_join",
        "s22_ivf_pq_persisted", "g03_triangles", "w15_zorder_skipping",
        "t19_quality_classifier", "g04_label_propagation",
        "w17_bucketed_colocated_join", "g05_bfs_hops", "s24_ivf_pq_recall",
        "g06_kcore", "g07_coreness_sweep", "c15_priority_sample",
        "s25_ivf_index_append", "d36_lsh_band_sweep", "s26_hard_negatives",
        "g08_hits", "g09_link_prediction", "c16_dsir_select")
    val spark = Sessions.local()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
