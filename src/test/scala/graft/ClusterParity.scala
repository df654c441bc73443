package graft

import org.apache.spark.sql.SparkSession

/** Multi-JVM parity harness: runs a representative query slice twice —
  * once on `local[4]` (threads in one JVM, the test default) and once on
  * `local-cluster[2,2,1024]` (a real standalone master + worker with TWO
  * SEPARATE EXECUTOR JVM PROCESSES, real RPC, real serialized shuffles
  * and broadcasts) — and asserts row-MULTISET equality (each distinct
  * row must appear the same number of times on both sides; a set
  * compare would let a multiplicity drift pass).
  *
  * What this proves that `local[n]` cannot: every custom construct
  * crosses a genuine process boundary — the native expressions
  * (hashed_shingles/minhash_sig/vec_dot) serialize to executors via the
  * function registry, the SpaceSavingTopK typed Aggregator's buffer
  * round-trips through real shuffle serialization, broadcast joins ship
  * driver→executor over RPC, and the iterative StarCC/PageRank loops
  * checkpoint across JVMs. Multiset-identical results here plus the
  * `local[3]` vs `local[8]` determinism battery (SCALING.md) is the
  * strongest single-box evidence that cluster re-planning cannot change
  * answers.
  *
  * Test scope on purpose (one JVM can hold only one SparkContext, so
  * this cannot share a session with the ScalaTest suites — the
  * ScaleProbe pattern). Run:
  *   SPARK_SCALA_VERSION=2.13 sbt "Test/runMain graft.ClusterParity"
  * (the env var lets the worker's executor launcher resolve the
  * dist-layout SPARK_HOME at /opt/spark).
  */
object ClusterParity {
  private val sf = "/root/testdata/sf0.001"

  /** One query per major engine surface: star join + decimal agg,
    * LSH/native-expression dedup, embedding ANN, exact percentiles,
    * iterative star-contraction closure, the typed-Aggregator top-k,
    * mergeable HLL registers, sessionization windows, integer PageRank,
    * order-pinned survival folds, path mining, and the hash-derived
    * bootstrap. */
  private val queries = Seq(
    "q16_star_join", "q17_pricing_summary", "q27_minhash_lsh",
    "q30_embed_neardup", "q50_percentiles", "q57_star_clusters",
    "q67_topk_udaf", "q79_hll", "q122_gap_sessions", "q133_pagerank",
    "q140_kaplan_meier", "q181_session_paths", "q196_bootstrap_ci",
    // one per r8 family: KMV distinct sketch, PQ-ADC byte-code search,
    // inclusion-dependency mining, and the streaming Benford gate's
    // batch twin
    "q161_kmv_sketch", "q137_pq_adc", "q204_join_discovery",
    "q192_benford_windows",
    // r9 families: global-rank statistics (phased CDF + HUGEINT-grid
    // rank sums), SNM blocking (shifted-rank equi-joins), and the
    // custom TopKPerGroup physical operator (partial/final heaps must
    // survive real executor boundaries + a real exchange)
    "q217_mannwhitney", "q224_sorted_neighborhood", "q226_topk_per_group",
    // r10 families: the KLL quantile sketch (its buffer must round-trip
    // real shuffle serialization and its bound must hold on the cluster
    // merge tree)
    "q254_kll_quantiles",
    // r11 families: the range-partitioned global-sort publish (sampled
    // boundaries + disjoint/complete certification must hold when the
    // sort and the read-back cross real executor JVMs) and the grouped
    // KLL (thousands of sketch buffers merging through a real exchange)
    "q255_sorted_publish", "q256_grouped_kll",
    // r11 batch-2 families: the calibration table (exact integer Brier
    // numerators through a real exchange), HyperANF (register-max
    // propagation across executors must stay bit-identical), IVM delta
    // terms (broadcast deltas on a real cluster), the deterministic
    // importance resample, and the space-saving monitor twin
    "q259_calibration", "q261_hyperanf", "q262_ivm_join",
    "q263_importance_select", "q265_stream_topk",
    // r11 batch-3: the KMV-sample set-difference algebra (per-source
    // sketches and the pair anti-join crossing real executors)
    "q270_sketch_anotb",
    // and the Markov chain power iteration (per-round pinned state +
    // dsum mass updates crossing real executors for 8 rounds)
    "q271_markov_attribution",
    // r12 catch-up, one per previously uncovered r11 family (r11
    // verdict item 6): Fellegi–Sunter linkage (Laplace-smoothed m/u
    // rates re-joined to the shared pair artifact — the likelihood
    // products' IEEE order must survive real shuffles), the DP binomial
    // histogram release (md5 coin pool drawn on executors must be
    // partition-invariant), DBSCAN over the ε-graph (degree aggregation
    // + label join across JVMs), and harmonic centrality (the HyperANF
    // register tables' max-merge fold re-read from the shared artifact)
    "q264_fellegi_sunter", "q266_dp_release", "q267_dbscan",
    "q269_harmonic_centrality",
    // r12 additions, one per new family: exact Shapley (bit-ops +
    // 16-row broadcasts over real RPC), leave-fold-out target encoding
    // (grid margins re-joined across executors), conformal quantile
    // (value-selected rank through a real exchange), Chao1/Good-Turing
    // (two-level count-of-counts), LOO ablation (totals-minus-group on
    // broadcast totals), join-cardinality estimation (bucket histogram
    // dsum), and the Bloom anti-join (md5 probe positions must be
    // identical on every executor JVM)
    "q272_shapley_attribution", "q273_target_encoding", "q274_conformal",
    "q275_vocab_richness", "q276_source_ablation", "q277_join_card_est",
    "q278_bloom_antijoin",
    // r12 batch-2, one per new family: isotonic PAV (the bin-lattice
    // broadcast joins and min/max folds over identical doubles across
    // JVMs), water-filling (global level selected from a ranked prefix
    // crossing an exchange), group-sequential looks (md5 entry draw on
    // executors), quantile treatment effects (value-selected ranks
    // through real shuffles), and the source-overlap matrix (16-slot
    // MinHash partial aggregation merging across executor JVMs)
    "q279_isotonic_calibration", "q280_token_budget",
    "q281_group_sequential", "q282_qte", "q283_source_overlap",
    // r12 batch-3, one per new family: Bradley–Terry (8 rounds of
    // pinned MM state re-broadcast across executor JVMs), the
    // Mantel–Haenszel pooled terms (dsum grid through a real
    // exchange), embedding isotropy (per-dim dsum partials merging
    // across JVMs), Cohen's kappa (4-cell agreement grid), and the
    // jackknife (totals-minus-row arithmetic on broadcast band totals)
    "q284_bradley_terry", "q285_mantel_haenszel",
    "q286_embed_isotropy", "q287_cohens_kappa",
    "q288_jackknife_ratio",
    // r12 batch-4: Kendall's grid pair-counts (broadcast cell
    // self-join across JVMs), the Chow decimal moments (pivot over a
    // real exchange), the AQP md5 sample (draws must be identical on
    // every executor), McNemar's 2x2, and the Wasserstein CDF integral
    // (pair-partitioned windows through real shuffles)
    "q289_kendall_tau", "q290_chow_break", "q291_aqp_sample",
    "q292_mcnemar", "q293_wasserstein",
    // r12 batch-5: Theil-Sen (day-grid pair slopes + rank selection
    // across JVMs), Nelson-Aalen (suffix risk sums + decimal-grid
    // hazard cumulation through real exchanges), and the DKW band
    // (md5 sample draw + per-type CDF sup over executor boundaries)
    "q294_theil_sen", "q295_nelson_aalen", "q296_dkw_band",
    // and the power-analysis grid (scalar base rate broadcast to the
    // MDE grid across executor JVMs)
    "q297_power_analysis",
    // r13: DoReMi mixture reweighting — the per-source excess-loss
    // grid (two LM joins over the persisted bigram working set's real
    // shuffles) collected to the driver MW fold, whose literal weights
    // re-enter the plan through a real broadcast
    "q298_doremi_mixture",
    // r14: the end-to-end corpus build — decision artifact, LM joins,
    // driver Hedge/apportionment literals, per-source rank + pack
    // windows over real shuffles, a real hive-partitioned publish from
    // executor JVMs, and the file read-back certification
    "q299_corpus_build",
    // r15 families: the typed mapPartitions container decode (byte
    // parsing on executor JVMs), the mixture monitor's K conditional
    // counts + stateless explode over a real exchange, and the
    // token→language plurality model's postings join
    "q300_container_dims", "q301_mixture_monitor", "q303_langid_confusion",
    // r16 families: the adaptive pack cumsum (pinned slim RDD +
    // counts-driven shape crossing real executors), the BFD typed
    // sorted-group fold (flatMapSortedGroups buffers must round-trip
    // real shuffle serialization) next to its greedy twin, the
    // admission controller's hash-priority window cumsum + broadcast
    // quota table, the IVF-PQ chain (two pinned RDDs + the 512-row
    // codebook broadcast over real RPC), and the char-3-gram slot
    // model's hash join
    "q302_pack_fragmentation", "q304_pack_compare",
    "q305_admission_control", "q306_ivfpq_ann", "q307_langid_chargrams",
    // the two-stage re-rank: the shortlist id-join against the pinned
    // corpus RDD must produce identical exact re-ranks across real
    // executor JVMs
    "q308_ivfpq_rerank",
    // r17 widening (r16 verdict item 5): the slice grows from 80 to 190
    // queries, prioritizing the surfaces where single-JVM and
    // multi-executor behavior can genuinely diverge — streaming batch
    // twins and watermark windows, typed folds and native expressions,
    // iterative graph/centroid loops, window-heavy dedup/pack shapes,
    // md5-drawn samplers (draws must be identical on every executor
    // JVM), and this round's trained IVF-PQ, admission deferral, and
    // two-build pricing chains
    "q12_window_rank", "q13_topk", "q19_tumbling_window",
    "q20_sliding_window", "q21_session_window", "q22_lag_delta",
    "q23_pyliteral_roundtrip", "q26_exact_dedup", "q28_simhash",
    "q29_ngram_jaccard", "q31_cosine_topk", "q32_ann_lsh", "q33_lang_id",
    "q34_quality_score", "q35_token_count", "q36_fingerprint",
    "q39_ivf_ann", "q40_rollup", "q42_weighted_simhash",
    "q44_stratified_sample", "q45_contamination", "q47_dedup_clusters",
    "q48_asof_join", "q49_range_join", "q52_token_gini",
    "q53_exact_contamination", "q54_sequence_pack",
    "q55_curation_manifest", "q56_incremental_dedup", "q58_mixing_weights",
    "q59_pii_redact", "q60_vocab_topk", "q61_repetition",
    "q62_unigram_score", "q64_int8_quantize", "q66_cube", "q71_pivot",
    "q72_ntile_buckets", "q74_scd2_ranges", "q77_bpe_pairs",
    "q84_bpe_merges", "q85_ann_recall", "q86_semantic_dedup",
    "q88_bpe_encode", "q89_pps_sample", "q91_oov_rate", "q92_triangles",
    "q94_clean_manifest", "q99_drift_windows", "q100_curation_pipeline",
    "q101_substr_spans", "q103_leakfree_split", "q105_dataset_card",
    "q106_publish_manifest", "q107_bigram_lm", "q109_shard_assign",
    "q110_tfidf_terms", "q111_kmeans_train", "q112_triplet_mining",
    "q113_pca_power", "q114_curation_funnel", "q115_rrf_fusion",
    "q117_stream_kmeans", "q118_pmi_collocations", "q119_embed_outliers",
    "q120_prefix_simjoin", "q123_forward_fill", "q124_quota_sample",
    "q125_rolling_stats", "q128_unpivot", "q129_knn_graph",
    "q132_window_dedup", "q134_gopher_gates", "q138_kcenter_coreset",
    "q139_bm25", "q141_label_propagation", "q150_quality_windows",
    "q151_unseen_mass", "q153_kcore", "q154_mmr_rerank", "q155_zipf_slope",
    "q156_bitext_margin", "q158_kneser_ney", "q159_winnow_overlap",
    "q164_langid_eval", "q171_k_anonymity", "q172_rolling_uniques",
    "q174_seed_ppr", "q177_stationary_dist", "q182_ccnet_buckets",
    "q185_link_prediction", "q187_phrase_search", "q191_data_profile",
    "q193_grouping_sets", "q197_modularity", "q203_shard_rebalance",
    "q211_bitsig_ann", "q212_mixture_sampler", "q215_cluster_canonical",
    "q216_rolling_distinct", "q219_assortativity", "q221_l_diversity",
    "q223_feature_hash_collisions", "q229_jl_distortion",
    "q231_grouped_kfold", "q238_token_burstiness", "q241_knn_label_noise",
    "q245_mrr_hit3", "q247_negative_sampling", "q250_eb_shrinkage",
    "q252_keyness", "q253_srm_windows", "q257_stream_quantiles",
    "q258_stream_cardinality", "q260_t_closeness", "q268_dr_offpolicy",
    "q309_ivfpq_trained", "q310_admission_deferral", "q311_build_pricing")

  private def run(spark: SparkSession): Map[String, Map[Seq[Any], Int]] =
    queries.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect()
        .map(_.toSeq.map {
          case a: Array[_] => a.toSeq
          case x => x
        }.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap
    }.toMap

  def main(args: Array[String]): Unit = {
    val local = Sessions.builder("local[4]", 4).getOrCreate()
    local.sparkContext.setLogLevel("ERROR")
    val want = run(local)
    local.stop()
    // a fresh context needs the old one fully gone
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val cp = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cluster = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-cluster-parity")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", value = false)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    cluster.sparkContext.setLogLevel("ERROR")
    val got = run(cluster)
    cluster.stop()

    var bad = 0
    for (n <- queries) {
      val ok = got(n) == want(n)
      if (!ok) bad += 1
      println(s"${if (ok) "PARITY" else "MISMATCH"}  $n " +
        s"(${want(n).size} rows)")
    }
    println(s"""{"metric":"cluster_parity","queries":${queries.size},""" +
      s""""mismatches":$bad}""")
    if (bad > 0) sys.exit(1)
  }
}
