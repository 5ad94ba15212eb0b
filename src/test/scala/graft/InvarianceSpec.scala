package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-invariance: the property that makes results trustworthy
  * on a cluster. Every query must produce the IDENTICAL result set
  * regardless of shuffle partition count (a 32-partition local run and
  * a 20 000-partition cluster run differ only in physical layout) —
  * which holds by construction here (exact integer aggregation,
  * total-order ranks, deterministic hashing) and is pinned for a
  * representative query per family.
  */
class InvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private val representatives = Seq(
    "p11_click_agg",        // hash aggregation
    "q1_pricing_summary",   // integer-cents money aggregation
    "dedup_ngram_jaccard",  // blocked self-join + df-cap
    "join_asof",            // timeline build + probe
    "window_rank",          // total-order window
    "sim_ivf_topk",         // broadcast quantizer + per-row argmax
    "sim_ann_multiprobe",   // Hamming-1 probe fan-out
    "emb_quantize",         // pure projection, float determinism
    "decontaminate",        // broadcast-set membership counts
    "text_repetition",      // per-row array folds
    "stats_corr",           // exact integer moments — THE invariance claim
    "join_interval",        // equi+interval join
    "pack_sequences",       // per-shard prefix sum (window over total order)
    "dedup_components",     // iterative star-contraction fixpoint
    "text_unigram_logprob", // model-as-data scoring join + rounded logs
    "text_bigram_logprob",  // hash-keyed conditional-LM scoring
    "sample_cap_source",    // bounded-heap per-source capping
    "sample_balance_sources", // data-derived per-mille rates
    "corpus_prep_cc",       // component-resolved near-dup removal
    "emb_stats",            // per-vector scalar folds
    "text_winnow",          // windowed-min fingerprint selection
    "emb_kmeans_step",      // Lloyd assign/update (CentroidAgg merge order)
    "shard_assign",         // hash-keyed shard + in-shard total order
    "stats_quantile_binned", // histogram-cumsum rank selection over bins
    "dedup_emb_neardup",    // derived-plane LSH pairs + hot-bucket cap
    "corpus_prep_best",     // struct-ordered keeper argmax over components
    "sample_token_budget",  // per-source hash-ordered prefix-sum cut
    "sample_dsir",          // broadcast bucket-model scoring + rounded logs
    "text_heavy_hitters",   // MG sketch-then-confirm — sketch state varies, confirmed set must not
    "dedup_spans",          // packed-long first-occurrence min
    "events_attribution",   // click-timeline as-of probe + window gate
    "events_anomaly",       // decimal(38) integer 2-sigma inequality
    "decontaminate_bloom",  // bitmap-as-data prefilter + exact confirm
    "stats_ks_test",        // integer sup-distance over histogram cumsum
    "events_markov",        // per-user total-order lead window
    "emb_covariance",       // Gram-fold sums rounded at 1e-6 before compare
    "emb_outliers",         // driver-side moments from partition-order-noisy sums
    "text_bpe_step",        // TakeOrdered over exact integer pair counts
    "dedup_spans_clean",    // ordered reconstruction from packed-min keepers
    "sim_topk_sq8",         // integer-domain candidate ranking + f32 re-rank
    "corpus_prep_full",     // three-stage composition
    "stats_mannwhitney",    // doubled-midrank integer fold over histogram cumsum
    "stats_bootstrap",      // keyed-hash Poisson multiplicities + order statistics
    "dedup_graph_rank",     // integer fixed-point PageRank iterations
    "sim_topk_pq",          // integer ADC ranking over broadcast LUTs
    "sim_ivfpq_topk",       // IVF cell restriction ∘ PQ integer ranking
    "events_mix_drift",     // pure per-mille integer shares
    "mm_batch_plan",        // total-order packing within shape buckets
    "q17_small_quantity",   // integer 20%-of-avg correlated cut
    "q21_late_supplier",    // semi+anti correlated pair over one fact
    "sample_dedup_weight",  // component-sized integer weights
    "retrieval_bm25",       // integer micro-point sums + TakeOrdered rank
    "retrieval_rrf",        // two bounded rank lists fused via integer points
    "semdedup",             // broadcast-quantizer assignment + cell-blocked pairs
    "sim_hard_negatives",   // cross-label heap top-K
    "split_leakage",        // LSH pair set ∘ hash split assignment
    "layout_zorder",        // bit-interleave projection + broadcast min-day
    "mm_phash_neardup",     // per-row aHash + chunk-blocked pair join
    "sim_recall_eval",      // bounded rank-list comparison counts
    "text_token_ids",       // broadcast vocab-map per-row encoding
    "stats_hll_ngrams",     // max-monoid registers + BIGINT harmonic sum
    "stats_hll_overlap",    // pair-merged registers + BIGINT inclusion-exclusion
    "dedup_allpairs_exact", // prefix-filtered exact join, BIGINT threshold
    "sample_weighted_reservoir", // bounded-heap ES keys, rounded-ln discipline
    "dedup_allpairs_incremental", // tranche-filtered prefix join, BIGINT threshold
    "events_changepoint",   // calendar-grain windows, all-BIGINT CUSUM
    "dedup_components_warm", // forest ∪ tranche contraction, min-id canonical
    "events_bot_score",     // decimal38 sufficient stats, integer ppm
    "emb_kcenter_coreset",  // rounded-max argmin per round, vec_id ties
    "events_hll_cube",      // max-monoid rollups + BIGINT harmonic sums
    "stats_fdr_bh",         // type-frame windows over rounded Chebyshev p
    "text_boilerplate_spans", // hash-grain df counts + broadcast boiler set
    "sim_dim_ablation",     // prefix-cosine heap top-K vs full-dim truth
    "join_time_banded",     // banded bucket equi-join, exact residual bound
    "dedup_recall_eval",    // full-outer pair-key join of memoized frames
    "join_asof_nearest",    // dual-order timeline probe, integer tie-break
    "text_classifier_score", // hashed-weight integer fold + gate
    "vocab_coverage",       // TakeOrdered trim + tiny-frame k-sweep
    "text_pmi_collocations", // vocab-sized margin joins + rounded-ln rank
    "sim_triangle_census",  // degree-oriented wedge semi-join census
    "retrieval_rank_eval",  // TakeOrdered-trimmed lists + integer gains
    "sim_lexsem_agreement", // full-outer pair-key join of memoized pair frames
    "retrieval_bm25_multi", // packed-id heap cut over one postings exchange
    "text_bpe_encode",      // frozen-merge fold + vocab join, integer ppm
    "sim_lexsem_calibration", // inline threshold sweep over one full-outer join
    "bonus_topk")           // TakeOrderedAndProject

  private def resultSet(name: String): Set[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect().map(_.toString).toSet
  }

  test("results are identical under different shuffle partition counts") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      representatives.foreach { q =>
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        val a = resultSet(q)
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        val b = resultSet(q)
        withClue(q)(assert(a === b))
        withClue(q)(assert(a.nonEmpty))
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("bpe trainer: identical learned vocabulary under different shuffle partition counts") {
    // through bpeVocabFromWf, NOT the declared text_bpe_vocab query —
    // that one is session-cached (train-once), so a list entry above
    // would compare a cached frame to itself and prove nothing. The
    // invariance claim is per-round: the (count desc, s1, s2) argmax
    // is a total order, so no partitioning can flip a merge
    val wf = graft.functions.TextAnalysis.wordFreq(
      Tables.documents(spark, sf))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val a = graft.functions.TextAnalysis.bpeVocabFromWf(spark, wf)
        .collect().map(_.toString).toSet
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = graft.functions.TextAnalysis.bpeVocabFromWf(spark, wf)
        .collect().map(_.toString).toSet
      assert(a === b)
      assert(a.nonEmpty)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
