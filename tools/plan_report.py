"""Generate PLANS.md: the physical-plan audit artifact.

For each headline query, dump the formatted Catalyst plan at the given
scale factor with a one-line note on the property that makes it the plan
you'd want at 100 TB.  Run after operator changes; the file is committed
so plan regressions show up in diffs (the executable guards live in
tests/test_plans.py — this artifact is for human audit).

Usage: python tools/plan_report.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# (query, the property to audit)
HEADLINE = [
    ("scan_filter_project", "PushedFilters + pruned ReadSchema on the parquet scan"),
    ("pricing_summary", "single exchange, map-side partial HashAggregate"),
    ("multi_join_star", "entire dimension chain broadcast; one fact exchange"),
    ("q9_product_type_profit", "pruned part broadcast; lineitem⋈orders is the only big edge"),
    ("q2_min_cost_supplier", "window-min decorrelation, exchange reused by min + filter"),
    ("topk_per_group", "WindowGroupLimit — per-partition top-k, no global sort"),
    ("dedup_minhash", "banded self-join on cached signatures (InMemoryTableScan both sides)"),
    ("dedup_simhash", "pigeonhole blocks over distinct signatures; codegen Hamming"),
    ("cosine_topk", "broadcast queries, corpus scanned once, WindowGroupLimit"),
    ("ann_lsh_topk", "bucketed equi-join on stored-projection signatures"),
    ("interval_overlap_join", "binned blocking: hash equi-join on time bin, no BNLJ"),
    ("window_running_sum", "single sort-based window, one exchange on the partition key"),
    ("tumbling_window_agg", "window() expands map-side; one keyed exchange"),
    ("training_data_pipeline", "filter→dedup→split→stats as one declarative plan"),
    ("vwap_hourly", "two weighted sums in one algebraic hash aggregate"),
    ("cohort_retention", "one reused user_id exchange for first-seen agg + activity join"),
    ("event_transition_matrix", "LEAD window on user_id; normalize over the tiny aggregate"),
    ("triangle_count", "degree-oriented edges (hub out-wedges capped); persisted edge list read 3x"),
    ("q11_important_stock", "per-part aggregate exchange reused by threshold + output (no persist)"),
    ("dedup_embedding_cosine", "stored-projection LSH buckets + Hamming-1 probe explode; equi-join candidates"),
    ("funnel_attribution", "one user_id exchange + one sort serves BOTH attribution window passes"),
    ("similar_docs_topk", "df-capped inverted-index candidates; WindowGroupLimit top-3 per doc"),
    ("skew_diagnostics", "key-cardinality agg; 1-row broadcast totals; TakeOrdered top-10"),
    ("point_in_time_join", "keyed equi-join + interval filter; fan-out bounded by versions/key"),
    ("label_propagation_step", "per-round keyed count + WindowGroupLimit argmax under localCheckpoint"),
    ("basket_association_rules", "persisted basket table read 3x; broadcast item supports"),
    ("bloom_prefilter_dedup", "sparse bloom bitmap broadcast probes; proven-absent rows skip the anti-join shuffle"),
    ("packing_efficiency_sweep", "one prefix-sum window pass; all budgets via multi-distinct Expand"),
    ("weighted_sample_per_lang", "integer md5 priority, WindowGroupLimit top-5 per language"),
    ("embedding_dimension_stats", "posexplode fan-out, 64-group partial-aggregated exchange"),
    ("daily_event_type_pivot", "declared-value pivotfirst, single scan, no distinct pre-job"),
    ("monthly_revenue_growth", "month-grain collapse BEFORE the unpartitioned LAG window"),
    ("dedup_method_comparison", "persisted member pair sets; count + intersect read one materialization"),
    # round-6 additions
    ("minhash_jaccard_estimate", "TakeOrderedAndProject bounds the audited pair set to <=128 at any corpus size"),
    ("quantile_sketch_merge", "windows run over the ~210-bin sketch, never rows; map-side partial sketch build"),
    ("dedup_components_star", "per-round hash min-agg + re-keyed edge projection; no join wider than the edge list"),
    # round-6 session additions
    ("classifier_auc_rank", "histogram AUC: corpus work is ONE hash agg onto score bins; window runs over bins only"),
    ("reciprocal_rank_fusion", "both ranker legs TakeOrderedAndProject; fusion join depth-bounded"),
    ("target_encoding_loo", "whole-partition windows + final agg share ONE event_type exchange"),
    ("small_file_compaction_plan", "metadata-sized file listing; placement window partitioned BY table partition"),
    ("zorder_clustering_audit", "integer bit-interleave map-side; rank-free file assignment; 16-group agg"),
    ("substring_span_dedup", "content-defined anchors inside one higher-order projection; text never shuffles"),
    ("link_prediction_common_neighbors", "degree-capped wedge equi-join; candidates only from wedges; anti-join vs edges"),
    ("jaccard_prefix_filter_join", "prefix join concentrates on RARE shingles; verify touches only candidates"),
    # round-9/10 additions
    ("protobuf_binary_decode", "pure-JVM tag-walk decode, zero shuffles before the 5-group final agg"),
    ("unigram_lm_train", "lattice DP folds inside ONE Catalyst expression; vocab-sized rounds, broadcast cost map"),
    ("ngram_lm_perplexity_filter", "model as 1-row broadcast maps; scoring pass is map-only on the streamed side"),
    ("dsir_importance_resample", "twin LM broadcast-hash probes; ONE doc_id exchange after map-side partials"),
    ("doremi_domain_reweight", "broadcast-hash model probe; single (lang, shard) exchange feeds 4 integer MW steps"),
    ("wordpiece_apply", "greedy fold map-only over the vocab; two broadcast piece maps; zero shuffles"),
    ("kmeans_lloyd", "k-row centroid broadcast per round; k-sized integer-stat exchange at any corpus size"),
    ("pagerank_rounds", "persisted symmetric edges; per round ONE dst-keyed hash agg with map-side partials"),
    ("feature_hashing", "md5 bucket+sign map-side; single (doc, bucket) exchange; no vocabulary join"),
    ("lsh_band_tradeoff_audit", "all 4 band configs in ONE tagged equi-self-join; prefix-filter truth, never brute force"),
    ("tokenizer_fertility_audit", "one training pass shared by both apply folds; 2-group final agg"),
    ("confluent_protobuf_decode", "frame strip + folded tag-walk compose map-side; zero shuffles before the small agg"),
    # round-11 additions
    ("exact_substring_spans", "all-position 64-gram table; exactly 2 keyed exchanges (hash window + doc islands); top-k heap"),
    ("exact_substring_removal_stats", "char-overlap island merge; doc-keyed budget join carries 2 ints per affected doc"),
    ("gopher_quality_rules", "rule flags in one HOF projection — no Generate; single lang-keyed agg"),
    ("recursive_cte_reachability", "WITH RECURSIVE: per level one frontier-edge equi-join; hop-bounded"),
    ("pass_at_k_estimate", "one user-keyed agg over events; k-branches touch only the tiny task table"),
    ("mrl_truncation_audit", "adjacent-id pair join; map-only 3-way delta projection; 3-group agg"),
    ("distinct_ngram_diversity", "per-n gram explode; two-phase exact distinct on the (lang, gram) exchange"),
    # round-12 additions
    ("logreg_train_gd", "map-only scoring passes (weights as literals); one 9-long partial-agg row per round"),
    ("bradley_terry_train", "ONE order-keyed collect_list exchange; map-side HOF pair gen -> <=600 sufficient-stat rows"),
    ("ols_normal_equations", "ONE moment-matrix agg (10 BIGINTs, map-side combined); Cramer solve is a projection"),
    ("pca_power_iteration", "double posexplode fans d^2 products map-side; one 256-group exchange; folds fixed-order"),
    ("als_one_round", "item-keyed agg of 5 BIGINT partials; fixed factors are a literal of the key — no join"),
    ("reachability_frontier_bfs", "per round: frontier equi-join + distinct + visited anti-join; |V|-bounded working set"),
    ("markov_transitions", "one user-keyed lag window; (prev, next) agg is ~25 groups; ppm window over the aggregate"),
    ("chi2_token_class_assoc", "distinct-presence explode; vocab rollup broadcast-joined; per-lang top-5 WindowGroupLimit"),
    ("hellinger_lang_drift", "per-token nano-floor BEFORE the sum; vocab-sized q rollup broadcast; map-side BC partials"),
    ("kaplan_meier_survival", "one user agg; calendar-bounded KM table; prefix-product folds on one tiny row"),
    ("cuped_variance_reduction", "one user agg; unit^2-rescaled integer second moments; 1-row x 2-row broadcast cross"),
    ("ipf_raking_weights", "one corpus agg to 25 cells; 6 scaling passes are windows over the 25-row table"),
    ("distinct_ngram_diversity_approx", "HLL registers partial-agg map-side; exact audit column rides for the contract"),
    # round-13 additions
    ("distinct_ngram_approx_pure", "the PURE sketch plan: HLL registers are the only distinct machinery"),
    ("als_alternating", "per half-step: keyed ratings-factor join + 5-BIGINT moment exchange; nano handoff"),
    ("decision_tree_histogram_train", "per level one constant-width histogram exchange; 1-row root-split broadcast cross"),
    ("gbdt_stump_boost", "3 sequential histogram passes; residual update via 1-row stump broadcast"),
    ("gbdt_logit_boost", "Newton g/h histograms (3 BIGINTs/cell); nano score accumulation map-side"),
    ("naive_bayes_train", "vocab-sized sparse model exchange; term-keyed apply join; 25-cell confusion rollup"),
    ("welch_t_test", "one user exchange + 1-row conditional pivot; t/df are constant projections"),
    ("mann_whitney_u", "rank window over the bounded deci-value axis, never users; doubled-rank integers"),
    ("permutation_test_mean_diff", "32x digit fan-out map-side partial-agg to 32 groups; 1-row observed cross"),
    ("logrank_test", "KM user exchange with arm pivots folded in; death-time table metadata-sized"),
    ("did_estimator", "one user exchange; signed-delta double-floor rescale; 1-row pivot"),
    ("link_prediction_adamic_adar", "hub-capped wedge equi-join; per-wedge ln-weight micro-floored pre-sum"),
    ("bagged_stump_ensemble", "8 replicas in ONE pass: digit-parity membership, (rb,f,b) histogram exchange"),
    ("hits_one_step", "distinct bipartite edges; hub agg; one join + part-keyed authority agg; top-k heap"),
    ("poststratified_effect", "one user exchange; 10-group pivot; 1-row total cross; window over 10 rows"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from odni_apache_beam_consumer_spark.session import get_spark
    from odni_apache_beam_consumer_spark.plans.registry import all_queries

    spark = get_spark(app_name="plan-report")
    queries = all_queries()
    print("# PLANS — physical-plan audit of the headline queries")
    print()
    print(f"Generated by `python tools/plan_report.py {sf_dir}`.")
    print("Executable plan guards live in `tests/test_plans.py`; this file is")
    print("the human-readable audit trail (regenerate after operator changes).")
    for name, note in HEADLINE:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        print(f"\n## {name}\n")
        print(f"*Audit property: {note}.*\n")
        print("```")
        print(plan.rstrip())
        print("```")
    return 0


if __name__ == "__main__":
    sys.exit(main())
