"""Empirical scaling probe: run key operators at sf0.1 and at a 10×
replicated copy of it, and record the runtime ratio in SCALE.md.

"Designed for 100 TB" is a claim about asymptotics; this probe checks
the first decade of it empirically. A blocked/bounded operator should
scale ~linearly in corpus size (ratio ≈ 10, modulo fixed overhead that
makes small runs look worse); a hidden quadratic (all-pairs join,
unbounded candidate set) shows up as a ratio ≫ 10.

The 10× fixture replicates each table with key shifting so join
integrity and duplicate structure scale LINEARLY:
- facts (orders/lineitem): o_orderkey/l_orderkey shifted per replica,
  dim keys untouched (dims are copied once — same join fan-in);
- documents: doc_id shifted; replica 0 keeps original text, replicas
  i>0 prefix every token with r{i}x so no cross-replica near-dups are
  fabricated (pair count grows 10×, not 100×);
- embeddings: vec_id shifted, vectors untouched.

Usage: python tools/scale_probe.py [--base /root/testdata/sf0.1]
                                   [--out /tmp/sls_scale10] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_QUERIES = [
    # text / dedup family (corpus-linear designs)
    "llm_dedup_exact",
    "llm_dedup_minhash_lsh",
    "llm_dedup_simhash",
    "llm_repeated_passages",
    "llm_text_quality",
    "llm_text_tfidf",
    "llm_ngram_lm_score",
    # relational core (scan/shuffle-bound)
    "flagship_pricing_join",
    "tpch_q1_style_full",
    "tpch_q5_style_regional_volume",
    "agg_count_distinct",
    "win_ranking",
    # embeddings
    "llm_knn_cosine_exact",
    # round-5 analytics (corpus-linear designs)
    "ts_twap",
    "cdc_scd2_build",
    "attribution_touch",
    "hist_equi_depth",
    "agg_gini_concentration",
    "llm_token_entropy",
    "llm_ngram_novelty",
    "agg_median_abs_deviation",
    "join_asof_directions",
    # round-6 additions: the remaining window-heavy / pair-producing ops
    "agg_trimmed_winsorized",
    "agg_weighted_median",
    "llm_winnowing_fingerprint",
    "llm_rouge_unigram",
    "llm_url_domain_normalize",
    "llm_dedup_per_domain",
    "llm_minhash_band_sweep",
    # round-7 additions: persisted-index probe, quantized ANN, IVF
    # multi-assign, streaming near-dup ingest
    "llm_dedup_persistent_index",
    "llm_ann_int8_rerank",
    "llm_ann_ivf",
    "stream_dedup_simhash",
    # round-7 batch 2: sketches, rank statistics, layout, pipeline ops.
    # join_spatial_grid is NOT probed (customers are a dim the fixture
    # copies once, so its input does not grow); graph_sssp_weighted is
    # excluded with the other graph_* ops (densification note below).
    "agg_count_min_sketch",
    "stats_ks_test",
    "stats_mann_whitney",
    "ts_user_streaks",
    "hist_zorder_layout",
    "profile_psi_drift",
    "ts_seasonal_decompose",
    "llm_rejection_sampling",
    "llm_span_corruption",
    "llm_contrastive_negatives",
    # round-8 additions: compaction + streaming index probe, pairwise /
    # vocab-iterating / join-heavy newcomers. stats_theil_sen IS probed
    # even though pairs are O(days^2): days are calendar-bounded, so
    # the ratio should reflect the daily-collapse scan only.
    "llm_dedup_index_compaction",
    "llm_bpe_apply_merges",
    "llm_ngram_backoff_score",
    "stats_theil_sen",
    "llm_ann_ivf_int8",
    "llm_embedding_drift",
    "llm_chat_template_flatten",
    "win_range_interval_time",
    "stream_stream_left_outer_join",
    "stream_update_mode_agg",
    "cdc_scd6",
    "win_funnel_wilson",
    # round-8 wave 2/3: quantified-subquery rewrite, exact OLS moments,
    # Bloom-prefiltered ingest (bitmap saturates at 10x by design —
    # bits_set shows it; production sizes m with the corpus), Poisson
    # bootstrap fan-out, workday arithmetic, KMV union.
    "subq_quantified_any_all",
    "stats_ols_two_feature",
    "llm_dedup_bloom_prefilter",
    "stats_bootstrap_ci",
    "ts_business_days",
    "agg_kmv_union",
    # round-9 additions: joint-frequency rank correlations (cells are
    # value-domain-bounded, so the pair stage must stay FLAT while the
    # scan grows), mergeable-moment tests, daily-collapse smoothing,
    # hash-order shuffle / weighted sampling / boilerplate vocab over a
    # 10x corpus, bloom-filter write+probe over 10x customers.
    # join_skyline_pareto is NOT probed (part is a dim the fixture
    # copies once, same reason as join_spatial_grid).
    "stats_spearman_corr",
    "stats_kendall_tau",
    "stats_association_battery",
    "stats_benford_digits",
    "stats_anova_oneway",
    "stats_kl_divergence",
    "ts_holt_linear",
    "fn_ipv4_cidr_battery",
    "llm_deterministic_shuffle",
    "llm_weighted_sample_es",
    "llm_boilerplate_vocab",
    "scan_parquet_bloom_filter",
    # round-10 additions: daily-collapse robust stats (days are
    # calendar-bounded, the scan grows), 25-group FDR finish over a 10x
    # fact scan, corpus-linear epoch allocation and banded perceptual
    # dedup (NOTE: unlike token-shingle dedup, the replica token prefix
    # does NOT break perceptual similarity — replicas of one doc have
    # near-identical byte means, so true near-dup pairs grow ~148x at
    # 10x by construction; the measured runtime ratio stays ~2.8
    # because the banded join is linear in candidates, which is the
    # claim under test), pandas resample over 10x orders, learned-gap
    # sessionization over 10x events, PQ/ADC + reward normalization
    # over the 10x corpus.  stats_fisher_exact and
    # fn_geo_haversine_battery are NOT probed (supplier/customer are
    # dims the fixture copies once — inputs do not grow, the
    # join_spatial_grid exclusion); graph_link_prediction joins the
    # excluded graph family (fixed part dim => 10x facts DENSIFY
    # baskets, wedges grow 100x because the workload does).
    "stats_runs_test",
    "stats_jarque_bera",
    "ts_hampel_outliers",
    "stats_fdr_bh",
    "llm_epoch_allocation",
    "llm_multimodal_ahash_dedup",
    "pandas_api_resample",
    "ts_sessionize_gap_percentile",
    "llm_reward_normalize",
    "llm_multimodal_ahash",
    "llm_ann_pq_adc",
    # round-10 wave 2: domain-collapsed rank/isotonic stats (50-value
    # quantity domain => the windows/joins must stay FLAT while the
    # scan grows), day-grain CUSUM/CCF, by-name union concat over 10x
    # events, Matryoshka NDCG + MMR over the 10x corpus (pool/round
    # stages are K-bounded, only the scoring scan grows), pivot_table's
    # single hash agg.  stats_herfindahl and graph_hits are NOT probed
    # (supplier/part are copied-once dims — the spatial-grid/graph
    # exclusions).
    "stats_kruskal_wallis",
    "stats_isotonic_minimax",
    "ts_cusum_drift",
    "ts_cross_correlation",
    "setop_union_by_name",
    "llm_retrieval_ndcg",
    "llm_mmr_diverse_topk",
    "pandas_api_pivot_table",
    # round-10 wave 3: shingle-key set containment over the 10x corpus
    # (same linear candidate claim as the jaccard family), the kappa
    # chassis McNemar (two map-side passes), counts-of-counts skew
    # profile (window runs on ~60 rows at any SF).
    "llm_dedup_set_containment",
    "llm_judge_mcnemar",
    "profile_key_skew",
    "stats_effect_size",
    "stats_power_mde",
    "stats_bayes_ab",
    "stats_lin_ccc",
    "llm_embedding_norm_outliers",
    "llm_source_overlap_matrix",
    "stats_cochran_armitage",
    "llm_capture_recapture",
    # footer-statistics aggregate: should stay near-FLAT at 10x (the
    # read is row-group metadata, not data pages)
    "scan_parquet_agg_pushdown",
    "stats_wilcoxon_signed_rank",
    "ts_var_cvar",
    "llm_vocab_growth_curve",
    # round-11 additions: map-only fertility counters + |langs|-row
    # aggregate (should track the scan, ~linear), and the Mann-Kendall
    # day-pair join (calendar-bounded daily table => near-FLAT pair
    # stage at 10x, only the orders scan grows).
    "llm_tokenizer_fertility",
    "ts_mann_kendall",
    # round-11 continuation: map-only text audits (readability, judge
    # bias — scan grows, finish is |sources|/O(1)), sparse-count
    # burstiness and the vocab-bounded JS pair stage, tercile-judge
    # alpha (two passes), daily-collapse ts ops (pacf / strength /
    # bollinger / calendar grid / ewm / granger — calendar-bounded
    # finishes over a growing scan), embedding passes (covariance +
    # projection, silhouette, broadcast-probe hard negatives — corpus
    # scans with dim^2 / k-bounded shuffles), multimodal featurizers
    # (scene-cut frame sums, chunk-vec alignment — mapInPandas linear),
    # and the one-shuffle conversation audit.
    # graph_personalized_pagerank joins the excluded graph family.
    "llm_text_readability",
    "llm_judge_length_bias",
    "llm_token_burstiness",
    "llm_source_js_divergence",
    "stats_krippendorff_alpha",
    "stats_mutual_info",
    "ts_pacf",
    "ts_seasonal_strength",
    "ts_bollinger_bands",
    "ts_calendar_profile",
    "ts_granger_causality",
    "pandas_api_ewm",
    "llm_embedding_abtt",
    "llm_cluster_silhouette",
    "llm_hard_negative_mining",
    "llm_multimodal_scene_cut",
    "llm_multimodal_alignment",
    "llm_chat_turn_audit",
    # round-11 wave 3: weekday-confined MK pairs (calendar-bounded),
    # trailing-window correlation and robust residual anomalies over
    # daily-collapse tables — only the fact scan grows in all three.
    "ts_seasonal_mann_kendall",
    "ts_rolling_correlation",
    "ts_stl_anomaly",
    # round-11 wave 4: the funnel's dedup-hash window + map-side stage
    # flags, the map-only loop detector, and Holm's 25-row finish over
    # a growing join — all fact-scan-linear.
    "llm_filter_funnel",
    "llm_repetition_loops",
    "stats_holm_bonferroni",
    # positional bigram self-join = one doc_id-co-partitioned shuffle;
    # cells are vocab^2-bounded, only the token explode grows.
    "llm_ngram_entropy_rate",
    # round-12: the covariance probe (two corpus passes onto a dim^2
    # shuffle after the checkpoint rewrite — should track the scan),
    # and PPR as the one DELIBERATE exception to the graph exclusion
    # (VERDICT r11 item 5 asked for its own row): 10x facts densify
    # the co-purchase graph, but PPR pushes are degree-proportional
    # row counts, not wedge counts — the ratio documents densification
    # cost, read it with that caveat.
    "llm_embedding_top_pc",
    "graph_personalized_pagerank",
    # round-12 wave 1: frequency/memory diagnostics — all three
    # collapse to the calendar-bounded daily table in one hash agg,
    # so the ratio must track the fact scan only.
    "ts_ljung_box",
    "ts_periodogram",
    "ts_hurst_exponent",
    # round-12 wave 2: domain/calendar-collapsed stats (grids stay
    # fixed while the scan grows) and the two text-family newcomers
    # (KN scoring = vocab-bounded count tables + held-slice joins;
    # Heaps = shingle-grain aggs — both should track the tokenize).
    "stats_friedman_test",
    "stats_cronbach_alpha",
    "stats_roc_auc",
    "stats_calibration_brier",
    "stats_hodges_lehmann",
    "llm_ngram_kneser_ney",
    "llm_heaps_law_fit",
    # round-12 wave 3: daily-collapse forecast ratio, the 200x
    # calendar-bounded randomization fan-out, and brand-partition
    # modularity (edge/node-grain aggs over the shared copurchase
    # staging -- the one graph op whose partition comes from a dim,
    # so the densification caveat reads differently: edges grow, the
    # 25-brand community table does not).
    "ts_theil_u",
    "stats_permutation_test",
    "graph_modularity",
    # round-12 wave 4: PR curve on the same domain grid as ROC, edge
    # assortativity over the shared staging, 2-row TOST chassis.
    "stats_auc_pr",
    "graph_assortativity",
    "stats_tost_equivalence",
    # round-13: map-only hash sampling; strata/domain/calendar-
    # collapsed rank+drift stats (25-nation grid, ~240-cell price
    # grid, day grid — all fixed while the scan grows); the 8-bin
    # Welch coherence (O(days) fan-out); per-source self-BLEU (ngram
    # counts + one bounded pair join, each doc's grams touched <=2x).
    # graph_rich_club joins graph_modularity's dim-partition caveat:
    # 10x facts densify edges, histograms stay degree-bounded.
    "sample_hash_deterministic",
    "stats_cmh_test",
    "stats_jonckheere_terpstra",
    "stats_page_trend",
    "ts_spectral_coherence",
    "ts_page_hinkley",
    "llm_selfbleu_diversity",
    "stats_dunn_test",
    "ts_dickey_fuller",
    "graph_rich_club",
    # round-13 wave 2: both collapse to the calendar-bounded daily
    # table (5-row moment agg / week grid + O(weeks) spine windows).
    "ts_variance_ratio",
    "stats_sign_test",
    # round-13 wave 3: day-grid rank walks + the days^2-bounded
    # template join (only the fact scan grows), and the map-side
    # md5-per-bigram watermark audit (bigram-explode-linear).
    "stats_xi_correlation",
    "ts_sample_entropy",
    "llm_watermark_detect",
    # round-13 wave 4: per-customer window reductions onto the
    # <=181-row KM time domain (only the orders scan + the customer
    # shuffle grow), and the (day x type) binary grid.  NOTE the KM
    # row-count artifact: the replica fixture duplicates each
    # customer's order DATES 10x, so every customer's second order
    # lands at gap 0 and the curve collapses to one event-time row —
    # the runtime ratio (the claim under test) is unaffected, but the
    # 10x output is degenerate by fixture construction, not design.
    "stats_kaplan_meier",
    "stats_logrank_test",
    "stats_cochran_q",
    # round-14 wave 1: all three collapse to the calendar-bounded
    # daily table (lag/lead windows, 6-pattern agg, l lag-joins on
    # O(days) rows) — only the fact scan grows with SF.
    "ts_turning_points",
    "ts_permutation_entropy",
    "ts_kpss_test",
    # round-14 wave 2: the shared two-sample prefix chassis — events
    # collapse to distinct micro-values, bucketed two-phase prefix
    # sums, 1-row moment close; the distinct-value table grows
    # sublinearly with facts.
    "stats_brunner_munzel",
    "stats_cvm_two_sample",
    "stats_ansari_bradley",
    # round-14 wave 3: 5-group / (type x day) map-side-partial moment
    # aggs + bounded-row finishes — only the fact scan grows.
    "stats_mood_median",
    "stats_bartlett_test",
    "stats_poisson_dispersion",
    # round-14 wave 4: calendar-bounded daily chassis (triple join /
    # 64-bin DFT on O(days) rows; only the fact scan grows).
    # graph_local_clustering is NOT probed — same densification
    # artifact as the other graph_* ops (see note below).
    "ts_adf_augmented",
    "ts_spectral_entropy",
    # round-14 wave 5: one customer-grain shuffle onto the 25-nation
    # grid / the daily-table cumsum window.
    "stats_theil_inequality",
    "ts_cusum_squares",
]
# graph_* ops are deliberately NOT probed: the replica fixture keeps
# the part dimension fixed, so 10x facts DENSIFY the co-purchase graph
# (degrees x10) rather than growing it — triangle/wedge work then grows
# superlinearly because the workload itself does (more triangles per
# node), not because the algorithm is wrong. A faithful graph scale
# test needs parts to scale with orders, which the fixture's
# join-fan-in invariant forbids.


def build_fixture(spark, base: str, out: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from spark_lineage_spark.tables import TABLES

    os.makedirs(out, exist_ok=True)
    # ONE shared shift for the orderkey namespace: orders and lineitem
    # must move their keys by the same amount or replica i's lineitems
    # would reference no replica-i orders and every fact join would
    # silently collapse to replica-0 matches (ratios would then measure
    # a broken fixture, not the operators).
    o = spark.read.parquet(os.path.join(base, "orders.parquet"))
    li = spark.read.parquet(os.path.join(base, "lineitem.parquet"))
    orderkey_shift = (
        max(
            o.agg(F.max("o_orderkey")).collect()[0][0] or 0,
            li.agg(F.max("l_orderkey")).collect()[0][0] or 0,
        )
        + 1
    )
    for name in TABLES:
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.exists(dst):
            shutil.rmtree(dst, ignore_errors=True)
        src = spark.read.parquet(os.path.join(base, f"{name}.parquet"))
        if name in ("orders", "lineitem", "documents", "embeddings", "events", "customer"):
            key = {
                "orders": "o_orderkey",
                "lineitem": "l_orderkey",
                "documents": "doc_id",
                "embeddings": "vec_id",
                "events": "user_id",
                "customer": "c_custkey",
            }[name]
            if name in ("orders", "lineitem"):
                shift = orderkey_shift
            else:
                shift = (src.agg(F.max(key)).collect()[0][0] or 0) + 1
            reps = []
            for i in range(factor):
                r = src.withColumn(key, F.col(key) + F.lit(i * shift))
                if name == "documents" and i > 0:
                    # unique token namespace per replica: no fabricated
                    # cross-replica duplicates
                    r = r.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split("text", " "),
                                lambda t: F.concat(F.lit(f"r{i}x"), t),
                            ),
                            " ",
                        ),
                    )
                reps.append(r)
            big = reps[0]
            for r in reps[1:]:
                big = big.unionByName(r)
            big.write.mode("overwrite").parquet(dst)
        else:
            # dims copied once: replicated facts keep referencing them
            src.write.mode("overwrite").parquet(dst)


def patch_rows(text: str, rows) -> str:
    """Subset-mode SCALE.md surgery: replace matching 10x-table rows
    in place, insert new ones after the LAST 6-column row (the 100x
    section's rows have a different column count and are never
    touched).  Unit-tested in tests/test_tools_scale_probe.py."""
    lines = text.splitlines(keepends=True)
    by_name = {n: (n, b, x, r, nb, nx) for n, b, x, r, nb, nx in rows}
    out_lines = []
    last_row_idx = 0
    for i, ln in enumerate(lines):
        parts = ln.split("|")
        if len(parts) == 8 and parts[1].strip() in by_name:
            n, b, x, r, nb, nx = by_name.pop(parts[1].strip())
            ln = f"| {n} | {b:.2f} | {x:.2f} | {r:.1f} | {nb} | {nx} |\n"
        if ln.startswith("|") and len(parts) == 8:
            last_row_idx = i
        out_lines.append(ln)
    for n, b, x, r, nb, nx in by_name.values():
        out_lines.insert(
            last_row_idx + 1,
            f"| {n} | {b:.2f} | {x:.2f} | {r:.1f} | {nb} | {nx} |\n",
        )
        last_row_idx += 1
    return "".join(out_lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sls_scale10")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--skip-fixture", action="store_true",
                    help="reuse an existing --out fixture")
    ap.add_argument("names", nargs="*",
                    help="probe only these queries (default: all)")
    args = ap.parse_args()

    from spark_lineage_spark.registry import load_all
    from spark_lineage_spark.session import build_spark

    specs = load_all()
    spark = build_spark("sls_scale_probe")
    if args.skip_fixture and os.path.exists(args.out):
        print(f"reusing fixture at {args.out}", flush=True)
    else:
        print(f"building {args.factor}x fixture at {args.out} ...", flush=True)
        t0 = time.time()
        build_fixture(spark, args.base, args.out, args.factor)
        print(f"fixture built in {time.time() - t0:.1f}s", flush=True)

    # warm
    specs["flagship_pricing_join"].builder(spark, "/root/testdata/sf0.001").count()

    rows = []
    probe_names = args.names or PROBE_QUERIES
    unknown = [n for n in probe_names if n not in specs]
    assert not unknown, f"unknown queries: {unknown}"
    for name in probe_names:
        spec = specs[name]
        times = {}
        for label, sf_dir in (("base", args.base), ("10x", args.out)):
            best = None
            for _ in range(2):
                t0 = time.time()
                n = spec.builder(spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[label] = (best, n)
        ratio = times["10x"][0] / max(times["base"][0], 1e-9)
        rows.append((name, times["base"][0], times["10x"][0], ratio,
                     times["base"][1], times["10x"][1]))
        print(f"{name}: {times['base'][0]:.2f}s -> {times['10x'][0]:.2f}s "
              f"(x{ratio:.1f}, rows {times['base'][1]} -> {times['10x'][1]})",
              flush=True)
        # release py4j DataFrame refs promptly so checkpoint blocks are
        # ContextCleaner-collectable, and nudge the JVM periodically —
        # without this, heavy ops measured late in the ~200-query
        # session read 2-4x slower than fresh-session standalone
        # (observed on llm_ann_pq_adc / stream_dedup_simhash; the
        # audit_runtime tool already does the same)
        import gc

        gc.collect()
        if len(rows) % 10 == 0:
            spark.sparkContext._jvm.System.gc()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scale_path = os.path.join(repo, "SCALE.md")
    if args.names:
        # subset mode: append/replace just these rows in the existing
        # table — a full rewrite here would drop every unprobed row
        text = open(scale_path).read()
        with open(scale_path, "w") as fh:
            fh.write(patch_rows(text, rows))
        print("updated SCALE.md (subset mode)", flush=True)
        spark.stop()
        return
    # preserve the hand-measured 100x section across regenerations
    tail_100x = ""
    if os.path.exists(scale_path):
        prev = open(scale_path).read()
        idx = prev.find("## 100")
        if idx >= 0:
            tail_100x = "\n" + prev[idx:]
    with open(scale_path, "w") as fh:
        fh.write("# SCALE — empirical 10× scaling probe\n\n")
        fh.write(
            f"Runtime at `{args.base}` vs a {args.factor}× key-shifted replica\n"
            f"(best of 2, warm session, local[32]; generated by\n"
            f"`tools/scale_probe.py`). A blocked/bounded operator should land\n"
            f"near ratio {args.factor} (fixed per-query overhead makes small\n"
            f"runs look relatively worse, so ratios BELOW {args.factor} are\n"
            f"common); a hidden quadratic would show ratios far above it.\n\n"
        )
        fh.write("| query | base s | 10x s | ratio | base rows | 10x rows |\n")
        fh.write("|---|---|---|---|---|---|\n")
        for name, b, x, r, nb, nx in rows:
            fh.write(f"| {name} | {b:.2f} | {x:.2f} | {r:.1f} | {nb} | {nx} |\n")
        fh.write(
            "\nNotes:\n"
            "- `join_spatial_grid` is not probed: customers are a"
            " dimension the fixture copies once, so its input does not"
            " grow at 10x; its cost model (O(n x cell density), no"
            " cartesian) is plan-asserted in tests/test_plans.py.\n"
            "- `llm_ann_ivf` is ~linear BY DESIGN at a fixed list count:"
            " with K=16 lists and nprobe=8, the probed candidate set is a"
            " fixed fraction of the corpus, so work grows 1:1 with corpus"
            " size (no quadratic). Production scales K with ~sqrt(n) so"
            " per-query work grows ~sqrt(n); K is pinned here so the"
            " recall property tests stay bit-reproducible.\n"
            "- graph_* ops are deliberately not probed: the replica"
            " fixture keeps dims fixed, so 10x facts DENSIFY the"
            " co-purchase graph (the workload itself grows superlinearly),"
            " which would measure the fixture, not the operators.\n"
            "- `join_skyline_pareto` is not probed for the same"
            " dim-table reason (part is copied once); its two-phase"
            " bucketed-window cost shape is documented in the query"
            " docstring and the frontier invariants are property-tested.\n"
        )
        fh.write(tail_100x)
    print("wrote SCALE.md", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
