"""Repo-wide plan-hygiene sweep: EVERY registered batch query is built
(plan-time only — no jobs run) and its physical plan checked for the
two unconditional scale-killers:

- a cartesian product / broadcast nested-loop join, and
- a row-at-a-time Python UDF (BatchEvalPython).

The showcase queries get deeper pinned properties in tests/test_plans.py;
this sweep exists so a *new* query can't land with a quadratic join or a
row-Python hot path without explicitly declaring it below.

Streaming queries (stream_*) execute their drain inside the query
function, so they are excluded here — their plans are exercised by
tests/test_streaming.py.
"""

from __future__ import annotations

import pytest

from mapreduce_wordcounter_spark.plans.inspect import physical_plan
from mapreduce_wordcounter_spark.registry import all_queries
from tests.conftest import SF_ORACLE

_QUERIES = all_queries()

# Documented exact baselines whose quadratic join is the point (each has
# a bucketed/LSH scale twin registered alongside):
_ALLOWED_QUADRATIC = {
    "embedding_top_pairs",  # all-pairs theta join; twin: embedding_top_pairs_bucketed
    "jaccard_near_dup_pairs",  # exact shingle self-join; twin: lsh_* pipeline
    "dedup_components_canonical",  # reuses the jaccard exact baseline as edge input
    "dedup_cluster_sizes",  # histogram over the same CC labeling
    "knn_brute_cosine",  # broadcast-queries x corpus scan: the exactness oracle
    "ann_matryoshka_topk",  # same broadcast-queries scan shape, but over the
    # 16/64-dim PREFIX (4x fewer multiply-adds; a narrow prefix column at
    # rest) — O(corpus x query-batch) like every flat-scan ANN prefilter,
    # with the full-dim work confined to MRL_CAND candidates per query
    "ann_ivf_recall",  # contains the brute baseline by definition (recall eval)
    "ann_rebuild_decision",  # composes ann_ivf_recall (same brute baseline)
    "ann_matryoshka_recall",  # composes the brute baseline + the MRL prefilter
    # scan — the only ANN recall eval whose NUMBERS are hash-checked
    "lsh_verified_pairs",  # verification reuses the jaccard-pair shape on candidates
}

# BroadcastNestedLoopJoin whose build side is CONSTANT-BOUNDED (a scalar,
# a literal band table, an 8-row plane table, a LIMIT-capped vocab): the
# work is O(N · k) for fixed small k, not O(N²) — fine at any scale.
_ALLOWED_BOUNDED_BNLJ = {
    "join_range_bands",  # 3-row literal price-band table
    "lsh_hyperplane_buckets",  # 8-row plane table cross (long-form oracle twin)
    "lsh_bucket_candidates",  # same plane cross, one level down
    "ann_lsh_topk",  # plane cross + 9-row constant probe-flip table
    "scalar_subquery",  # 1-row aggregate scalar as the build side
    "tf_idf",  # 1-row corpus-size scalar joined onto df counts
    "doc_keywords_top3",  # rank window over the tf_idf relation (same scalar)
    "bm25_topk",  # 1-row (N, avgdl) scalar stats joined onto the tf relation
    "source_unigram_kl",  # 1-row corpus-token-total scalar onto (source, word)
    "corpus_health_report",  # one-row dashboard: joins of 1-row aggregates only
    "word_typo_pairs",  # vocab LIMIT-capped before the edit-distance theta join
    "q11_important_stock",  # 1-row global-total scalar (HAVING threshold)
    "q15_top_supplier",  # 1-row MAX-revenue scalar
    "q22_global_sales_opportunity",  # 1-row (sum, count) average scalar
    "ev_funnel_conversion",  # joins of four 1-row funnel-stage counts
    "ev_value_histogram",  # 1-row global MIN/MAX bin-edge scalar
    "doc_unigram_logprob",  # 1-row corpus-token-total scalar onto the vocab
    "ccnet_perplexity_buckets",  # inherits doc_unigram_logprob's 1-row scalar
    "dsir_importance_weights",  # 1-row (N, N_t, V) totals scalar onto the vocab
    "dsir_topk_selection",  # same scalar one level down (TakeOrdered on top)
    "dsir_sample_fraction",  # 1-row corpus-count scalar (quantile threshold)
    "dsir_gumbel_sample",  # the same 1-row totals scalar inside the weights
    "dsir_gumbel_sample_fraction",  # + the 1-row corpus-count scalar
    "doc_bigram_logprob",  # 1-row vocab-size scalar onto the bigram model
    "skew_top_keys",  # 1-row total scalar onto the 5-row top-k
    "source_lang_chisq",  # 1-row chi-square scalar joined onto 1-row dims
    "bigram_pmi_top50",  # two 1-row totals scalars onto the 50-row top list
    "lineitem_abc_analysis",  # 1-row revenue-total scalar onto the part ranks
    "part_affinity_lift",  # 1-row order-count scalar onto the pair lifts
    "ev_seasonality_dow_hour",  # 1-row total scalar onto the ≤168-row grid
    "graph_modularity",  # joins of three 1-row aggregate scalars
    "ev_benford_deviation",  # 1-row total scalar onto the 9-row digit grid
    "zorder_layout",  # 1-row min/max bounds scalar (bit-budget normalization)
    "zorder3_layout",  # same 1-row bounds scalar, 3-dim interleave
    "layout_span_compare",  # same 1-row bounds scalar, both layouts
    "hilbert_layout",  # same 1-row bounds scalar, Hilbert grid normalization
    "hilbert_vs_zorder_spans",  # same scalar, both curves
    "zorder_probe",  # 1-row corpus-start-hour scalar onto the probe scan
    "hilbert_probe",  # same 1-row start-hour scalar, hilbert-sorted copy
    "ann_rp_topk",  # 16-row constant projection-dim table (the lsh-plane shape)
    "lsh_recall_vs_exact",  # 1-row exact-pair-count scalar onto the 1-row hits
    "ev_bootstrap_ci_mean",  # 1-row point-estimate scalar onto the 32-row CI
    # semi-oracled sketch tier (VERDICT r11 #6): each joins 1-row exact
    # references onto 1-row estimates to serve the bound booleans
    "wc_vocab_hll_merge",  # 1-row exact-vocab scalar x 1-row HLL estimate
    "theta_vocab_ops",  # 1-row exact set-op counts x 1-row theta estimates
    "value_quantiles_kll",  # 1-row exact brackets x 1-row KLL quantiles
    "sample_bernoulli",  # 1-row total x two 1-row sample checksums
}

# The deliberately-Python surface: the real UDTF twin of the native
# tokenizer (its JVM explode/split twin wc_counts is the hot path).
_ALLOWED_PYTHON = {"udtf_tokenize_counts"}

# Global (no partitionBy) windows over CONSTANT-BOUNDED relations: the
# bucket-offset tables of the two-pass cumsum construction (<=1025
# rows), literal grids, top-k limited lists, and 1-row scalars. A
# global window over a data-sized relation funnels the corpus through
# ONE partition (the WindowExec WARN + single-task sort) and is
# rejected for every query not declared here.
_ALLOWED_BOUNDED_GLOBAL_WINDOW: set[str] = {
    "lineitem_abc_analysis",  # <=1025-row bucket-offset cumsum table
    "quality_lr_auc",  # <=1025-row score-band offset table (_rank_auc)
    "quality_lr_holdout_auc",  # same construction, holdout slice
    "quality_lr_hashed_holdout_auc",  # same _rank_auc offset table
    "zorder_layout",  # <=64-row coarse-z bucket-offset table
    "zorder3_layout",  # same, 3-dim interleave
    "layout_span_compare",  # same bucket offsets, both layouts
    "hilbert_layout",  # <=64-row coarse-d bucket-offset table
    "hilbert_vs_zorder_spans",  # same bucket offsets, both curves
    "mixture_weights",  # lang x source slice grid (dozens of rows)
    "mixture_temperature_weights",  # same slice grid
    "token_budget_allocation",  # same <=|langs| slice grid (quota windows)
    "ev_bootstrap_ci_mean",  # 32-row replicate-mean relation (rank + count)
    "source_lang_chisq",  # source x lang grid
    "orders_open_backlog",  # month-grain relation (~84 rows)
    "vocab_top1k",  # LIMIT-1000-capped relation feeds the id window
    # strategy-consistency: the windowed vocab relation is broadcast-
    # joined by the SAME query (explicit F.broadcast), so the join
    # strategy already caps it at broadcast scale — the global window
    # is bounded by the constraint that makes the join viable. The
    # unbounded-vocab posture (shuffle join + distributed_rank) is
    # demonstrated by zipf_slope over the same relation.
    "doc_mean_word_rank",
    # size-adaptive: at the plan-build SF the measured customer count
    # selects the small-side exact-window strategy; the distributed
    # path is plan-checked + result-pinned in tests/test_plans.py
    "orders_rfm_segments",
    "bpe_subword_vocab",  # subword inventory: |alphabet| + K merges
    "bpe_tokenize",  # same bounded subword-id assignment
}

_BATCH_QUERIES = sorted(n for n in _QUERIES if not n.startswith("stream_"))


def _global_windows(plan: str) -> int:
    """Count Window operators whose required child distribution is a
    single partition: a `Window` node whose subtree's first Exchange
    (the one Catalyst inserted to satisfy the window's distribution,
    at most a Sort away) is `Exchange SinglePartition`."""
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if "Window " not in line:
            continue
        if "sum(__bn#" in line and "__pid#" in line:
            # layout.distributed_rank's offset window: a cumulative sum
            # of per-range row counts ordered by the range id — an
            # n_parts-row (constant, 32) relation by construction. The
            # reserved __bn/__pid names are produced only by that
            # helper, so the signature is structural, not per-query.
            continue
        for nxt in lines[i + 1 : i + 4]:
            if "Exchange" in nxt:
                if "SinglePartition" in nxt:
                    hits += 1
                break
            if "Sort " not in nxt and "WindowGroupLimit" not in nxt:
                break  # partitioning satisfied upstream without exchange
    return hits


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_complex_output_columns(name, spark):
    """No registered query may serve a top-level array/map/struct
    column (VERDICT r10 #3): the external harness canonicalizes
    results with pandas sort/factorize, which cannot hash list cells —
    a complex-typed output is a guaranteed driver error the moment the
    query rotates into the sampled window, even when its math is
    perfect (embedding_quantize_int8, r10's one red row). Serve an
    exploded (id, pos, value) relation or a deterministic string
    serialization (array_join ↔ array_to_string) instead. Plan-time
    only — schemas resolve without running jobs."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = _QUERIES[name](spark, SF_ORACLE).schema
    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: top-level complex column(s) {complex_cols} — the driver's "
        f"canonicalizer cannot hash list/struct cells; serve exploded rows "
        f"or a deterministic string serialization with a matching oracle"
    )


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_scale_killers(name, spark):
    plan = physical_plan(_QUERIES[name](spark, SF_ORACLE))
    if name not in _ALLOWED_QUADRATIC:
        assert "CartesianProduct" not in plan, (
            f"{name}: plans a cartesian product — add a bucketed twin or "
            f"whitelist with justification"
        )
        if name not in _ALLOWED_BOUNDED_BNLJ:
            assert "BroadcastNestedLoop" not in plan, (
                f"{name}: plans a nested-loop join — if the build side is "
                f"constant-bounded, whitelist with justification; otherwise "
                f"add a bucketed twin"
            )
    if name not in _ALLOWED_PYTHON:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in the plan — use a pandas_udf/"
            f"mapInPandas (Arrow) instead"
        )
    if name not in _ALLOWED_BOUNDED_GLOBAL_WINDOW:
        assert _global_windows(plan) == 0, (
            f"{name}: plans a single-partition Window over an undeclared "
            f"relation — partition it (two-pass bucketed cumsum: "
            f"layout._distributed_ntile / training._rank_auc) or, if the "
            f"windowed relation is constant-bounded, whitelist with "
            f"justification"
        )
