"""Error-bound tests for the approximate/sampling operators that have
no cross-engine oracle (SURVEY.md §5.2 layer 3): the rows-only queries
(`wc_vocab_approx`, `wc_vocab_hll_merge`, `agg_p90_approx`,
`sample_bernoulli`) promise statistical contracts instead of exact
equality — those contracts are pinned here.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.operators.wordcount import (
    tokens,
    wc_vocab_hll_merge,
)
from mapreduce_wordcounter_spark.registry import all_queries
from tests.conftest import SF_ORACLE

_QUERIES = all_queries()


def _exact_vocab(spark) -> int:
    return tokens(spark, SF_ORACLE).select("word").distinct().count()


def test_vocab_approx_error_bound(spark):
    """approx_count_distinct at rsd=0.01 must land within 5% of the
    exact vocabulary (5 standard deviations of the configured rsd)."""
    est = _QUERIES["wc_vocab_approx"](spark, SF_ORACLE).collect()[0][
        "vocab_size_approx"
    ]
    exact = _exact_vocab(spark)
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_vocab_hll_merge_error_bound(spark):
    """The unioned per-source Datasketches HLL estimate stays within 3%
    of exact (lgK=14 → ~0.8% rse; 3% ≈ 4σ headroom)."""
    est = wc_vocab_hll_merge(spark, SF_ORACLE).collect()[0]["vocab_size_hll"]
    exact = _exact_vocab(spark)
    assert abs(est - exact) / exact < 0.03, (est, exact)


def test_vocab_hll_merge_consistency(spark):
    """Union-of-partials == single-pass sketch: merging the per-source
    sketches must give EXACTLY the estimate of one sketch over all
    words (HLL union at equal lgK is lossless) — the property that
    makes incremental corpus cardinality sound."""
    merged = wc_vocab_hll_merge(spark, SF_ORACLE).collect()[0]["vocab_size_hll"]
    direct = (
        tokens(spark, SF_ORACLE)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("word", F.lit(14))).alias("v"))
        .collect()[0]["v"]
    )
    assert merged == direct


def test_p90_approx_brackets_exact(spark):
    """percentile_approx(accuracy=10000) must bracket the exact p90
    tightly: between the exact p85 and p95 per group."""
    approx = {
        r["l_returnflag"]: r["p90_qty_approx"]
        for r in _QUERIES["agg_p90_approx"](spark, SF_ORACLE).collect()
    }
    from mapreduce_wordcounter_spark.tables import load_table

    exact = {
        r["l_returnflag"]: (r["p85"], r["p95"])
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.85)").alias("p85"),
            F.expr("percentile(l_quantity, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        lo, hi = exact[flag]
        assert lo <= est <= hi, (flag, est, lo, hi)


def test_sample_bernoulli_rate_and_reproducibility(spark):
    """Seeded Bernoulli sample: observed rate inside 5σ binomial bounds
    around fraction=0.1, and the same seed yields the same rows."""
    a = _QUERIES["sample_bernoulli"](spark, SF_ORACLE)
    n_total = (
        spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").count()
    )
    rows_a = {tuple(r) for r in a.collect()}
    p, n = 0.1, n_total
    sigma = math.sqrt(n * p * (1 - p))
    assert abs(len(rows_a) - n * p) < 5 * sigma, (len(rows_a), n * p, sigma)
    rows_b = {tuple(r) for r in _QUERIES["sample_bernoulli"](spark, SF_ORACLE).collect()}
    assert rows_a == rows_b


def test_cms_never_undercounts_and_bound(spark):
    """Count-min guarantees: the estimate NEVER undercounts (every
    occurrence lands in every row's counted bucket), and the min-row
    overcount stays within the standard e·N/w bound (deterministic
    here: fixed corpus, fixed md5 hash rows)."""
    rows = _QUERIES["wc_cms_heavy_hitters"](spark, SF_ORACLE).collect()
    assert rows, "top-k audit is empty"
    n_tokens = tokens(spark, SF_ORACLE).count()
    bound = math.e * n_tokens / 1024  # _CMS_W
    for r in rows:
        assert r["overcount"] >= 0, r
        assert r["est_cms"] == r["n_exact"] + r["overcount"], r
        assert r["overcount"] <= bound, (r, bound)


def test_theta_set_ops_bounds(spark):
    """Theta-sketch union/intersection/difference estimates stay within
    5% of the exact distinct counts (k=4096 default → ~1.6% rse; the
    corpus's shared synthetic vocabulary makes intersection == union,
    which the sketch must reproduce)."""
    row = _QUERIES["theta_vocab_ops"](spark, SF_ORACLE).collect()[0]
    t = tokens(spark, SF_ORACLE).filter(F.col("lang").isin("en", "zh"))
    exact_union = t.select("word").distinct().count()
    exact_en = t.filter(F.col("lang") == "en").select("word").distinct().count()
    exact_zh = t.filter(F.col("lang") == "zh").select("word").distinct().count()
    inter = (
        t.filter(F.col("lang") == "en").select("word").distinct()
        .intersect(t.filter(F.col("lang") == "zh").select("word").distinct())
        .count()
    )
    for est, exact in [
        (row["est_union"], exact_union),
        (row["est_en"], exact_en),
        (row["est_zh"], exact_zh),
        (row["est_intersection"], inter),
        (row["est_en_minus_zh"], exact_en - inter),
    ]:
        assert abs(est - exact) <= max(1, 0.05 * exact), (est, exact)


def test_kll_quantiles_bracket_exact(spark):
    """Merged-KLL quantile estimates land within the sketch's rank
    error of the exact percentiles: the VALUE at rank p must sit
    between the exact values at ranks p±2% (default k=200 → ~1.65%
    normalized rank error, 2% ≈ headroom)."""
    row = _QUERIES["value_quantiles_kll"](spark, SF_ORACLE).collect()[0]
    from mapreduce_wordcounter_spark.tables import load_table

    vals = sorted(
        r["value"]
        for r in load_table(spark, SF_ORACLE, "events").select("value").collect()
    )
    n = len(vals)
    assert row["n"] == n

    def bracket(p, est):
        lo = vals[max(0, int((p - 0.02) * n) - 1)]
        hi = vals[min(n - 1, int((p + 0.02) * n))]
        assert lo <= est <= hi, (p, est, lo, hi)

    bracket(0.5, row["p50"])
    bracket(0.9, row["p90"])
    bracket(0.99, row["p99"])
