"""Error-bound tests for the approximate/sampling operators
(SURVEY.md §5.2 layer 3). Since round 12 these queries are
SEMI-ORACLED (VERDICT r11 #6): each emits exact references
(hash-checked against DuckDB by the external harness) plus its
statistical contract as a boolean. These tests pin (a) the booleans
are actually TRUE at the oracle SF — the same gate the driver hashes —
and (b) the RAW estimator bounds, computed inline where the query now
only serves the boolean, so a bound regression is visible as numbers,
not just a flipped bit.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.operators.wordcount import tokens
from mapreduce_wordcounter_spark.registry import all_queries
from tests.conftest import SF_ORACLE

_QUERIES = all_queries()


def _exact_vocab(spark) -> int:
    return tokens(spark, SF_ORACLE).select("word").distinct().count()


def test_vocab_approx_error_bound(spark):
    """approx_count_distinct at rsd=0.01 must land within 5% of the
    exact vocabulary (5 standard deviations of the configured rsd) —
    raw bound inline, plus the query's own semi-oracle boolean."""
    exact = _exact_vocab(spark)
    est = (
        tokens(spark, SF_ORACLE)
        .agg(F.approx_count_distinct("word", 0.01).alias("v"))
        .collect()[0]["v"]
    )
    assert abs(est - exact) / exact < 0.05, (est, exact)
    row = _QUERIES["wc_vocab_approx"](spark, SF_ORACLE).collect()[0]
    assert row["vocab_exact"] == exact
    assert row["approx_within_5pct"] is True


def _hll_merged_estimate(spark) -> float:
    per_source = (
        tokens(spark, SF_ORACLE)
        .groupBy("source")
        .agg(F.hll_sketch_agg("word", F.lit(14)).alias("sketch"))
    )
    return per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("v")
    ).collect()[0]["v"]


def test_vocab_hll_merge_error_bound(spark):
    """The unioned per-source Datasketches HLL estimate stays within 3%
    of exact (lgK=14 → ~0.8% rse; 3% ≈ 4σ headroom) — raw bound inline,
    plus the query's semi-oracle boolean and hash-checked exact."""
    exact = _exact_vocab(spark)
    est = _hll_merged_estimate(spark)
    assert abs(est - exact) / exact < 0.03, (est, exact)
    row = _QUERIES["wc_vocab_hll_merge"](spark, SF_ORACLE).collect()[0]
    assert row["vocab_exact"] == exact
    assert row["hll_within_3pct"] is True


def test_vocab_hll_merge_consistency(spark):
    """Union-of-partials == single-pass sketch: merging the per-source
    sketches must give EXACTLY the estimate of one sketch over all
    words (HLL union at equal lgK is lossless) — the property that
    makes incremental corpus cardinality sound."""
    merged = _hll_merged_estimate(spark)
    direct = (
        tokens(spark, SF_ORACLE)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("word", F.lit(14))).alias("v"))
        .collect()[0]["v"]
    )
    assert merged == direct


def test_p90_approx_brackets_exact(spark):
    """percentile_approx(accuracy=10000) must bracket the exact p90
    tightly: between the exact p85 and p95 per group — raw bracket
    inline, plus every group's semi-oracle boolean."""
    from mapreduce_wordcounter_spark.tables import load_table

    li = load_table(spark, SF_ORACLE, "lineitem")
    raw = {
        r["l_returnflag"]: (r["est"], r["p85"], r["p95"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", 0.9, 10000).alias("est"),
            F.expr("percentile(l_quantity, 0.85)").alias("p85"),
            F.expr("percentile(l_quantity, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert raw
    for flag, (est, lo, hi) in raw.items():
        assert lo <= est <= hi, (flag, est, lo, hi)
    rows = _QUERIES["agg_p90_approx"](spark, SF_ORACLE).collect()
    assert {r["l_returnflag"] for r in rows} == set(raw)
    assert all(r["p90_within_bracket"] is True for r in rows)


def test_sample_bernoulli_rate_and_reproducibility(spark):
    """Seeded Bernoulli sample: observed rate inside 5σ binomial bounds
    around fraction=0.1, and the same seed yields the same rows — raw
    rowset check inline, plus the query's semi-oracle booleans."""
    from mapreduce_wordcounter_spark.tables import load_table

    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    n_total = li.count()
    rows_a = {tuple(r) for r in li.sample(fraction=0.1, seed=42).collect()}
    p, n = 0.1, n_total
    sigma = math.sqrt(n * p * (1 - p))
    assert abs(len(rows_a) - n * p) < 5 * sigma, (len(rows_a), n * p, sigma)
    rows_b = {tuple(r) for r in li.sample(fraction=0.1, seed=42).collect()}
    assert rows_a == rows_b
    row = _QUERIES["sample_bernoulli"](spark, SF_ORACLE).collect()[0]
    assert row["n_total"] == n_total
    assert row["rate_within_5sigma"] is True
    assert row["reproducible"] is True


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
    """Theta-sketch union/intersection/difference: the query's exact
    membership counts equal independently-computed set-op counts, and
    every within-max(1, 5%) semi-oracle boolean holds (k=4096 default
    → ~1.6% rse; the corpus's shared synthetic vocabulary makes
    intersection == union, which the sketch must reproduce)."""
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
    assert row["exact_union"] == exact_union
    assert row["exact_en"] == exact_en
    assert row["exact_zh"] == exact_zh
    assert row["exact_intersection"] == inter
    assert row["exact_en_minus_zh"] == exact_en - inter
    for col in (
        "ok_union", "ok_intersection", "ok_en", "ok_zh", "ok_en_minus_zh"
    ):
        assert row[col] is True, col


def test_kll_quantiles_bracket_exact(spark):
    """Merged-KLL quantile estimates land within the sketch's rank
    error of the exact percentiles: the VALUE at rank p must sit
    between the exact values at ranks p±2% (default k=200 → ~1.65%
    normalized rank error; 2% ≈ headroom — tighter than the query's
    own 3% driver-gate boolean, which is also asserted)."""
    from mapreduce_wordcounter_spark.tables import load_table

    e = load_table(spark, SF_ORACLE, "events")
    est = (
        e.groupBy("event_type")
        .agg(F.kll_sketch_agg_double("value").alias("sk"))
        .agg(F.kll_merge_agg_double("sk").alias("msk"))
        .select(
            F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(0.9)).alias("p90"),
            F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(0.99)).alias("p99"),
            F.kll_sketch_get_n_double(F.col("msk")).alias("n"),
        )
        .collect()[0]
    )
    vals = sorted(r["value"] for r in e.select("value").collect())
    n = len(vals)
    assert est["n"] == n

    def bracket(p, v):
        lo = vals[max(0, int((p - 0.02) * n) - 1)]
        hi = vals[min(n - 1, int((p + 0.02) * n))]
        assert lo <= v <= hi, (p, v, lo, hi)

    bracket(0.5, est["p50"])
    bracket(0.9, est["p90"])
    bracket(0.99, est["p99"])
    row = _QUERIES["value_quantiles_kll"](spark, SF_ORACLE).collect()[0]
    assert row["n"] == n
    assert row["ok_p50"] is True
    assert row["ok_p90"] is True
    assert row["ok_p99"] is True
