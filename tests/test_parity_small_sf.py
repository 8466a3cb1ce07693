"""Oracle parity at sf0.001 for the size-guard-sensitive queries.

The main differential layer runs at sf0.01; this one re-runs the
queries whose implementations carry explicit short-input guards
(Spark's ``sequence(1, k)`` is DESCENDING for k < 1 where DuckDB's
``generate_series`` is empty; slices/windows degenerate on tiny docs)
at the smallest scale, where short documents and sparse groups actually
occur. A full-surface sweep at sf0.001 was green when this was added —
this subset keeps the guard regressions pinned without doubling suite
time.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from mapreduce_wordcounter_spark import TABLES
from mapreduce_wordcounter_spark.registry import all_oracles, all_queries
from tests.conftest import SF_SMOKE

_ORACLES = all_oracles()
_QUERIES = all_queries()

# Queries with n-gram/slice/window size guards or grid generation.
_GUARDED = [
    "ngrams_bigram_top50",
    "ngrams_trigram_top50",
    "boilerplate_ngrams",
    "gopher_repetition",
    "benchmark_contamination",
    "chunk_documents",
    "pack_sequences",
    "jaccard_near_dup_pairs",
    "minhash_signatures",
    "ev_resample_ffill",
    "ev_interpolate_linear",
    # round 4, later waves: short-doc bigram guards, sparse-graph
    # degenerate cases (empty wedge/triangle sets), tiny rank windows
    "doc_bigram_logprob",
    "bigram_pmi_top50",
    "bpe_top_pairs",
    "graph_pagerank",
    "graph_triangle_counts",
    "graph_common_neighbors",
    "graph_label_propagation",
    "ev_rolling_zscore",
    "ev_top_paths",
    "ev_first_touch",
    "part_affinity_lift",
    # round 5: degenerate-layout cases (n < N_FILES tiles, single-hour
    # corpora collapse the normalization span to the greatest(,1)
    # guard), short-doc prefixes, tiny strata
    "zorder_layout",
    "layout_span_compare",
    "dpp_partitioned_join",
    "jaccard_prefix_join",
    "sample_weighted_per_lang",
    # round 6: empty-edge-set guard (sum(d) NULL -> ceil-div TypeError)
    "graph_kcore_peel",
]


@pytest.fixture(scope="module")
def duck_smoke():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None:
            return None
        if isinstance(v, float) and math.isnan(v):
            return None
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, bytes):
            return v.hex()
        return v

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", _GUARDED)
def test_parity_at_smoke_sf(name, spark, duck_smoke):
    s = _canon(_QUERIES[name](spark, SF_SMOKE).toPandas())
    o = _canon(duck_smoke.execute(_ORACLES[name]).fetchdf())
    assert s.shape == o.shape, f"{name}: {s.shape} != {o.shape}"
    for col in s.columns:
        sv, dv = list(s[col]), list(o[col])
        mism = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, dv))
            if not (
                (a is None and b is None)
                or (
                    isinstance(a, float)
                    and isinstance(b, float)
                    and math.isnan(a)
                    and math.isnan(b)
                )
                or a == b
            )
        ]
        assert not mism, f"{name}.{col}: {len(mism)} mismatches, first: {mism[:3]}"


def test_kcore_empty_edge_graph_returns_empty(spark, tmp_path):
    """Degenerate corpus with NO co-occurrence edges (a single event
    has no LAG partner): sum(d) aggregates to NULL, and before the
    round-6 guard the ceil-div raised TypeError. The k-core of an
    empty graph is an empty result with the right schema."""
    from pyspark.sql import functions as F

    from mapreduce_wordcounter_spark.operators.graph import graph_kcore_peel
    from mapreduce_wordcounter_spark.tables import load_table

    d = str(tmp_path / "degenerate")
    ev = load_table(spark, SF_SMOKE, "events").orderBy("event_id").limit(1)
    ev.coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    out = graph_kcore_peel(spark, d)
    assert out.columns == ["user_id", "core_degree"]
    assert out.count() == 0
