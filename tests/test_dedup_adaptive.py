"""The size-adaptive exact->LSH dedup switch (VERDICT r8 #3).

jaccard_prefix_join estimates the prefix self-join's candidate mass
(one aggregate, no pair generated) and escalates from the lossless
AllPairs/PPJoin plan to the banded-LSH verified-pairs plan on
duplicate-heavy corpora, where exact prefix filtering is
candidate-quadratic. These tests pin BOTH regimes and the
escalated path's result equivalence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def replica_corpus(spark, tmp_path_factory):
    """A duplicate-heavy corpus: every sf0.01 document replicated 10x
    under fresh doc_ids — the regime a real crawl's dedup pass hits,
    where each duplicated doc contributes ~C(10,2) candidate pairs."""
    base = tmp_path_factory.mktemp("repcorpus")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    nd = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    rep = docs.crossJoin(
        spark.range(10).select(F.col("id").alias("r"))
    ).select(
        (F.col("doc_id") + F.col("r") * nd).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    rep.coalesce(4).write.mode("overwrite").parquet(
        str(base / "documents.parquet")
    )
    return str(base)


def test_distinct_corpus_picks_exact_prefix(spark):
    from mapreduce_wordcounter_spark.operators import dedup

    pick = dedup.jaccard_pairs_strategy(spark, SF_ORACLE)
    assert pick["strategy"] == "prefix"
    # wide margin: the driver's oracle corpus must never flip
    assert pick["mass_per_doc"] < dedup._PREFIX_MASS_PER_DOC_MAX / 5


def test_replica_corpus_escalates_to_lsh(spark, replica_corpus):
    from mapreduce_wordcounter_spark.operators import dedup

    pick = dedup.jaccard_pairs_strategy(spark, replica_corpus)
    assert pick["strategy"] == "lsh"
    assert pick["mass_per_doc"] > dedup._PREFIX_MASS_PER_DOC_MAX


def test_adaptive_serves_lsh_plan_on_replica_corpus(spark, replica_corpus):
    """On the duplicate-heavy corpus the serving entry's rows are the
    banded-LSH verified pairs — bounded candidates, not the quadratic
    exact join."""
    from mapreduce_wordcounter_spark.operators import dedup

    got = sorted(
        tuple(r)
        for r in dedup.jaccard_prefix_join(spark, replica_corpus).collect()
    )
    lsh = sorted(
        tuple(r)
        for r in dedup.lsh_verified_pairs(spark, replica_corpus).collect()
    )
    assert got == lsh
    assert len(got) > 0  # replicas are exact dups: J = 1.0 pairs exist


def test_adaptive_serves_exact_plan_on_distinct_corpus(spark):
    from mapreduce_wordcounter_spark.operators import dedup

    got = sorted(
        tuple(r)
        for r in dedup.jaccard_prefix_join(spark, SF_ORACLE).collect()
    )
    exact = sorted(
        tuple(r)
        for r in dedup._prefix_join_parts(spark, SF_ORACLE)["pairs"].collect()
    )
    assert got == exact
