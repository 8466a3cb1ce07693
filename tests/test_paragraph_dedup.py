"""Paragraph-level dedup invariants (oracle parity runs in
tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.registry import all_queries
from tests.conftest import SF_ORACLE

_QUERIES = all_queries()


@pytest.fixture(scope="module")
def para(spark):
    return _QUERIES["dedup_paragraphs"](spark, SF_ORACLE).toPandas()


def test_survivor_accounting(para):
    """0 <= n_kept <= n_paragraphs per doc (an exact-duplicate doc
    keeps zero — all its paragraphs first-occurred in the earlier
    copy)."""
    assert (para.n_kept >= 0).all()
    assert (para.n_kept <= para.n_paragraphs).all()
    assert ((para.kept_frac >= 0) & (para.kept_frac <= 1)).all()


def test_kept_total_equals_distinct_paragraphs(spark, para):
    from mapreduce_wordcounter_spark.operators.dedup import (
        _PARA_TOKENS,
        _POS_PACK,
    )
    from mapreduce_wordcounter_spark.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"[^\p{L}]+"), lambda x: x != ""
    )
    # Recompute distinct segment count independently (single-line corpus:
    # line split is identity, so doc-level token windows == paragraphs).
    n_distinct = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") > 0)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t), {_PARA_TOKENS}),"
                    f" i -> array_join(slice(t, i, {_PARA_TOKENS}), ' '))"
                )
            ).alias("seg")
        )
        .filter(F.col("seg") != "")
        .distinct()
        .count()
    )
    assert int(para.n_kept.sum()) == n_distinct
    # Duplicate docs exist in the corpus → some paragraphs must dedup.
    assert int(para.n_kept.sum()) < int(para.n_paragraphs.sum())
    # Packed-position-key capacity holds on this corpus (module bound).
    assert int(para.n_paragraphs.max()) < _POS_PACK


def test_planted_duplicates(spark, tmp_path):
    """Planted corpus: doc 1 is an exact copy of doc 0 (keeps ZERO
    paragraphs), doc 2 shares doc 0's first paragraph but not its
    second (keeps exactly its novel one), doc 3 is all-new (keeps
    all). Also exercises the multi-LINE path the sf corpus can't
    (paragraphs split on newline before windowing)."""
    p1 = " ".join(f"alpha{i}" for i in range(30))  # 30 tokens → 2 segments
    p2 = " ".join(f"beta{i}" for i in range(10))
    p3 = " ".join(f"gamma{i}" for i in range(10))
    rows = [
        (0, p1 + "\n" + p2, "en", "s0", 1),
        (1, p1 + "\n" + p2, "en", "s0", 1),  # exact copy
        (2, p1 + "\n" + p3, "en", "s0", 1),  # shares p1 only
        (3, p3 + " novel", "en", "s0", 1),   # p3 token-window differs from doc 2's
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = (
        _QUERIES["dedup_paragraphs"](spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    # doc 0: first occurrence of everything → keeps all 3 segments
    # (p1 = 2 windows of 25; p2 = 1; line split exercised).
    assert out.loc[0].n_kept == out.loc[0].n_paragraphs == 3
    assert out.loc[1].n_kept == 0 and out.loc[1].n_paragraphs == 3
    assert out.loc[2].n_paragraphs == 3 and out.loc[2].n_kept == 1  # p3 only
    assert out.loc[3].n_kept == out.loc[3].n_paragraphs == 1
