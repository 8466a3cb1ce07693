"""PII detection/redaction invariants (oracle parity runs in
tests/test_oracle_parity.py; these pin that the planted-span
construction actually exercises the detectors — a regex bug that
matched nothing would still be "parity green" if the oracle had the
same bug, but it cannot survive these count pins)."""

from __future__ import annotations

import pytest

from mapreduce_wordcounter_spark.registry import all_queries
from tests.conftest import SF_ORACLE

_QUERIES = all_queries()


@pytest.fixture(scope="module")
def pii(spark):
    return _QUERIES["pii_counts"](spark, SF_ORACLE).toPandas().set_index("doc_id")


def test_planted_spans_are_detected(pii):
    """Exactly one span of each planted kind, keyed on doc_id."""
    for doc_id, row in pii.iterrows():
        assert row.n_email == (1 if doc_id % 3 == 0 else 0), doc_id
        assert row.n_phone == (1 if doc_id % 5 == 0 else 0), doc_id
        assert row.n_ipv4 == (1 if doc_id % 7 == 0 else 0), doc_id
        assert row.has_pii == (
            doc_id % 3 == 0 or doc_id % 5 == 0 or doc_id % 7 == 0
        ), doc_id


def test_redaction_removes_every_span_and_only_spans(spark, pii):
    """len_after differs from len_before exactly by the span/placeholder
    deltas, and a doc with no planted PII is untouched."""
    red = (
        _QUERIES["pii_redacted_stats"](spark, SF_ORACLE)
        .toPandas()
        .set_index("doc_id")
    )
    joined = red.join(pii)
    assert (joined.n_pii == joined.n_email + joined.n_phone + joined.n_ipv4).all()
    clean = joined[~joined.has_pii]
    assert (clean.len_before == clean.len_after).all()
    dirty = joined[joined.has_pii]
    assert (dirty.len_before != dirty.len_after).all()


def test_pipeline_gate_is_vacuous_on_raw_corpus(spark):
    """The raw corpus is letters-only, so the pipeline_curate PII gate
    must drop zero docs — pinned so a regex typo that started matching
    plain words shows up as a diff here, not as a silent survivor-count
    drift inside the composed oracle."""
    from mapreduce_wordcounter_spark.operators.text import (
        _PII_EMAIL,
        _PII_IPV4,
        _PII_PHONE,
    )
    from mapreduce_wordcounter_spark.tables import load_table

    import pyspark.sql.functions as F

    docs = load_table(spark, SF_ORACLE, "documents")
    n_hit = docs.filter(
        F.col("text").rlike(_PII_EMAIL)
        | F.col("text").rlike(_PII_PHONE)
        | F.col("text").rlike(_PII_IPV4)
    ).count()
    assert n_hit == 0
