"""Property-based differential tests (SURVEY.md §5.2 layer 3).

Hypothesis generates adversarial corpora (mixed case, punctuation
runs, digits, underscores, empty docs, whitespace-only docs) and the
Spark pipeline must match a trivially-correct pure-Python reference
tokenizer on every one. This is the randomized generalization of the
golden fixtures — the reference repo has nothing like it (one fixed
test, main_test.go:9-48).

Example counts are kept small because every example is a Spark job;
the value is in the generator's edge-case bias, not volume.
"""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# ASCII-only alphabet, heavy on separators and case variety — the
# domain where Spark (\p{L}), DuckDB, and Python agree (FIXTURES.md §4).
_ALPHABET = "abcABC xyZ 0189_-.,!?'\n\t"

_docs_strategy = st.lists(
    st.text(alphabet=_ALPHABET, max_size=80), min_size=0, max_size=8
)


def _py_reference_counts(texts: list[str]) -> Counter:
    """The normative spec (SURVEY.md Appendix A) in three lines of
    obviously-correct Python: maximal letter runs, lowercased."""
    c: Counter = Counter()
    for t in texts:
        c.update(w.lower() for w in re.findall(r"[a-zA-Z]+", t))
    return c


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_docs_strategy)
def test_spark_matches_python_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] or [(0, "")],
        "doc_id long, text string",
    )
    got = {
        r["word"]: r["count"]
        for r in (
            docs.select(
                F.explode(F.split(F.lower("text"), r"[^\p{L}]+")).alias("word")
            )
            .filter(F.col("word") != "")
            .groupBy("word")
            .count()
            .collect()
        )
    }
    want = dict(_py_reference_counts(texts if texts else [""]))
    assert got == want


# --- substring-span dedup vs a pure-Python reference ------------------------

_SPAN_W, _SPAN_STRIDE = 40, 10  # mirrors operators/dedup.py

_span_docs_strategy = st.lists(
    st.text(alphabet="ab A", min_size=0, max_size=120), min_size=0, max_size=6
)


def _py_span_reference(texts: list[str]) -> dict[int, tuple[int, int, int]]:
    """(n_windows, n_dup_spans, n_removed) per doc, from the obvious
    quadratic-free Python: strided windows over lower(text), global
    occurrence counts, first-occurrence by (doc, pos)."""
    wins: list[tuple[int, int, str]] = []
    for d, t in enumerate(texts):
        t = t.lower()
        for i in range(0, len(t) - _SPAN_W + 1, _SPAN_STRIDE):
            wins.append((d, i + 1, t[i : i + _SPAN_W]))
    occ: Counter = Counter(s for _, _, s in wins)
    first: dict[str, tuple[int, int]] = {}
    for d, p, s in sorted(wins):
        first.setdefault(s, (d, p))
    out: dict[int, tuple[int, int, int]] = {}
    for d, p, s in wins:
        n, dup, rem = out.get(d, (0, 0, 0))
        out[d] = (
            n + 1,
            dup + (occ[s] > 1),
            rem + (first[s] != (d, p)),
        )
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_span_docs_strategy)
def test_span_dedup_matches_python_reference(spark, texts, tmp_path_factory):
    """dedup_substring_spans on Hypothesis corpora (tiny alphabet →
    dense genuine duplicates, including within-document repeats and
    sub-window docs) must match the pure-Python window accounting."""
    from mapreduce_wordcounter_spark.registry import all_queries

    d = tmp_path_factory.mktemp("span_sf")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
        or [(0, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    rows = all_queries()["dedup_substring_spans"](spark, str(d)).collect()
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_spans"], r["n_removed"])
        for r in rows
    }
    want = _py_span_reference(texts if texts else [""])
    assert got == want


# --- C4 line filter vs a pure-Python reference ------------------------------

_c4_docs_strategy = st.lists(
    st.text(alphabet="ab dup\nX ", min_size=0, max_size=150),
    min_size=0,
    max_size=6,
)


def _py_c4_reference(texts: list[str]) -> dict[int, tuple[int, int, int]]:
    """(n_lines, n_kept, kept_words) per doc: trimmed newline lines →
    [a-z]+ tokens (lowercased) → 25-token windows → keep iff >= 5
    words and no 'dup' token (mirrors operators/text.py constants)."""
    out: dict[int, tuple[int, int, int]] = {}
    for d, t in enumerate(texts):
        segs: list[list[str]] = []
        for line in (s.strip() for s in t.split("\n")):
            if not line:
                continue
            toks = [w.lower() for w in re.findall(r"[a-zA-Z]+", line)]
            if not toks:
                continue
            for i in range(0, len(toks), 25):
                seg = toks[i : i + 25]
                if seg:
                    segs.append(seg)
        if not segs:
            continue
        kept = [s for s in segs if len(s) >= 5 and "dup" not in s]
        out[d] = (len(segs), len(kept), sum(len(s) for s in kept))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_c4_docs_strategy)
def test_c4_filter_matches_python_reference(spark, texts, tmp_path_factory):
    """c4_line_filter on Hypothesis corpora (planted 'dup' blocklist
    hits, short trailing windows, whitespace-only and empty docs) must
    match the pure-Python rule evaluation."""
    from mapreduce_wordcounter_spark.registry import all_queries

    d = tmp_path_factory.mktemp("c4_sf")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
        or [(0, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    rows = all_queries()["c4_line_filter"](spark, str(d)).collect()
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_words"]) for r in rows
    }
    want = _py_c4_reference(texts)
    assert got == want


def _py_morton(x: int, y: int) -> int:
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=50,
    )
)
def test_morton_expression_matches_python(spark, pts):
    """The unrolled div/% z-value expression must equal the obviously-
    correct Python bit interleave on adversarial coordinates (all-ones,
    alternating bits, boundary values — hypothesis finds them)."""
    from mapreduce_wordcounter_spark.operators.layout import _SPARK_Z

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "i long, x long, y long"
    )
    got = {
        r["i"]: r["z"]
        for r in df.withColumn(
            "z", F.expr(_SPARK_Z.format(x="x", y="y"))
        ).collect()
    }
    for i, (x, y) in enumerate(pts):
        assert got[i] == _py_morton(x, y), (x, y)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.data(),
)
def test_prefix_join_lossless_on_random_corpora(spark, data, tmp_path_factory):
    """The AllPairs/PPJoin losslessness claim, fuzzed: on arbitrary
    small corpora (random words, random duplication structure) the
    prefix-filtered join must return EXACTLY the all-pairs baseline's
    result — same pairs, same jaccard values."""
    from mapreduce_wordcounter_spark.registry import all_queries

    rng_words = data.draw(
        st.lists(
            st.text(alphabet="abcdefg", min_size=1, max_size=4),
            min_size=4,
            max_size=12,
            unique=True,
        )
    )
    n_docs = data.draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        n_w = data.draw(st.integers(3, 12))
        words = [
            rng_words[data.draw(st.integers(0, len(rng_words) - 1))]
            for _ in range(n_w)
        ]
        docs.append((i, " ".join(words), "en", "synth", len(" ".join(words))))
    # duplicate one doc exactly so the J >= 0.5 result is non-trivial
    # on most draws
    docs.append((n_docs, docs[0][1], "en", "synth", docs[0][4]))
    d = tmp_path_factory.mktemp("ppjoin_fuzz")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    qs = all_queries()
    exact = (
        qs["jaccard_near_dup_pairs"](spark, str(d))
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pref = (
        qs["jaccard_prefix_join"](spark, str(d))
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert exact.equals(pref), (exact, pref)
