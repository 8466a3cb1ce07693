"""Golden-fixture and invariant tests (SURVEY.md §5.2 layers 1+3,
FIXTURES.md §1-2).

Layer 1 ports the reference's only test — its exact corpus and exact
expected counts (main_test.go:9-48) — then closes the fixture gaps the
reference leaves open (casing is claimed in its README but untested;
digits/underscores/apostrophes/empty docs aren't covered at all).

Layer 3 checks the algebraic laws of the computation (SURVEY.md
Appendix A.6): token conservation, permutation invariance, and the
corpus-doubling merge law the reference's two-identical-files test
gestures at.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The exact content of the reference's test files (main_test.go:16).
_GOLDEN_TEXT = "apple orange! banana? apple.\n banana apple: apple. banana..."

# FIXTURES.md §2 edge-case corpus.
_EDGE_DOCS = [
    (1, "Apple APPLE aPpLe"),
    (2, "don't can't"),
    (3, "foo123bar x_y"),
    (4, "  ...  !!!  "),
    (5, ""),
    (6, "one-two three--four"),
    (7, "AAA aaa AaA bbb"),
]


def _word_counts(docs: DataFrame) -> dict[str, int]:
    """The flagship pipeline over an arbitrary (doc_id, text) frame —
    same expression tree as wordcount.tokens (SURVEY.md §2.3)."""
    counts = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"[^\p{L}]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
    )
    return {r["word"]: r["count"] for r in counts.collect()}


@pytest.fixture(scope="module")
def golden(spark):
    """Two identical docs — the reference's exact fixture shape."""
    return spark.createDataFrame(
        [(1, _GOLDEN_TEXT), (2, _GOLDEN_TEXT)], "doc_id long, text string"
    )


def test_reference_golden_counts(spark, golden):
    """The reference's golden assertion, verbatim: {apple: 8, orange: 2,
    banana: 6} (main_test.go:36-40)."""
    assert _word_counts(golden) == {"apple": 8, "banana": 6, "orange": 2}


def test_reference_golden_vocab(spark, golden):
    """The program's actual printed output: distinct vocabulary = 3
    (main.go:73)."""
    vocab = (
        golden.select(
            F.explode(F.split(F.lower("text"), r"[^\p{L}]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .agg(F.countDistinct("word").alias("v"))
        .collect()[0]["v"]
    )
    assert vocab == 3


@pytest.mark.parametrize(
    "doc_id,expected",
    [
        (1, {"apple": 3}),
        (2, {"don": 1, "t": 2, "can": 1}),
        (3, {"foo": 1, "bar": 1, "x": 1, "y": 1}),
        (4, {}),
        (5, {}),
        (6, {"one": 1, "two": 1, "three": 1, "four": 1}),
        (7, {"aaa": 3, "bbb": 1}),
    ],
)
def test_edge_corpus(spark, doc_id, expected):
    """FIXTURES.md §2: the tokenizer edges the reference never tests —
    casing, apostrophes, digits/underscore separators, hyphen splits,
    punctuation-only and empty documents."""
    text = dict(_EDGE_DOCS)[doc_id]
    docs = spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
    assert _word_counts(docs) == expected


def test_unicode_letters_tokenize(spark):
    """Unicode-letter parity with the reference's unicode.IsLetter
    (main.go:143): ASCII-adjacent European scripts keep accents, and
    Java's full lowercase mapping applies. Spark-side only (App. B.4 —
    the DuckDB oracle corpus stays ASCII)."""
    docs = spark.createDataFrame(
        [(1, "Straße café ÎLE naïve 北京 word")], "doc_id long, text string"
    )
    got = _word_counts(docs)
    assert got == {
        "straße": 1,
        "café": 1,
        "île": 1,
        "naïve": 1,
        "北京": 1,
        "word": 1,
    }


# ---------------------------------------------------------------------------
# Layer 3: algebraic invariants (SURVEY.md Appendix A.6)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    """A slice of the real documents table plus every edge doc."""
    from mapreduce_wordcounter_spark.tables import load_table

    real = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(100)
    )
    edge = spark.createDataFrame(
        [(1000 + i, t) for i, t in _EDGE_DOCS], "doc_id long, text string"
    )
    return real.unionByName(edge).cache()


def test_token_conservation(spark, corpus):
    """sum(cnt) over the grouped result == total token count of the
    corpus (no token created or lost by the aggregation)."""
    toks = corpus.select(
        F.explode(F.split(F.lower("text"), r"[^\p{L}]+")).alias("word")
    ).filter(F.col("word") != "")
    total = toks.count()
    summed = toks.groupBy("word").count().agg(F.sum("count")).collect()[0][0]
    assert summed == total


def test_permutation_invariance(spark, corpus):
    """Counts are invariant under document order (the reference's
    unordered work queue, main.go:102-105, made into a law)."""
    fwd = _word_counts(corpus)
    rev = _word_counts(corpus.orderBy(F.desc("doc_id")))
    assert fwd == rev


def test_corpus_doubling_law(spark, corpus):
    """Counts over D ⊎ D = 2× counts over D (Appendix A.6 — the
    generalization of the reference's two-identical-files trick)."""
    once = _word_counts(corpus)
    twice = _word_counts(corpus.unionByName(corpus))
    assert twice == {w: 2 * c for w, c in once.items()}


def test_lowercase_idempotence(spark, corpus):
    """lower(lower(x)) == lower(x) over every token in the corpus."""
    toks = corpus.select(
        F.explode(F.split(F.lower("text"), r"[^\p{L}]+")).alias("word")
    ).filter(F.col("word") != "")
    n_bad = toks.filter(F.lower("word") != F.col("word")).count()
    assert n_bad == 0


def test_counts_positive_and_vocab_consistent(spark, corpus):
    """Every grouped count ≥ 1, and the scalar summary equals the
    grouped result's cardinality (main.go:73 == len of the map)."""
    grouped = (
        corpus.select(
            F.explode(F.split(F.lower("text"), r"[^\p{L}]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .cache()
    )
    assert grouped.filter(F.col("count") < 1).count() == 0
    vocab = (
        corpus.select(
            F.explode(F.split(F.lower("text"), r"[^\p{L}]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .agg(F.countDistinct("word"))
        .collect()[0][0]
    )
    assert vocab == grouped.count()
