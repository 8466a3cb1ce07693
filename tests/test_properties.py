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
