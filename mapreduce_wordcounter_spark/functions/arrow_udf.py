"""Arrow-optimized scalar Python UDF (Spark 4 ``useArrow=True``).

Completes the repo's Python-execution matrix: row-Python UDF (banned
from hot paths by tests/test_plan_hygiene.py, represented only by the
deliberate UDTF), pandas UDF / mapInPandas (Arrow-batched, udaf.py and
multimodal.py), raw mapInArrow (multimodal.py) — and this, the scalar
``@udf(useArrow=True)`` form that keeps the familiar one-value-in /
one-value-out authoring model while the runner moves batches over
Arrow (plans as ArrowEvalPython, not BatchEvalPython, so the hygiene
sweep's row-Python ban stays intact).

The function body is nested so cloudpickle ships it by value (the repo
rule for every Python UDF — executors do not share the driver's
sys.path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.registry import query
from mapreduce_wordcounter_spark.tables import load_table


@query(
    "udf_arrow_vowel_ratio",
    oracle="""
    SELECT doc_id,
           ROUND(CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
                      AS DOUBLE)
                 / length(lower(text)), 6) AS vowel_ratio
    FROM documents
    WHERE length(text) > 0
    """,
)
def udf_arrow_vowel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document vowel ratio through an Arrow-optimized scalar
    Python UDF — deliberately a metric the engine could compute
    natively (the oracle does, in pure SQL), so the test pins that the
    Arrow UDF path produces byte-identical results to the JVM
    expression engine. The ratio divides two exact integers, so
    rounding is engine-safe.

    Scale: ArrowEvalPython — one vectorized map stage, batch-bounded
    executor memory; still ~an order slower than the native
    regexp_replace/length expressions, which is exactly why the repo
    keeps scalar Python off hot paths (SCALE.md §3)."""

    @F.udf("double", useArrow=True)
    def vowel_ratio(text: str) -> float:
        import math

        low = text.lower()
        # floor(x·1e6 + 0.5)/1e6, NOT Python round(): round() is
        # banker's at ties (41/128 → …312) while SQL ROUND is
        # half-away (→ …313) — the repo-wide quantize convention.
        return math.floor(
            sum(c in "aeiou" for c in low) / len(low) * 1_000_000 + 0.5
        ) / 1_000_000

    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.length("text") > 0).select(
        "doc_id", vowel_ratio("text").alias("vowel_ratio")
    )
