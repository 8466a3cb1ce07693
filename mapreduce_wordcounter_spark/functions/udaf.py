"""User-defined aggregate surface: Arrow-batched Pandas UDAF.

The reference exposes no UDF/UDAF surface at all (its tokenizer is the
hard-coded moral equivalent of one UDTF, SURVEY.md §2.2) — this module
demonstrates the engine's *extension* aggregate path: a grouped-agg
``pandas_udf`` running vectorized over Arrow batches inside a normal
``groupBy().agg()``, with partial aggregation handled by Spark's
ObjectHashAggregate.

Why a UDAF and not SQL: the point is the machinery. The example —
pseudo-weighted mean — is deliberately SQL-expressible so the driver's
DuckDB oracle can verify the Arrow path bit-for-bit (same quantize-to-
int trick as functions/numeric.py: int64 sums are order-independent,
so the distributed execution order can't perturb the hash).

Scale posture: grouped-agg pandas UDFs hold one group's column slice
in memory per invocation — fine for bounded groups like event types;
for unbounded groups prefer built-in aggregates or an explicit
two-stage (partial struct → merge) formulation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.registry import query
from mapreduce_wordcounter_spark.tables import load_table


def weighted_mean_udaf():
    """Build the grouped-agg pandas UDF. Nested definition → cloudpickle
    serializes by value (workers don't share the driver's sys.path —
    same rule as mm_features_pandas / user_running_counts)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        # Quantize to int64 micro-units first: integer sums are
        # order-independent, so the result is identical no matter how
        # Arrow batches or group slices arrive.
        q = (v * 1_000_000 + 0.5).apply(int)
        return float(int((q * w).sum()) / int(w.sum()) / 1_000_000)

    return wmean


@query(
    "udaf_weighted_mean",
    oracle="""
    SELECT event_type,
           ROUND(CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)
                          * (1 + event_id % 7)) AS DOUBLE)
                 / SUM(1 + event_id % 7) / 1000000.0, 6) AS wmean_value
    FROM events
    GROUP BY event_type
    """,
)
def udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type weighted mean of ``value`` with deterministic
    pseudo-weights (1 + event_id mod 7), computed by the Pandas UDAF and
    verified against straight SQL in DuckDB."""
    e = load_table(spark, sf_dir, "events")
    wmean = weighted_mean_udaf()
    weighted = e.select(
        "event_type", "value", (1 + F.col("event_id") % 7).alias("w")
    )
    return weighted.groupBy("event_type").agg(
        F.round(wmean("value", "w"), 6).alias("wmean_value")
    )
