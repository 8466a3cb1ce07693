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


# Shared oracle body: per-customer OLS slope from exact integer sums.
# {where} restricts the customer domain ('' = all customers).
_OLS_ORACLE = """
    WITH pts AS (
        SELECT o_custkey,
               epoch_us(o_orderdate) // 86400000000 AS x,
               CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
        FROM orders{where}),
    s AS (
        SELECT o_custkey, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM pts GROUP BY o_custkey)
    SELECT o_custkey, n AS n_orders,
           CAST(FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0)
                      * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS slope
    FROM s
    WHERE n >= 2 AND n * sxx - sx * sx > 0
    """


@query(
    "grouped_ols_slope",
    oracle=_OLS_ORACLE.format(where=" WHERE o_custkey % 97 = 0"),
)
def grouped_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-customer OLS slope of order
    total (dollars/day) over the order date — the per-group model-fit
    pattern (each group's rows land in one pandas frame; numpy does the
    math). The engine's third Pandas-API class after grouped-agg
    (udaf_weighted_mean) and map-batches (mm_features_pandas).

    Cross-engine exactness: inputs are integerized first (days since
    epoch; price in cents via floor(p*100+0.5)), the five OLS sums are
    exact int64 arithmetic (order-independent), and the closed form
    slope = (n·Sxy − Sx·Sy)/(n·Sxx − Sx²) goes through the identical
    float64 divide/quantize in numpy and DuckDB. Degenerate groups
    (n<2 or zero date variance) are dropped on both sides.

    Scale posture — grouped-map is the FEW-LARGE-GROUPS tool: each group
    pays a Python invocation + pandas frame construction, so fitting
    every customer this way costs ~1 ms × |customers| regardless of data
    size (measured: 15k tiny groups → 17 s at sf0.1 vs 0.3 s for the
    same math as JVM aggregates). The domain is therefore bounded to a
    deterministic customer sample (custkey % 97 = 0 — the "segments
    worth a model fit" regime); the all-customers scale path is
    ols_slope_agg below, same closed form as pure JVM aggregates.
    """
    o = _t_orders(spark, sf_dir).filter(F.col("o_custkey") % 97 == 0)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        import numpy as np
        import pandas as pd  # noqa: F811 — worker-side import by value

        x = pdf["x"].to_numpy(np.int64)
        y = pdf["y"].to_numpy(np.int64)
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx, sxy = int((x * x).sum()), int((x * y).sum())
        den = n * sxx - sx * sx
        if n < 2 or den == 0:
            return pd.DataFrame({"o_custkey": [], "n_orders": [], "slope": []}).astype(
                {"o_custkey": "int64", "n_orders": "int64", "slope": "float64"}
            )
        raw = (n * sxy - sx * sy) / den / 100.0
        slope = math.floor(raw * 1_000_000.0 + 0.5) / 1_000_000.0
        return pd.DataFrame(
            {
                "o_custkey": [int(pdf["o_custkey"].iloc[0])],
                "n_orders": [n],
                "slope": [slope],
            }
        )

    return o.groupBy("o_custkey").applyInPandas(
        fit, "o_custkey long, n_orders long, slope double"
    )


@query("ols_slope_agg", oracle=_OLS_ORACLE.format(where=""))
def ols_slope_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The all-customers scale path for grouped_ols_slope: identical
    closed-form OLS, but the five sums are built-in JVM aggregates (one
    partial→final hash aggregate, no Python anywhere) and the slope is a
    post-aggregation expression. Per-group cost is O(rows), not
    O(groups) Python invocations — this is the form that survives
    millions of groups at 100 TB. Same oracle body as the grouped-map
    demo, unrestricted domain."""
    o = _t_orders(spark, sf_dir)
    s = o.groupBy("o_custkey").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    raw = num.cast("double") / den.cast("double") / F.lit(100.0)
    slope = F.floor(raw * 1_000_000.0 + F.lit(0.5)).cast("long") / F.lit(1_000_000.0)
    return (
        s.filter((F.col("n") >= 2) & (den > 0))
        .select("o_custkey", F.col("n").alias("n_orders"), slope.alias("slope"))
    )


def _t_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ (midnight-aligned): days since epoch
    # via datediff == DuckDB's epoch_us // 86400e6 on naive timestamps.
    return o.select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
