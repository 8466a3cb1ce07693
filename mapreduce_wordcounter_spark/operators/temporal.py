"""Temporal join operators over ``events`` (north-star extension).

Spark has no native AS-OF join (DuckDB/Pandas/kdb do). The scalable
construction used here is the **union + running-last trick**: tag the
probe ("left") and reference ("right") streams, union them, and take a
per-key running ``last(right_payload, ignorenulls)`` over event time.
One shuffle (the window partition), no range-condition join — the
naive alternative (theta-join on ``b.ts <= a.ts`` + argmax) plans a
per-key cross product, which is quadratic in the hot keys and
unrunnable at 100 TB.

Ordering detail: rows sort by (ts, side) with the reference side
first, so a reference row at exactly the probe's timestamp IS matched
— the inclusive ``<=`` semantics of DuckDB's ``ASOF JOIN ... ON
b.ts <= a.ts``, which is also the oracle here.

The reference repo has no joins at all (single-input pipeline,
SURVEY.md §2.2) — this is extension surface with exact oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_wordcounter_spark.registry import query
from mapreduce_wordcounter_spark.session import ensure_utc
from mapreduce_wordcounter_spark.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


def _asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(click event, ts of the user's most recent purchase at-or-before
    it) — NULL when no prior purchase exists (left as-of)."""
    ensure_utc(spark)
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        "event_id",
        F.lit(None).cast("timestamp").alias("ref_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("ref_ts"),
    )
    # Reference rows sort before probe rows at equal ts → inclusive <=.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_purchase_ts", F.last("ref_ts", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select("event_id", "user_id", "ts", "last_purchase_ts")
    )


@query(
    "join_asof_last_purchase",
    oracle=f"""
    SELECT a.event_id,
           a.user_id,
           strftime(a.ts, '{_DUCK_TS_FMT}') AS click_ts,
           strftime(b.ts, '{_DUCK_TS_FMT}') AS last_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND b.ts <= a.ts
    """,
)
def join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each click matched to the same user's most recent
    purchase at or before it. Oracle is DuckDB's native ASOF JOIN; the
    Spark plan is the union + running-last construction (module
    docstring) — semantically identical, shuffle-optimal."""
    out = _asof_click_purchase(spark, sf_dir)
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("click_ts"),
        F.date_format("last_purchase_ts", _TS_FMT).alias("last_purchase_ts"),
    )


@query(
    "join_asof_tolerance_1h",
    oracle=f"""
    SELECT a.event_id,
           a.user_id,
           strftime(a.ts, '{_DUCK_TS_FMT}') AS click_ts,
           CASE WHEN a.ts - b.ts <= INTERVAL '1 hour'
                THEN strftime(b.ts, '{_DUCK_TS_FMT}') END AS recent_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND b.ts <= a.ts
    """,
)
def join_asof_tolerance_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with tolerance (pandas merge_asof's ``tolerance=``):
    the match only counts if the purchase happened within the hour
    before the click — staleness masking as a post-projection, zero
    extra plan cost."""
    out = _asof_click_purchase(spark, sf_dir)
    within = F.col("last_purchase_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("click_ts"),
        F.when(within, F.date_format("last_purchase_ts", _TS_FMT)).alias(
            "recent_purchase_ts"
        ),
    )


@query(
    "ev_resample_ffill",
    oracle="""
    WITH hourly AS (
        SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h,
               arg_max(value, epoch_us(ts)) AS v
        FROM events GROUP BY 1, 2),
    bounds AS (
        SELECT user_id,
               time_bucket(INTERVAL '1 hour', MIN(ts)) AS h0,
               time_bucket(INTERVAL '1 hour', MAX(ts)) AS h1
        FROM events GROUP BY 1),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
        FROM bounds)
    SELECT g.user_id,
           strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           last_value(hv.v IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.h) AS value_ffill
    FROM grid g
    LEFT JOIN hourly hv ON g.user_id = hv.user_id AND g.h = hv.h
    """,
)
def ev_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: snap each user's events onto a dense
    hourly grid (their first hour → last hour) and forward-fill gaps
    with the most recent observed value — the gap-filling primitive
    under downsampling, feature snapshots, and point-in-time training
    frames.

    Scale posture: the grid materializes via sequence()+explode on the
    per-user bounds row — rows ∝ users x hours, generated distributed,
    never on the driver. Everything shuffles once on user_id (the agg,
    the join, and the ffill window all share it). The last-in-hour
    pick is max_by over unix_micros so ties are impossible at µs
    resolution (verified: no (user, ts) duplicates in the corpus); the
    ffill is last(ignorenulls) over the event-time order — the same
    running-last trick as the AS-OF join above."""
    ensure_utc(spark)
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.expr("max_by(value, unix_micros(ts))").alias("v"))
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        )
    )
