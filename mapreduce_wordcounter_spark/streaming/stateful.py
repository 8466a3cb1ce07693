"""Custom stateful streaming operator (SURVEY.md §7 phase 6).

``applyInPandasWithState`` is the escape hatch for streaming semantics
the built-in operators can't express: arbitrary per-key state machines,
custom eviction, cross-event logic. The operator here — a cumulative
per-user event counter — is deliberately simple so its *machinery*
(Arrow-batched state updates, update-mode emission, state schema) is
fully exercised while its semantics stay oracle-checkable: drained over
a finite source, the final per-user count must equal the batch
``GROUP BY user_id`` count.

Scale posture: state is partitioned by the grouping key across
executors and checkpointed via the state store (RocksDB-backed in
production); per-key state here is a single long, so state size is
O(distinct users), the same bound a built-in streaming agg would have.
The reference has no streaming at all (terminates after one pass,
main.go:106-110) — this is north-star extension surface.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from mapreduce_wordcounter_spark.registry import query
from mapreduce_wordcounter_spark.streaming.windows import events_stream

_OUT_SCHEMA = "user_id bigint, n_events bigint"
_STATE_SCHEMA = "n bigint"


def user_running_counts(stream: DataFrame) -> DataFrame:
    """Attach the stateful running-count operator to an events stream.
    Emits one (user_id, cumulative n_events) row per key per
    micro-batch in update mode.

    The state-transition function is nested so cloudpickle serializes
    it BY VALUE: Spark's Python workers don't share the driver's
    sys.path, so a module-level function would unpickle by reference
    and die with ModuleNotFoundError when the package is loaded via a
    path hack (the grading driver does exactly that). Same rule as
    mm_features_pandas."""

    def update_running_count(key, pdfs, state):
        # Per-key state transition: fold this micro-batch's rows into
        # the stored count, emit the new cumulative value.
        import pandas as pd

        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return stream.groupBy("user_id").applyInPandasWithState(
        update_running_count,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query(
    "stream_stateful_user_counts",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful operator drained over the finite events source:
    the last cumulative emission per user equals the batch GROUP BY
    count — streaming-batch equivalence as the correctness contract
    (multi-batch state progression is pinned in tests/test_streaming.py)."""
    out = user_running_counts(events_stream(spark, sf_dir))
    name = "stream_stateful_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    # Update mode appends one row per key per micro-batch; the running
    # count is monotone, so max = final.
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
