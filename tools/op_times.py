#!/usr/bin/env python
"""Per-operator runtime metrics dump — the runtime half of SURVEY §2.1
O14 (the reference's ``-profile=cpu|mem|block|trace`` switch,
main.go:27,33-57).

The reference attaches a Go profiler to its one hard-coded pipeline; the
Spark-first analog is the engine's own SQLMetrics: every physical
operator of an *executed* plan carries its measured wall-times (codegen
pipeline time, shuffle write/fetch time, sort/agg time, spill sizes) and
row counts. This tool executes a registered query and prints the final
(post-AQE) operator tree with those metrics — i.e. where the time
actually went, per operator, from the runtime, not an estimate.

Usage: python tools/op_times.py [query ...]   (default: a showcase set)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_wordcounter_spark import get_spark  # noqa: E402
from mapreduce_wordcounter_spark.registry import all_queries  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

DEFAULT = [
    "wc_counts",
    "q5_regional_revenue",
    "tf_idf",
    "minhash_signatures",
    "pipeline_curate",
]

# Metrics worth printing: anything time-like, plus volume indicators.
_KEEP = ("time", "duration", "numOutputRows", "spill", "dataSize", "peak")


def _scala_map_items(jmap):
    it = jmap.iterator()
    while it.hasNext():
        kv = it.next()
        yield kv._1(), kv._2()


def collect_op_metrics(df) -> list[tuple[int, str, dict[str, int]]]:
    """Execute ``df`` and return (depth, operator, metrics) rows for the
    final physical plan (AQE-resolved when adaptive execution ran)."""
    df.collect()
    node = df._jdf.queryExecution().executedPlan()
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        node = node.executedPlan()

    out: list[tuple[int, str, dict[str, int]]] = []

    def walk(n, depth: int) -> None:
        metrics = {}
        for key, metric in _scala_map_items(n.metrics()):
            if any(k.lower() in key.lower() for k in _KEEP):
                metrics[key] = metric.value()
        out.append((depth, n.nodeName(), metrics))
        # AQE wraps materialized stages in *QueryStageExec leaves; the
        # actual operator subtree hangs off .plan(), not .children().
        if "QueryStage" in n.nodeName():
            walk(n.plan(), depth + 1)
            return
        children = n.children()
        for i in range(children.size()):
            walk(children.apply(i), depth + 1)

    walk(node, 0)
    return out


def main(argv: list[str]) -> None:
    names = argv or DEFAULT
    spark = get_spark("op-times")
    queries = all_queries()
    for name in names:
        if name not in queries:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        print(f"\n== {name} (sf={SF}) ==")
        for depth, op, metrics in collect_op_metrics(queries[name](spark, SF)):
            shown = ", ".join(f"{k}={v}" for k, v in sorted(metrics.items()))
            print(f"{'  ' * depth}{op}" + (f"  [{shown}]" if shown else ""))


if __name__ == "__main__":
    main(sys.argv[1:])
