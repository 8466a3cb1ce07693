"""tools/op_times.py — the runtime half of O14 (profiling analog):
an executed plan's operator tree must expose measured time metrics."""

from __future__ import annotations

import importlib.util
import os


def _load_op_times():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "op_times.py")
    spec = importlib.util.spec_from_file_location("op_times", os.path.abspath(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_collect_op_metrics_exposes_runtime(spark):
    from mapreduce_wordcounter_spark.registry import all_queries

    op_times = _load_op_times()
    rows = op_times.collect_op_metrics(
        all_queries()["wc_counts"](spark, "/root/testdata/sf0.001")
    )
    ops = [name for _, name, _ in rows]
    assert any("HashAggregate" in o for o in ops)
    assert any(o.startswith("Scan") for o in ops)
    # At least one operator reports a measured time metric and the agg
    # reports its output rows — i.e. these are runtime numbers, not plan
    # estimates.
    all_metrics = [m for _, _, m in rows]
    assert any(any("time" in k.lower() for k in m) for m in all_metrics)
    agg = next(m for name, m in [(n, m) for _, n, m in rows] if "HashAggregate" in name)
    assert agg.get("numOutputRows", 0) > 0
