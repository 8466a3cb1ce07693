"""Physical-plan introspection (SURVEY.md §4 / §7 phase 7).

The reference hand-builds its physical plan in Go control flow, so its
"optimizations" are code (map-side combine at main.go:126,150, NumCPU
parallelism at main.go:31, chunked I/O at main.go:134-135). In this
engine Catalyst owns the physical plan — which means plan *quality* is
an observable, testable property rather than a code-review claim.

This module turns `df.explain()` text into structured facts so tests
(tests/test_plans.py) can pin the properties that matter at 100 TB:

- filters/projections reach the parquet scan (PushedFilters/ReadSchema);
- small dimensions broadcast instead of shuffling the fact side;
- aggregations are partial→final (the reference's combiner, for free);
- nothing plans a cartesian product or a row-at-a-time Python UDF
  in a hot path.

A regression in any of these is invisible at sf0.01 wall-clock but
fatal at the design scale — exactly the class of bug plan tests exist
to catch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed-plan string (post-AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text — scans carry PushedFilters/ReadSchema.
    (Same JVM entry point df.explain() prints through.)"""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@dataclass
class PlanFacts:
    """Structured summary of one query's physical plan."""

    n_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    n_shuffle_exchanges: int = 0
    has_partial_aggregate: bool = False
    has_final_aggregate: bool = False
    has_cartesian: bool = False
    has_python_row_udf: bool = False
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    scans: list[dict[str, str]] = field(default_factory=list)

    @property
    def pushed_filter_scans(self) -> int:
        return sum(1 for s in self.scans if s.get("pushed") not in (None, "", "[]"))


def plan_facts(df: DataFrame) -> PlanFacts:
    """Parse the formatted plan into checkable facts."""
    fmt = formatted_plan(df)
    phys = physical_plan(df)
    facts = PlanFacts()
    facts.n_broadcast_exchanges = phys.count("BroadcastExchange")
    facts.n_shuffle_exchanges = len(re.findall(r"Exchange (?:hash|range|Single)", phys))
    facts.n_exchanges = facts.n_broadcast_exchanges + facts.n_shuffle_exchanges
    facts.broadcast_joins = phys.count("BroadcastHashJoin") + phys.count(
        "BroadcastNestedLoopJoin"
    )
    facts.sortmerge_joins = phys.count("SortMergeJoin")
    facts.has_cartesian = "CartesianProduct" in phys
    facts.has_python_row_udf = "BatchEvalPython" in phys
    # HashAggregate appears in partial/final pairs; keys are only in the
    # formatted detail, but mode shows in the simple string as
    # `partial_<fn>` arguments vs final.
    facts.has_partial_aggregate = "partial_" in phys
    facts.has_final_aggregate = bool(
        re.search(r"HashAggregate|SortAggregate|ObjectHashAggregate", phys)
    )
    # Scan blocks in formatted output:
    #   (N) Scan parquet \n Output [..] ... PushedFilters: [...] ReadSchema: ...
    for block in re.split(r"\n\(\d+\) ", fmt):
        if not block.startswith("Scan parquet"):
            continue
        pushed = re.search(r"PushedFilters: (\[[^\]]*\])", block)
        schema = re.search(r"ReadSchema: ([^\n]+)", block)
        facts.scans.append(
            {
                "pushed": pushed.group(1) if pushed else "",
                "read_schema": schema.group(1).strip() if schema else "",
            }
        )
    return facts


def assert_scale_ready(df: DataFrame, *, allow_python_udf: bool = False) -> PlanFacts:
    """The minimum bar every declared query must clear: no cartesian
    product, no row-at-a-time Python UDF (Arrow-batched pandas UDFs show
    as ArrowEvalPython and are allowed)."""
    facts = plan_facts(df)
    if facts.has_cartesian:
        raise AssertionError(f"cartesian product in plan:\n{physical_plan(df)}")
    if facts.has_python_row_udf and not allow_python_udf:
        raise AssertionError(f"row-at-a-time Python UDF in plan:\n{physical_plan(df)}")
    return facts
