#!/usr/bin/env python
"""Decompose jaccard_prefix_join's scaling: candidates vs output.

Round 5's replica blow-up measured a 1.56 wall-clock exponent for the
prefix join and left the docstring's "work ∝ candidates" claim
contradicted by a shipped artifact. This harness separates the two
growth sources the single wall-clock number conflates:

  - CANDIDATE growth — what the prefix/length/positional filters
    control, the thing the operator's scale claim is about;
  - OUTPUT growth — true J >= 0.5 pairs, a property of the CORPUS: an
    exact join cannot emit fewer rows than there are true pairs.

It counts each pipeline stage (shingle rows, prefix rows, candidate
pairs, verified output pairs) and times the query at sf0.1 and at a
10x blow-up in BOTH modes:

  - distinct (realistic 10x: per-replica token remap, disjoint
    vocabularies, scale-invariant pair density), and
  - replica  (10 identical copies of every doc: pair density grows
    ~quadratically by construction).

Writes PREFIX_JOIN_DECOMP.json; SCALE.md cites the numbers.

Usage: python tools/prefix_join_decompose.py
(measurement discipline: 32g heap via SPARK_GRAFT_DRIVER_MEM, warm-up
pass, GC quiesce at pass boundaries, no concurrent Spark jobs)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_wordcounter_spark import get_spark
from mapreduce_wordcounter_spark.session import release_pinned

BASE = "/root/testdata/sf0.1"


def build(mode: str) -> str:
    dst = f"/tmp/scale10_{mode}"
    os.environ["SCALE_BLOWUP_MODE"] = mode
    from tools.scale_check import build_blowup

    build_blowup(dst)
    return dst


def measure(spark, sf_dir: str) -> dict:
    from mapreduce_wordcounter_spark.operators.dedup import (
        _prefix_join_parts,
        jaccard_pairs_strategy,
        jaccard_prefix_join,
    )

    # warm-up (codegen + the pinned shingle build)
    parts = _prefix_join_parts(spark, sf_dir)
    parts["pairs"].write.format("noop").mode("overwrite").save()
    counts = {k: parts[k].count() for k in ("shingles", "prefix", "cand", "pairs")}
    spark.catalog.clearCache()
    release_pinned()
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    _prefix_join_parts(spark, sf_dir)["pairs"].write.format("noop").mode(
        "overwrite"
    ).save()
    wall = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    release_pinned()
    # The ADAPTIVE serving entry (r9): on the replica corpus the mass
    # guard escalates to banded LSH, so its wall stays bounded while
    # the pure exact plan above shows the candidate blow-up.
    strategy = jaccard_pairs_strategy(spark, sf_dir)
    spark.catalog.clearCache()
    release_pinned()
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    jaccard_prefix_join(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    adaptive_wall = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    release_pinned()
    return {
        **{f"n_{k}": v for k, v in counts.items()},
        "wall_sec": wall,
        "adaptive_strategy": strategy["strategy"],
        "adaptive_mass_per_doc": round(strategy["mass_per_doc"], 2),
        "adaptive_wall_sec": adaptive_wall,
    }


def main() -> None:
    spark = get_spark("prefix-join-decompose")
    out: dict = {"base": measure(spark, BASE)}
    for mode in ("distinct", "replica"):
        out[f"x10_{mode}"] = measure(spark, build(mode))
    for mode in ("distinct", "replica"):
        b, x = out["base"], out[f"x10_{mode}"]
        out[f"exponents_{mode}"] = {
            k: round(math.log10(max(x[k] / max(b[k], 1e-9), 1e-9)), 2)
            for k in ("n_cand", "n_pairs", "wall_sec", "adaptive_wall_sec")
        }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PREFIX_JOIN_DECOMP.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
