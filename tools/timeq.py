#!/usr/bin/env python
"""Time individual registered queries with bench.py's exact methodology
(shared session, untimed warm-up pass, then min over N timed passes of
a noop-sink write, cache + pins cleared and GC quiesced per pass).

Usage:
  SPARK_GRAFT_CPUS=32 python tools/timeq.py wc_counts lsh_verified_pairs
Env:
  SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  TIMEQ_PASSES        timed passes (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from mapreduce_wordcounter_spark import get_spark  # noqa: E402
from mapreduce_wordcounter_spark.registry import all_queries  # noqa: E402
from mapreduce_wordcounter_spark.session import release_pinned  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    npass = int(os.environ.get("TIMEQ_PASSES", "3"))
    spark = get_spark("timeq")
    queries = all_queries()

    for name in names:  # untimed warm-up (JIT/codegen)
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for _ in range(npass):
        spark.catalog.clearCache()
        release_pinned()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        for name in names:
            fn = queries[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
