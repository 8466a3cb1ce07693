"""Plan-shape tests (SURVEY.md §4): pin the physical-plan properties
that matter at the 100 TB design point. Wall-clock at sf0.01 cannot
distinguish a pruned scan from a full scan or a broadcast join from a
shuffled one — these assertions can.
"""

from __future__ import annotations

import pytest

from mapreduce_wordcounter_spark.plans.inspect import (
    assert_scale_ready,
    plan_facts,
)
from mapreduce_wordcounter_spark.registry import all_queries
from tests.conftest import SF_ORACLE

_QUERIES = all_queries()

# Queries allowed to plan ArrowEvalPython (pandas UDF paths by design:
# multimodal feature extraction). Nothing may plan BatchEvalPython.
_PANDAS_UDF_OK = {"mm_features_pandas"}

# The Python UDTF is the *deliberate* slow-path surface demo — its
# docstring records the cost and points at the codegen twin (wc_counts).
# Nothing else may plan row-at-a-time Python.
_ROW_PYTHON_OK = {"udtf_tokenize_counts"}

# Streaming-only entries construct a streaming query; plan introspection
# of the batch shape is covered by their ev_* batch twins.
_SKIP = {"stream_tumbling_live"}


@pytest.mark.parametrize("name", sorted(n for n in _QUERIES if n not in _SKIP))
def test_every_query_is_scale_ready(name, spark):
    """No declared query may plan a cartesian product or a
    row-at-a-time Python UDF."""
    df = _QUERIES[name](spark, SF_ORACLE)
    assert_scale_ready(df, allow_python_udf=name in _ROW_PYTHON_OK)


def test_scan_pruning_and_pushdown(spark):
    """scan_filter_project must read only the projected columns and
    push its predicate into the parquet scan — the Catalyst equivalents
    of the reference's hand-rolled 'only do the work you need' loop."""
    facts = plan_facts(_QUERIES["scan_filter_project"](spark, SF_ORACLE))
    assert facts.scans, "expected a parquet scan"
    scan = facts.scans[0]
    assert scan["pushed"] not in ("", "[]"), f"no pushdown: {scan}"
    # Column pruning: lineitem has 16 columns; the read schema must not
    # materialize all of them.
    assert scan["read_schema"].count(":") < 10, scan["read_schema"]


def test_small_dims_broadcast(spark):
    """nation⋈region joins must broadcast the dimensions, never
    shuffle the fact side (q5-style plans at scale die without this)."""
    facts = plan_facts(_QUERIES["join_broadcast_dims"](spark, SF_ORACLE))
    assert facts.broadcast_joins >= 1
    assert facts.sortmerge_joins == 0


def test_q5_join_strategy(spark):
    """TPC-H Q5 shape: the region/nation dims and the pre-filtered
    customer/supplier legs all broadcast; at most ONE shuffle join
    survives — the big-big co⋈lis fact join on (orderkey, nationkey),
    which is the one join that genuinely cannot broadcast at scale."""
    facts = plan_facts(_QUERIES["q5_regional_revenue"](spark, SF_ORACLE))
    assert facts.broadcast_joins >= 4, facts
    assert facts.sortmerge_joins <= 1, facts


def test_wordcount_partial_aggregate(spark):
    """The flagship groupBy(word).count() must split partial→final —
    the map-side combiner the reference hand-implements
    (main.go:126,150) and gets for free here."""
    facts = plan_facts(_QUERIES["wc_counts"](spark, SF_ORACLE))
    assert facts.has_partial_aggregate
    assert facts.has_final_aggregate


def test_wordcount_single_shuffle(spark):
    """One logical shuffle for the word aggregation — no accidental
    extra exchanges in the flagship pipeline."""
    facts = plan_facts(_QUERIES["wc_counts"](spark, SF_ORACLE))
    assert facts.n_shuffle_exchanges <= 1, facts


def test_wordcount_plan_immune_to_cms_pin(spark):
    """wc_cms_heavy_hitters pins a vocab-count relation whose aggregate
    is alias-identical to wc_counts' — the pin must carry a marker
    column so the CacheManager cannot substitute it into wc_counts'
    executed plan (r12: it did, doubling wc_counts' exchanges in any
    session where the CMS query built first)."""
    from mapreduce_wordcounter_spark.session import release_pinned

    _QUERIES["wc_cms_heavy_hitters"](spark, SF_ORACLE)  # registers its pin
    try:
        facts = plan_facts(_QUERIES["wc_counts"](spark, SF_ORACLE))
        assert facts.n_shuffle_exchanges <= 1, facts
    finally:
        release_pinned()
        spark.catalog.clearCache()


def test_minhash_single_shuffle(spark):
    """The wide MinHash aggregate computes all 16 permutations in one
    groupBy(doc_id) pass: exactly one shuffle beyond the shingle
    relation's own data-bounded doc_id spread (r13: the pinned shingle
    build carries one keyed exchange of the raw doc scan so the
    tokenize+3-gram+md5 runs cluster-wide — see _spark_shingles), and
    banding adds none (stack/concat are projections)."""
    # Cold plan: a populated shingle cache embeds the cached subtree's
    # own exchanges in the plan string and would double-count.
    spark.catalog.clearCache()
    facts = plan_facts(_QUERIES["minhash_signatures"](spark, SF_ORACLE))
    # Shingles dedup per-row (array_distinct) → the only shuffles are
    # the shingle spread + the wide groupBy(doc_id) aggregate.
    assert facts.n_shuffle_exchanges <= 2, facts


def test_tfidf_broadcasts_df_side(spark):
    """TF-IDF joins tf (big) with df (vocabulary-sized): the df side
    must broadcast."""
    facts = plan_facts(_QUERIES["tf_idf"](spark, SF_ORACLE))
    assert facts.broadcast_joins >= 1, facts
    assert facts.sortmerge_joins == 0, facts


def test_multimodal_uses_arrow_not_row_udf(spark):
    """Pandas-UDF paths must be Arrow-batched (ArrowEvalPython), never
    BatchEvalPython."""
    from mapreduce_wordcounter_spark.plans.inspect import physical_plan

    df = _QUERIES["mm_features_pandas"](spark, SF_ORACLE)
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan


def test_paragraph_dedup_shuffles_hash_not_text(spark):
    """dedup_paragraphs' corpus-wide exchange must carry the md5 key +
    packed position, never the paragraph string: Catalyst projects
    md5(seg) below the window exchange and prunes seg. If a refactor
    reorders the projection, the shuffle payload silently grows by the
    full corpus text — this pins the pruning."""
    from mapreduce_wordcounter_spark.plans.inspect import physical_plan

    plan = physical_plan(_QUERIES["dedup_paragraphs"](spark, SF_ORACLE))
    # The pre-exchange projection computes the hash...
    assert "md5(" in plan
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange hashpartitioning(_w" in line:
            # ...and the first Project feeding the window exchange
            # must not retain the seg string column.
            below = "\n".join(lines[i + 1 : i + 3])
            assert "md5(" in below and "seg#" not in below.split("AS _w")[0].rsplit("md5", 1)[0], below
            break
    else:
        raise AssertionError("window exchange not found in plan:\n" + plan)


def test_substring_spans_shuffle_hash_not_text(spark):
    """dedup_substring_spans' window exchange must carry md5(span) +
    the packed position, never the 40-char span string itself — same
    pruning pin as the paragraph-dedup twin (the shuffle payload
    would otherwise be ~4x the corpus text at stride 10)."""
    from mapreduce_wordcounter_spark.plans.inspect import physical_plan

    plan = physical_plan(_QUERIES["dedup_substring_spans"](spark, SF_ORACLE))
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange hashpartitioning(_w" in line:
            project = lines[i + 1]
            assert "md5(" in project, project
            # The projection's OUTPUT columns must not include the raw
            # span (it may appear inside the md5(...) argument only).
            outputs = project.split("Project [", 1)[1]
            stripped = outputs.replace("md5(cast(span", "md5(cast(_", 1)
            assert "span#" not in stripped, project
            break
    else:
        raise AssertionError("window exchange not found in plan:\n" + plan)


def test_runtime_bloom_filter_injects_when_broadcast_impossible(spark):
    """At 100 TB a selective dimension side often exceeds the broadcast
    threshold; Spark's runtime bloom filter then prunes the fact scan
    instead (a bloom built from the filtered side is pushed into the
    probe side's scan). At test scale AQE broadcasts everything, so
    this pins the behavior in the exact regime that matters: broadcast
    disabled → InjectRuntimeFilter adds bloom_filter_agg/might_contain
    around the fact scan."""
    from pyspark.sql import functions as F

    saved_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        opt = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "might_contain" in opt and "bloom_filter_agg" in opt, opt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_thresh)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            saved_scan,
        )


def test_shuffle_hash_hint_is_honored(spark):
    """join_hinted_shuffle_hash must plan a ShuffledHashJoin — the
    hint, not the optimizer's default (SMJ or broadcast), decides."""
    from mapreduce_wordcounter_spark.operators.relational import (
        join_hinted_shuffle_hash,
    )
    from mapreduce_wordcounter_spark.plans.inspect import physical_plan
    from tests.conftest import SF_ORACLE

    plan = physical_plan(join_hinted_shuffle_hash(spark, SF_ORACLE))
    assert "ShuffledHashJoin" in plan, plan


def test_arrow_udf_plans_arrow_not_row_python(spark):
    """udf_arrow_vowel_ratio must run as ArrowEvalPython — the scalar
    useArrow path — never the row-at-a-time BatchEvalPython."""
    from mapreduce_wordcounter_spark.functions.arrow_udf import (
        udf_arrow_vowel_ratio,
    )
    from mapreduce_wordcounter_spark.plans.inspect import physical_plan
    from tests.conftest import SF_ORACLE

    plan = physical_plan(udf_arrow_vowel_ratio(spark, SF_ORACLE))
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_distributed_rank_single_materialized_range_assignment(spark):
    """layout.distributed_rank's correctness invariant: the offsets
    subtree and the ranking subtree must read the SAME materialized
    range assignment. Spark does NOT guarantee that two plan-identical
    range exchanges sample the same boundaries (sampling is seeded by
    the physical RDD id; observed divergence inside a multi-rank join
    where exchange-reuse stopped firing), so the helper persists the
    partitioned relation — pin that the executed plan reads it via
    InMemoryTableScan and plans exactly ONE rangepartitioning
    exchange."""
    from pyspark.sql import functions as F

    from mapreduce_wordcounter_spark.operators.layout import distributed_rank
    from mapreduce_wordcounter_spark.session import release_pinned
    from mapreduce_wordcounter_spark.tables import load_table
    from tests.conftest import SF_ORACLE

    df = load_table(spark, SF_ORACLE, "documents").select("doc_id", "n_chars")
    try:
        ranked = distributed_rank(df, [F.desc("n_chars"), F.asc("doc_id")])
        ranked.collect()
        node = ranked._jdf.queryExecution().executedPlan()
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            node = node.executedPlan()

        # Tree-walk the executed plan (NOT the string form — every
        # InMemoryTableScan PRINTS its cached lineage, exchange
        # included, so string-counting overcounts): both consumers must
        # read the cache, and no range exchange may execute outside it.
        cache_scans, live_range_exchanges = 0, 0

        def walk(n):
            nonlocal cache_scans, live_range_exchanges
            name = n.nodeName()
            if "InMemoryTableScan" in name:
                cache_scans += 1
                return  # below this, lineage executes only on cache miss
            if "Exchange" in name and "rangepartitioning" in n.toString().splitlines()[0]:
                live_range_exchanges += 1
            if "QueryStage" in name:
                walk(n.plan())
                return
            ch = n.children()
            for i in range(ch.size()):
                walk(ch.apply(i))

        walk(node)
        assert cache_scans >= 2, node.toString()
        assert live_range_exchanges == 0, node.toString()
    finally:
        release_pinned()


def test_distributed_rank_matches_global_window(spark):
    """The distributed rank must equal the plain global ROW_NUMBER for
    every row (exactness, not approximation)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from mapreduce_wordcounter_spark.operators.layout import distributed_rank
    from mapreduce_wordcounter_spark.tables import load_table
    from tests.conftest import SF_ORACLE

    df = load_table(spark, SF_ORACLE, "documents").select("doc_id", "n_chars")
    got = {
        r["doc_id"]: r["rank"]
        for r in distributed_rank(
            df, [F.desc("n_chars"), F.asc("doc_id")]
        ).collect()
    }
    want = {
        r["doc_id"]: r["rank"]
        for r in df.withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.desc("n_chars"), F.asc("doc_id"))
            ),
        ).collect()
    }
    assert got == want


def test_rfm_distributed_path_equals_small_path(spark):
    """orders_rfm_segments is size-adaptive; the distributed path
    (forced by dropping the threshold to 0) must return EXACTLY the
    small-path rows, and its plan must contain no single-partition
    window (the scale contract the adaptivity exists to serve)."""
    from mapreduce_wordcounter_spark.operators import relational as R
    from mapreduce_wordcounter_spark.plans.inspect import physical_plan
    from mapreduce_wordcounter_spark.session import release_pinned
    from tests.conftest import SF_ORACLE

    small = sorted(
        tuple(r) for r in R.orders_rfm_segments(spark, SF_ORACLE).collect()
    )
    saved = R._RFM_DISTRIBUTED_ROWS
    R._RFM_DISTRIBUTED_ROWS = 0
    try:
        big_df = R.orders_rfm_segments(spark, SF_ORACLE)
        plan = physical_plan(big_df)
        big = sorted(tuple(r) for r in big_df.collect())
    finally:
        R._RFM_DISTRIBUTED_ROWS = saved
        release_pinned()
    assert big == small
    from tests.test_plan_hygiene import _global_windows

    # the only global windows are the structurally-exempt 32-row
    # distributed_rank offset cumsums, which _global_windows skips
    assert _global_windows(plan) == 0
    assert "rangepartitioning" in plan
