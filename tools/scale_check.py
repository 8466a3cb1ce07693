#!/usr/bin/env python
"""Measured scaling spot-check: sf0.1 vs a seeded ~10x blow-up.

The 100 TB claims in SCALE.md argue from plan shape (bounded fan-out,
single-shuffle profiles, broadcast-able sides). This script adds one
measured point: it builds a deterministic 10x replication of the two
growing tables (events, documents — entity ids offset per replica so
entity cardinality scales with the data; every other table symlinked),
runs the heaviest headline queries at both scales with the bench
harness discipline (untimed warm-up, then min of two timed passes,
cache cleared per pass), and records wall-time ratios and log10
scaling exponents in SCALE_CHECK.json.

Usage: python tools/scale_check.py [blowup_dir]
(default blowup dir: /tmp/scale10, built on demand)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_wordcounter_spark import get_spark
from mapreduce_wordcounter_spark.registry import all_queries
from mapreduce_wordcounter_spark.session import release_pinned

BASE = "/root/testdata/sf0.1"
REPLICAS = 10

# The heaviest headline queries per BENCH_local.json, plus wc_counts
# as the near-linear control every other exponent is read against.
# Only queries whose INPUT tables grow in the blow-up (events /
# documents) belong here — embeddings-driven queries would measure
# nothing (that table is symlinked unchanged).
TARGETS = [
    "wc_counts",
    "graph_pagerank",
    "graph_common_neighbors",
    "graph_kcore_peel",
    "graph_modularity",
    # r9: trigram_index_match now probes the AT-REST posting index
    # (VERDICT r8 #2) — the serve-tier substring entry. The index-less
    # scan variant (trigram_match_scan, exponent ~1.2 by construction:
    # it reads the corpus once per query) is deliberately NOT a scale
    # target: it is the documented one-off-pattern fallback, not a
    # serving path.
    "trigram_index_match",
    "trigram_index_probe",
    "pipeline_curate",
    "lsh_verified_pairs",
    "stream_cms_heavy_hitters",
    "bpe_learn_merges",
    "zorder_layout",
    "zorder_probe",
    "jaccard_prefix_join",
    # round 6: the curation funnel's five-version read path (its
    # at-rest build — 1 create + 4 stats-pruned DELETE commits over
    # the grown documents table — is paid once in the warm-up pass,
    # the same once-per-corpus posture as the trained indexes)
    "pipeline_curate_versioned",
    # round 6: the trained classifier's serving path (training runs
    # once in the warm-up pass — the once-per-corpus posture — so the
    # timed passes measure map-only scoring, the path that sees 100 TB)
    "quality_lr_predict",
    # round 7: DSIR selection (two map-combined shuffles over one
    # scan) and the broadcast-rank quality feature — both documents-
    # driven, so they grow with the blow-up. (embedding_pca_whiten /
    # orders_rfm_segments are embeddings/orders-driven — those tables
    # are symlinked unchanged, so a measurement would be vacuous.)
    "dsir_importance_weights",
    "doc_mean_word_rank",
    # round 8: fraction-scale DSIR selection — the weights pipeline
    # plus a distributed rank (range exchange + local windows), so the
    # exponent shows the rank's cost growing with the corpus
    "dsir_sample_fraction",
    # round 9 (late): SimHash near-dup pairs — documents-driven; the
    # signature is one map-combined shuffle, candidates come from the
    # 4-block bucket join (bucket-collision-bounded, never all-pairs)
    "simhash_hamming_pairs",
    # round 9 (late): hive-partition-pruned read over the versioned
    # documents table (the at-rest build — create + append + the
    # metadata-only partition drop — is paid once in the warm-up pass;
    # timed passes measure the pruned scan, the path that sees 100 TB)
    "table_partition_pruning",
    # round 10: hidden days(ts) partitioning over the versioned events
    # table — events grow in the blow-up, so the timed passes measure
    # the transform-pruned read (5 day-partitions selected out of 30)
    # through the checkpoint manifest tree (build paid in warm-up)
    "table_partition_transform",
    # round 11: CCNet perplexity terciles (documents-driven: vocab
    # model + per-lang NTILE) and the watermarked LEFT OUTER
    # stream-stream attribution join (events-driven: join state
    # bounded by rate x window). token_budget_allocation reduces to a
    # per-lang count plus constant-size windows — its corpus-growing
    # half is the same token scan mixture_temperature_weights already
    # covers; table_multicol_skip_probe is orders-driven (symlinked).
    "ccnet_perplexity_buckets",
    "stream_click_attribution_outer",
    # round 11 (late): constant x32 map-side replicate fan-out over
    # events — the exponent shows the explode+combine growing linearly
    # with the corpus, nothing superlinear hiding in the rank stage
    "ev_bootstrap_ci_mean",
    # round 12 (wave 3): positional phrase probe — documents-driven;
    # the at-rest posting build is paid in warm-up, the timed passes
    # measure the two posting-list scans + (doc_id, adjacency-key)
    # equi-join, whose input tracks the phrase words' document
    # frequency (linear for a fixed common word, but 2/|vocab| of the
    # token stream — never a corpus scan). ann_matryoshka_topk /
    # table_restore_audit / table_refs_metadata are embeddings/orders-
    # driven (symlinked unchanged → vacuous here).
    "search_phrase_positional",
    # round 12 (wave 4): Hilbert layout construction — events-driven,
    # same distributed-NTILE profile as zorder_layout (expect ~0.3)
    "hilbert_layout",
    "hilbert_probe",
]


def build_blowup(dst: str) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    # Replica ID strides derived from the base tables (MAX(id)+1), not
    # hardcoded sf0.1 cardinalities — if the base grows, offsets keep
    # replica ID spaces disjoint instead of silently colliding (which
    # would distort the measured exponents).
    ev_stride, user_stride = con.execute(
        f"SELECT MAX(event_id) + 1, MAX(user_id) + 1 "
        f"FROM read_parquet('{BASE}/events.parquet')"
    ).fetchone()
    doc_stride = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM read_parquet('{BASE}/documents.parquet')"
    ).fetchone()[0]
    if not os.path.exists(f"{dst}/events.parquet"):
        con.execute(
            f"""
            COPY (
              SELECT e.event_id + r.r * {ev_stride} AS event_id, e.ts,
                     e.user_id + r.r * {user_stride} AS user_id,
                     e.event_type, e.value, e.props
              FROM read_parquet('{BASE}/events.parquet') e,
                   (SELECT unnest(generate_series(0, {REPLICAS - 1})) AS r) r
            ) TO '{dst}/events.parquet' (FORMAT PARQUET)
            """
        )
    if not os.path.exists(f"{dst}/documents.parquet"):
        # DISTINCT-docs blow-up (round 6): replica r > 0 suffixes every
        # word with a replica-unique letter marker — a bijective token
        # remap, so each replica reproduces the base corpus's exact
        # pair/df structure under a disjoint vocabulary, and NO pair
        # spans replicas. True-near-dup density is therefore
        # scale-invariant, the property a real 10x corpus has. (The
        # previous IDENTICAL-replica blow-up made every doc 10 exact
        # copies: output pairs grew ~quadratically — 45 extra true
        # pairs per doc — so any exact pairs join measured its own
        # output growth, not its candidate scaling. That mode remains
        # available for skew stress via SCALE_BLOWUP_MODE=replica.)
        mode = os.environ.get("SCALE_BLOWUP_MODE", "distinct")
        text_expr = (
            "d.text"
            if mode == "replica"
            else "CASE WHEN r.r = 0 THEN d.text ELSE"
            " regexp_replace(d.text, '([a-zA-Z]+)',"
            " '\\1q' || chr(CAST(97 + r.r AS INTEGER)), 'g') END"
        )
        con.execute(
            f"""
            COPY (
              SELECT d.doc_id + r.r * {doc_stride} AS doc_id,
                     {text_expr} AS text, d.lang,
                     d.source, d.n_chars
              FROM read_parquet('{BASE}/documents.parquet') d,
                   (SELECT unnest(generate_series(0, {REPLICAS - 1})) AS r) r
            ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """
        )
        if mode != "replica":
            # The remap suffix ('q'+letter) is letters-only (a digit
            # would be split by the engine's [^letter]+ tokenizer), so
            # a base token that already ends in that suffix would
            # collide with a replica token and let pairs span replicas,
            # distorting the exponents. Verify the bijective-remap
            # claim instead of assuming it: replica-0 and replica->0
            # vocabularies must be disjoint.
            overlap = con.execute(
                f"""
                WITH toks AS (
                  SELECT doc_id < {doc_stride} AS base,
                         unnest(regexp_split_to_array(lower(text),
                                                      '[^a-z]+')) AS tok
                  FROM read_parquet('{dst}/documents.parquet')
                )
                SELECT count(*) FROM (
                  SELECT tok FROM toks WHERE base AND tok <> ''
                  INTERSECT
                  SELECT tok FROM toks WHERE NOT base AND tok <> ''
                )
                """
            ).fetchone()[0]
            if overlap:
                raise AssertionError(
                    f"distinct-mode blow-up is not vocabulary-disjoint: "
                    f"{overlap} tokens shared between replica 0 and r>0 "
                    f"(suffix collision) — exponents would be distorted"
                )
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "embeddings",
    ]:
        p = f"{dst}/{t}.parquet"
        if not os.path.exists(p):
            os.symlink(f"{BASE}/{t}.parquet", p)


def timed(spark, queries, sf_dir: str) -> dict[str, float]:
    for name in TARGETS:  # untimed warm-up (JIT/codegen + at-rest training)
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out: dict[str, float] = {}
    for _ in range(2):
        spark.catalog.clearCache()
        release_pinned()
        # GC-quiesce at PASS boundaries (outside any timer): the heavy
        # verification joins (jaccard_prefix_join at 10x, last in the
        # pass) leave enough old-gen pressure to inflate the next
        # pass's early queries 2x+ — measured on the index-less trigram
        # scan (then serving as trigram_index_match),
        # 30s vs 67s depending only on what ran before it in the same
        # JVM. Per-QUERY gc is worse: it tears down cleaner-tracked
        # shared state mid-pass and inflated the graph family ~2x.
        spark.sparkContext._jvm.System.gc()
        for name in TARGETS:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            out[name] = min(out.get(name, dt), dt)
    return out


def main() -> None:
    # The blow-up dir is MODE-SUFFIXED: build_blowup skips files that
    # already exist, so a shared path would silently reuse a corpus
    # built under the other mode while the JSON records the requested
    # one (observed: a stale replica-mode documents.parquet re-labeled
    # "distinct" turned jaccard_prefix_join's measured exponent from
    # 0.68 into 1.77 — the output-quadratic regime, not the candidate
    # scaling under measurement).
    mode = os.environ.get("SCALE_BLOWUP_MODE", "distinct")
    blowup = sys.argv[1] if len(sys.argv) > 1 else f"/tmp/scale10_{mode}"
    build_blowup(blowup)
    spark = get_spark("scale-check")
    queries = all_queries()
    t_base = timed(spark, queries, BASE)
    t_big = timed(spark, queries, blowup)
    rows = {}
    for name in TARGETS:
        ratio = round(t_big[name] / t_base[name], 2)
        rows[name] = {
            "sf0.1_sec": t_base[name],
            "x10_sec": t_big[name],
            "ratio": ratio,
            "exponent": round(math.log10(max(ratio, 1e-9)), 2),
        }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CHECK.json",
    )
    with open(path, "w") as f:
        json.dump(
            {
                "replicas": REPLICAS,
                "base": BASE,
                "doc_blowup": os.environ.get("SCALE_BLOWUP_MODE", "distinct"),
                "queries": rows,
            },
            f,
            indent=1,
        )
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
