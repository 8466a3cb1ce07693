"""Train-once semantics of the at-rest artifacts (round 5).

The LPA label table, the learned BPE tokenizer and the trigram posting
index are trained once per (session, sf_dir) and served from scratch
parquet; their DuckDB oracles replay training, so *content* is covered
by the parity layer. These tests pin the at-rest *mechanics* the
oracles cannot see:

- a second invocation reads the same artifact instead of retraining
  (path-cache hit), and returns identical rows;
- the artifact's internal invariants hold (merge ranks dense, pair
  counts monotonically learnable, index lossless vs the on-the-fly
  twin).
"""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_lpa_labels_train_once(spark):
    """r9: the trained labels are a CATALOG artifact — the second call
    reads the same published data dir, no retrain."""
    import os

    from mapreduce_wordcounter_spark.operators import graph
    from mapreduce_wordcounter_spark.sources import index_catalog as ic

    first = _rows(graph.graph_label_propagation(spark, SF_ORACLE))
    src = os.path.join(SF_ORACLE, "events.parquet")
    m1 = ic.manifest("lpa", src, {"k": graph._LPA_K})
    assert m1 is not None and m1.get("data")
    second = _rows(graph.graph_label_propagation(spark, SF_ORACLE))
    assert ic.manifest("lpa", src, {"k": graph._LPA_K})["data"] == m1["data"]
    assert first == second
    assert len(first) > 0


def test_bpe_trains_once_and_merges_are_dense(spark):
    import os

    from mapreduce_wordcounter_spark.operators import text
    from mapreduce_wordcounter_spark.sources import index_catalog as ic

    merges = _rows(text.bpe_learn_merges(spark, SF_ORACLE))
    src = os.path.join(SF_ORACLE, "documents.parquet")
    m1 = ic.manifest("bpe", src, {"k": text._BPE_MERGES})
    assert m1 is not None and m1.get("data")
    again = _rows(text.bpe_learn_merges(spark, SF_ORACLE))
    assert ic.manifest("bpe", src, {"k": text._BPE_MERGES})["data"] == m1["data"]
    assert merges == again
    # Dense 1..K ranks; every merged symbol is the concatenation of
    # its pair; counts positive.
    ranks = [m[0] for m in sorted(merges)]
    assert ranks == list(range(1, text._BPE_MERGES + 1))
    for _rank, a, b, merged, cnt in merges:
        assert merged == a + b
        assert cnt > 0


def test_bpe_subword_vocab_consistent_with_merges(spark):
    from mapreduce_wordcounter_spark.operators import text

    merges = {m[3] for m in text.bpe_learn_merges(spark, SF_ORACLE).collect()}
    vocab = {
        r["subword"] for r in text.bpe_subword_vocab(spark, SF_ORACLE).collect()
    }
    # Multi-char subwords can only come from merges (chars are the
    # base alphabet). Not every merged symbol must survive (it may be
    # consumed by a later merge), but every surviving multi-char
    # subword must be a learned merge.
    multi = {s for s in vocab if len(s) > 1}
    assert multi <= merges


def test_trigram_probe_equals_on_the_fly(spark):
    """The at-rest probe (serving entry trigram_index_match, r9) must
    equal the index-less on-the-fly scan (trigram_match_scan) — the
    posting index is lossless for containment."""
    from mapreduce_wordcounter_spark.operators import text

    probe = _rows(text.trigram_index_match(spark, SF_ORACLE))
    direct = _rows(text.trigram_match_scan(spark, SF_ORACLE))
    assert probe == direct
    assert len(probe) > 0


def test_dedup_components_train_once(spark):
    """r9: the component labels are a CATALOG artifact — the second
    call reads the same published data dir (no retrain), and the key
    carries no session identity (cross-session reuse is pinned in
    tests/test_index_catalog.py)."""
    import os

    from mapreduce_wordcounter_spark.operators import dedup
    from mapreduce_wordcounter_spark.sources import index_catalog as ic

    first = _rows(dedup.dedup_components_canonical(spark, SF_ORACLE))
    src = os.path.join(SF_ORACLE, "documents.parquet")
    m1 = ic.manifest("dedup_comp", src, None)
    assert m1 is not None and m1.get("data")
    second = _rows(dedup.dedup_components_canonical(spark, SF_ORACLE))
    m2 = ic.manifest("dedup_comp", src, None)
    assert m2["data"] == m1["data"]  # same published artifact
    assert first == second
    assert len(first) > 0


def test_multicol_skip_index_prunes_and_stays_exact(spark):
    """The fskip artifact (operators/lakehouse.py): a two-column probe
    scans a strict subset of the snapshot's files yet returns exactly
    read().filter(...); the index builds once per committed version
    (catalog memo) and a new commit flips the fingerprint so the next
    probe rebuilds against the new snapshot."""
    from mapreduce_wordcounter_spark.operators.lakehouse import (
        _fskip_orders,
        file_skip_index,
        read_skip_multi,
    )
    from mapreduce_wordcounter_spark.sources import index_catalog as ic
    from pyspark.sql import functions as F

    vt = _fskip_orders(spark, SF_ORACLE)
    filters = {"o_orderkey": (2000, 9000), "o_totalprice": (1000.0, 150000.0)}
    idx = file_skip_index(spark, vt, sorted(filters)).collect()
    n_files = len(idx)
    key_only = [
        r["file"]
        for r in idx
        if not (r["o_orderkey__hi"] < 2000 or r["o_orderkey__lo"] > 9000)
    ]
    admitted = [
        r["file"]
        for r in idx
        if not (r["o_orderkey__hi"] < 2000 or r["o_orderkey__lo"] > 9000)
        and not (
            r["o_totalprice__hi"] < 1000.0 or r["o_totalprice__lo"] > 150000.0
        )
    ]
    # multiplicative skipping: the second column prunes beyond the first
    assert 0 < len(admitted) < len(key_only) < n_files, (
        len(admitted), len(key_only), n_files,
    )

    got = sorted(map(tuple, read_skip_multi(spark, vt, filters).collect()))
    pred = (
        F.col("o_orderkey").between(2000, 9000)
        & F.col("o_totalprice").between(1000.0, 150000.0)
    )
    want = sorted(map(tuple, vt.read(spark).filter(pred).collect()))
    assert got == want

    # staleness contract: the artifact is pinned to the built version
    v = vt.snapshot()["version"]
    m = ic.manifest("fskip", vt.path, {"cols": ",".join(sorted(filters))})
    assert m is not None and m["build_version"] == v
    assert ic.staleness(
        "fskip", vt.path, {"cols": ",".join(sorted(filters))}, v + 1
    ) == 1


def test_zorder_optimize_makes_both_dims_prune(spark):
    """OPTIMIZE ZORDER BY (user_id, d) + the fskip index: on the
    Morton layout BOTH range predicates prune files (each alone admits
    a strict subset) and their conjunction prunes multiplicatively; on
    the pre-optimize ingest layout (v0, hash order) the same probe
    admits every file. The rewrite is row-identical and v0 still
    time-travels."""
    from mapreduce_wordcounter_spark.operators.lakehouse import (
        _zorder_events,
        file_skip_index,
    )
    from mapreduce_wordcounter_spark.sources.versioned import VersionedTable

    vt = _zorder_events(spark, SF_ORACLE)
    idx = file_skip_index(spark, vt, ["d", "user_id"]).collect()
    n = len(idx)

    def admit(rows, col, lo, hi):
        return [
            r["file"]
            for r in rows
            if not (r[f"{col}__hi"] < lo or r[f"{col}__lo"] > hi)
        ]

    by_user = admit(idx, "user_id", 10, 40)
    by_day = admit(idx, "d", 5, 12)
    both = [f for f in by_user if f in by_day]
    assert len(by_user) < n and len(by_day) < n, (len(by_user), len(by_day), n)
    assert 0 < len(both) <= min(len(by_user), len(by_day))

    # row identity through the rewrite; pre-optimize snapshot intact
    v = vt.snapshot()["version"]
    a = sorted(map(tuple, vt.read(spark, v - 1).collect()))
    b = sorted(map(tuple, vt.read(spark, v).collect()))
    assert a == b


def test_phrase_positional_adjacency_semantics(spark, tmp_path):
    """Phrase matching is POSITIONAL adjacency, not co-occurrence: a
    crafted corpus pins overlap handling ('hash join hash join' = 2
    matches), non-adjacent co-occurrence (0 matches — a bag-of-words
    index would wrongly hit), reversed order (0), and 1-based
    first_pos across tokenizer punctuation."""
    import pyspark.sql.functions as F

    from mapreduce_wordcounter_spark.operators import text

    rows = [
        (1, "hash join hash join hash"),        # overlapping: 2 at pos 1, 3
        (2, "hash table then a join later"),    # co-occur, not adjacent
        (3, "join hash"),                       # reversed order
        (4, "The HASH, join! works"),           # case+punct: pos 2
        (5, "nothing here"),
    ]
    d = tmp_path / "sfphrase"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    got = {
        (r.doc_id, r.n_matches, r.first_pos)
        for r in text.search_phrase_positional(spark, str(d)).collect()
    }
    assert got == {(1, 2, 1), (4, 1, 2)}
