"""Semantic invariants for the training-pipeline operators (SURVEY.md
§5.2 layer 4 — properties the DuckDB differential can't express).

The oracle parity layer proves Spark == SQL-spec; these tests prove the
*spec itself* has the properties the operator's consumers rely on:
packing respects capacity, hash splits are consistent and stable, KL is
non-negative, MinHash estimates track exact Jaccard within the
estimator's variance, streaming and batch incremental dedup agree.
"""

from __future__ import annotations

from mapreduce_wordcounter_spark.registry import all_queries
from tests.conftest import SF_ORACLE

_QUERIES = all_queries()

_PACK_CAPACITY = 2048  # mirrors operators/text.py


def test_pack_sequences_greedy_invariants(spark):
    """pack_id must equal (running token total before the doc) //
    capacity within each (lang, source) group, doc_id order — checked
    against a three-line Python reference on the collected rows."""
    rows = (
        _QUERIES["pack_sequences"](spark, SF_ORACLE)
        .orderBy("lang", "source", "doc_id")
        .collect()
    )
    assert rows
    running: dict[tuple[str, str], int] = {}
    for r in rows:
        key = (r["lang"], r["source"])
        before = running.get(key, 0)
        assert r["pack_id"] == before // _PACK_CAPACITY, r
        running[key] = before + r["n_tokens"]
    # Every pack (except possibly each group's last) is filled past its
    # start boundary, i.e. pack ids within a group are contiguous.
    for key, total in running.items():
        assert total > 0


def test_dataset_split_consistency_and_shares(spark):
    rows = _QUERIES["dataset_split_assign"](spark, SF_ORACLE).collect()
    n = len(rows)
    assert n > 0
    shares = {"train": 0, "validation": 0, "test": 0}
    for r in rows:
        assert 0 <= r["bucket"] < 100
        expect = (
            "train" if r["bucket"] < 80 else "validation" if r["bucket"] < 90 else "test"
        )
        assert r["split"] == expect
        shares[r["split"]] += 1
    # Loose binomial bounds around 80/10/10 (n=500 at sf0.01).
    assert 0.70 <= shares["train"] / n <= 0.90
    assert 0.03 <= shares["validation"] / n <= 0.20
    assert 0.03 <= shares["test"] / n <= 0.20


def test_deterministic_sample_is_deterministic(spark):
    """Hash membership must be identical across independent runs (the
    property Bernoulli sampling lacks) and a ~10% fraction."""
    a = {r["doc_id"] for r in _QUERIES["deterministic_sample"](spark, SF_ORACLE).collect()}
    b = {r["doc_id"] for r in _QUERIES["deterministic_sample"](spark, SF_ORACLE).collect()}
    assert a == b
    total = _QUERIES["dedup_exact"](spark, SF_ORACLE).count()  # 500 docs
    assert 0.04 <= len(a) / total <= 0.20


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """For LSH candidates that exact verification confirms (J >= 0.5),
    the 16-perm signature estimate must sit within the estimator's
    4-sigma band (sigma <= sqrt(0.25/16) = 0.125): |est - J| <= 0.5,
    and the mean absolute error must be far tighter."""
    est = {
        (r["doc_a"], r["doc_b"]): r["jaccard_est"]
        for r in _QUERIES["minhash_jaccard_est"](spark, SF_ORACLE).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _QUERIES["lsh_verified_pairs"](spark, SF_ORACLE).collect()
    }
    assert exact, "expected verified near-dup pairs at sf0.01"
    # Every verified pair came from the candidate set, so it has an
    # estimate row.
    errs = []
    for pair, j in exact.items():
        assert pair in est, pair
        errs.append(abs(est[pair] - j))
        assert errs[-1] <= 0.5, (pair, est[pair], j)
    assert sum(errs) / len(errs) <= 0.25


def test_source_kl_nonnegative_and_total(spark):
    rows = _QUERIES["source_unigram_kl"](spark, SF_ORACLE).collect()
    assert rows
    # Gibbs' inequality: KL >= 0 (quantization can dip a hair under 0).
    for r in rows:
        assert r["kl_unigram"] >= -1e-6, r
    corpus_tokens = sum(r["n_tokens"] for r in rows)
    wc = _QUERIES["wc_summary"](spark, SF_ORACLE).collect()[0]
    assert corpus_tokens == wc["total_tokens"]


def test_semantic_dedup_labels_are_canonical_minima(spark):
    rows = _QUERIES["semantic_dedup_components"](spark, SF_ORACLE).collect()
    assert rows
    by_label: dict[int, list[int]] = {}
    for r in rows:
        assert r["canonical_id"] <= r["vec_id"]
        assert r["is_canonical"] == (r["vec_id"] == r["canonical_id"])
        by_label.setdefault(r["canonical_id"], []).append(r["vec_id"])
    for label, members in by_label.items():
        assert min(members) == label  # the canonical is the component min
        assert len(members) >= 2  # edges only — singletons are not emitted


def test_stream_incremental_dedup_matches_batch(spark):
    batch = {
        (r["doc_id"], r["content_hash"])
        for r in _QUERIES["dedup_incremental_new"](spark, SF_ORACLE).collect()
    }
    stream = {
        (r["doc_id"], r["content_hash"])
        for r in _QUERIES["stream_incremental_dedup"](spark, SF_ORACLE).collect()
    }
    assert batch == stream
    assert batch  # non-vacuous


def test_vocab_ids_dense_and_rank_ordered(spark):
    rows = sorted(
        _QUERIES["vocab_top1k"](spark, SF_ORACLE).collect(),
        key=lambda r: r["token_id"],
    )
    assert rows
    assert [r["token_id"] for r in rows] == list(range(len(rows)))
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_boilerplate_ngrams_doc_frequency_floor(spark):
    rows = _QUERIES["boilerplate_ngrams"](spark, SF_ORACLE).collect()
    assert rows
    assert all(r["n_docs"] >= 2 for r in rows)
    ndocs = [r["n_docs"] for r in rows]
    assert ndocs == sorted(ndocs, reverse=True)


def test_trigram_index_is_lossless(spark):
    """The trigram-index path must return EXACTLY the documents a
    direct contains() scan finds — candidate pruning can only remove
    false positives, never true matches (a doc containing the pattern
    contains all its trigrams)."""
    from pyspark.sql import functions as F

    from mapreduce_wordcounter_spark.operators.text import _TRGM_PATTERN
    from mapreduce_wordcounter_spark.registry import all_queries
    from mapreduce_wordcounter_spark.tables import load_table

    via_index = {
        r["doc_id"]
        for r in all_queries()["trigram_index_match"](spark, SF_ORACLE).collect()
    }
    direct = {
        r["doc_id"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .filter(F.instr(F.lower(F.col("text")), _TRGM_PATTERN) > 0)
        .collect()
    }
    assert via_index == direct and direct


def test_dsir_sample_fraction_invariants(spark):
    """The fraction selection must be EXACTLY the top floor(n/10) of
    the importance-weight ordering (weight desc, doc_id tiebreak),
    with sel_rank a dense contiguous 1..floor(n/10) — the quantile
    threshold has no float boundary by construction."""
    full = _QUERIES["dsir_importance_weights"](spark, SF_ORACLE).collect()
    n = len(full)
    assert n > 0
    expect = sorted(
        ((-r["mean_log_ratio"], r["doc_id"]) for r in full)
    )[: n // 10]
    expect_ids = [doc for _, doc in expect]
    sel = (
        _QUERIES["dsir_sample_fraction"](spark, SF_ORACLE)
        .orderBy("sel_rank")
        .collect()
    )
    assert [r["sel_rank"] for r in sel] == list(range(1, n // 10 + 1))
    assert [r["doc_id"] for r in sel] == expect_ids


def test_dsir_gumbel_sample_invariants(spark):
    """Seeded Gumbel top-k: exactly K rows, deterministic across
    invocations (fixed seed), ordered by the perturbed key, and NOT
    the deterministic weight head — the Gumbel noise must actually
    change the selection vs pure top-K by weight."""
    K = 64
    a = _QUERIES["dsir_gumbel_sample"](spark, SF_ORACLE).collect()
    b = _QUERIES["dsir_gumbel_sample"](spark, SF_ORACLE).collect()
    assert len(a) == K
    assert [(r["doc_id"], r["key_micro"]) for r in a] == [
        (r["doc_id"], r["key_micro"]) for r in b
    ]
    keys = [r["key_micro"] for r in a]
    assert keys == sorted(keys, reverse=True)
    # the stochastic sample differs from the deterministic weight head
    full = _QUERIES["dsir_importance_weights"](spark, SF_ORACLE).collect()
    det_head = {
        r["doc_id"]
        for r in sorted(
            full, key=lambda r: (-r["mean_log_ratio"], r["doc_id"])
        )[:K]
    }
    assert {r["doc_id"] for r in a} != det_head


def test_dsir_gumbel_fraction_invariants(spark):
    """Fraction-scale Gumbel sample: exactly floor(n/10) rows, dense
    contiguous ranks ordered by the perturbed key, and a superset
    check against the K=64 gumbel head (same key, same order — the
    top-64 must be the fraction selection's prefix when n/10 >= 64)."""
    n = len(_QUERIES["dsir_importance_weights"](spark, SF_ORACLE).collect())
    sel = (
        _QUERIES["dsir_gumbel_sample_fraction"](spark, SF_ORACLE)
        .orderBy("sel_rank")
        .collect()
    )
    assert [r["sel_rank"] for r in sel] == list(range(1, n // 10 + 1))
    keys = [r["key_micro"] for r in sel]
    assert keys == sorted(keys, reverse=True)
    head = _QUERIES["dsir_gumbel_sample"](spark, SF_ORACLE).collect()
    if n // 10 >= len(head):
        assert [r["doc_id"] for r in sel[: len(head)]] == [
            r["doc_id"] for r in head
        ]


def test_token_budget_allocation_sums_exactly(spark):
    """Largest-remainder property: per-lang integer quotas sum to the
    global budget EXACTLY (no rounding drift), every quota is
    non-negative, and alloc never exceeds availability."""
    rows = _QUERIES["token_budget_allocation"](spark, SF_ORACLE).collect()
    assert sum(r["quota"] for r in rows) == 100_000
    assert all(r["quota"] >= 0 for r in rows)
    assert all(r["alloc"] <= min(r["quota"], r["n_tokens"]) for r in rows)


def test_ccnet_buckets_are_per_lang_terciles(spark):
    """Within every language the three buckets differ in size by at
    most one (NTILE contract), bucket boundaries respect the NLL
    ordering, and keep == (bucket <= 2)."""
    rows = _QUERIES["ccnet_perplexity_buckets"](spark, SF_ORACLE).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        sizes = [sum(1 for r in rs if r["bucket"] == b) for b in (1, 2, 3)]
        present = [s for s in sizes if s > 0]
        if len(rs) >= 3:
            assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        # NLL ordering: every head doc <= every tail doc
        rs.sort(key=lambda r: (r["bucket"], r["mean_nll"]))
        for a, b in zip(rs, rs[1:]):
            if a["bucket"] < b["bucket"]:
                assert a["mean_nll"] <= b["mean_nll"], lang
        assert all(r["keep"] == (r["bucket"] <= 2) for r in rs)


def test_cc_twophase_equals_minlabel(spark):
    """The star algorithm and the min-label loop reach the same
    fixpoint on the real co-occurrence graph."""
    a = sorted(
        map(tuple, _QUERIES["graph_cc_twophase"](spark, SF_ORACLE).collect())
    )
    b = sorted(
        map(
            tuple,
            _QUERIES["graph_user_components"](spark, SF_ORACLE).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_cc_twophase_chain_round_bound(spark):
    """The reason the algorithm exists: a 200-node path has diameter
    199 — the min-label loop would need ~199 rounds — but the star
    alternation must label it in O(log² n): 12 rounds is generous for
    n = 200 and fails loudly if the implementation degrades to
    diameter-bounded propagation."""
    from mapreduce_wordcounter_spark.operators.dedup import cc_two_phase
    from pyspark.sql import functions as F

    chain = spark.range(199).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    out = cc_two_phase(chain, max_rounds=12).collect()
    assert len(out) == 200
    assert all(r["canonical_id"] == 0 for r in out)
    assert sum(1 for r in out if r["is_canonical"]) == 1


def test_bootstrap_ci_brackets_the_mean(spark):
    """The bootstrap interval must contain the point estimate, be
    properly ordered, and come from the declared 32 replicates; the
    interval is non-degenerate (resampling noise exists) yet within a
    plausible band of the mean (sanity, not a coverage claim)."""
    row = _QUERIES["ev_bootstrap_ci_mean"](spark, SF_ORACLE).collect()[0]
    assert row["n_replicates"] == 32
    assert row["ci_lo"] <= row["mean"] <= row["ci_hi"]
    assert row["ci_lo"] < row["ci_hi"]
    width = row["ci_hi"] - row["ci_lo"]
    assert width < abs(row["mean"]) * 0.5 + 1.0
