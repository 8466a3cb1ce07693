"""Retrieval-quality tests for the approximate operators (ANN, LSH,
MinHash, SimHash).

Oracle parity proves these compute *what they claim*; these tests prove
the claims are *useful* — an index can be hash-exact and still retrieve
garbage. Method: plant structure (clustered embeddings, near-duplicate
documents) in a tmpdir shaped like an sf_dir (operators read
``{sf_dir}/<table>.parquet``), and assert the approximate result
captures it.

On *structureless* data IVF/LSH recall honestly degrades toward the
scanned fraction (~N_PROBE/k) — that property is asserted too, so the
quality bar is explicit in both regimes.
"""

from __future__ import annotations

import math
import random

import pytest

from mapreduce_wordcounter_spark.registry import all_queries

_QUERIES = all_queries()


@pytest.fixture(scope="module")
def clustered_sf(spark, tmp_path_factory):
    """500 vectors in 10 tight clusters, labels = true cluster ids
    (the regime a trained IVF codebook produces); vec_id 0-4 are the
    query vectors, one per distinct cluster."""
    rng = random.Random(42)
    dim, k, n = 64, 10, 500
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(k)]
    rows = []
    for vid in range(n):
        c = vid % k  # queries 0-4 land in clusters 0-4
        vec = [centers[c][i] + rng.gauss(0, 0.05) for i in range(dim)]
        rows.append((vid, [float(x) for x in vec], c))
    d = tmp_path_factory.mktemp("clustered_sf")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def _recall(brute, approx) -> float:
    per_q = []
    for qid in brute.query_id.unique():
        want = set(brute[brute.query_id == qid].vec_id)
        got = set(approx[approx.query_id == qid].vec_id)
        per_q.append(len(want & got) / len(want))
    return sum(per_q) / len(per_q)


def test_ivf_recall_on_clustered_data(spark, clustered_sf):
    """When neighborhoods align with cells (the regime IVF is built
    for), multi-probe IVF must recover ≥90% of the exact top-10."""
    brute = _QUERIES["knn_brute_cosine"](spark, clustered_sf).toPandas()
    ivf = _QUERIES["ann_ivf_topk"](spark, clustered_sf).toPandas()
    assert _recall(brute, ivf) >= 0.9


def test_ivf_recall_floor_on_real_testdata(spark):
    """The driver's synthetic embeddings are near-structureless: recall
    may legitimately be low, but the probe must still scan its fraction
    — the result must be full-length and all cosines must be real
    matches present in the probed cells (sanity floor, not a quality
    claim)."""
    ivf = _QUERIES["ann_ivf_topk"](spark, "/root/testdata/sf0.01").toPandas()
    assert set(ivf.groupby("query_id").size()) == {10}
    assert ivf.cosine.notna().all()


def test_lsh_topk_recall_on_clustered_data(spark, clustered_sf):
    """Multi-probe hyperplane-LSH top-k on clustered data: a tight
    cluster (σ=0.05 around its center) collides on most sign bits, so
    probing the query's bucket + all Hamming-1 neighbors must recover
    the large majority of the exact top-10."""
    brute = _QUERIES["knn_brute_cosine"](spark, clustered_sf).toPandas()
    lsh = _QUERIES["ann_lsh_topk"](spark, clustered_sf).toPandas()
    assert _recall(brute, lsh) >= 0.7, _recall(brute, lsh)


def test_lsh_buckets_separate_clusters(spark, clustered_sf):
    """Hyperplane-LSH property: same-bucket pairs must be substantially
    more similar than the corpus at large — bucket collision correlates
    with cosine (the property that makes the bucket join a useful
    candidate generator)."""
    import pandas as pd

    buckets = _QUERIES["lsh_hyperplane_buckets"](spark, clustered_sf).toPandas()
    emb = spark.read.parquet(f"{clustered_sf}/embeddings.parquet").toPandas()
    emb = emb.merge(buckets, on="vec_id")
    # With tight clusters, same-cluster vectors should co-bucket far
    # more often than cross-cluster ones.
    by_bucket = emb.groupby("bucket")["label"].agg(["count", "nunique"])
    multi = by_bucket[by_bucket["count"] >= 2]
    assert len(multi) > 0
    # Average distinct-cluster count inside a shared bucket stays small:
    # buckets are dominated by single clusters.
    assert (multi["nunique"] / multi["count"]).mean() < 0.5


def test_bucketed_top_pairs_recall_on_clustered_data(spark, clustered_sf):
    """The bucketed (multi-table LSH) top-pairs scale path must recover
    the overwhelming share of the exact top-20 pairs when those pairs
    are genuinely similar (intra-cluster cosine ~0.99 → per-plane
    collision prob ~0.97 → 6-table recall ≈ 1). This is the regime the
    operator exists for: near-duplicate embedding detection."""
    exact = _QUERIES["embedding_top_pairs"](spark, clustered_sf).toPandas()
    bucketed = _QUERIES["embedding_top_pairs_bucketed"](spark, clustered_sf).toPandas()
    want = {(a, b) for a, b in zip(exact.vec_a, exact.vec_b)}
    got = {(a, b) for a, b in zip(bucketed.vec_a, bucketed.vec_b)}
    assert len(want & got) / len(want) >= 0.75, (
        f"bucketed top-pairs recall {len(want & got)}/{len(want)}"
    )
    # Every reported pair must carry its true (exact-formula) cosine —
    # the approximation is in candidate generation only, never scoring.
    by_pair = {(a, b): c for a, b, c in zip(exact.vec_a, exact.vec_b, exact.cosine)}
    for a, b, c in zip(bucketed.vec_a, bucketed.vec_b, bucketed.cosine):
        if (a, b) in by_pair:
            assert abs(by_pair[(a, b)] - c) < 1e-9


@pytest.fixture(scope="module")
def nearly_dup_sf(spark, tmp_path_factory):
    """Documents with planted duplicate structure: 5 exact-dup pairs,
    5 near-dup pairs (~90% token overlap), 30 unrelated docs."""
    rng = random.Random(7)
    # Alphabetic-only vocab: the tokenizer treats digits as separators,
    # so "w123"-style words would all collapse to the single token "w".
    # sorted(): set iteration order of *strings* depends on the
    # per-process PYTHONHASHSEED — without it the planted corpus (and
    # the Hamming-distance margins below) silently differ between runs.
    vocab = sorted(
        {
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
            for _ in range(500)
        }
    )
    rows = []
    did = 0

    def doc(words):
        nonlocal did
        rows.append((did, " ".join(words), "en", "synth", len(" ".join(words))))
        did += 1
        return did - 1

    planted_exact, planted_near = [], []
    for _ in range(5):
        words = [rng.choice(vocab) for _ in range(60)]
        a = doc(words)
        b = doc(words)
        planted_exact.append((a, b))
    for _ in range(5):
        words = [rng.choice(vocab) for _ in range(60)]
        a = doc(words)
        # ~90% overlap: swap the last 6 words (tail edit keeps most
        # 3-gram shingles intact; scattered edits would break 3 shingles
        # per edit and sink Jaccard below any useful threshold)
        near = words[:-6] + [rng.choice(vocab) for _ in range(6)]
        b = doc(near)
        planted_near.append((a, b))
    for _ in range(30):
        doc([rng.choice(vocab) for _ in range(60)])
    d = tmp_path_factory.mktemp("nearly_dup_sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    return str(d), planted_exact, planted_near


def test_lsh_dedup_finds_planted_duplicates(spark, nearly_dup_sf):
    """End-to-end MinHash+LSH: every planted exact pair and ≥4/5 of the
    ~90%-overlap near pairs survive banding + Jaccard≥0.5 verification;
    no unrelated pair sneaks in."""
    sf, exact, near = nearly_dup_sf
    pairs = _QUERIES["lsh_verified_pairs"](spark, sf).toPandas()
    found = {(min(a, b), max(a, b)) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    planted = {(min(a, b), max(a, b)) for a, b in exact + near}
    assert set(exact) <= found, f"missed exact dups: {set(exact) - found}"
    assert len(found & set(near)) >= 4, f"missed near dups: {set(near) - found}"
    assert found <= planted, f"false positives: {found - planted}"


def test_simhash_hamming_tracks_similarity(spark, nearly_dup_sf):
    """SimHash property: exact dups hash identically; near dups sit at
    small Hamming distance; unrelated docs sit far."""
    sf, exact, near = nearly_dup_sf
    sig = {
        r["doc_id"]: int(r["simhash"])
        for r in _QUERIES["simhash32"](spark, sf).collect()
    }

    def ham(a, b):
        return bin(sig[a] ^ sig[b]).count("1")

    assert all(ham(a, b) == 0 for a, b in exact)
    near_d = [ham(a, b) for a, b in near]
    assert max(near_d) <= 8, near_d
    rng = random.Random(3)
    unrelated = [(20 + i, 21 + j) for i, j in [(rng.randrange(9), rng.randrange(9)) for _ in range(10)]]
    unrelated_d = [ham(a, b) for a, b in unrelated if a != b and a in sig and b in sig]
    assert sum(unrelated_d) / len(unrelated_d) > max(near_d), (unrelated_d, near_d)


def test_simhash_hamming_pairs_pigeonhole_complete(spark, nearly_dup_sf):
    """The block-bucketed pair query must equal the brute-force spec:
    the pigeonhole construction (4 disjoint 15-bit blocks, threshold 3)
    guarantees zero misses, and the verify step guarantees zero false
    positives — so the candidate optimization must be invisible in the
    result. Planted exact dups must appear at hamming 0."""
    from mapreduce_wordcounter_spark.operators.dedup import (
        _HAM_BLOCKS,
        _HAM_MAX,
        _SIMHASH_BITS,
        _simhash60,
    )

    # the no-miss guarantee only holds while H < B and blocks tile the sig
    assert _HAM_MAX < _HAM_BLOCKS
    assert _SIMHASH_BITS % _HAM_BLOCKS == 0

    sf, exact, _near = nearly_dup_sf
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in _QUERIES["simhash_hamming_pairs"](spark, sf).collect()
    }
    sig = {r["doc_id"]: int(r["simhash"]) for r in _simhash60(spark, sf).collect()}
    ids = sorted(sig)
    brute = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sig[a] ^ sig[b]).count("1") <= _HAM_MAX
    }
    assert got == brute
    for a, b in exact:
        assert got[(min(a, b), max(a, b))] == 0


def test_kmeans_recovers_planted_clusters(spark, clustered_sf):
    """Lloyd training from the hash init (which knows nothing about the
    planted structure) must rediscover the 10 tight clusters: per true
    cluster, the dominant trained cell holds ≥90% of members (mean
    purity). This is the training-quality claim behind the IVF recall
    gate — parity alone would also pass a k-means that never moved."""
    assign = _QUERIES["ivf_kmeans_assign"](spark, clustered_sf).toPandas()
    assign["true"] = assign.vec_id % 10
    purity = (
        assign.groupby("true").cell.agg(lambda s: s.value_counts().iloc[0] / len(s))
    )
    assert purity.mean() >= 0.9, purity.to_dict()


def test_ivfpq_recall_on_clustered_data(spark, clustered_sf):
    """The two-stage IVF-PQ path (8×4-bit codes, ADC shortlist, exact
    re-rank) on clustered data: recall is bounded above by the coarse
    probe and below by what the PQ shortlist preserves. Gate at ≥0.8 —
    tighter than the corpus regime (the planted clusters separate far
    beyond the PQ distortion) but below the pure-IVF 0.9 gate, because
    the 60-deep shortlist can clip dense same-cluster neighborhoods."""
    brute = _QUERIES["knn_brute_cosine"](spark, clustered_sf).toPandas()
    pq = _QUERIES["ann_ivfpq_topk"](spark, clustered_sf).toPandas()
    assert _recall(brute, pq) >= 0.8


def test_rp_topk_recall_on_clustered_data(spark, clustered_sf):
    """JL random projection: a 16-dim Rademacher sketch of 64-dim
    vectors distorts pairwise angles by O(1/sqrt(16)), so on clustered
    data (intra-cluster cosine ~0.99 vs cross-cluster ~0) the sketch
    ranking must put essentially all true top-10 inside the 5k
    candidate pool — and the exact-cosine verification then restores
    the true order. Gate at 0.9."""
    brute = _QUERIES["knn_brute_cosine"](spark, clustered_sf).toPandas()
    rp = _QUERIES["ann_rp_topk"](spark, clustered_sf).toPandas()
    assert _recall(brute, rp) >= 0.9, _recall(brute, rp)


def test_rp_topk_scores_are_exact(spark):
    """The approximation lives in candidate generation only: every
    (query, candidate) the RP path reports must carry the identical
    rounded cosine the brute-force scan computes for that pair."""
    brute = _QUERIES["knn_brute_cosine"](spark, "/root/testdata/sf0.001").toPandas()
    rp = _QUERIES["ann_rp_topk"](spark, "/root/testdata/sf0.001").toPandas()
    exact = {(q, v): c for q, v, c in zip(brute.query_id, brute.vec_id, brute.cosine)}
    hits = 0
    for q, v, c in zip(rp.query_id, rp.vec_id, rp.cosine):
        if (q, v) in exact:
            assert abs(exact[(q, v)] - c) < 1e-9
            hits += 1
    assert hits > 0


def test_prefix_join_equals_exact_baseline(spark, nearly_dup_sf):
    """Prefix filtering is LOSSLESS: on planted duplicate structure the
    prefix-join must return exactly the exact baseline's pair set (not
    a subset — this is what separates it from the LSH/df-cap tiers)."""
    sf, _, _ = nearly_dup_sf
    exact = (
        _QUERIES["jaccard_near_dup_pairs"](spark, sf)
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pref = (
        _QUERIES["jaccard_prefix_join"](spark, sf)
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(exact) > 0
    assert exact.equals(pref), (exact, pref)


def test_pca_top_component_quality(spark):
    """Power iteration (embedding_pca_top_component) must return a
    unit vector whose Rayleigh quotient is (a) non-decreasing vs the
    uniform start (a theorem for PSD matrices, so a hard floor) and
    (b) close to the true leading eigenvalue from a dense eigensolve
    of the same covariance matrix."""
    import numpy as np

    from tests.conftest import SF_SMOKE

    v = (
        _QUERIES["embedding_pca_top_component"](spark, SF_SMOKE)
        .orderBy("dim")
        .collect()
    )
    vec = np.array([r["loading"] for r in v])
    assert abs(float(np.linalg.norm(vec)) - 1.0) < 1e-6

    cov_rows = _QUERIES["embedding_covariance"](spark, SF_SMOKE).collect()
    d = len(vec)
    C = np.zeros((d, d))
    for r in cov_rows:
        C[r["dim_i"], r["dim_j"]] = r["cov"]
        C[r["dim_j"], r["dim_i"]] = r["cov"]
    u0 = np.full(d, 1.0 / math.sqrt(d))
    assert vec @ C @ vec >= u0 @ C @ u0 - 1e-9
    # The synthetic embedding spectrum is NEAR-DEGENERATE at the top
    # (10 planted clusters -> lambda2/lambda1 ~ 0.93), so K=6 power
    # iterations deterministically reach ~0.885 * lambda1 here —
    # assert a floor under that and well above the mean eigenvalue
    # (what a non-informative direction would score).
    lam1 = float(np.linalg.eigvalsh(C)[-1])
    assert vec @ C @ vec >= 0.85 * lam1
    assert vec @ C @ vec >= 1.3 * (float(np.trace(C)) / d)


def test_pca_deterministic_across_fits(spark):
    from mapreduce_wordcounter_spark.operators import similarity as S
    from tests.conftest import SF_SMOKE

    S._PC_CACHE.clear()
    v1 = S._power_iterate(spark, SF_SMOKE)
    S._PC_CACHE.clear()
    v2 = S._power_iterate(spark, SF_SMOKE)
    assert v1 == v2


def test_pca_projection_captures_variance(spark):
    """var(pc1) must equal the component's Rayleigh quotient (it IS
    v'Cv by definition) — checked against a dense eigensolve: the 1-D
    projection keeps >= 0.85 of the best possible single-direction
    variance."""
    import numpy as np

    from tests.conftest import SF_SMOKE

    pc1 = np.array(
        [
            r["pc1"]
            for r in _QUERIES["embedding_pca_project"](spark, SF_SMOKE)
            .orderBy("vec_id")
            .collect()
        ]
    )
    cov_rows = _QUERIES["embedding_covariance"](spark, SF_SMOKE).collect()
    d = 1 + max(r["dim_j"] for r in cov_rows)
    C = np.zeros((d, d))
    for r in cov_rows:
        C[r["dim_i"], r["dim_j"]] = C[r["dim_j"], r["dim_i"]] = r["cov"]
    lam1 = float(np.linalg.eigvalsh(C)[-1])
    assert float(pc1.var()) >= 0.85 * lam1


def test_pca_top3_orthogonal_unit_basis(spark):
    """Deflation must yield an (approximately) ORTHONORMAL basis: unit
    norms exactly (each component ends on a normalize step) and
    pairwise dot products ~0 (the last step of every component ends
    projection -> normalize, so orthogonality holds by construction
    up to pico-quantization). Eigenvalues are Rayleigh estimates in
    TRAINING order; on this near-degenerate spectrum (lambda2 ~
    lambda3) K=6 estimates may invert within a few percent, so the
    order is pinned with that tolerance, not strictly."""
    import numpy as np

    from tests.conftest import SF_SMOKE

    rows = (
        _QUERIES["embedding_pca_top3"](spark, SF_SMOKE)
        .orderBy("component", "dim")
        .collect()
    )
    comps = {}
    lams = {}
    for r in rows:
        comps.setdefault(r["component"], []).append(r["loading"])
        lams[r["component"]] = r["eigenvalue"]
    assert sorted(comps) == [0, 1, 2]
    V = {m: np.array(v) for m, v in comps.items()}
    for m in range(3):
        assert abs(float(np.linalg.norm(V[m])) - 1.0) < 1e-6
    for a in range(3):
        for b in range(a + 1, 3):
            assert abs(float(V[a] @ V[b])) < 1e-6, (a, b, V[a] @ V[b])
    assert lams[0] >= lams[1] * 0.95 and lams[1] >= lams[2] * 0.95
    assert lams[2] > 0


def test_pca_project3_consistent_with_components(spark):
    """The 3-D projection must equal each vector's dot product with
    the served components (up to the pico quantization), and the
    per-coordinate variances must track the eigenvalues."""
    import numpy as np

    from tests.conftest import SF_SMOKE

    comp_rows = (
        _QUERIES["embedding_pca_top3"](spark, SF_SMOKE)
        .orderBy("component", "dim")
        .collect()
    )
    V = np.array(
        [[r["loading"] for r in comp_rows if r["component"] == m]
         for m in range(3)]
    )
    proj = {
        r["vec_id"]: (r["pc1"], r["pc2"], r["pc3"])
        for r in _QUERIES["embedding_pca_project"](spark, SF_SMOKE).collect()
    }
    from mapreduce_wordcounter_spark.tables import load_table

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .limit(50)
        .collect()
    }
    for vid, x in emb.items():
        got = np.array(proj[vid])
        want = V @ x
        assert np.allclose(got, want, atol=1e-6), (vid, got, want)


def test_pca_whiten_unit_variance_and_exact_scaling(spark):
    """The whitened coordinates must be (a) EXACTLY the raw projection
    divided by sqrt(eigenvalue) — one IEEE double division, so
    bit-equality, not allclose — and (b) approximately unit-variance
    per direction: var(pc_m) is the Rayleigh quotient v'Cv while the
    served eigenvalue is the final pre-normalization norm ||C v||, so
    the ratio is 1 only up to power-iteration convergence — bounded
    here at +/-25% on the near-degenerate tail components."""
    import math

    import numpy as np

    from tests.conftest import SF_SMOKE

    lam = {
        r["component"]: r["eigenvalue"]
        for r in _QUERIES["embedding_pca_top3"](spark, SF_SMOKE)
        .select("component", "eigenvalue")
        .distinct()
        .collect()
    }
    proj = {
        r["vec_id"]: (r["pc1"], r["pc2"], r["pc3"])
        for r in _QUERIES["embedding_pca_project"](spark, SF_SMOKE).collect()
    }
    wh = {
        r["vec_id"]: (r["wc1"], r["wc2"], r["wc3"])
        for r in _QUERIES["embedding_pca_whiten"](spark, SF_SMOKE).collect()
    }
    assert wh.keys() == proj.keys()
    roots = [math.sqrt(lam[m]) for m in range(3)]
    for vid, (p1, p2, p3) in proj.items():
        w = wh[vid]
        assert w == (p1 / roots[0], p2 / roots[1], p3 / roots[2]), vid
    W = np.array(list(wh.values()))
    for m in range(3):
        assert 0.75 < float(W[:, m].var()) < 1.25, (m, W[:, m].var())


def test_pca_explained_variance_invariants(spark):
    """Explained-variance surface: ratios strictly positive, each
    below 1, cumulative strictly increasing and consistent with the
    per-component ratios under the fixed accumulation order; the
    eigenvalues must be byte-identical to embedding_pca_top3's (the
    same cached training pass, k prefix-stable)."""
    from tests.conftest import SF_SMOKE

    rows = (
        _QUERIES["embedding_pca_explained_variance"](spark, SF_SMOKE)
        .orderBy("component")
        .collect()
    )
    assert [r["component"] for r in rows] == [0, 1, 2]
    top3_lams = {
        r["component"]: r["eigenvalue"]
        for r in _QUERIES["embedding_pca_top3"](spark, SF_SMOKE)
        .select("component", "eigenvalue")
        .distinct()
        .collect()
    }
    from mapreduce_wordcounter_spark.operators.similarity import _pca_trace

    t = _pca_trace(spark, SF_SMOKE)
    cum = 0.0
    for m, r in enumerate(rows):
        assert r["eigenvalue"] == top3_lams[m]
        assert 0.0 < r["variance_ratio"] < 1.0
        assert r["variance_ratio"] == r["eigenvalue"] / t
        cum = r["eigenvalue"] if m == 0 else cum + r["eigenvalue"]
        assert r["cumulative_ratio"] == cum / t
    assert rows[0]["cumulative_ratio"] < rows[1]["cumulative_ratio"] < rows[2]["cumulative_ratio"]
    assert rows[2]["cumulative_ratio"] < 1.0


def test_ivf_sq8_tracks_ivf_on_clustered_data(spark, clustered_sf):
    """IVF-SQ8 routes through the SAME probe as ann_ivf_topk, so on
    cluster-aligned data its exact-re-ranked top-10 must match the
    float path's recall: int8 quantization of unit-scale vectors
    perturbs cosines by ~1/127 — far below the inter-cluster margin —
    and the 3x shortlist absorbs any within-cluster reordering."""
    ivf = _QUERIES["ann_ivf_topk"](spark, clustered_sf).toPandas()
    sq8 = _QUERIES["ann_ivf_sq8_topk"](spark, clustered_sf).toPandas()
    assert _recall(ivf, sq8) >= 0.9, _recall(ivf, sq8)
    # the exact re-rank serves true cosines: where both paths agree on
    # a (query, vec) pair, the cosine is identical
    m = ivf.merge(sq8, on=["query_id", "vec_id"], suffixes=("_f", "_q"))
    assert (m["cosine_f"] == m["cosine_q"]).all()


# -- matryoshka truncated-dim ANN ---------------------------------------


def test_matryoshka_recall_floor_on_real_testdata(spark):
    """The driver's synthetic embeddings are NOT matryoshka-trained —
    a 16-dim prefix of structureless 64-dim vectors is just a lossy
    projection, so recall is data-dependent (measured ~0.48 at
    sf0.01; the clustered-data test below makes the quality claim for
    the regime MRL is built for). The hard invariants here: full
    result shape, and every served cosine equals the brute-force
    value for that pair — stage 2 is EXACT re-ranking, never an
    approximation of the score."""
    brute = _QUERIES["knn_brute_cosine"](spark, "/root/testdata/sf0.01").toPandas()
    mrl = _QUERIES["ann_matryoshka_topk"](spark, "/root/testdata/sf0.01").toPandas()
    assert set(mrl.groupby("query_id").size()) == {10}
    assert _recall(brute, mrl) >= 0.3  # sanity floor, not a quality claim
    bmap = {(r.query_id, r.vec_id): r.cosine for r in brute.itertuples()}
    for r in mrl.itertuples():
        if (r.query_id, r.vec_id) in bmap:
            assert abs(bmap[(r.query_id, r.vec_id)] - r.cosine) < 1e-9


def test_matryoshka_perfect_recall_on_clustered_data(spark, clustered_sf):
    """On clustered data the 16-dim prefix preserves cluster geometry
    (cluster centers differ in every dim), so the 50-candidate
    prefilter must contain the entire exact top-10: recall = 1.0 and
    the full result equals brute-force exactly."""
    brute = _QUERIES["knn_brute_cosine"](spark, clustered_sf).toPandas()
    mrl = _QUERIES["ann_matryoshka_topk"](spark, clustered_sf).toPandas()
    assert _recall(brute, mrl) >= 0.99


def test_covariance_arrow_semantics(spark):
    """The mapInArrow covariance (r12 optimization) must replay the
    per-ROW semantics of the old explode plan exactly: variable-length
    vectors contribute only their own upper triangle, null vectors
    contribute nothing, null ELEMENTS drop out of the sums but keep
    their row in n, and all arithmetic is the float32→float64 →
    floor(x*1e6 + 0.5) micro-quantization. Pinned against a hand-built
    frame with all three edge shapes."""
    import math

    from pyspark.sql import types as T

    import mapreduce_wordcounter_spark.operators.similarity as sim

    rows = [
        ([1.5, -2.0, 0.25],),
        ([0.5, None, 4.0],),   # null element
        ([3.25, 1.0],),        # shorter vector
        (None,),               # null vector
    ]
    schema = T.StructType(
        [T.StructField("embedding", T.ArrayType(T.FloatType()), True)]
    )
    df = spark.createDataFrame(rows, schema)
    orig = sim.load_table
    try:
        sim.load_table = lambda *_a, **_k: df
        got = {
            (r["dim_i"], r["dim_j"]): r["cov"]
            for r in sim.embedding_covariance(spark, "ignored").collect()
        }
    finally:
        sim.load_table = orig

    def q(x):
        return math.floor(x * 1e6 + 0.5)

    vecs = [[1.5, -2.0, 0.25], [0.5, None, 4.0], [3.25, 1.0]]
    expect = {}
    for i in range(3):
        for j in range(i, 3):
            cells = [v for v in vecs if len(v) > j]
            n = len(cells)
            if n == 0:
                continue
            sxy = sum(
                q(v[i] * v[j])
                for v in cells
                if v[i] is not None and v[j] is not None
            )
            sx = sum(q(v[i]) for v in cells if v[i] is not None)
            sy = sum(q(v[j]) for v in cells if v[j] is not None)
            expect[(i, j)] = (sxy / 1e6) / n - ((sx / 1e6) / n) * (
                (sy / 1e6) / n
            )
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-12, (k, got[k], v)
