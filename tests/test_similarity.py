"""ANN quality properties: approximate methods must actually
approximate — each variant's top-5 is compared against the exact
brute-force top-5 (recall@5).  A bucket scheme that is oracle-correct
but finds none of the true neighbors (the original single-table LSH
measured 0.00) is a correctness bug in spirit, which is exactly what
these floors catch."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def topsets(spark, oracle_sf_dir):
    from tsengine.registry import all_queries

    qs = all_queries()
    out = {}
    for name in ("ann_cosine_topk", "ann_lsh", "ann_ivf"):
        out[name] = {
            (r.query_id, r.neighbor_id)
            for r in qs[name].fn(spark, oracle_sf_dir).collect()
        }
    return out


def test_ivf_recall_floor(topsets):
    exact = topsets["ann_cosine_topk"]
    recall = len(topsets["ann_ivf"] & exact) / len(exact)
    assert recall >= 0.7, f"IVF recall@5 degraded to {recall:.2f}"


def test_lsh_recall_floor(topsets):
    exact = topsets["ann_cosine_topk"]
    recall = len(topsets["ann_lsh"] & exact) / len(exact)
    assert recall >= 0.3, f"multi-band LSH recall@5 degraded to {recall:.2f}"


def test_all_return_full_topk(topsets):
    for name, s in topsets.items():
        assert len(s) == 50, f"{name} returned {len(s)} pairs, expected 10x5"


def test_band_signature_udf_matches_scalar_recompute(spark, sf_dir):
    """The Arrow-matmul signature kernel must agree bit-for-bit with a
    scalar Python recomputation of sign(<e, plane>) — guards the numpy
    vectorization against transposition/reshape/order bugs."""
    from pyspark.sql import functions as F

    from tsengine.operators.similarity import (
        N_BANDS,
        N_BITS,
        _band_signatures_udf,
        _PLANES,
    )
    from tsengine.sources.tables import load_table

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .limit(100)
    )
    rows = emb.select("vec_id", "e", _band_signatures_udf()(F.col("e")).alias("bands")).collect()
    assert rows
    for r in rows:
        for b in range(N_BANDS):
            expect = "".join(
                "1"
                if sum(x * w for x, w in zip(r.e, _PLANES[b * N_BITS + j])) >= 0
                else "0"
                for j in range(N_BITS)
            )
            assert r.bands[b] == expect, (r.vec_id, b)


def test_ivf_pq_recall_floor(spark, oracle_sf_dir):
    """Composed IVF+PQ (coarse prune -> ADC over codes -> exact
    rerank) must stay close to plain IVF's recall — the PQ compression
    step should cost little once the shortlist is exactly reranked
    (measured 0.88 vs IVF's 0.92 at HEAD; floor set to catch
    collapses, not noise)."""
    from tsengine.registry import all_queries

    qs = all_queries()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_cosine_topk"].fn(spark, oracle_sf_dir).collect()
    }
    ivfpq = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_ivf_pq"].fn(spark, oracle_sf_dir).collect()
    }
    assert len(ivfpq) == 50
    recall = len(ivfpq & exact) / len(exact)
    assert recall >= 0.6, f"IVF+PQ recall@5 degraded to {recall:.2f}"


def test_knn_join_restricted_to_probe_set_equals_ann_lsh(spark, oracle_sf_dir):
    """knn_join_lsh restricted to the probe vectors must EQUAL ann_lsh
    exactly — same band signatures, same candidate generation, same
    6dp-rounded cosine and tie-break, so the all-vectors graph's rows
    for vec_id < _N_QUERIES are ann_lsh's rows verbatim.  Catches any
    drift between the broadcast-probe and shuffle-self-join paths."""
    from tsengine.operators.similarity import _N_QUERIES
    from tsengine.registry import all_queries

    qs = all_queries()
    knn = {
        (r.vec_id, r.neighbor_id, r.cos, r.rank)
        for r in qs["knn_join_lsh"].fn(spark, oracle_sf_dir).collect()
        if r.vec_id < _N_QUERIES
    }
    ann = {
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in qs["ann_lsh"].fn(spark, oracle_sf_dir).collect()
    }
    assert knn == ann


def test_knn_join_covers_most_vectors(spark, oracle_sf_dir):
    """Every vector with at least one band-bucket companion gets a
    neighbor list; with 8 bands x 5 bits over a 500-vector corpus the
    graph should cover nearly everyone, ranks dense from 1 without
    gaps and TOP_K at most."""
    from tsengine.operators.similarity import TOP_K
    from tsengine.registry import all_queries
    from tsengine.sources.tables import load_table

    df = all_queries()["knn_join_lsh"].fn(spark, oracle_sf_dir)
    rows = df.collect()
    n_vecs = load_table(spark, oracle_sf_dir, "embeddings").count()
    by_vec: dict = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r.rank)
    assert len(by_vec) >= 0.9 * n_vecs
    for vid, ranks in by_vec.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), vid
        assert len(ranks) <= TOP_K


def test_knn_join_scale_dial_shrinks_candidates(spark, oracle_sf_dir):
    """The production dial: more bits => smaller buckets => fewer
    candidate pairs (the linear-volume knob the docstring sells).
    Counted on the PRE-top-k distinct candidate set (r9 advice: the
    returned graph is capped at TOP_K per vector, so a graph-row count
    tests coverage, not candidate volume — it could pass with the dial
    broken).  3 bits halving to 8 must cut candidates by a real
    factor; the non-default geometries also guard the parametric
    plane factory end-to-end."""
    from tsengine.operators.similarity import _knn_candidates

    n5 = _knn_candidates(spark, oracle_sf_dir, n_bits=5).count()
    n8 = _knn_candidates(spark, oracle_sf_dir, n_bits=8).count()
    assert n8 > 0
    # expected volume ~ bands * N^2 / 2^bits: 8 bits vs 5 is an 8x cut
    # in EXPECTED bucket mass; demand at least 2x on the fixture to
    # leave room for banding overlap and distinct-pair saturation
    assert n8 * 2 <= n5, (n5, n8)


def test_bucket_pair_dots_hot_bucket_raises(monkeypatch):
    """A (band, bucket) group above the kernel cap must fail LOUDLY
    with the remediation in the message ('raise n_bits' / exact-dedup
    first), not OOM an executor on a bucket^2 Gram — the degenerate
    corpus here (one vector duplicated past the cap) is exactly what a
    dedup input looks like.  Checked at the real cap with cheap dim-1
    vectors (the guard fires before any allocation) and just below a
    monkeypatched cap to pin the boundary."""
    import pandas as pd
    import pytest

    import tsengine.operators.similarity as sim

    m = sim._KNN_BUCKET_CAP + 1
    pdf = pd.DataFrame(
        {
            "vec_id": range(m),
            "e": [[0.5]] * m,
            "nrm": [0.5] * m,
            "band": 3,
            "bucket": "00000",
        }
    )
    with pytest.raises(ValueError, match="hot bucket.*n_bits"):
        sim._bucket_pair_dots(pdf)
    # boundary: exactly cap-sized groups still score
    monkeypatch.setattr(sim, "_KNN_BUCKET_CAP", 4)
    out = sim._bucket_pair_dots(pdf.head(4))
    assert len(out) == 4 * 3  # all ordered pairs
    with pytest.raises(ValueError, match="band=3"):
        sim._bucket_pair_dots(pdf.head(5))


def test_bucket_pair_dots_bit_identical_to_hof_fold(spark, oracle_sf_dir):
    """The grouped kernel's dimension-ordered Gram accumulation must be
    BIT-identical (==, never approx) to the interpreted
    aggregate(zip_with(...)) left fold — the parity contract that lets
    knn_join_lsh hash-match the DuckDB oracle.  Pins the kernel against
    a future 'optimization' to np.dot/matmul/einsum, whose BLAS or
    pairwise summation reorders the adds and would drift by ulps that
    only surface at a 6dp rounding boundary."""
    import pandas as pd

    from pyspark.sql import functions as F

    from tsengine.operators.similarity import _bucket_pair_dots
    from tsengine.sources.tables import load_table

    emb = (
        load_table(spark, oracle_sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .limit(40)
    )
    sq = F.aggregate(F.col("e"), F.lit(0.0), lambda acc, x: acc + x * x)
    nrms = emb.withColumn("nrm", F.sqrt(sq)).collect()
    pdf = pd.DataFrame(
        {
            "vec_id": [r.vec_id for r in nrms],
            "e": [list(r.e) for r in nrms],
            "nrm": [r.nrm for r in nrms],
            "band": 0,
            "bucket": "t",
        }
    )
    kernel = _bucket_pair_dots(pdf)
    kmap = {
        (int(r.vec_id), int(r.neighbor_id)): float(r.cosraw)
        for r in kernel.itertuples()
    }
    # reference: the interpreted HOF fold, evaluated by Spark itself
    a = emb.withColumn("nrm", F.sqrt(sq))
    b = a.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ne"),
        F.col("nrm").alias("nnrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("e"), F.col("ne"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ref = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            (dot / (F.col("nrm") * F.col("nnrm"))).alias("cosraw"),
        )
        .collect()
    )
    assert len(ref) == len(kmap) == 40 * 39
    for r in ref:
        assert kmap[(r.vec_id, r.neighbor_id)] == r.cosraw, (
            r.vec_id,
            r.neighbor_id,
        )


def test_knn_components_cluster_invariants(spark, oracle_sf_dir):
    """Structural invariants of the semantic clusters: the component
    label IS the min member id; every labelled vector has >= 1 mutual
    edge at the threshold; every mutual edge joins two vectors of the
    SAME component (closure actually closed); components have >= 2
    members (isolated vectors never enter)."""
    from tsengine.operators.similarity import _knn_mutual_edges, knn_components

    comp = {
        r.vec_id: r.component
        for r in knn_components(spark, oracle_sf_dir).collect()
    }
    edges = {
        (r.node, r.nbr) for r in _knn_mutual_edges(spark, oracle_sf_dir).collect()
    }
    assert comp and edges
    # both directions present, no self-loops
    assert all((b, a) in edges for a, b in edges)
    assert all(a != b for a, b in edges)
    touched = {a for a, _ in edges}
    assert set(comp) == touched
    assert all(comp[a] == comp[b] for a, b in edges)
    by_comp: dict = {}
    for v, c in comp.items():
        by_comp.setdefault(c, []).append(v)
    for c, members in by_comp.items():
        assert c == min(members)
        assert len(members) >= 2


def test_semdedup_survivors_partition_of_corpus(spark, oracle_sf_dir):
    """Survivors + dropped non-canonical members partition the corpus:
    exactly one survivor per cluster (its min vec_id), n_members adds
    back to the full corpus count, and unclustered vectors survive
    with n_members=1."""
    from tsengine.operators.similarity import knn_components, semdedup_survivors
    from tsengine.sources.tables import load_table

    n = load_table(spark, oracle_sf_dir, "embeddings").count()
    surv = {r.vec_id: r.n_members for r in semdedup_survivors(spark, oracle_sf_dir).collect()}
    comp = {
        r.vec_id: r.component
        for r in knn_components(spark, oracle_sf_dir).collect()
    }
    clusters: dict = {}
    for v, c in comp.items():
        clusters.setdefault(c, set()).add(v)
    # every cluster contributes exactly its canonical member
    for c, members in clusters.items():
        assert c in surv and surv[c] == len(members)
        assert not (members - {c}) & set(surv)
    # absorbed mass reconstructs the corpus
    assert sum(surv.values()) == n
    # unclustered vectors ride through untouched
    unclustered = set(surv) - set(comp)
    assert all(surv[v] == 1 for v in unclustered)


def test_knn_hubness_mass_conserved(spark, oracle_sf_dir):
    """The in-degree histogram must conserve graph mass: sum of
    indegree*n_vectors equals the graph's row count, and sum of
    n_vectors equals the number of distinct vectors that appear in
    ANY neighbor list."""
    from tsengine.operators.similarity import knn_hubness, knn_join_lsh

    g = knn_join_lsh(spark, oracle_sf_dir).cache()
    hub = knn_hubness(spark, oracle_sf_dir).collect()
    assert sum(r.indegree * r.n_vectors for r in hub) == g.count()
    assert sum(r.n_vectors for r in hub) == g.select("neighbor_id").distinct().count()
    g.unpersist()


def test_knn_label_vote_matches_python_recompute(spark, oracle_sf_dir):
    """The one-hop vote must equal an independent Python argmax over
    the same graph + seed labels: cos-weighted sum per candidate label,
    6dp rounding, (score desc, label asc) tie-break — guards the
    join/groupBy/window composition against seed-filter and tie bugs."""
    from tsengine.operators.similarity import (
        _SEED_MOD,
        knn_join_lsh,
        knn_label_vote,
    )
    from tsengine.sources.tables import load_table

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, oracle_sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    votes: dict = {}
    for r in knn_join_lsh(spark, oracle_sf_dir).collect():
        if r.vec_id % _SEED_MOD == 0 or r.neighbor_id % _SEED_MOD != 0:
            continue
        votes.setdefault(r.vec_id, {}).setdefault(labels[r.neighbor_id], []).append(
            r.cos
        )
    expected = {}
    for v, per_label in votes.items():
        scored = sorted(
            ((round(sum(cs), 6), lab) for lab, cs in per_label.items()),
            key=lambda t: (-t[0], t[1]),
        )
        expected[v] = (scored[0][1], scored[0][0])
    got = {
        r.vec_id: (r.pred_label, r.score)
        for r in knn_label_vote(spark, oracle_sf_dir).collect()
    }
    assert got == expected
    assert got, "vote produced no predictions"
    # no seed ever receives a prediction
    assert all(v % _SEED_MOD != 0 for v in got)


def test_knn_pagerank_matches_python_recompute(spark, oracle_sf_dir):
    """Fixed-iteration damped PageRank must walk the identical
    fixed-point BIGINT trajectory as a scalar Python recompute over
    the same mutual edge set — guards the join-loop (contribution
    direction, outdeg joins, integer-div semantics) end-to-end.  The
    recompute uses Python's arbitrary-precision ints, so agreement
    also proves no 64-bit anomaly in either engine's div/sum."""
    from tsengine.operators.similarity import (
        _PR_ITERS,
        _PR_SCALE,
        _knn_mutual_edges,
        knn_pagerank,
    )

    edges = [
        (r.node, r.nbr) for r in _knn_mutual_edges(spark, oracle_sf_dir).collect()
    ]
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {n: _PR_SCALE for n in outdeg}
    for _ in range(_PR_ITERS):
        ranks = {
            n: 150000
            + (85 * sum(ranks[d] // outdeg[d] for (sn, d) in edges if sn == n))
            // 100
            for n in outdeg
        }
    got = {
        r.vec_id: r.pagerank_micro
        for r in knn_pagerank(spark, oracle_sf_dir).collect()
    }
    assert got == ranks
    assert got, "pagerank produced no nodes"
    # teleport floor: no rank can fall below the undamped minimum
    assert all(v >= 150000 for v in got.values())


def test_embedding_outliers_matches_python_fence(spark, oracle_sf_dir):
    """The flagged set must equal a Python recompute of the Tukey-style
    fence from kmeans_fit's own assignment: per-cluster discrete-rank
    quartiles (ceil(n/4), ceil(3n/4)) and the 0.75 multiplier — guards
    the window rank arithmetic and the strict-inequality membership."""
    import math

    from tsengine.operators.clustering import embedding_outliers, kmeans_fit

    rows = kmeans_fit(spark, oracle_sf_dir).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r.dist)
    fences = {}
    for c, ds in by_cluster.items():
        ds.sort()
        n = len(ds)
        q1 = ds[math.ceil(n / 4) - 1]
        q3 = ds[math.ceil(3 * n / 4) - 1]
        fences[c] = q3 + 0.75 * (q3 - q1)
    expected = {
        (r.vec_id, r.cluster)
        for r in rows
        if r.dist > fences[r.cluster]
    }
    out = embedding_outliers(spark, oracle_sf_dir).collect()
    assert {(r.vec_id, r.cluster) for r in out} == expected
    assert out, "fence flagged nothing at the fixture dial"
    assert all(r.dist > r.fence for r in out)
    # every flagged row carries its own cluster's fence, bit-exact
    assert all(r.fence == fences[r.cluster] for r in out)
