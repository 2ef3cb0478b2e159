"""Semantic sanity + plan contracts for the round-11 additions: the
materialized kNN-graph artifact (build-once / audit-many) and the
composed curation pipeline v3 (SemDeDup + keep-best + Gopher gate +
weighted sample)."""

from __future__ import annotations

import hashlib
import math
import os
import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fresh_artifact(spark):
    """(Re)build the sf0.001 graph artifact and return its path."""
    from tsengine.operators.similarity import (
        _knn_graph_path,
        knn_graph_materialize,
    )

    knn_graph_materialize(spark, SF)
    return _knn_graph_path(SF, 5)


def test_materialized_graph_is_bit_identical_to_live_build(spark):
    """The parquet roundtrip must preserve the ranked graph exactly —
    same rows, same doubles bit-for-bit — so every audit's oracle
    (which recomputes the graph from the CTEs) still hash-matches."""
    from tsengine.operators.similarity import knn_join_lsh

    _fresh_artifact(spark)
    from tsengine.operators.similarity import _knn_graph_cached

    key = lambda r: (r.vec_id, r.rank)  # noqa: E731
    live = sorted(knn_join_lsh(spark, SF).collect(), key=key)
    mat = sorted(_knn_graph_cached(spark, SF).collect(), key=key)
    assert len(live) == len(mat) > 0
    for a, b in zip(live, mat):
        assert (a.vec_id, a.neighbor_id, a.rank) == (b.vec_id, b.neighbor_id, b.rank)
        assert a.cos == b.cos  # exact, not approx: parquet stores the bits


def test_artifact_publish_is_atomic_and_flagged(spark):
    """The artifact dir must carry parquet's _SUCCESS marker (the
    cached reader's existence probe) and no temp dir may linger."""
    path = _fresh_artifact(spark)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    parent = os.path.dirname(path)
    leaf = os.path.basename(path)
    stale = [d for d in os.listdir(parent) if d.startswith(f"{leaf}.tmp.")]
    assert stale == []


def test_audits_read_artifact_not_rebuild(spark):
    """With the artifact published, every graph AUDIT's plan must be a
    parquet scan — zero grouped-map kernels (the build's signature
    FlatMapGroupsInPandas) anywhere.  This IS round 11's efficiency
    claim: audits are cheap reads of the persisted asset."""
    from tsengine.operators.similarity import (
        knn_assortativity,
        knn_hubness,
        knn_label_vote,
        knn_pagerank,
        knn_snn_graph,
        knn_triangle_count,
    )

    _fresh_artifact(spark)
    for fn in (knn_hubness, knn_label_vote, knn_snn_graph, knn_assortativity):
        plan = _plan(fn(spark, SF))
        assert "FlatMapGroupsInPandas" not in plan, fn.__name__
        assert "Scan parquet" in plan, fn.__name__
    # the iterative two (pagerank, triangles) localCheckpoint the edge
    # table eagerly, which EXECUTES the read path at plan-build time;
    # asserting on their final plan would only see the checkpoint scan.
    # Proving their input came from the artifact: the mutual edge build
    # from the cached graph has no kernel either.
    from tsengine.operators.similarity import _knn_graph_cached, _knn_mutual_edges

    mut_plan = _plan(
        _knn_mutual_edges(spark, SF, graph=_knn_graph_cached(spark, SF))
    )
    assert "FlatMapGroupsInPandas" not in mut_plan
    # and both run end-to-end off it
    assert knn_pagerank(spark, SF).count() > 0
    assert knn_triangle_count(spark, SF).count() == 1


def test_components_stay_on_live_build_path(spark):
    """knn_components must keep exercising the full composition (r10
    verdict item 3's explicit order): its mutual-edge input (the
    default live path) retains the grouped-map scoring kernel even
    when the artifact exists.  (knn_components' own final plan is a
    checkpoint scan — hash_min_components localCheckpoints eagerly —
    so the contract is asserted on the pre-checkpoint input plan.)"""
    from tsengine.operators.similarity import _knn_mutual_edges

    _fresh_artifact(spark)
    plan = _plan(_knn_mutual_edges(spark, SF))
    assert "FlatMapGroupsInPandas" in plan


def test_graph_path_tracks_fixture_mtime(monkeypatch):
    """A regenerated embeddings fixture must invalidate the cache: the
    artifact path is keyed by the parquet's NANOSECOND mtime (whole
    seconds would silently serve a stale graph after a same-second
    regeneration — ADVICE r11)."""
    import types

    from tsengine.operators import similarity as sim

    p1 = sim._knn_graph_path(SF, 5)
    real = os.stat

    def fake(p, *a, **k):
        if str(p).endswith("embeddings.parquet"):
            # same whole second as a plausible regen, +1ns
            return types.SimpleNamespace(
                st_mtime_ns=real(p, *a, **k).st_mtime_ns + 1
            )
        return real(p, *a, **k)

    monkeypatch.setattr(sim.os, "stat", fake)
    p2 = sim._knn_graph_path(SF, 5)
    assert p1 != p2


def test_curation_v3_semantics(spark):
    """Recompute the pipeline's guarantees from its verified stages:
    (a) no output doc is a dropped (non-keep-best) cluster member;
    (b) every output doc passes the Gopher gate;
    (c) n_members matches the doc's component size (1 for singletons);
    (d) the sample key is the documented md5-priority formula and the
        output is the top-k of the gated survivor set by (key, doc_id);
    (e) at most one output doc per semantic component."""
    from tsengine.operators.similarity import knn_components, pipeline_curation_v3
    from tsengine.operators.text import gopher_rules
    from tsengine.sources.tables import load_table

    out = pipeline_curation_v3(spark, SF).collect()
    assert 0 < len(out) <= 100

    comp = {
        r.vec_id: r.component for r in knn_components(spark, SF).collect()
    }
    sizes: dict[int, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    docs = {
        r.doc_id: r
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    }
    keep = {r.doc_id for r in gopher_rules(spark, SF).collect() if r.keep == 1}

    # keep-best survivor per component, longest (n_chars desc, doc_id)
    best: dict[int, int] = {}
    for vid, c in comp.items():
        cur = best.get(c)
        cand = (-docs[vid].n_chars, vid)
        if cur is None or cand < (-docs[cur].n_chars, cur):
            best[c] = vid

    seen_components = set()
    for r in out:
        c = comp.get(r.doc_id)
        if c is not None:
            assert best[c] == r.doc_id, "non-keep-best member sampled"  # (a)
            assert c not in seen_components  # (e)
            seen_components.add(c)
            assert r.n_members == sizes[c]  # (c)
        else:
            assert r.n_members == 1  # (c) singleton
        assert r.doc_id in keep  # (b)
        h = int(
            hashlib.md5(f"curv3:{r.doc_id}".encode()).hexdigest()[:8], 16
        )
        expect = round(
            math.log((h + 1) / 4294967296.0) / docs[r.doc_id].n_chars, 6
        )
        assert abs(r.key - expect) < 1e-9  # (d)

    # (d) top-k: every gated survivor NOT in the output ranks below the
    # output's minimum (key desc, doc_id asc)
    out_ids = {r.doc_id for r in out}
    cutoff = min((r.key, -r.doc_id) for r in out)
    for doc_id, d in docs.items():
        if doc_id not in keep or doc_id in out_ids:
            continue
        c = comp.get(doc_id)
        if c is not None and best[c] != doc_id:
            continue  # dropped member, not a survivor
        h = int(hashlib.md5(f"curv3:{doc_id}".encode()).hexdigest()[:8], 16)
        k = round(math.log((h + 1) / 4294967296.0) / d.n_chars, 6)
        assert (k, -doc_id) <= cutoff


def test_curation_v3_plan_contract(spark):
    """The composition must stay one distributed DAG: no cartesian
    product, no partition-less window (the keep-best window partitions
    by component), and the final sample compiles to TakeOrdered —
    per-partition top-k, never a global sort."""
    from tsengine.operators.similarity import pipeline_curation_v3

    plan = _plan(pipeline_curation_v3(spark, SF))
    assert "CartesianProduct" not in plan
    assert not re.search(r"Window.*partitionBy=\[\]", plan)
    assert "TakeOrderedAndProject" in plan


def test_knn_graph_update_equals_rebuild_bitwise(spark):
    """The incremental update (old-graph artifact + new-batch probe +
    union re-rank) must equal the from-scratch rebuild EXACTLY — same
    edges, same ranks, same cosine bits (the probe kernel's block fold
    is the full kernel's fold restricted to new rows)."""
    from tsengine.operators.similarity import knn_graph_update, knn_join_lsh

    key = lambda r: (r.vec_id, r.rank)  # noqa: E731
    inc = sorted(knn_graph_update(spark, SF).collect(), key=key)
    full = sorted(knn_join_lsh(spark, SF).collect(), key=key)
    assert len(inc) == len(full) > 0
    for a, b in zip(inc, full):
        assert (a.vec_id, a.neighbor_id, a.rank) == (b.vec_id, b.neighbor_id, b.rank)
        assert a.cos == b.cos


def test_knn_graph_update_probe_is_batch_scoped(spark):
    """Every probe-kernel candidate must involve a new-batch vector —
    the structural guarantee that the incremental path never rescores
    old-old pairs (the linear-in-batch claim)."""
    from tsengine.operators.similarity import _INC_MOD, knn_graph_update
    from tsengine.operators.similarity import _knn_old_graph_cached

    # force the artifact so the update's only kernel is the probe
    _knn_old_graph_cached(spark, SF)
    df = knn_graph_update(spark, SF)
    plan = _plan(df)
    assert plan.count("FlatMapGroupsInPandas") == 1  # probe only
    # old-old edges in the RESULT must come from the artifact: any edge
    # between two old vectors must also exist in the old graph
    old = {
        (r.vec_id, r.neighbor_id)
        for r in _knn_old_graph_cached(spark, SF).collect()
    }
    for r in df.collect():
        if r.vec_id % _INC_MOD != 0 and r.neighbor_id % _INC_MOD != 0:
            assert (r.vec_id, r.neighbor_id) in old


def test_curation_v3_oracle_reuses_stage_fragments():
    """The one-definition-per-stage contract: the composed pipeline's
    registered oracle must contain the EXACT fragment text its stages
    are individually verified with — a silent divergence between the
    gopher_rules oracle and the pipeline's inlined copy would let the
    two drift apart while both stay individually green."""
    from tsengine.operators.similarity import _KNN_MUTUAL_CTES
    from tsengine.operators.text import _GOPHER_FEAT_CTES, _GOPHER_KEEP_PRED
    from tsengine.registry import all_queries

    qs = all_queries()
    pipe = qs["pipeline_curation_v3"].oracle
    assert _KNN_MUTUAL_CTES in pipe
    assert _GOPHER_FEAT_CTES in pipe
    assert _GOPHER_KEEP_PRED in pipe
    # and the standalone gopher oracle embeds the same fragments
    gop = qs["gopher_rules"].oracle
    assert _GOPHER_FEAT_CTES in gop
    assert _GOPHER_KEEP_PRED in gop


def test_probe_kernel_is_bit_restriction_of_full_kernel():
    """On one synthetic bucket, the probe kernel's block product must
    emit EXACTLY the full kernel's rows restricted to pairs involving
    a new vector — same cosraw bits (both kernels fold dimensions in
    index order, so this is equality, not approximation)."""
    import numpy as np
    import pandas as pd

    from tsengine.operators.similarity import (
        _bucket_pair_dots,
        _bucket_probe_dots,
        _INC_MOD,
    )

    rng = np.random.RandomState(7)
    m, dim = 23, 16
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(m, dtype="int64"),
            "e": [rng.randn(dim) for _ in range(m)],
            "band": np.zeros(m, dtype="int32"),
            "bucket": ["b"] * m,
        }
    )
    pdf["nrm"] = [float(np.sqrt((v * v).sum())) for v in pdf["e"]]
    pdf["is_new"] = (pdf["vec_id"] % _INC_MOD == 0).astype(bool)

    full = _bucket_pair_dots(pdf.drop(columns=["is_new"]))
    probe = _bucket_probe_dots(pdf)

    def as_map(df):
        return {
            (int(r.vec_id), int(r.neighbor_id)): float(r.cosraw)
            for r in df.itertuples()
        }

    fm, pm = as_map(full), as_map(probe)
    want = {
        k: v
        for k, v in fm.items()
        if k[0] % _INC_MOD == 0 or k[1] % _INC_MOD == 0
    }
    assert set(pm) == set(want)
    for k, v in want.items():
        assert pm[k] == v  # bit-for-bit, not approx
