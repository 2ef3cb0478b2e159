"""Round-12 contracts: the graph artifact's true-atomic publish +
superseded-version GC (VERDICT r11 item 3 / ADVICE r11), and the
incremental curation pipeline's equality with a from-scratch v3 run."""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"


def _toy(spark, val):
    return spark.createDataFrame([(1, val)], "id long, v long")


def _leaf(tmp_path, mtag):
    # the exact leaf shape _knn_graph_path mints: dial prefix, mtime
    # tag, sf_scoped_dir's 10-hex scale-factor tag
    return str(tmp_path / f"graph_k10_b8x5_m{mtag}_0123456789")


def test_publish_never_deletes_destination_first(spark, tmp_path):
    """Publishing onto an existing COMPLETE artifact must leave it in
    place untouched (concurrent-publisher-won semantics): at no point
    may the destination be absent — the rmtree-before-rename window
    ADVICE r11 flagged."""
    from tsengine.operators.similarity import _publish_graph

    path = _leaf(tmp_path, 111)
    _publish_graph(_toy(spark, 1), path)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    ino = os.stat(path).st_ino
    _publish_graph(_toy(spark, 2), path)  # loser discards its copy
    assert os.stat(path).st_ino == ino  # original artifact untouched
    [row] = spark.read.parquet(path).collect()
    assert row.v == 1
    assert not [d for d in os.listdir(tmp_path) if ".tmp." in d]


def test_publish_replaces_incomplete_occupant(spark, tmp_path):
    """An occupant WITHOUT _SUCCESS (crashed legacy layout) is swapped
    aside-then-in, never leaving the path absent, and the aside copy
    is removed."""
    from tsengine.operators.similarity import _publish_graph

    path = _leaf(tmp_path, 222)
    os.makedirs(path)  # incomplete: no _SUCCESS
    # non-empty, so the rename cannot trivially replace an empty dir —
    # the aside-swap branch itself must run (tightened in round 13)
    open(os.path.join(path, "part-junk"), "w").close()
    _publish_graph(_toy(spark, 7), path)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    [row] = spark.read.parquet(path).collect()
    assert row.v == 7
    assert not [d for d in os.listdir(tmp_path) if ".old." in d or ".tmp." in d]


def test_publish_gc_prunes_superseded_mtimes(spark, tmp_path):
    """Publishing the new-fixture-mtime artifact prunes superseded
    siblings of the same dial+sf family — exactly one artifact
    survives (VERDICT r11 missing-item 2) — while a DIFFERENT dial or
    sf tag is left alone."""
    from tsengine.operators.similarity import _publish_graph

    old = _leaf(tmp_path, 111)
    other_dial = str(tmp_path / "graph_k10_b8x6_m111_0123456789")
    other_sf = str(tmp_path / "graph_k10_b8x5_m111_aaaaaaaaaa")
    orphan_tmp = old + ".tmp.999999999"  # dead-pid staging leftover
    for p in (old, other_dial, other_sf):
        _publish_graph(_toy(spark, 1), p)
    os.makedirs(orphan_tmp)
    new = _leaf(tmp_path, 333)
    _publish_graph(_toy(spark, 2), new)
    left = sorted(os.listdir(tmp_path))
    assert os.path.basename(new) in left
    assert os.path.basename(old) not in left, "superseded artifact must be GC'd"
    assert os.path.basename(orphan_tmp) not in left, "dead-pid staging dir"
    assert os.path.basename(other_dial) in left, "different dial: not ours"
    assert os.path.basename(other_sf) in left, "different sf: not ours"


def test_publish_gc_spares_live_writers_staging(spark, tmp_path):
    """A staging dir owned by a LIVE pid (a concurrent publisher
    mid-write) must never be GC'd — deleting it would re-introduce the
    race the publish path exists to close."""
    from tsengine.operators.similarity import _publish_graph

    path = _leaf(tmp_path, 444)
    live_tmp = f"{path}.tmp.1"  # pid 1: always alive
    os.makedirs(live_tmp)
    _publish_graph(_toy(spark, 1), path)
    assert os.path.basename(live_tmp) in os.listdir(tmp_path)


def test_publish_reraises_unexpected_oserror(spark, tmp_path, monkeypatch):
    """An unexpected rename failure must surface, not silently discard
    the build and leave a confusing path-not-found at read time."""
    from tsengine.operators import similarity as sim

    path = _leaf(tmp_path, 555)

    def boom(src, dst):
        raise PermissionError(13, "nope")

    monkeypatch.setattr(sim.os, "rename", boom)
    with pytest.raises(PermissionError):
        sim._publish_graph(_toy(spark, 1), path)


def test_curation_v3_incremental_equals_from_scratch(spark):
    """The daily-ingest twin must be row-identical to the from-scratch
    pipeline_curation_v3 over old ∪ new — the displacement argument
    (update ≡ rebuild, pinned bit-for-bit on the graph) lifted through
    the mutual/component/keep-best/gate/sample tail, which depends on
    the graph only through its exact rows."""
    from tsengine.operators.similarity import (
        pipeline_curation_v3,
        pipeline_curation_v3_incremental,
    )

    key = lambda r: r.doc_id  # noqa: E731
    full = sorted(pipeline_curation_v3(spark, SF).collect(), key=key)
    inc = sorted(pipeline_curation_v3_incremental(spark, SF).collect(), key=key)
    assert len(full) == len(inc) > 0
    for a, b in zip(full, inc):
        assert a == b


def test_curation_v3_incremental_plan_contract(spark):
    """The incremental pipeline's plan must carry the update path's
    signatures: NO full [m x m] Gram rebuild of the whole corpus in
    one kernel-feeding scan (the probe kernel + an artifact READ of
    the old-corpus graph instead), no CartesianProduct, and the sample
    stays TakeOrdered."""
    from tsengine.operators.similarity import (
        _knn_graph_path,
        pipeline_curation_v3_incremental,
    )

    df = pipeline_curation_v3_incremental(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    # the old-corpus graph arrived via its persisted artifact
    assert os.path.exists(
        os.path.join(_knn_graph_path(SF, 5, variant="_old10"), "_SUCCESS")
    )


def test_shard_manifest_is_the_global_prefix_sum(spark):
    """Recompute the global exclusive prefix sum single-threaded and
    require exact equality — the two-level distributed scan (partition
    partials + broadcast offsets) must be indistinguishable from the
    naive single-partition window."""
    from tsengine.operators.packing import _SHARD_B, shard_manifest

    rows = sorted(shard_manifest(spark, SF).collect(), key=lambda r: r.doc_id)
    cum = 0
    for r in rows:
        assert r.tok_offset == cum, r
        assert r.shard_id == cum // _SHARD_B, r
        cum += r.n_tokens
    assert cum > 0


def test_shard_manifest_plan_contract(spark):
    """The corpus-sized running sum must be the PARTITIONED window
    (by spark_partition_id over a range repartition), with the
    partition offsets arriving via a broadcast join — never the whole
    corpus through one window task."""
    from tsengine.operators.packing import shard_manifest

    plan = (
        shard_manifest(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, "offsets must broadcast, never shuffle"
    assert "windowspecdefinition(pid" in plan, "corpus window must partition by pid"


def test_shard_manifest_invariant_to_parallelism(spark, monkeypatch):
    """The determinism claim behind the manifest — any consumer can
    rebuild the exact same shard set — requires the output to be
    byte-identical REGARDLESS of cluster width: the two-level scan's
    range-partition count is sized from defaultParallelism, so the
    same corpus on a 3-task laptop and a 601-task cluster (more
    partitions than documents, forcing EMPTY range partitions whose
    pids never reach the offsets table) must emit identical
    (tok_offset, shard_id) for every doc."""
    from tsengine.operators.packing import shard_manifest

    def at_parallelism(n):
        monkeypatch.setattr(
            type(spark.sparkContext),
            "defaultParallelism",
            property(lambda self: n),
        )
        return sorted(
            (
                (r.doc_id, r.source, r.n_tokens, r.tok_offset, r.shard_id)
                for r in shard_manifest(spark, SF).collect()
            )
        )

    base = at_parallelism(3)
    assert base == at_parallelism(601)


def test_curation_funnel_is_monotone_and_agrees_with_pipeline(spark):
    """The funnel counts must (a) shrink monotonically per source
    through the stages, (b) total exactly the documents table, and
    (c) report the same sampled mass the pipeline actually emits —
    the report and the pipeline share one set of stage definitions."""
    from tsengine.operators.similarity import (
        curation_funnel_report,
        pipeline_curation_v3,
    )
    from tsengine.sources.tables import load_table

    rows = curation_funnel_report(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= r.n_survivors >= r.n_gated >= r.n_sampled >= 0, r
    n_docs_total = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    assert sum(r.n_sampled for r in rows) == pipeline_curation_v3(spark, SF).count()
