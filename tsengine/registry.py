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

    @property
    def doc(self) -> str:
        # read lazily: some operators format constants into their
        # docstring AFTER the @register decorator runs (e.g.
        # heavy_hitters_cms patches {_CMS_D}); an eager snapshot would
        # dump literal placeholders into REGISTRY.md
        return (self.fn.__doc__ or "").strip()


_REGISTRY: dict[str, Query] = {}

# Enumeration order of ``all_queries()`` (and therefore of
# ``__spark_entry__.queries()``).  The driver's per-round CORRECTNESS
# check covers the FIRST 50 names it enumerates (r01-r04 evidence).
# ROTATION POLICY: slots go to registered operators with the fewest
# prior driver-green rows, ties broken by family coverage.  §2 ops keep
# full local verification (tests/test_oracle_all.py +
# tools/check_oracle.py at sf0.01 and sf0.1 per round) plus their
# r01-r03 driver rows; the r4 extension family keeps its r4 rows.
# Round-6 rotation (per VERDICT r5 item 1): the 18 queries with no
# driver row yet go first — the 13 round-5 additions + the 5 rows-only
# MLlib/sketch twins deferred from r5.  The remaining slots are
# high-risk re-checks: this round's rewrites (dedup_embedding's
# de-cartesianed plan, group_quantiles' single-job refinement,
# before_training_grid's new value oracle, textrank_keywords' widened
# float guard), the four ex-HUGEINT oracles, and any new round-6
# queries (inserted after the never-sampled block as they land).
_SAMPLE_PRIORITY: tuple[str, ...] = (
    # -- 13 round-5 additions, never driver-sampled --
    "pr_curve",
    "pr_auc",
    "scd2_intervals",
    "table_profile",
    "zorder_layout",
    "bucketed_join_agg",
    "cumulative_distinct_users",
    "attribution_last_touch",
    "vocab_coverage",
    "contamination_score",
    "embedding_normalize_arrow",
    "stream_user_topk",
    "stream_scd2",
    # -- 5 rows-only twins, never driver-sampled (rows-only check) --
    "logreg_fit_mllib",
    "mlp_fit_mllib",
    "pca2_fit",
    "group_quantiles_approx",
    "distinct_counts_approx",
    # -- round-6 rewrites / new queries (driver-proof the new plans) --
    "dedup_embedding",
    "group_quantiles",
    "before_training_grid",
    "textrank_keywords",
    # (round-6 additions are uncommented here as each one lands:)
    "grouped_geomean_sql",
    "acf_lags",
    "metric_correlations",
    "seasonal_decompose",
    "mad_outliers",
    "cusum_changepoint",
    "length_histogram",
    # "dedup_levenshtein",
    # "minhash_containment",
    # "perplexity_buckets",
    # "stream_anomaly",
    # "idempotent_write_merge",
    # -- high-risk re-checks: ex-HUGEINT oracles (fixed r5, stay hot) --
    "token_count",
    "doc_fingerprint",
    "session_window_agg",
    "pipeline_corpus",
    "pipeline_corpus_v2",
    # -- perf-touched this round (plans changed => re-prove values) --
    "perplexity_filter",
    "grouped_geomean_udaf",
    # -- family-coverage backfill --
    "dedup_minhash_lsh",
    "semdedup",
    "ann_cosine_topk",
    "ann_lsh",
    "roc_auc",
    "pipeline_frozen_inference",
    "unsup_epoch_curves",
    "stream_session",
    "stream_interval_join",
    "heavy_hitters_cms",
    "funnel_events",
    "decontaminate",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle)
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
    import tsengine.operators.stats  # noqa: F401
    import tsengine.pipelines  # noqa: F401

    _LOADED = True
