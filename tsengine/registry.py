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


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


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
    import tsengine.pipelines  # noqa: F401

    _LOADED = True
