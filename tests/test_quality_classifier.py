"""Semantic pins for the learned quality gate (`quality_classifier`):
the distilled logistic scorer must actually LEARN the weak-label rule
(separate clean long docs from junk short ones through the feature
space), not just echo base rates; plus driver-contract checks.
"""

from __future__ import annotations

import unittest.mock as mock

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (t, src) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


@pytest.fixture(scope="module")
def gated_corpus(spark):
    """Two sources with opposite quality: `clean` docs are long varied
    prose (far above the 250-char weak-label line), `junk` docs are
    short repetitive fragments far below it."""
    base = ("the quick brown fox jumps over a lazy dog and the rain in "
            "spain stays mainly on the plain while ").split()
    clean = [
        (" ".join(base * 4 + [f"uniq{i}{j}" for j in range(12)]), "clean")
        for i in range(40)
    ]
    junk = [(" ".join(["spam"] * (4 + i % 3)), "junk") for i in range(40)]
    return _docs(spark, clean + junk)


def test_classifier_learns_the_gate(spark, gated_corpus):
    import tsengine.operators.text as T

    with mock.patch.object(T, "load_table", return_value=gated_corpus):
        rep = {r["source"]: r for r in T.quality_classifier(spark, "ignored").collect()}
    assert rep["clean"]["n_docs"] == 40 and rep["junk"]["n_docs"] == 40
    # the learned gate separates the sources through the features
    assert rep["clean"]["pass_rate"] >= 0.95
    assert rep["junk"]["pass_rate"] <= 0.05
    # and the calibrated probabilities sit on the right sides of 0.5
    assert rep["clean"]["avg_prob"] > 0.5 > rep["junk"]["avg_prob"]


def test_classifier_deterministic_and_driver_safe(spark, gated_corpus):
    import tsengine.operators.text as T

    with mock.patch.object(T, "load_table", return_value=gated_corpus):
        a = sorted(map(tuple, T.quality_classifier(spark, "ignored").collect()))
        b = sorted(map(tuple, T.quality_classifier(spark, "ignored").collect()))
    assert a == b
    with mock.patch.object(T, "load_table", return_value=gated_corpus):
        for f in T.quality_classifier(spark, "ignored").schema.fields:
            assert not str(f.dataType).startswith(("ArrayType", "MapType", "StructType"))
