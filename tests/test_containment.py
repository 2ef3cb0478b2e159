"""Semantic pins for the asymmetric containment detector
(`minhash_containment`): it must catch the quote/superset duplicate
class that symmetric Jaccard LSH structurally misses, and its bottom-k
estimate must be exact when the contained side has <= k shingles.
"""

from __future__ import annotations

import unittest.mock as mock

import pytest
from pyspark.sql import functions as F


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [
            (i, t, "en", "src", len(t))
            for i, t in enumerate(rows)
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


@pytest.fixture(scope="module")
def quote_corpus(spark):
    """doc 0 = a short quote; doc 1 = the quote embedded in a much
    larger page; docs 2+ = unrelated filler.  Jaccard(0,1) ~ 0.09 —
    far below every symmetric threshold — but containment(0 in 1) = 1."""
    words = [f"w{i}" for i in range(400)]
    quote = " ".join(words[:30])
    page = " ".join(words[100:400]) + " " + quote
    filler = [" ".join(words[i : i + 40]) for i in range(200, 320, 40)]
    return _docs_df(spark, [quote, page, *filler])


def test_containment_catches_quote_in_superset(spark, quote_corpus):
    import tsengine.operators.dedup as D

    with mock.patch.object(D, "load_table", return_value=quote_corpus):
        got = {
            (r.doc_src, r.doc_dst): r.containment
            for r in D.minhash_containment(spark, "ignored").collect()
        }
    # the contained->container direction fires at full containment
    assert got.get((0, 1)) == 1.0
    # and it IS asymmetric: the page is not contained in the quote
    assert (1, 0) not in got


def test_jaccard_lsh_misses_the_same_pair(spark, quote_corpus):
    """The motivating gap: the symmetric MinHash-LSH dedup never
    surfaces the quote/superset pair (its Jaccard is ~0.09, so band
    collision probability is negligible and the estimate sits far
    below any near-dup threshold)."""
    import tsengine.operators.dedup as D

    with mock.patch.object(D, "load_table", return_value=quote_corpus):
        pairs = {
            (r.doc_a, r.doc_b)
            for r in D.dedup_minhash_lsh(spark, "ignored").collect()
            if r.est_jaccard >= 0.5
        }
    assert (0, 1) not in pairs


def test_small_doc_sketch_is_exact(spark):
    """A doc with <= k shingles has its WHOLE shingle set as the
    sketch, so the estimate is the exact containment fraction: a fully
    contained small doc scores exactly 1.0, and a 2-of-3 overlap
    (exact containment 0.666667) sits below the 0.75 keep threshold
    and must NOT appear."""
    import tsengine.operators.dedup as D
    from tsengine.operators.dedup import _CONT_K

    a = "t1 t2 t3 t4 t5"                 # 3 shingles (<= k)
    b = a + " x1 x2 x3"                  # superset: all 3 present
    d = "t1 t2 t3 t4 y1 y2 y3"           # shares exactly 2 of the 3
    c = " ".join(f"z{i}" for i in range(50))
    docs = _docs_df(spark, [a, b, d, c])
    assert _CONT_K >= 3
    with mock.patch.object(D, "load_table", return_value=docs):
        got = {
            (r.doc_src, r.doc_dst): r.containment
            for r in D.minhash_containment(spark, "ignored").collect()
        }
    assert got.get((0, 1)) == 1.0     # full containment, exact
    assert (0, 2) not in got          # 2/3 = 0.667 < 0.75 threshold
