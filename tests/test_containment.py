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


@pytest.fixture(scope="module")
def stop_shingle_corpus(spark):
    """62 docs: docs 0/1 are a genuine contained pair (unique words);
    docs 2..61 each share the SAME 7-token boilerplate prefix followed
    by one unique word — 4 of each filler doc's 5 shingles are
    corpus-frequent (df = 60, far above the cap of GREATEST(4,
    ceil(0.01*62)) = 4), so WITHOUT the df-cap every filler pair shares
    4/5 sketch hashes (containment 0.8 >= 0.75) and the probe join
    fans out df(h)^2 = 60^2 rows per stop hash."""
    quote = "a1 a2 a3 a4 a5"
    page = quote + " b1 b2 b3"
    boiler = "c1 c2 c3 c4 c5 c6"
    fillers = [f"{boiler} u{i}" for i in range(60)]
    return _docs_df(spark, [quote, page, *fillers])


def test_df_cap_kills_stop_shingle_blowup(spark, stop_shingle_corpus):
    """The r8 skew guard: stop-shingle hashes (df > cap) are dropped
    BEFORE sketching, so boilerplate-only overlap produces ZERO pairs
    and the genuine contained pair still scores exactly 1.0."""
    import tsengine.operators.dedup as D

    with mock.patch.object(D, "load_table", return_value=stop_shingle_corpus):
        got = {
            (r.doc_src, r.doc_dst): r.containment
            for r in D.minhash_containment(spark, "ignored").collect()
        }
    assert got.get((0, 1)) == 1.0
    spurious = [p for p in got if p[0] >= 2 and p[1] >= 2]
    assert spurious == [], f"boilerplate-only pairs survived the cap: {spurious[:5]}"
    assert len(got) == 1


def test_without_cap_stop_shingles_go_quadratic(spark, stop_shingle_corpus):
    """Counterfactual pin: disabling the cap (patched to infinity) on
    the same corpus yields all 60*59 = 3540 boilerplate pairs — the
    df(h)^2 blow-up the guard exists to prevent."""
    import tsengine.operators.dedup as D

    with mock.patch.object(D, "load_table", return_value=stop_shingle_corpus), \
         mock.patch.object(D, "_CONT_DF_CAP_MIN", 10**9):
        rows = D.minhash_containment(spark, "ignored").collect()
    spurious = [
        r for r in rows if r.doc_src >= 2 and r.doc_dst >= 2
    ]
    assert len(spurious) == 60 * 59


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


def test_dedup_incremental_consistent_with_full_pair_table(spark, oracle_sf_dir):
    """Every incremental match must appear in the full self-join's pair
    table (same estimate), and must be the strongest corpus match its
    batch doc has there — the asymmetric ingest join may not invent,
    lose, or mis-rank pairs relative to the bootstrap self-join."""
    from tsengine.registry import all_queries

    qs = all_queries()
    full = {}
    for r in qs["dedup_minhash_lsh"].fn(spark, oracle_sf_dir).collect():
        for new, old in ((r.doc_a, r.doc_b), (r.doc_b, r.doc_a)):
            if new % 10 >= 8 and old % 10 < 8:
                full.setdefault(new, {})[old] = r.est_jaccard
    expected = {}
    for new, matches in full.items():
        best = sorted(
            ((ej, mid) for mid, ej in matches.items() if ej >= 0.25),
            key=lambda t: (-t[0], t[1]),
        )
        if best:
            expected[new] = (best[0][1], best[0][0])
    got = {
        r.doc_id: (r.match_id, r.est_jaccard)
        for r in qs["dedup_incremental"].fn(spark, oracle_sf_dir).collect()
    }
    assert got == expected
    assert got, "no batch doc matched the corpus at the fixture"
