"""Semantic sanity for the round-4 text-mining/graph/audio ops —
properties the oracle hash can't express (the hash proves Spark and
DuckDB agree; these prove the agreed answer MEANS the right thing)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_perplexity_is_exp_of_nll_and_positive(spark):
    from tsengine.registry import all_queries

    import math

    rows = all_queries()["perplexity_filter"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.avg_nll > 0  # smoothed probs are < 1
        assert r.ppl > 1
        assert math.isclose(r.ppl, math.exp(r.avg_nll), rel_tol=1e-4)


def test_textrank_top_token_is_a_hub(spark):
    """PageRank mass concentrates on high-weighted-degree nodes: the
    top-ranked token's co-occurrence degree must beat the median."""
    from pyspark.sql import functions as F

    from tsengine.registry import all_queries
    from tsengine.sources.tables import load_table

    top = all_queries()["textrank_keywords"].fn(spark, SF).first()
    toks = load_table(spark, SF, "documents").select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("tok")
    )
    counts = toks.groupBy("tok").count().collect()
    freqs = sorted(r["count"] for r in counts)
    median = freqs[len(freqs) // 2]
    top_freq = next(r["count"] for r in counts if r["tok"] == top.tok)
    assert top_freq >= median


def test_audio_stats_geometry(spark):
    from tsengine.registry import all_queries

    rows = all_queries()["mm_audio_stats"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_samples == r.n_frames * r.n_channels
        assert -32768 <= r.pcm_min <= r.pcm_max <= 32767
        assert r.pcm_sq_sum >= abs(r.pcm_sum)


def test_pmi_bigrams_matches_python_recompute(spark):
    """PMI rows must equal a from-scratch Python recompute of unigram
    and bigram counts plus the shared ln((cxy*U*U)/(B*cx*cy))
    expression — guards the tokenizer, the count floor, and the
    double-promotion order end-to-end."""
    import math

    from tsengine.registry import all_queries
    from tsengine.sources.tables import load_table

    texts = [
        r.text for r in load_table(spark, SF, "documents").select("text").collect()
    ]
    uni: dict = {}
    big: dict = {}
    U = B = 0
    for t in texts:
        tk = [w for w in t.split(" ") if w != ""]
        U += len(tk)
        B += max(0, len(tk) - 1)
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(tk, tk[1:]):
            big[(x, y)] = big.get((x, y), 0) + 1
    expected = {}
    for (x, y), cxy in big.items():
        if cxy < 5:
            continue
        v = math.log((float(cxy) * U * U) / (float(B) * uni[x] * uni[y]))
        expected[(x, y)] = (cxy, round(v, 6))
    got = {
        (r.x, r.y): (r.cxy, r.pmi)
        for r in all_queries()["pmi_bigrams"].fn(spark, SF).collect()
    }
    assert got == expected
    assert got, "no bigram cleared the count floor at the fixture"
