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
