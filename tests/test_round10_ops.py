"""Semantic sanity for the round-10 additions — properties the oracle
hash can't express (the hash proves Spark and DuckDB agree; these
prove the agreed answer MEANS the right thing), plus plan contracts
for the new aggregation shapes."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_token_entropy_matches_python_recompute(spark):
    """Per-doc entropy must equal a from-scratch Python recompute of
    H = log2(n) - sum(c*log2(c))/n over whitespace-token counts, and
    sit on the information-theoretic bounds: 0 (single repeated token)
    .. log2(n_tokens) (all distinct), with equality exactly at the
    degenerate count profiles."""
    from tsengine.operators.text import token_entropy
    from tsengine.sources.tables import load_table

    rows = {r.doc_id: r for r in token_entropy(spark, SF).collect()}
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    checked = 0
    for d in docs:
        toks = [t for t in d.text.split(" ") if t != ""]
        if not toks:
            assert d.doc_id not in rows  # zero-token docs drop out
            continue
        r = rows[d.doc_id]
        c = Counter(toks)
        n = sum(c.values())
        h = math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n
        assert r.n_tokens == n
        assert r.n_distinct == len(c)
        assert abs(r.token_entropy - h) < 1e-6
        # bounds up to the operator's 6dp output rounding (a maximal-
        # entropy doc rounds to just above log2(n))
        assert -5e-7 <= r.token_entropy <= math.log2(n) + 5e-7
        if len(c) == 1:
            assert r.token_entropy == 0.0
        checked += 1
    assert checked == len(rows)


def test_tokenizer_fertility_consistent_with_token_count(spark):
    """The per-lang fertility report must re-aggregate exactly from
    token_count's per-doc rows (same ceil(len/4) rule — the two
    reports may never disagree), and fertility >= 1 by construction
    (every non-empty word yields at least one subtoken)."""
    from tsengine.operators.text import token_count, tokenizer_fertility
    from tsengine.sources.tables import load_table

    fert = {r.lang: r for r in tokenizer_fertility(spark, SF).collect()}
    per_doc = (
        token_count(spark, SF)
        .join(load_table(spark, SF, "documents").select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("w"),
            F.sum("n_subtokens").alias("s"),
        )
        .collect()
    )
    assert {r.lang for r in per_doc} == set(fert)
    for r in per_doc:
        f = fert[r.lang]
        assert (f.n_docs, f.n_words, f.n_subtokens) == (r.n_docs, r.w, r.s)
        assert f.fertility >= 1.0
        assert abs(f.fertility - round(r.s / r.w, 6)) < 1e-9


def test_contingency_stats_marginals_and_independence_math(spark):
    """Cells must partition the corpus (sum of n_docs = |documents|),
    every chi2 term must be non-negative, and expected/chi2/pmi must
    equal a from-scratch Python recompute from the raw counts."""
    from tsengine.operators.mining import contingency_stats
    from tsengine.sources.tables import load_table

    cells = contingency_stats(spark, SF).collect()
    docs = load_table(spark, SF, "documents").select("lang", "source").collect()
    n_total = len(docs)
    joint = Counter((d.lang, d.source) for d in docs)
    row_t = Counter(d.lang for d in docs)
    col_t = Counter(d.source for d in docs)

    assert sum(c.n_docs for c in cells) == n_total
    assert {(c.lang, c.source) for c in cells} == set(joint)
    for c in cells:
        n = joint[(c.lang, c.source)]
        exp = row_t[c.lang] * col_t[c.source] / n_total
        assert c.n_docs == n
        assert abs(c.expected - round(exp, 6)) < 1e-9
        assert c.chi2_term >= 0
        assert abs(c.chi2_term - (n - exp) ** 2 / exp) < 1e-5
        assert abs(c.pmi - math.log(n * n_total / (row_t[c.lang] * col_t[c.source]))) < 1e-5


def test_knn_triangle_census_matches_python_recompute(spark):
    """The full census (nodes, edges, wedges, triangles, coefficient)
    must equal a brute-force Python recompute over the collected
    mutual-edge list — guards the id-ordered orientation join against
    double- or under-counting."""
    from tsengine.operators.similarity import (
        _knn_mutual_edges,
        knn_triangle_count,
    )

    row = knn_triangle_count(spark, SF).collect()
    assert len(row) == 1
    row = row[0]

    edges = {(r.node, r.nbr) for r in _knn_mutual_edges(spark, SF).collect()}
    # symmetry is a construction invariant of the mutual filter
    assert all((b, a) in edges for a, b in edges)
    und = {(a, b) for a, b in edges if a < b}
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = sum(
        1
        for a, b in und
        for c in (x for x in deg if x > b)
        if (b, c) in und and (a, c) in und
    )
    assert row.n_nodes == len(deg)
    assert row.n_edges == len(und)
    assert row.n_wedges == wedges
    assert row.n_triangles == tris
    expect = round(3.0 * tris / wedges, 6) if wedges else 0.0
    assert abs(row.global_clustering - expect) < 1e-9
    assert 0.0 <= row.global_clustering <= 1.0


def test_round10_agg_plan_shapes(spark):
    """tokenizer_fertility is ONE corpus exchange (per-row HOF folds,
    then a |lang|-key hash agg); token_entropy is exactly two (token
    count, then doc rollup); contingency_stats re-aggregates the tiny
    cell table and assembles with broadcast joins — never a
    sort-merge join or a partition-less window anywhere."""
    from tsengine.operators.mining import contingency_stats
    from tsengine.operators.text import token_entropy, tokenizer_fertility

    fert_plan = _plan(tokenizer_fertility(spark, SF))
    assert len(re.findall(r"Exchange hashpartitioning", fert_plan)) == 1

    ent_plan = _plan(token_entropy(spark, SF))
    assert len(re.findall(r"Exchange hashpartitioning", ent_plan)) == 2

    cont_plan = _plan(contingency_stats(spark, SF))
    assert "SortMergeJoin" not in cont_plan
    assert "BroadcastHashJoin" in cont_plan
    for plan in (fert_plan, ent_plan, cont_plan):
        assert not re.search(r"Window.*partitionBy=\[\]", plan)


def test_qc_oracle_default_is_unchanged_by_parameterization():
    """The builder was parameterized for calibration_bins; the default
    output IS quality_classifier's registered oracle contract, pinned
    by digest so a refactor can't silently shift the SQL the driver
    hash-checks.  (Verified byte-identical against the pre-refactor
    string when the parameterization landed; update the digest only
    with a deliberate oracle change + fresh driver row.)"""
    import hashlib

    from tsengine.operators.text import _qc_oracle_sql
    from tsengine.registry import all_queries

    default = _qc_oracle_sql()
    assert all_queries()["quality_classifier"].oracle == default
    digest = hashlib.sha256(default.encode()).hexdigest()
    assert digest == (
        "1a861281a5cde78ac5765206da6cbea630f43babd50d7f8d21570b9670e9ecd9"
    )


def test_calibration_bins_partition_and_bounds(spark):
    """Bins must partition the scored corpus, every bin's mean_prob
    must sit inside the bin's probability interval, and frac_pos must
    be a valid rate — plus the scored-row recompute ties the bin table
    back to _qc_scored exactly."""
    from tsengine.operators.text import _qc_scored, calibration_bins

    bins = {r.bin: r for r in calibration_bins(spark, SF).collect()}
    scored = _qc_scored(spark, SF).collect()
    assert sum(r.n_docs for r in bins.values()) == len(scored)
    recount = Counter(min(int(r.prob * 10), 9) for r in scored)
    pos = Counter()
    for r in scored:
        pos[min(int(r.prob * 10), 9)] += r.y
    assert {b: r.n_docs for b, r in bins.items()} == dict(recount)
    for b, r in bins.items():
        assert 0 <= b <= 9
        assert r.n_pos == pos[b]
        assert 0.0 <= r.frac_pos <= 1.0
        lo, hi = b / 10.0, 1.0 if b == 9 else (b + 1) / 10.0
        assert lo - 5e-7 <= r.mean_prob <= hi + 5e-7


def test_ann_recall_report_matches_set_recompute(spark):
    """recall@k must equal the set intersection of the two registered
    ranked lists, with a full exact list per query."""
    from tsengine.operators.similarity import (
        TOP_K,
        ann_cosine_topk,
        ann_lsh,
        ann_recall_report,
    )

    report = {r.query_id: r for r in ann_recall_report(spark, SF).collect()}
    exact: dict[int, set] = {}
    for r in ann_cosine_topk(spark, SF).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set] = {}
    for r in ann_lsh(spark, SF).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(report) == set(exact)
    for qid, r in report.items():
        inter = len(exact[qid] & approx.get(qid, set()))
        assert r.n_exact == len(exact[qid]) == TOP_K
        assert r.n_hits == inter
        assert abs(r.recall - round(inter / TOP_K, 6)) < 1e-9


def test_gopher_rules_flags_recompute_and_discriminate(spark):
    """Every per-rule flag must equal a python recompute of the
    published threshold on the raw text, keep must be the AND of the
    flags, and BOTH populations (keep=1 / keep=0) must be non-empty at
    the fixture — a gate that never drops (or always drops) tests
    nothing."""
    from tsengine.operators.text import (
        _GOPHER_MWL,
        _GOPHER_STOP_MIN,
        _GOPHER_WORDS,
        _STOPWORDS,
        gopher_rules,
    )
    from tsengine.sources.tables import load_table

    rows = {r.doc_id: r for r in gopher_rules(spark, SF).collect()}
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    assert set(rows) == set(texts)
    for doc_id, r in rows.items():
        toks = [t for t in texts[doc_id].split(" ") if t]
        assert r.n_words == len(toks)
        assert abs(r.mean_word_len - sum(map(len, toks)) / len(toks)) < 1e-6
        assert r.stop_hits == sum(t in _STOPWORDS for t in toks)
        assert r.pass_words == int(_GOPHER_WORDS[0] <= len(toks) <= _GOPHER_WORDS[1])
        assert r.pass_word_len == int(
            _GOPHER_MWL[0] <= r.mean_word_len <= _GOPHER_MWL[1]
        )
        assert r.pass_alpha == int(
            sum(any(c.isalpha() for c in t) for t in toks) / len(toks) >= 0.8
        )
        assert r.pass_stops == int(r.stop_hits >= _GOPHER_STOP_MIN)
        assert r.keep == (
            r.pass_words
            and r.pass_word_len
            and r.pass_alpha
            and r.pass_symbols
            and r.pass_stops
        )
    keeps = {r.keep for r in rows.values()}
    assert keeps == {0, 1}, keeps


def test_gopher_rules_plan_is_one_codegen_projection(spark):
    """The gate must stay a pure map-side projection: no exchange, no
    Python UDF — the whole point of the threshold baseline is that it
    costs one codegen pass at 100 TB."""
    from tsengine.operators.text import gopher_rules

    plan = _plan(gopher_rules(spark, SF))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_knn_snn_graph_matches_python_recompute(spark):
    """Every edge's shared-neighbor count and SNN Jaccard must equal a
    set recompute over the registered graph, and the edge set must be
    exactly the graph's edge set (no dropped or invented edges)."""
    from tsengine.operators.similarity import knn_join_lsh, knn_snn_graph

    graph = knn_join_lsh(spark, SF).collect()
    nbrs: dict[int, set] = {}
    for r in graph:
        nbrs.setdefault(r.vec_id, set()).add(r.neighbor_id)
    out = knn_snn_graph(spark, SF).collect()
    assert {(r.vec_id, r.neighbor_id) for r in out} == {
        (r.vec_id, r.neighbor_id) for r in graph
    }
    assert len(out) == len(graph)
    for r in out:
        a, b = nbrs[r.vec_id], nbrs[r.neighbor_id]
        inter = len(a & b)
        assert r.n_shared == inter
        assert abs(r.snn_jaccard - round(inter / len(a | b), 6)) < 1e-9
        # an edge (a,b) where b's own list reciprocates shares >= 0;
        # bounds sanity at the TOP_K cap
        assert 0 <= r.n_shared <= 10
        assert 0.0 <= r.snn_jaccard <= 1.0


def test_rfm_segments_scores_match_python_quintiles(spark):
    """Scores must equal a python recompute of integer-rank quintile
    selection over the per-customer metrics; segment labels must follow
    the (r,f) floor rules; quintile populations must be roughly n/5
    up to tie inflation (a degenerate all-one-score metric would mean
    the boundaries are broken)."""
    from collections import Counter

    from tsengine.operators.analytics import (
        _RFM_M_QUANT,
        _rank_boundaries,
        rfm_segments,
    )

    out = rfm_segments(spark, SF).collect()
    assert out
    mq = {r.o_custkey: int(r.monetary * 100) // _RFM_M_QUANT for r in out}
    for name, score_of, invert in (
        ("recency_days", lambda r: 6 - r.r_score, True),
        ("frequency", lambda r: r.f_score, False),
    ):
        hist = Counter(getattr(r, name) for r in out)
        bounds = _rank_boundaries(dict(hist))
        assert bounds == sorted(bounds)
        for r in out:
            v = getattr(r, name)
            expect = next((q + 1 for q, b in enumerate(bounds) if v <= b), 5)
            assert score_of(r) == expect, (name, v, bounds)
    mb = _rank_boundaries(dict(Counter(mq.values())))
    for r in out:
        expect = next((q + 1 for q, b in enumerate(mb) if mq[r.o_custkey] <= b), 5)
        assert r.m_score == expect
    for r in out:
        if r.r_score >= 4 and r.f_score >= 4:
            assert r.segment == "champions"
        elif r.f_score >= 4:
            assert r.segment == "loyal_at_risk"
        elif r.r_score >= 4:
            assert r.segment == "new_or_promising"
        else:
            assert r.segment == "regular"
    n = len(out)
    fcounts = Counter(r.f_score for r in out)
    assert sum(fcounts.values()) == n and len(fcounts) >= 2


def test_cross_source_overlap_matches_python_sets(spark):
    """Jaccard per source pair must equal a python set recompute of
    distinct 5-gram hashes per source, and the matrix must be the full
    upper triangle over the fixture's sources."""
    from tsengine.operators.corpus import _NGRAM, cross_source_overlap
    from tsengine.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("source", "text").collect()
    import hashlib

    sets: dict[str, set] = {}
    for r in docs:
        toks = r.text.split(" ")
        for i in range(len(toks) - _NGRAM + 1):
            g = " ".join(toks[i : i + _NGRAM])
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            sets.setdefault(r.source, set()).add(h)
    out = cross_source_overlap(spark, SF).collect()
    srcs = sorted(sets)
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    for r in out:
        a, b = sets[r.source_a], sets[r.source_b]
        assert r.source_a < r.source_b
        assert r.n_a == len(a) and r.n_b == len(b)
        assert r.n_shared == len(a & b)
        assert abs(r.jaccard - round(len(a & b) / len(a | b), 6)) < 1e-9


def test_minhash_error_report_consistency(spark):
    """The report's pair set must equal dedup_minhash_lsh's candidate
    set, est_jaccard must equal its est_jaccard, exact_jaccard must
    match dedup_ngram_jaccard wherever the latter kept the pair
    (>= threshold), and abs_err must be |est - exact| to 6dp."""
    from tsengine.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
        minhash_error_report,
    )

    rep = {(r.doc_a, r.doc_b): r for r in minhash_error_report(spark, SF).collect()}
    lsh = {(r.doc_a, r.doc_b): r.est_jaccard for r in dedup_minhash_lsh(spark, SF).collect()}
    assert set(rep) == set(lsh)
    for k, r in rep.items():
        assert abs(r.est_jaccard - lsh[k]) < 1e-9
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert abs(r.abs_err - round(abs(r.est_jaccard - r.exact_jaccard), 6)) < 2e-6
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in dedup_ngram_jaccard(spark, SF).collect()}
    for k in set(rep) & set(exact):
        assert abs(rep[k].exact_jaccard - exact[k]) < 1e-9


def test_embedding_drift_matches_numpy_recompute(spark):
    """Per-dim means and Welch z must match a numpy recompute on the
    parity split; 64 rows, splits non-empty, and an identical-split
    sanity: z magnitudes stay modest on iid halves (no dimension of an
    isotropic fixture should show |z| > 8)."""
    import numpy as np

    from tsengine.operators.drift import embedding_drift
    from tsengine.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    ref = np.array([r.embedding for r in emb if r.vec_id % 2 == 0], dtype=np.float64)
    cur = np.array([r.embedding for r in emb if r.vec_id % 2 == 1], dtype=np.float64)
    out = {r.dim: r for r in embedding_drift(spark, SF).collect()}
    assert sorted(out) == list(range(ref.shape[1]))
    for d, r in out.items():
        assert r.n_ref == ref.shape[0] and r.n_cur == cur.shape[0]
        assert abs(r.mean_ref - ref[:, d].mean()) < 1e-5
        assert abs(r.mean_cur - cur[:, d].mean()) < 1e-5
        assert abs(r.shift - (cur[:, d].mean() - ref[:, d].mean())) < 1e-5
        se = np.sqrt(
            ref[:, d].var(ddof=1) / len(ref) + cur[:, d].var(ddof=1) / len(cur)
        )
        assert abs(r.shift_z - (cur[:, d].mean() - ref[:, d].mean()) / se) < 1e-3
        assert abs(r.shift_z) < 8.0


def test_dup_rate_by_source_consistency(spark):
    """Cell counts must recompute from dedup_minhash_lsh's pair set
    joined to document sources; ppm normalization must use C(n,2) on
    the diagonal and n_a*n_b off it; total pairs must be conserved."""
    from collections import Counter

    from tsengine.operators.dedup import dedup_minhash_lsh, dup_rate_by_source
    from tsengine.sources.tables import load_table

    src = {
        r.doc_id: r.source
        for r in load_table(spark, SF, "documents").select("doc_id", "source").collect()
    }
    pairs = [(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF).collect()]
    cells = Counter(
        tuple(sorted((src[a], src[b]))) for a, b in pairs
    )
    ncnt = Counter(src.values())
    out = {(r.source_a, r.source_b): r for r in dup_rate_by_source(spark, SF).collect()}
    assert set(out) == set(cells)
    assert sum(r.n_pairs for r in out.values()) == len(pairs)
    for k, r in out.items():
        assert r.n_pairs == cells[k]
        na, nb = ncnt[k[0]], ncnt[k[1]]
        assert (r.n_docs_a, r.n_docs_b) == (na, nb)
        denom = na * (na - 1) / 2 if k[0] == k[1] else na * nb
        assert abs(r.dup_ppm - round(r.n_pairs * 1e6 / denom, 6)) < 1e-6


def test_dedup_keep_best_policy_vs_keep_canonical(spark):
    """Both policies must keep exactly one member per cluster with the
    same n_dups accounting and identical survivor COUNT; keep_best's
    survivor must be its cluster's longest member (doc_id tiebreak),
    and at least the cluster structure must be shared."""
    from tsengine.operators.dedup import (
        dedup_components,
        dedup_keep_best,
        dedup_keep_canonical,
    )
    from tsengine.sources.tables import load_table

    comp = {}
    for r in dedup_components(spark, SF).collect():
        comp.setdefault(r.component, []).append(r.doc_id)
    nch = {
        r.doc_id: r.n_chars
        for r in load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    }
    best = {r.doc_id: r for r in dedup_keep_best(spark, SF).collect()}
    canon = {r.doc_id: r for r in dedup_keep_canonical(spark, SF).collect()}
    assert len(best) == len(canon)
    for cid, members in comp.items():
        expect = min(members, key=lambda d: (-nch[d], d))
        kept = [d for d in members if d in best]
        assert kept == [expect], (cid, members, kept)
        assert best[expect].n_dups == len(members)
        assert cid in canon and canon[cid].n_dups == len(members)


def test_source_log_odds_matches_python_recompute(spark):
    """z must equal a python recompute of the prior-smoothed log-odds
    ratio from raw counts; exactly top-5 rows per source ranked by
    (z desc, term)."""
    import math
    from collections import Counter

    from tsengine.operators.mining import _LO_ALPHA0, _LO_TOPK, source_log_odds
    from tsengine.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("source", "text").collect()
    sw, w, s = Counter(), Counter(), Counter()
    for r in docs:
        for t in r.text.split(" "):
            if t:
                sw[(r.source, t)] += 1
                w[t] += 1
                s[r.source] += 1
    n = sum(s.values())

    def z_of(src, term):
        y_sw, y_w, n_s = sw[(src, term)], w[term], s[src]
        aw = _LO_ALPHA0 * y_w / n
        delta = math.log((y_sw + aw) / (n_s + _LO_ALPHA0 - y_sw - aw)) - math.log(
            ((y_w - y_sw) + aw) / ((n - n_s) + _LO_ALPHA0 - (y_w - y_sw) - aw)
        )
        return delta / math.sqrt(1.0 / (y_sw + aw) + 1.0 / ((y_w - y_sw) + aw))

    out = source_log_odds(spark, SF).collect()
    per_src: dict[str, list] = {}
    for r in out:
        per_src.setdefault(r.source, []).append(r)
        assert abs(r.z - round(z_of(r.source, r.term), 6)) < 1e-9
        assert r.n_in_source == sw[(r.source, r.term)]
        assert r.n_corpus == w[r.term]
    for src, rows in per_src.items():
        assert sorted(r.rank for r in rows) == list(range(1, _LO_TOPK + 1))
        expect = sorted(
            {t for (ss, t) in sw if ss == src},
            key=lambda t: (-round(z_of(src, t), 6), t),
        )[:_LO_TOPK]
        got = [r.term for r in sorted(rows, key=lambda r: r.rank)]
        assert got == expect, (src, got, expect)


def test_zipf_fit_matches_numpy_lstsq(spark):
    """Slope/intercept/R² must match a numpy least-squares recompute on
    the (ln rank, ln count) pairs, and the fixture's word-salad corpus
    must fit with a negative slope and sane R²."""
    import numpy as np

    from tsengine.operators.mining import zipf_fit
    from tsengine.sources.tables import load_table
    from collections import Counter

    docs = load_table(spark, SF, "documents").select("text").collect()
    cnt = Counter(t for r in docs for t in r.text.split(" ") if t)
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ordered) + 1, dtype=np.float64))
    y = np.log(np.array([c for _, c in ordered], dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    row = zipf_fit(spark, SF).collect()
    assert len(row) == 1
    row = row[0]
    assert row.n_vocab == len(ordered)
    assert abs(row.slope - slope) < 1e-5
    assert abs(row.intercept - intercept) < 1e-5
    assert abs(row.r2 - r * r) < 1e-5
    assert row.slope < 0
    assert 0.0 <= row.r2 <= 1.0


def test_knn_assortativity_matches_python_recompute(spark):
    """The scalar must equal a python Pearson over endpoint degrees of
    the mutual edge list; node/edge counts must match."""
    import math

    from tsengine.operators.similarity import _knn_mutual_edges, knn_assortativity

    edges = [(r.node, r.nbr) for r in _knn_mutual_edges(spark, SF).collect()]
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    xs = [deg[s] for s, d in edges]
    ys = [deg[d] for s, d in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    denom = (n * sxx - sx * sx) * (n * syy - sy * sy)
    row = knn_assortativity(spark, SF).collect()[0]
    assert row.n_nodes == len(deg)
    assert row.n_edges == n // 2
    if denom > 0:
        expect = (n * sxy - sx * sy) / math.sqrt(denom)
        assert abs(row.assortativity - round(expect, 6)) < 1e-9
        assert -1.0 <= row.assortativity <= 1.0
    else:
        assert row.assortativity is None


def test_weighted_sample_is_es_priority_topk(spark):
    """The selected set must equal a python recompute of the E-S
    priority top-k, be exactly k docs, and skew toward longer docs
    (mean selected n_chars > corpus mean — the property that separates
    it from the uniform reservoir)."""
    import hashlib
    import math

    from tsengine.operators.mining import _WS_K, weighted_sample
    from tsengine.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()

    def key(doc_id, n_chars):
        h = int(hashlib.md5(f"wsmpl:{doc_id}".encode()).hexdigest()[:8], 16)
        return round(math.log((h + 1) / 4294967296.0) / n_chars, 6)

    expect = sorted(docs, key=lambda r: (-key(r.doc_id, r.n_chars), r.doc_id))[:_WS_K]
    out = weighted_sample(spark, SF).collect()
    assert len(out) == _WS_K
    assert [r.doc_id for r in out[: _WS_K]] is not None
    assert {r.doc_id for r in out} == {r.doc_id for r in expect}
    corpus_mean = sum(r.n_chars for r in docs) / len(docs)
    sel_mean = sum(r.n_chars for r in out) / len(out)
    assert sel_mean > corpus_mean
