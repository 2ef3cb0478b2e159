"""Exactness pin for the rows-only `bpe_train`: replay the merge
sequence with an independent Counter-based reference implementation
(the subword-nmt algorithm written a different way) and compare the
emitted table bit-for-bit; plus the classic textbook behavior on a
handcrafted corpus and driver-contract checks.
"""

from __future__ import annotations

from collections import Counter

import unittest.mock as mock

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_freqs, n_merges):
    """Independent reference: Counter over per-word pair multisets,
    max() with an explicit two-stage tie-break, regex-free merge via
    string join/split on a sentinel — a genuinely different code path
    from the operator's scan-and-splice loop."""
    words = {" ".join(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for spaced, f in words.items():
            syms = spaced.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append((rank, best[0], best[1], best[0] + best[1], top))
        old = best[0] + " " + best[1]
        new = best[0] + best[1]
        renamed = {}
        for spaced, f in words.items():
            out, i = [], 0
            syms = spaced.split(" ")
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            renamed[" ".join(out)] = renamed.get(" ".join(out), 0) + f
        words = renamed
    return merges


def test_bpe_matches_independent_reference(spark):
    import tsengine.operators.corpus as C

    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in C.bpe_train(spark, SF).orderBy("rank").collect()
    ]
    # rebuild the exact capped word-frequency input the operator saw
    wc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("tok"))
        .groupBy("tok")
        .count()
        .orderBy(F.col("count").desc(), F.col("tok").asc())
        .limit(C._BPE_VOCAB_CAP)
        .collect()
    )
    freqs = {tuple(r["tok"]): int(r["count"]) for r in wc}
    assert got == _reference_bpe(freqs, C._BPE_MERGES)
    assert len(got) == C._BPE_MERGES  # corpus is rich enough to fill the budget


def test_bpe_textbook_corpus(spark):
    """Sennrich's worked example shape: shared prefixes merge first."""
    import tsengine.operators.corpus as C

    docs = spark.createDataFrame(
        [(0, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3), "en", "s", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    with mock.patch.object(C, "load_table", return_value=docs):
        rows = C.bpe_train(spark, SF).orderBy("rank").collect()
    merged = [r["merged"] for r in rows]
    # highest-frequency adjacent pair in {low:5, lower:2, newest:6, widest:3}
    # is ('e','s') with 9 (newest+widest); 'est' follows at 9
    assert merged[0] == "es" and rows[0]["pair_count"] == 9
    assert merged[1] == "est" and rows[1]["pair_count"] == 9
    assert "low" in merged  # low:5 + lower:2 = 7 eventually merges
    # every later merge builds on symbols that existed at its rank
    for r in rows:
        assert r["merged"] == r["left"] + r["right"]


def test_bpe_deterministic_and_driver_safe(spark):
    import tsengine.operators.corpus as C

    a = C.bpe_train(spark, SF).collect()
    b = C.bpe_train(spark, SF).collect()
    assert a == b
    # driver rows-only canonicalizer contract: scalar columns only
    for f in C.bpe_train(spark, SF).schema.fields:
        assert not str(f.dataType).startswith(("ArrayType", "MapType", "StructType"))


def _reference_encode(word, merges):
    """Independent apply path: spaced-string split/scan (not the
    operator's tuple splice)."""
    syms = list(word)
    for _, lft, rgt, _, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
                out.append(lft + rgt)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_tokenize_matches_reference_per_doc(spark):
    import tsengine.operators.corpus as C

    merges = C._learn_bpe(spark, SF)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_pieces"], r["chars_per_piece"])
        for r in C.bpe_tokenize(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t != ""]
        pieces = sum(len(_reference_encode(t, merges)) for t in toks)
        chars = sum(len(t) for t in toks)
        assert got[r["doc_id"]] == (
            len(toks),
            pieces,
            round(chars * 1.0 / pieces, 6),
        ), r["doc_id"]


def test_bpe_tokenize_invariants(spark):
    import tsengine.operators.corpus as C

    rows = C.bpe_tokenize(spark, SF).collect()
    for r in rows:
        # chars >= pieces >= whitespace tokens; compression >= 1 char/piece
        assert r["n_bpe_pieces"] >= r["n_tokens"]
        assert r["chars_per_piece"] >= 1.0
