"""Corpus-construction operators for LLM training-data pipelines
(project north star; not present in the reference — Spark-native
designs per SURVEY.md §7.2 M6, extending the dedup/text families).

Three standard stages every large-scale pretraining corpus runs:

  * ``decontaminate``     — n-gram overlap against a benchmark/eval set
                            (the GPT-3/Llama decontamination recipe):
                            any training document sharing an n-gram with
                            the eval set is flagged.  Relationally an
                            equi-join on gram hash with the eval side
                            BROADCAST — benchmark sets are fixed and
                            small, the corpus side is the 100 TB scan.
  * ``repetition_score``  — within-document duplicate-n-gram fraction
                            (Gopher-style repetition signal), entirely
                            map-side: no shuffle at any scale.
  * ``stratified_sample`` — deterministic hash-based per-source
                            sampling (mixture weighting): keep a
                            source-dependent fraction of documents,
                            reproducible across engines/runs because
                            the decision is md5 arithmetic on doc_id,
                            never ``rand()`` (SURVEY.md §4.3).

All three are oracle-checked; the DuckDB twins re-derive n-grams with
the window/LEAD formulation as an independent derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsengine.operators.dedup import _md5_int, gram_array, grams_df
from tsengine.registry import register
from tsengine.sources.tables import load_table

#: every doc_id divisible by this is "the benchmark set" — a
#: deterministic stand-in for an eval suite riding in the same table
_EVAL_MOD = 50
_NGRAM = 5

_GRAMS_CTE = f"""
tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(range(0, len(string_split(text, ' ')))) AS i
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, g
  FROM (
    SELECT doc_id,
           tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w
               || ' ' || LEAD(tok, 3) OVER w || ' ' || LEAD(tok, 4) OVER w AS g,
           LEAD(tok, {_NGRAM - 1}) OVER w AS t_last
    FROM tokens
    WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  )
  WHERE t_last IS NOT NULL
),
gh AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT AS h FROM grams
)"""


@register(
    "decontaminate",
    "WITH "
    + _GRAMS_CTE
    + f""",
train AS (SELECT doc_id, h FROM gh WHERE doc_id % {_EVAL_MOD} <> 0),
eval_g AS (SELECT doc_id AS eval_id, h FROM gh WHERE doc_id % {_EVAL_MOD} = 0)
SELECT t.doc_id,
       COUNT(DISTINCT t.h) AS n_shared_grams,
       COUNT(DISTINCT e.eval_id) AS n_eval_docs
FROM train t JOIN eval_g e ON t.h = e.h
GROUP BY t.doc_id
""",
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    at least one token 5-gram with the (deterministic) eval subset,
    with the shared-gram and eval-doc counts.

    Scale shape: the eval side — distinct (gram hash, eval doc) pairs of
    a FIXED benchmark suite — is explicitly ``broadcast``; the corpus
    side streams through a map-side gram projection and a broadcast
    hash join, so the only shuffle is the final per-doc aggregate
    (partially aggregated map-side).  This is the standard
    decontamination plan at 100 TB: never shuffle the corpus on gram."""
    g = grams_df(spark, sf_dir, _NGRAM).select(
        "doc_id", _md5_int("sh").alias("h")
    )
    train = g.filter(F.col("doc_id") % _EVAL_MOD != 0)
    eval_g = g.filter(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), "h"
    )
    return (
        train.join(F.broadcast(eval_g), "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_shared_grams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


@register(
    "repetition_score",
    f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
),
g AS (
  SELECT doc_id, COUNT(DISTINCT sh) AS n_distinct FROM (
    SELECT doc_id,
           tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS sh,
           LEAD(tok, 2) OVER w AS t_last
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                 unnest(range(0, len(string_split(text, ' ')))) AS i
          FROM documents)
    WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  ) WHERE t_last IS NOT NULL
  GROUP BY doc_id
)
SELECT t.doc_id,
       ROUND(1.0 - n_distinct / CAST(n_tok - 2 AS DOUBLE), 6) AS rep_frac
FROM t JOIN g USING (doc_id)
WHERE n_tok >= 3
""",
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher-style quality signal): the
    fraction of token 3-gram occurrences that are duplicates of an
    earlier gram in the same document — ``1 - distinct/total``.

    Entirely map-side (one projection over the scan, no shuffle at any
    corpus size): both counts come from the row's own token array."""
    from tsengine.operators.dedup import gram_array

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    total = F.size("toks") - 2
    return (
        docs.filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.round(
                1.0 - F.size(gram_array(3)) / total.cast("double"), 6
            ).alias("rep_frac"),
        )
    )


#: per-source keep-rate numerators out of 100: rate(srcN) = (100, 50, 25,
#: 10)[N % 4] — a deterministic stand-in for a mixture-weight config
_RATES = (100, 50, 25, 10)

_RATE_CASE_SQL = (
    f"CASE CAST(substr(source, 4) AS INT) % 4 WHEN 0 THEN {_RATES[0]} "
    f"WHEN 1 THEN {_RATES[1]} WHEN 2 THEN {_RATES[2]} ELSE {_RATES[3]} END"
)


@register(
    "pipeline_corpus",
    "WITH "
    + _GRAMS_CTE
    + f""",
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM gh t JOIN gh e ON t.h = e.h AND e.doc_id % {_EVAL_MOD} = 0
  WHERE t.doc_id % {_EVAL_MOD} <> 0
),
base AS (
  SELECT doc_id, text, source, n_chars FROM documents
  WHERE lang = 'en' AND n_chars >= 100 AND doc_id % {_EVAL_MOD} <> 0
),
ded AS (
  SELECT doc_id, text, source, n_chars FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
    FROM base
  ) WHERE rk = 1
),
clean AS (
  SELECT d.* FROM ded d LEFT JOIN contaminated c USING (doc_id)
  WHERE c.doc_id IS NULL
),
sampled AS (
  SELECT * FROM clean
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        < {_RATE_CASE_SQL}
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       ROUND(AVG(n_chars), 6) AS avg_chars
FROM sampled GROUP BY source
""",
)
def pipeline_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus construction — the composed DAG a pretraining
    data pipeline runs nightly, as ONE declarative plan:

    lang/length filter (parquet pushdown) -> exact-dedup keep-first
    (one shuffle on md5(text) — a 16-byte key, never the document) ->
    benchmark decontamination (broadcast gram anti-join) -> stratified
    mixture sampling (map-side hash filter) -> per-source stats.

    Composability is the point: every stage is the registered operator's
    exact logic, fused by Catalyst into a single job — filters reach the
    scan, the sample filter rides above the dedup, and the only
    corpus-wide shuffles are the dedup hash and the final 4-group agg.

    Dedup shape (r13 optimization, guide §2.3/§8 "shuffle keys and
    metadata instead of payloads"): every downstream consumer needs
    only (doc_id, source, n_chars, token-count), so those are projected
    MAP-SIDE and the keep-first winner per md5(text) is a min_by
    aggregation — map-side partial agg collapses same-partition
    duplicates before the exchange, and the exchange carries ~50 bytes
    per distinct hash instead of the document text.  The previous
    row_number window form shuffled the FULL text of every surviving
    row on md5(text); at 100 TB that is the difference between
    shuffling fingerprints and shuffling the corpus.  min_by on the
    unique doc_id is exactly ROW_NUMBER()=1 ordered by doc_id — the
    oracle is unchanged and hash-identical."""
    docs = load_table(spark, sf_dir, "documents")
    g = grams_df(spark, sf_dir, _NGRAM).select(
        "doc_id", _md5_int("sh").alias("h")
    )
    eval_g = g.filter(F.col("doc_id") % _EVAL_MOD == 0).select("h").distinct()
    contaminated = (
        g.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .join(F.broadcast(eval_g), "h")
        .select("doc_id")
        .distinct()
    )
    base = docs.filter(
        (F.col("lang") == "en")
        & (F.col("n_chars") >= 100)
        & (F.col("doc_id") % _EVAL_MOD != 0)
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.md5("text").alias("_k"),
    )
    ded = (
        base.groupBy("_k")
        .agg(
            F.expr("min_by(struct(doc_id, source, n_chars, n_tok), doc_id)").alias(
                "w"
            )
        )
        .select("w.*")
    )
    clean = ded.join(contaminated, "doc_id", "left_anti")
    bucket = _md5_int(F.col("doc_id").cast("string")) % 100
    src_k = F.substring("source", 4, 10).cast("int") % 4
    rate = (
        F.when(src_k == 0, _RATES[0])
        .when(src_k == 1, _RATES[1])
        .when(src_k == 2, _RATES[2])
        .otherwise(_RATES[3])
    )
    sampled = clean.filter(bucket < rate)
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


@register(
    "stratified_sample",
    f"""
SELECT doc_id, source
FROM (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket,
         CAST(substr(source, 4) AS INT) % 4 AS src_k
  FROM documents
)
WHERE bucket < CASE src_k WHEN 0 THEN {_RATES[0]} WHEN 1 THEN {_RATES[1]}
                          WHEN 2 THEN {_RATES[2]} ELSE {_RATES[3]} END
""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source stratified sampling (training-mixture
    weighting): document kept iff ``md5(doc_id) % 100`` falls under its
    source's keep rate.  Pure filter over the scan — no shuffle, no
    ``rand()`` (reproducible across engines, runs and retries; at
    100 TB re-sampling a failed partition MUST be deterministic).
    Filter and the two projected columns push down to parquet."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _md5_int(F.col("doc_id").cast("string")) % 100
    src_k = F.substring("source", 4, 10).cast("int") % 4
    rate = (
        F.when(src_k == 0, _RATES[0])
        .when(src_k == 1, _RATES[1])
        .when(src_k == 2, _RATES[2])
        .otherwise(_RATES[3])
    )
    return docs.filter(bucket < rate).select("doc_id", "source")


@register(
    "contamination_score",
    "WITH "
    + _GRAMS_CTE
    + f""",
train AS (SELECT doc_id, h FROM gh WHERE doc_id % {_EVAL_MOD} <> 0),
eval_h AS (SELECT DISTINCT h FROM gh WHERE doc_id % {_EVAL_MOD} = 0)
SELECT t.doc_id,
       COUNT(DISTINCT t.h) AS n_grams,
       COUNT(DISTINCT CASE WHEN e.h IS NOT NULL THEN t.h END) AS n_shared,
       ROUND(COUNT(DISTINCT CASE WHEN e.h IS NOT NULL THEN t.h END) * 1.0
             / COUNT(DISTINCT t.h), 6) AS contamination
FROM train t LEFT JOIN eval_h e ON t.h = e.h
GROUP BY t.doc_id
""",
)
def contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded benchmark-contamination measurement: for EVERY training
    document, the fraction of its distinct token 5-grams that appear
    anywhere in the eval subset — the near-contamination signal
    thresholded pipelines miss (``decontaminate`` flags >= 1 shared
    gram; this reports the whole distribution, the input to an
    overlap-fraction cut a la GPT-3's 13-gram rule).

    Scale shape: same as ``decontaminate`` — the distinct eval-gram set
    is a FIXED benchmark suite, broadcast; the corpus side streams
    through the map-side gram projection and a broadcast LEFT join
    (keeping zero-overlap docs), and the one shuffle is the per-doc
    distinct-gram aggregate."""
    g = grams_df(spark, sf_dir, _NGRAM).select("doc_id", _md5_int("sh").alias("h"))
    train = g.filter(F.col("doc_id") % _EVAL_MOD != 0)
    eval_h = (
        g.filter(F.col("doc_id") % _EVAL_MOD == 0).select("h").distinct()
    )
    j = train.join(
        F.broadcast(eval_h.withColumn("_in", F.lit(1))), "h", "left"
    )
    shared = F.count_distinct(F.when(F.col("_in").isNotNull(), F.col("h")))
    return j.groupBy("doc_id").agg(
        F.count_distinct("h").alias("n_grams"),
        shared.alias("n_shared"),
        F.round(shared * 1.0 / F.count_distinct("h"), 6).alias("contamination"),
    )


# ---------------------------------------------------------------------------
# BPE vocabulary training (tokenizer learning as a corpus stage)
# ---------------------------------------------------------------------------

_BPE_VOCAB_CAP = 4096
_BPE_MERGES = 32


def _learn_bpe(spark: SparkSession, sf_dir: str) -> list[tuple[int, str, str, str, int]]:
    """Shared merge-learning kernel for `bpe_train` / `bpe_tokenize`:
    distributed word-frequency agg + deterministic top-V TakeOrdered,
    then the bounded driver-side merge loop (see bpe_train docstring
    for the scale argument)."""
    wc = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok").asc())
        .limit(_BPE_VOCAB_CAP)
        .collect()
    )
    words = [(tuple(r["tok"]), int(r["freq"])) for r in wc]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(_BPE_MERGES):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (lft, rgt), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lft, rgt, lft + rgt, cnt))
        words = [(_bpe_apply_one(syms, lft, rgt), freq) for syms, freq in words]
    return merges


def _bpe_apply_one(syms: tuple[str, ...], lft: str, rgt: str) -> tuple[str, ...]:
    """Greedy leftmost non-overlapping replacement of the (lft, rgt)
    adjacency with lft+rgt — one merge pass over one symbol tuple."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
            out.append(lft + rgt)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _bpe_encode(word: str, merges: list[tuple[int, str, str, str, int]]) -> tuple[str, ...]:
    """Encode one word type: start from characters, apply the learned
    merges in rank order."""
    syms = tuple(word)
    for _, lft, rgt, _, _ in merges:
        if len(syms) < 2:
            break
        syms = _bpe_apply_one(syms, lft, rgt)
    return syms


@register("bpe_train", None)
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a byte-pair-encoding merge table from the corpus — the
    tokenizer-training stage of an LLM data pipeline (Sennrich et al.
    2016; the subword-nmt recipe every GPT-style tokenizer descends
    from).  Output: the ordered merge list (rank, left, right, merged,
    pair_count at selection time).

    Rows-only registration: BPE is an iterative data-dependent argmax
    (each merge changes the pair statistics the next argmax sees) —
    the same non-SQL-expressible class as `kmeans_fit`/`pca2_fit`.
    Exactness is pinned instead by `tests/test_bpe.py`, which replays
    the merges with an independent Counter-based reference
    implementation and checks the table bit-for-bit.

    Scale shape: the ONLY corpus-sized work is the word-frequency
    aggregation (map-side combinable count, then a deterministic
    TakeOrdered top-4096 by (freq desc, token asc) — NOT a global
    sort).  Merge learning then runs on the bounded frequency list
    (<= 4096 rows on the driver, O(V * wordlen * merges) — corpus-size
    independent), exactly how production BPE trainers operate on
    capped word-count tables; ties broken (count desc, pair lex asc)
    so the table is deterministic across engines and partitionings."""
    return spark.createDataFrame(
        _learn_bpe(spark, sf_dir),
        "rank int, left string, right string, merged string, pair_count bigint",
    )


@register("bpe_tokenize", None)
def bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merge table to the corpus — the tokenizer
    *application* stage: per document, the whitespace token count, the
    BPE piece count under the learned merges, and the chars-per-piece
    compression the tokenizer achieves.  Completes the train->apply
    tokenizer story next to `bpe_train`; rows-only for the same
    data-derived-model reason, with multi-path parity pinned by
    tests/test_bpe.py (the per-type encoder is replayed in pure Python
    against every distinct token).

    Scale shape: merges are applied per distinct token TYPE, not per
    token instance — one corpus-wide distinct (a shuffle whose input
    is the already-slim token projection), then ONE vectorized
    pandas_udf pass over the zipf-small type table computes piece
    counts (O(types * merges), Arrow-batched), and the result joins
    back to the token stream on the token key.  The type table is
    zipf-small but unbounded, so the join is hinted shuffle_hash, NOT
    broadcast (the minhash/perplexity r5 precedent: never broadcast a
    corpus-derived table); the per-doc agg is map-side combinable.
    The merge list itself is a bounded driver value (<= 32 rows)
    closed over by the UDF — the same bounded-model-broadcast shape as
    the PQ codebooks (similarity.py)."""
    from pyspark.sql.functions import pandas_udf

    merges = _learn_bpe(spark, sf_dir)

    def _n_pieces_fn(toks):
        cache: dict[str, int] = {}

        def enc(w):
            n = cache.get(w)
            if n is None:
                n = cache[w] = len(_bpe_encode(w, merges))
            return n

        return toks.map(enc).astype("int32")

    n_pieces_udf = pandas_udf(_n_pieces_fn, "int")

    tok = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("tok"),
        )
    )
    types = tok.select("tok").distinct().withColumn("n_pieces", n_pieces_udf("tok"))
    return (
        tok.join(types.hint("shuffle_hash"), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_pieces").alias("n_bpe_pieces"),
            F.sum(F.length("tok")).alias("n_word_chars"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_bpe_pieces",
            F.round(F.col("n_word_chars") * 1.0 / F.col("n_bpe_pieces"), 6).alias(
                "chars_per_piece"
            ),
        )
    )


@register(
    "cross_source_overlap",
    "WITH "
    + _GRAMS_CTE
    + """,
sgh AS (SELECT DISTINCT d.source, gh.h
        FROM gh JOIN documents d USING (doc_id)),
cnt AS (SELECT source, COUNT(*) AS n FROM sgh GROUP BY source),
inter AS (SELECT a.source AS source_a, b.source AS source_b,
                 COUNT(*) AS shared
          FROM sgh a JOIN sgh b ON a.h = b.h AND a.source < b.source
          GROUP BY 1, 2)
SELECT ca.source AS source_a, cb.source AS source_b,
       ca.n AS n_a, cb.n AS n_b,
       COALESCE(i.shared, 0) AS n_shared,
       ROUND(COALESCE(i.shared, 0) * 1.0
             / (ca.n + cb.n - COALESCE(i.shared, 0)), 6) AS jaccard
FROM cnt ca JOIN cnt cb ON ca.source < cb.source
LEFT JOIN inter i ON i.source_a = ca.source AND i.source_b = cb.source
""",
)
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise n-gram Jaccard between SOURCES — the mixture-overlap
    matrix a pretraining-data team reads before setting domain weights
    (two sources sharing half their 5-grams should not be upsampled as
    if independent; the corpus-level complement of per-document
    ``contamination_score`` and doc-vs-doc ``dedup_ngram_jaccard``).
    One row per unordered source pair including zero-overlap pairs, so
    the output is always the full |S|(|S|-1)/2 matrix.

    Scale shape: the corpus collapses FIRST to distinct (source,
    gram-hash) — one map-side-combinable distinct whose output is
    bounded by vocabulary x |S|, not by row count; the intersection
    self-join keys on the gram hash with fan-out <= |S| per key (a
    gram appears once per SOURCE, never per document), so no key's
    cost depends on the document distribution; per-source totals and
    the final pair assembly are |S|-row broadcasts.  Nothing
    corpus-sized crosses the wire after the first distinct."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    sgh = (
        docs.select(
            "source", F.explode(gram_array(_NGRAM)).alias("sh")
        )
        .select("source", _md5_int("sh").alias("h"))
        .distinct()
    )
    cnt = sgh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = sgh.alias("a"), sgh.alias("b")
    inter = (
        a.join(b, "h")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = cnt.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    cb = cnt.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    pairs = ca.crossJoin(cb).filter(F.col("source_a") < F.col("source_b"))
    shared = F.coalesce(F.col("shared"), F.lit(0))
    return (
        pairs.join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            shared.alias("n_shared"),
            F.round(
                shared * 1.0 / (F.col("n_a") + F.col("n_b") - shared), 6
            ).alias("jaccard"),
        )
    )
