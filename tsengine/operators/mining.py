"""Corpus-mining and statistics operators (north-star extension,
BASELINE.json): TF-IDF term weighting, corpus n-gram counts, rolling
per-key statistics, z-score outlier detection, training-mixture domain
weighting, and a deterministic hash-reservoir sample.

The reference has no corpus analytics (its data is fixed-length sensor
windows); these are the operations a large-scale training-data pipeline
layers on top — all expressed as declarative DataFrame plans so Catalyst
keeps them in whole-stage codegen:

* ``tfidf_topk`` — explode + two hash aggs + one shuffle join on the
  term key + per-doc window top-k.  At 100 TB the term join is the
  classic skew point (stopwords): AQE skew-join splits it, and the
  doc-frequency side is orders of magnitude smaller than the corpus.
* ``ngram_count`` — map-side n-gram projection (single-layer array
  ``transform`` feeding a codegen'd explode, the plan shape that beat
  the window-function shingler; see README dead-ends), then one hash
  agg keyed on the gram.
* ``rolling_stats`` / ``zscore_outliers`` — bounded window frames /
  grouped aggregation + shuffle join; both single-shuffle plans.
* ``mixture_weights`` — per-source token totals; the normalization
  constant flows through a 20-row window over () — cardinality is the
  number of *domains*, never the number of documents.
* ``reservoir_sample`` — global deterministic top-k by md5 order:
  Spark's TakeOrdered (per-partition top-k, then a k-row driver merge)
  — no full sort, no rand(), reproducible on retry at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsengine.operators.dedup import _md5_int
from tsengine.registry import register
from tsengine.sources.tables import load_table

# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term) rows: non-empty whitespace tokens, one row per
    occurrence."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    return docs.select("doc_id", F.explode(toks).alias("term"))


@register(
    "tfidf_topk",
    """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, tfidf, rnk AS rank
FROM (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df.dfreq + 1.0)) + 1.0), 6) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df.dfreq + 1.0)) + 1.0), 6) DESC,
                    tf.term
         ) AS rnk
  FROM tf JOIN df USING (term) CROSS JOIN n
)
WHERE rnk <= 3
""",
)
def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf =
    ln((N+1)/(df+1)) + 1, the sklearn formulation).

    Plan: tokenize map-side -> hash agg on (doc_id, term) -> document
    frequency as COUNT over a term-partition window on that same tf
    table (one exchange, replacing the groupBy+self-join shape that
    costs two) -> one window per doc for the top-k.  Three exchanges
    total; the corpus-size scalar rides a broadcast cross join (1 row).
    Ranking orders by the ROUNDED score (then term) so cross-engine
    last-ulp differences cannot reorder the top-k (SURVEY.md §4.4
    discipline).
    """
    toks = _doc_tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # tf has exactly one row per (doc, term), so a term-partition count
    # IS the document frequency — no second aggregation, no join
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    score = F.round(
        F.col("tf")
        * (F.log((F.col("n_docs") + 1.0) / (F.col("dfreq") + 1.0)) + 1.0),
        6,
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.crossJoin(F.broadcast(n))
        .withColumn("dfreq", dfreq)
        .withColumn("tfidf", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


# ---------------------------------------------------------------------------
# corpus n-gram counts
# ---------------------------------------------------------------------------


@register(
    "ngram_count",
    """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS gram
  FROM toks, UNNEST(range(1, len(tk))) AS r(i)
  WHERE len(tk) >= 2
)
SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY 1 HAVING COUNT(*) >= 5
""",
)
def ngram_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram frequency table (count >= 5) — the building
    block for boilerplate detection and LM vocabulary induction.

    Unlike dedup's ``gram_array`` this keeps EVERY occurrence (no
    ``array_distinct``): the bigram array is a map-side single-layer
    ``transform`` feeding a codegen'd explode, then one hash agg keyed
    on the gram (partial aggregation collapses repeats before the
    shuffle).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    d = docs.select(F.col("doc_id"), toks.alias("tk")).filter(F.size("tk") >= 2)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("tk") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("tk", i), F.element_at("tk", i + 1)
        ),
    )
    return (
        d.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


@register(
    "pmi_bigrams",
    """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
uni AS (
  SELECT tk[i] AS w FROM toks, UNNEST(range(1, len(tk) + 1)) AS r(i)
),
ucnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
utot AS (SELECT COUNT(*) AS u FROM uni),
big AS (
  SELECT tk[i] AS x, tk[i + 1] AS y
  FROM toks, UNNEST(range(1, len(tk))) AS r(i)
  WHERE len(tk) >= 2
),
btot AS (SELECT COUNT(*) AS b FROM big),
bcnt AS (
  SELECT x, y, COUNT(*) AS cxy FROM big GROUP BY 1, 2 HAVING COUNT(*) >= 5
)
SELECT bc.x, bc.y, bc.cxy,
       ROUND(LN((CAST(bc.cxy AS DOUBLE) * t.u * t.u)
                / (CAST(bt.b AS DOUBLE) * cx.c * cy.c)), 6) AS pmi
FROM bcnt bc
JOIN ucnt cx ON bc.x = cx.w
JOIN ucnt cy ON bc.y = cy.w
CROSS JOIN utot t CROSS JOIN btot bt
""",
)
def pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent
    token pairs, PMI = ln(p(xy) / (p(x) p(y))) with p from corpus
    unigram/bigram frequencies — the classic collocation score
    (Church & Hanks 1990) a pipeline uses to find multi-word
    expressions, template boilerplate (high-count low-PMI pairs), and
    vocabulary-merge candidates.  Same tokenizer and count >= 5 floor
    as `ngram_count`; the PMI itself needs the pair's WORDS, so this
    keeps (x, y) columns instead of the concatenated gram.

    Determinism: all counts are integers (order-free); the PMI is ONE
    shared expression shape — ln((cxy*U*U)/(B*cx*cy)) with identical
    left-associated double promotion in both engines — so the only
    rounding exposure is ROUND(,6) on a logarithm, which has no
    structural midpoint alignment (unlike the grid-derived PageRank
    values; the r9 policy for generic one-shot float expressions).

    100 TB shape: exactly TWO corpus passes — one explode+hash-agg for
    unigram counts, one for bigram counts (both collapse map-side to
    zipf-law output sizes) — each eagerly localCheckpointed because
    Spark does NOT reuse the aliased agg subtree: the naive lazy form
    re-derived the unigram agg for cx, cy AND the total (5 corpus
    scans in the executed plan, measured at sf0.1 before this shape).
    Both totals then DERIVE from the materialized aggs as vocab-sized
    sums (same integers, never a third corpus pass); the count >= 5
    floor cuts the bigram table BEFORE the vocab equi-joins; the two
    totals are 1-row broadcasts.  No windows, no corpus-sized join
    side anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    d = docs.select(toks.alias("tk"))
    ucnt = (
        d.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    utot = ucnt.agg(F.sum("c").alias("u"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("tk") - 1),
        lambda i: F.struct(
            F.element_at("tk", i).alias("x"),
            F.element_at("tk", i + 1).alias("y"),
        ),
    )
    bagg = (
        d.filter(F.size("tk") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .localCheckpoint(eager=True)
    )
    btot = bagg.agg(F.sum("cxy").alias("b"))
    bcnt = bagg.filter(F.col("cxy") >= 5)
    cx = ucnt.select(F.col("w").alias("x"), F.col("c").alias("cx"))
    cy = ucnt.select(F.col("w").alias("y"), F.col("c").alias("cy"))
    pmi = F.round(
        F.log(
            (F.col("cxy").cast("double") * F.col("u") * F.col("u"))
            / (F.col("b").cast("double") * F.col("cx") * F.col("cy"))
        ),
        6,
    )
    return (
        bcnt.join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .select("x", "y", "cxy", pmi.alias("pmi"))
    )


# ---------------------------------------------------------------------------
# rolling per-key statistics
# ---------------------------------------------------------------------------


@register(
    "rolling_stats",
    """
SELECT event_id, user_id,
       ROUND(AVG(value) OVER w, 6) AS roll_avg,
       ROUND(STDDEV_SAMP(value) OVER w, 6) AS roll_std
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
)
def rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling mean/std of the last 4 events per user (bounded ROWS
    frame) — standard sensor-smoothing / feature-engineering shape.

    One shuffle on user_id, O(frame) state per row; the frame order is
    pinned by (ts, event_id) so the 4-term float accumulation order is
    identical on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("roll_avg"),
        F.round(F.stddev_samp("value").over(w), 6).alias("roll_std"),
    )


# ---------------------------------------------------------------------------
# z-score outliers
# ---------------------------------------------------------------------------


@register(
    "zscore_outliers",
    """
WITH s AS (
  SELECT user_id, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
  FROM events GROUP BY 1
)
SELECT e.event_id, e.user_id, ROUND((e.value - s.mu) / s.sigma, 4) AS z
FROM events e JOIN s USING (user_id)
WHERE ABS((e.value - s.mu) / s.sigma) > 2.5
""",
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly detection: events more than 2.5 sigma
    from that user's mean.

    groupBy agg (partial map-side combine) + shuffle join back on
    user_id — the per-user stats side is |users| rows, vastly smaller
    than the event log, so at 100 TB the join broadcasts (AQE converts
    it once the agg side's runtime size is known).
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(stats, "user_id")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "user_id", F.round(z, 4).alias("z"))
    )


# ---------------------------------------------------------------------------
# training-mixture weights
# ---------------------------------------------------------------------------


@register(
    "mixture_weights",
    """
WITH s AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS n_tokens
  FROM documents GROUP BY 1
)
SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(POWER(n_tokens, 0.7) / SUM(POWER(n_tokens, 0.7)) OVER (), 6) AS weight
FROM s
""",
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain sampling weights for training-mixture construction:
    weight ~ n_tokens^0.7, normalized (the temperature-scaled mixing
    rule used for multilingual/multi-domain LM corpora).

    One hash agg over the corpus to |domains| rows; the normalizer is a
    1-row total broadcast back onto the domain table (no partition-less
    window anywhere in the plan — contract-tested).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("n_tokens"),
    )
    pw = s.withColumn("_pw", F.pow("n_tokens", 0.7))
    tot = pw.agg(F.sum("_pw").alias("_tot"))
    return (
        pw.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("_pw") / F.col("_tot"), 6).alias("weight"),
        )
    )


# ---------------------------------------------------------------------------
# semi-structured (JSON) property extraction
# ---------------------------------------------------------------------------


@register(
    "props_extract",
    """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
FROM events GROUP BY 1
""",
)
def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the semi-structured ``props`` JSON column with a declared
    schema (``from_json``) and aggregate the extracted field — the
    event-log enrichment path every clickstream pipeline needs.

    ``from_json`` with an explicit schema stays in codegen (Jackson
    parse per row, no Python); the projection then feeds a plain hash
    agg.  At 100 TB the parse is map-side and the shuffle carries only
    |event_type| groups.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic reservoir sample
# ---------------------------------------------------------------------------


@register(
    "reservoir_sample",
    """
SELECT doc_id, source
FROM documents
ORDER BY ('0x' || substr(md5('smpl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
         doc_id
LIMIT 100
""",
)
def reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-without-replacement sample of exactly k=100 docs, chosen
    by md5 order — the deterministic reservoir: every engine, run and
    retry picks the same 100 docs (rand() would not survive a 100 TB
    partition retry).

    orderBy+limit compiles to TakeOrdered: per-partition top-k then a
    k-row merge on the driver — no global sort shuffle at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = _md5_int(F.concat(F.lit("smpl:"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "source", key.alias("_h"))
        .orderBy("_h", "doc_id")
        .limit(100)
        .drop("_h")
    )


# ---------------------------------------------------------------------------
# TextRank — PageRank over the token co-adjacency graph
# ---------------------------------------------------------------------------

_TR_ITERS = 3
_TR_DAMP = 0.85
_TR_TOP = 50

_TR_BIGRAM_CTES = """
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
bigrams AS (
  SELECT doc_id, u['t1'] AS t1, u['t2'] AS t2
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(l)),
                                 i -> {'t1': l[i], 't2': l[i + 1]})) AS u
    FROM toks WHERE len(l) >= 2
  )
),
bg_counts AS (
  SELECT t1, t2, COUNT(*) AS c12 FROM bigrams GROUP BY t1, t2
)"""


def _textrank_oracle() -> str:
    sql = (
        "WITH "
        + _TR_BIGRAM_CTES
        + """,
edges AS (
  SELECT src, dst, SUM(w) AS w FROM (
    SELECT t1 AS src, t2 AS dst, c12 AS w FROM bg_counts
    UNION ALL
    SELECT t2, t1, c12 FROM bg_counts
  ) GROUP BY src, dst
),
outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
r0 AS (SELECT src AS node, 1.0 AS rank FROM outw)"""
    )
    # per-node contributions accumulate in SORTED src order via a
    # left fold seeded with 0.0 — the exact fold Spark's
    # aggregate(array_sort(collect_list(...))) runs, so both engines
    # compute bit-identical sums (the ema_smooth discipline); the 9dp
    # intermediate round stays as a belt-and-braces guard
    for i in range(1, _TR_ITERS + 1):
        sql += f""",
r{i} AS (
  SELECT node,
         ROUND({1 - _TR_DAMP} + {_TR_DAMP} *
               list_reduce(list_prepend(0.0, cs), (a, b) -> a + b), 9) AS rank
  FROM (
    SELECT e.dst AS node, list(r.rank * e.w / o.ow ORDER BY e.src) AS cs
    FROM edges e
    JOIN r{i - 1} r ON e.src = r.node
    JOIN outw o ON e.src = o.src
    GROUP BY e.dst
  )
)"""
    sql += f"""
SELECT node AS tok, ROUND(rank, 6) AS rank
FROM r{_TR_ITERS}
ORDER BY ROUND(rank, 6) DESC, node
LIMIT {_TR_TOP}
"""
    return sql


@register("textrank_keywords", _textrank_oracle())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    (damping 0.85, K=3 fixed iterations, uniform init) over the
    undirected token co-adjacency graph — nodes are vocabulary tokens,
    edge weights are adjacent-occurrence counts — emitting the top-50
    corpus keywords by stationary importance.  Hub function words score
    high by degree; distinctive mid-frequency terms separate from the
    tail — the classic unsupervised keyword signal a curation pipeline
    uses for domain tagging.

    Scale shape: the graph build is two zipf-small aggs over map-side
    bigram extraction (same in-row transform as `perplexity_filter` —
    zero shuffles before the count agg); each PageRank iteration is ONE
    equi-join of the rank vector on the token key plus a
    map-side-combinable weighted-sum groupBy; the graph is
    vocab x avg-degree edges — corpus-logarithmic, never corpus-sized.
    At 100 TB: pre-partition edges and ranks on the token key so all K
    iterations reuse one exchange (the `dedup_components` discipline).
    The final top-50 is TakeOrdered (per-partition top-k + k-row driver
    merge), not a global sort.  Intermediate ranks round to 9dp each
    iteration in BOTH engines, pinning FP-drift out of the oracle
    compare.  Oracle: the same K iterations unrolled as CTEs.

    Float parity (hardened round 6, VERDICT r5 item 3): the
    per-iteration accumulation is association-PINNED — contributions
    fold in sorted src order from a 0.0 seed in BOTH engines (Spark
    ``aggregate(array_sort(collect_list(...)))`` vs DuckDB
    ``list_reduce(list_prepend(0.0, list(... ORDER BY src)))``), so the
    sums are bit-identical and no rounding boundary can flip
    (tests/test_properties_round6.py forces an order-sensitive
    catastrophic-cancellation sum through both folds).

    The pinned fold costs ~+0.15s steady vs the pre-r6 plain SUM
    (1.35s -> 1.51s, stable across two boots, re-measured r7).  The
    hybrid considered in VERDICT r6 item 8 — plain SUM for
    intermediate iterations, pinned fold only for the last — was
    REJECTED: each iteration re-rounds to 9dp, and an unordered SUM
    differing by ~1 ulp from the fold flips the round exactly at a
    5e-10 boundary, the failure class this repo has already observed
    once in 74k rows (verify SKILL gotchas).  A flipped intermediate
    rank propagates through every later iteration; 0.15s on one query
    does not buy back a probabilistic oracle mismatch.

    Ref scope: nanuncheria/time-series-data-SSL has no text mining; this
    extends the corpus-mining family (SURVEY.md north-star extensions).
    """
    docs = load_table(spark, sf_dir, "documents")
    l = F.col("l")
    bigrams = (
        docs.withColumn("l", F.filter(F.split("text", " "), lambda x: x != ""))
        .where(F.size("l") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("l") - 1),
                    lambda i: F.struct(
                        F.element_at(l, i).alias("t1"),
                        F.element_at(l, i + 1).alias("t2"),
                    ),
                )
            ).alias("u")
        )
        .select(F.col("u.t1").alias("t1"), F.col("u.t2").alias("t2"))
    )
    bg_counts = bigrams.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c12"))
    edges = (
        bg_counts.select(
            F.col("t1").alias("src"), F.col("t2").alias("dst"), F.col("c12").alias("w")
        )
        .unionAll(
            bg_counts.select(
                F.col("t2").alias("src"),
                F.col("t1").alias("dst"),
                F.col("c12").alias("w"),
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # eager localCheckpoint: truncates lineage so the K iteration joins
    # read the materialized (vocab x avg-degree) edge table instead of
    # re-deriving the corpus scan per iteration — the plan drops from
    # 42 exchanges / 20 scans to the per-iteration join+agg chain.
    # r14 A/B (VERDICT r13 item 4): removing it in favor of AQE
    # runtime exchange reuse is 0.3s FASTER at sf0.1 (2.49s vs 2.82s
    # build+noop — the checkpoint job overhead dominates there) but
    # 1.0s SLOWER at the 10x tier (3.00s vs 2.06s steady — runtime
    # reuse only dedupes 7 of the repeated stages, so real corpus-side
    # work re-runs per iteration and grows with data).  The checkpoint
    # is the scale-correct choice; kept.
    edges_w = edges.join(outw, "src").localCheckpoint(eager=True)
    # node set re-derived from the checkpointed table so the rank-vector
    # lineage is corpus-free too
    ranks = edges_w.select("src").distinct().withColumn("rank", F.lit(1.0))
    # association-pinned accumulation (VERDICT r5 item 3): contributions
    # fold in SORTED src order from a 0.0 seed, the identical
    # left-assoc fold the oracle runs via list_reduce(list_prepend(0.0,
    # list(... ORDER BY src))) — bit-identical across engines, so the
    # former half-boundary cascade risk is gone by construction
    # (tests/test_properties_round6.py forces the boundary)
    for _ in range(_TR_ITERS):
        ranks = (
            edges_w.join(ranks, "src")
            .select(
                "dst",
                F.struct(
                    F.col("src"),
                    (F.col("rank") * F.col("w") / F.col("ow")).alias("c"),
                ).alias("sc"),
            )
            .groupBy(F.col("dst").alias("src"))
            .agg(
                F.round(
                    F.lit(1 - _TR_DAMP)
                    + F.lit(_TR_DAMP)
                    * F.aggregate(
                        F.array_sort(F.collect_list("sc")),
                        F.lit(0.0),
                        lambda acc, x: acc + x["c"],
                    ),
                    9,
                ).alias("rank")
            )
        )
    return (
        ranks.select(F.col("src").alias("tok"), F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "tok")
        .limit(_TR_TOP)
    )


# ---------------------------------------------------------------------------
# corpus-composition audit: lang x source contingency statistics
# ---------------------------------------------------------------------------


@register(
    "contingency_stats",
    """
WITH cell AS (
  SELECT lang, source, COUNT(*) AS n_docs FROM documents GROUP BY lang, source
),
rowt AS (SELECT lang, SUM(n_docs) AS n_lang FROM cell GROUP BY lang),
colt AS (SELECT source, SUM(n_docs) AS n_source FROM cell GROUP BY source),
tot  AS (SELECT SUM(n_docs) AS n FROM cell)
SELECT c.lang, c.source, c.n_docs,
       ROUND(r.n_lang * ct.n_source * 1.0 / t.n, 6) AS expected,
       ROUND(POWER(c.n_docs - r.n_lang * ct.n_source * 1.0 / t.n, 2)
             / (r.n_lang * ct.n_source * 1.0 / t.n), 6) AS chi2_term,
       ROUND(LN(c.n_docs * t.n * 1.0 / (r.n_lang * ct.n_source)), 6) AS pmi
FROM cell c
JOIN rowt r USING (lang)
JOIN colt ct USING (source)
CROSS JOIN tot t
""",
)
def contingency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition audit: the lang x source contingency table
    with per-cell independence statistics — expected count under
    independence, the cell's chi-squared contribution, and pointwise
    mutual information.  This is the dataset-mixture drift check an
    LLM-data pipeline runs after every ingest: a cell whose chi2_term
    spikes means one source's language mix shifted (crawl drift,
    broken extractor), and summing chi2_term gives the classical
    independence test statistic.

    Scale shape: ONE corpus pass — a map-side-combinable hash agg to
    |lang| x |source| cells; the marginals and grand total are re-aggs
    of that tiny cell table (never a second corpus scan), and the
    final assembly is broadcast joins over |cells| rows.  All
    statistics are ratios of exact integer counts; the transcendental
    (LN) sees identical doubles in both engines, so the 6dp round only
    absorbs libm last-ulp drift (the ``pmi_bigrams`` discipline,
    mining.py:250)."""
    docs = load_table(spark, sf_dir, "documents")
    cell = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))
    rowt = cell.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    colt = cell.groupBy("source").agg(F.sum("n_docs").alias("n_source"))
    tot = cell.agg(F.sum("n_docs").alias("n"))
    expected = F.col("n_lang") * F.col("n_source") * 1.0 / F.col("n")
    return (
        cell.join(F.broadcast(rowt), "lang")
        .join(F.broadcast(colt), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_docs",
            F.round(expected, 6).alias("expected"),
            F.round(
                F.pow(F.col("n_docs") - expected, 2) / expected, 6
            ).alias("chi2_term"),
            F.round(
                F.log(
                    F.col("n_docs")
                    * F.col("n")
                    * 1.0
                    / (F.col("n_lang") * F.col("n_source"))
                ),
                6,
            ).alias("pmi"),
        )
    )


_LO_ALPHA0 = 100.0  # informative Dirichlet prior mass (Monroe et al.)
_LO_TOPK = 5


_LO_SCORE_SQL = """
ln((y_sw + aw) / (n_s + {a0} - y_sw - aw))
         - ln(((y_w - y_sw) + aw) / ((n - n_s) + {a0} - (y_w - y_sw) - aw))
""".replace("{a0}", str(_LO_ALPHA0))

_LO_SIGMA_SQL = "sqrt(1.0 / (y_sw + aw) + 1.0 / ((y_w - y_sw) + aw))"


@register(
    "source_log_odds",
    f"""
WITH toks AS (
  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
sw AS (SELECT source, term, COUNT(*) AS y_sw FROM toks GROUP BY 1, 2),
w AS (SELECT term, COUNT(*) AS y_w FROM toks GROUP BY 1),
s AS (SELECT source, COUNT(*) AS n_s FROM toks GROUP BY 1),
g AS (SELECT COUNT(*) AS n FROM toks),
scored AS (
  SELECT source, term, y_sw, y_w,
         ROUND(({_LO_SCORE_SQL}) / {_LO_SIGMA_SQL}, 6) AS z
  FROM (SELECT sw.source, sw.term, sw.y_sw,
               {_LO_ALPHA0} * w.y_w / g.n AS aw, w.y_w, s.n_s, g.n
        FROM sw JOIN w USING (term) JOIN s USING (source) CROSS JOIN g)
)
SELECT source, term, y_sw AS n_in_source, y_w AS n_corpus, z, rnk AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY z DESC, term) AS rnk
      FROM scored)
WHERE rnk <= {_LO_TOPK}
""",
)
def source_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per source by log-odds ratio with informative
    Dirichlet prior (Monroe, Colaresi & Quinn 2008, "Fightin' Words" —
    the standard corpus-linguistics answer to "what words make this
    source different", robust where raw TF-IDF overweights rare
    typos): each source vs the rest of the corpus, prior mass
    alpha_w = alpha0 * y_w / n from the global distribution, z-scored
    by the delta's approximate variance 1/(y_sw+a_w) + 1/(y_rest+a_w);
    top-{_LO_TOPK} terms per source, ranked on the 6dp-ROUNDED z (the
    ``tfidf_topk`` determinism rule: never rank on unrounded floats).

    Determinism: every input to the transcendentals is an exact
    integer count or one division of exact integers, the expression
    tree is textually mirrored in both engines, and the only emitted
    float is ROUND(z, 6) — the ``pmi_bigrams`` discipline.

    Scale shape: three map-side-combinable count aggs (vocab x |S|,
    vocab, |S| rows — all zipf-small) + one 1-row grand total; scoring
    joins broadcast the vocab- and |S|-bounded sides; the top-k window
    partitions by source over vocab-bounded groups.  The corpus is
    touched exactly once, by the token explode feeding the counts."""
    toks = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "term"
        ),
    )
    sw = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("y_sw"))
    w = toks.groupBy("term").agg(F.count(F.lit(1)).alias("y_w"))
    s = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    g = toks.agg(F.count(F.lit(1)).alias("n"))
    j = (
        sw.join(F.broadcast(w), "term")
        .join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(g))
        .withColumn("aw", _LO_ALPHA0 * F.col("y_w") / F.col("n"))
    )
    y_sw, y_w, n_s, n, aw = (
        F.col("y_sw"),
        F.col("y_w"),
        F.col("n_s"),
        F.col("n"),
        F.col("aw"),
    )
    delta = F.log((y_sw + aw) / (n_s + _LO_ALPHA0 - y_sw - aw)) - F.log(
        ((y_w - y_sw) + aw) / ((n - n_s) + _LO_ALPHA0 - (y_w - y_sw) - aw)
    )
    sigma = F.sqrt(1.0 / (y_sw + aw) + 1.0 / ((y_w - y_sw) + aw))
    scored = j.select(
        "source",
        "term",
        y_sw.alias("n_in_source"),
        y_w.alias("n_corpus"),
        F.round(delta / sigma, 6).alias("z"),
    )
    rnk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("z").desc(), "term")
    )
    return (
        scored.withColumn("rank", rnk)
        .filter(F.col("rank") <= _LO_TOPK)
        .select("source", "term", "n_in_source", "n_corpus", "z", "rank")
    )


@register(
    "zipf_fit",
    """
WITH cnt AS (
  SELECT term, COUNT(*) AS c
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        FROM documents)
  GROUP BY term
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS r FROM cnt
),
s AS (
  SELECT COUNT(*) AS n,
         SUM(ln(r)) AS sx, SUM(ln(c)) AS sy,
         SUM(ln(r) * ln(r)) AS sxx, SUM(ln(c) * ln(c)) AS syy,
         SUM(ln(r) * ln(c)) AS sxy
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_vocab,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept,
       ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
""",
)
def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token rank-frequency curve:
    least-squares slope/intercept/R² of ln(count) on ln(rank) — the
    corpus-health one-liner (natural text fits slope ≈ -1; synthetic
    boilerplate, template spam, or truncated crawls bend the curve and
    drop R² long before any per-document filter notices).

    Determinism: ranks are deterministic (count DESC, term) integers;
    ln inputs are exact integers, so each term of the regression sums
    is bit-identical — the SUMS are engine-order-dependent over the
    vocab and the three emitted statistics are ROUND(,6)-canonicalized
    (standing policy), with the closed-form arithmetic mirrored
    textually (the ``metric_correlations`` rule).

    Scale shape: the corpus is touched once by the token-count agg
    (map-side combinable); everything after runs on the VOCAB-sized
    table (zipf-small by the very law being fitted).  Even there the
    global rank is NOT a partition-less window (the registry-wide plan
    contract): it uses the ``_avg_ranked_scores`` two-phase form —
    terms sharing a count are one "bucket", bucket offsets come from a
    broadcast greater-count self-join over the DISTINCT-count table
    (O(sqrt(tokens)) rows by the fitted law itself), and the in-bucket
    row_number windows PARTITION BY count."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "term"
        )
    )
    cnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    btot = cnt.groupBy("c").agg(F.count(F.lit(1)).alias("bc"))
    lo, hi = btot.alias("lo"), btot.alias("hi")
    off = (
        hi.join(F.broadcast(lo), F.col("lo.c") > F.col("hi.c"), "left")
        .groupBy(F.col("hi.c").alias("c"))
        .agg(F.coalesce(F.sum("lo.bc"), F.lit(0)).alias("off"))
    )
    ranked = (
        cnt.join(F.broadcast(off), "c")
        .withColumn(
            "r",
            F.col("off")
            + F.row_number().over(Window.partitionBy("c").orderBy("term")),
        )
    )
    lx, ly = F.log(F.col("r")), F.log(F.col("c"))
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(ly * ly).alias("syy"),
        F.sum(lx * ly).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("long").alias("n_vocab"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


_WS_K = 100


@register(
    "weighted_sample",
    f"""
SELECT doc_id, source, n_chars, key
FROM (
  SELECT doc_id, source, n_chars,
         ROUND(ln((('0x' || substr(md5('wsmpl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                  / 4294967296.0) / n_chars, 6) AS key
  FROM documents
)
ORDER BY key DESC, doc_id
LIMIT {_WS_K}
""",
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample of exactly k={_WS_K} docs WITHOUT
    replacement — Efraimidis-Spirakis priority sampling (priority
    u^(1/w), evaluated in the order-preserving log form ln(u)/w) with
    the uniform u derived from the md5 hash instead of rand():
    deterministic on every engine, run and partition retry, like
    ``reservoir_sample``, but inclusion probability proportional to
    document length — the quality/size-weighted subsampling step a
    curation pipeline runs when it wants a token-budget-proportional
    corpus slice rather than a doc-uniform one.

    Determinism: u = (h+1)/2^32 is EXACT (integer + power-of-two
    division); the only transcendental is one ln whose cross-engine
    ulp exposure is absorbed by ranking on the ROUND(,6) key with
    doc_id tiebreak (the ``tfidf_topk`` ranking rule).  orderBy+limit
    compiles to TakeOrdered — per-partition top-k then a k-row driver
    merge, no global sort at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    h = _md5_int(F.concat(F.lit("wsmpl:"), F.col("doc_id").cast("string")))
    key = F.round(F.log((h + 1) / F.lit(4294967296.0)) / F.col("n_chars"), 6)
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("key"))
        .orderBy(F.col("key").desc(), "doc_id")
        .limit(_WS_K)
    )
