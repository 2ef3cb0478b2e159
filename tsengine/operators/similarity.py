"""Approximate-nearest-neighbor similarity search over the embedding
column (north-star extension, BASELINE.json).

Two tiers:
  * ``ann_cosine_topk`` — brute-force cosine top-k: the exact baseline
    (query-set × corpus join).  Correct at any corpus size when the
    query set is small enough to broadcast.
  * ``ann_lsh`` — random-hyperplane LSH buckets: sign-bit signature
    partitions the corpus; candidates come only from the query's own
    bucket, then exact cosine reranks.  The 100 TB path: bucket join
    instead of full cross join (recall traded for an ~2^b fan-in cut).

Hyperplanes are deterministic arithmetic (FIXTURES.md §6) so the DuckDB
oracle reproduces signatures exactly.  Cosines are rounded to 6 before
ranking, with vec_id tie-breaks, so ranks agree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

_DIM = 64
TOP_K = 5
_N_QUERIES = 10  # vec_id < 10 are the query vectors
N_PLANES = 8

# plane weights w(h, i) = (((i+1)*(h+3)*2654435761) % 1999 - 999) / 1000
_PLANES = [
    [(((i + 1) * (h + 3) * 2654435761) % 1999 - 999) / 1000.0 for i in range(_DIM)]
    for h in range(N_PLANES)
]


def _dot_const(vec_col, weights):
    warr = F.array(*[F.lit(w) for w in weights])
    return F.aggregate(
        F.zip_with(vec_col, warr, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    sq = lambda v: F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)  # noqa: E731
    return dot / (F.sqrt(sq(a)) * F.sqrt(sq(b)))


@register(
    "ann_cosine_topk",
    f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.e, c.e), 6) AS cos
  FROM emb q JOIN emb c ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, JVM-side zip_with dot products, per-query top-k window.
    The plan is scan-shaped over the corpus — no corpus self-join."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine(F.col("qe"), F.col("e")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


@register(
    "ann_lsh",
    f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
proj AS (
  SELECT vec_id, e, h,
         SUM(x * ((((i + 1) * (h + 3) * 2654435761) % 1999 - 999) / 1000.0)) AS d
  FROM (SELECT vec_id, e, unnest(e) AS x, unnest(range(0, {_DIM})) AS i FROM emb)
  CROSS JOIN (SELECT unnest(range(0, {N_PLANES})) AS h)
  GROUP BY vec_id, e, h
),
sig AS (
  SELECT vec_id, e,
         string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, '' ORDER BY h) AS bucket
  FROM proj GROUP BY vec_id, e
),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.e, c.e), 6) AS cos
  FROM sig q JOIN sig c ON q.bucket = c.bucket
  WHERE q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM cand
) WHERE rank <= {TOP_K}
""",
)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: 8 random-hyperplane sign bits -> bucket key;
    candidates share the query's bucket; exact cosine reranks.  The
    bucket join is an equi-join on the signature — linear shuffle, no
    cross join; at 100 TB, multiple signature tables (bands) trade
    recall for fan-in like MinHash-LSH does for dedup."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    bits = [
        F.when(_dot_const(F.col("e"), _PLANES[h]) >= 0, "1").otherwise("0")
        for h in range(N_PLANES)
    ]
    sig = emb.select("vec_id", "e", F.concat(*bits).alias("bucket"))
    q = sig.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    cand = (
        sig.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine(F.col("qe"), F.col("e")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= TOP_K
    )
