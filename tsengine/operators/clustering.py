"""Embedding clustering + semantic dedup (LLM-pipeline operators).

``kmeans_fit`` is a deterministic full-batch Lloyd fit over the
``embeddings`` table — the engine-portable twin of the MLlib KMeans
estimator, using the same discipline that upgraded ``logreg_fit`` from
rows-only to hash-checked (tsengine/operators/ml.py): deterministic
init (the first K vectors), distances rounded to 6dp before the argmin,
per-dimension centroid means rounded to 6dp before they enter the next
iteration, ties broken by centroid id.  Both engines then walk the
exact same centroid trajectory and the final per-vector assignment is
hash-identical.

``semdedup`` is the standard semantic-deduplication shape for
pretraining corpora (cluster first, compare only within a cluster):
the final k-means assignment buckets the pair join, so candidate pairs
are ~N²/K instead of N² — the same bucketing argument as MinHash-LSH
(tsengine/operators/dedup.py), with the cluster id as the bucket key.

Scale shape: each Lloyd step is one map-side assignment pass (centroid
table broadcast as literals) + one groupBy(cluster) partial-agg mean;
only K x DIM rounded scalars ever reach the driver (treeAggregate
shape).  The pair join is an equi-join on cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

_DIM = 64
_K = 8
_STEPS = 2  # Lloyd iterations after the deterministic init
_SEM_THRESHOLD = 0.25  # within-cluster cosine for near-dup pairs (the
# driver fixture's embeddings are near-orthogonal random vectors — max
# pair cosine ~0.51 — so the production-style 0.8 would select nothing)


def _assigned_df(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Nearest-centroid assignment as ONE Arrow-batched numpy kernel
    (mapInPandas): distances accumulate per dimension in index order
    (``acc += (x_i - c_i)^2`` for i = 0..D-1), which is float64
    left-fold association — bit-identical to the oracle's explicit
    64-term ``+`` chain.  Distances round to 6dp BEFORE the argmin
    (engine-portable comparison); ``argmin`` takes the FIRST minimum,
    i.e. ties break on the lower centroid id, matching the oracle's
    ROW_NUMBER ... ORDER BY dd, cid.

    A composition of per-centroid zip_with/aggregate folds measured
    ~10x slower here: Spark evaluates higher-order array functions
    interpreted, and the 8 x 64-literal expression trees dominate plan
    compile — same dead end as the map-side minhash (dedup.py)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)  # [K, D]

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["e"].values).astype(np.float64)  # [n, D]
            acc = np.zeros((len(pdf), C.shape[0]))
            for i in range(C.shape[1]):
                d = X[:, i : i + 1] - C[None, :, i]
                acc += d * d
            dd = np.round(acc, 6)
            cl = np.argmin(dd, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": cl.astype("int32"),
                    "dist": dd[np.arange(len(cl)), cl],
                    "e": pdf["e"],
                }
            )

    return emb.mapInPandas(
        fn, schema="vec_id long, cluster int, dist double, e array<double>"
    )


def _centroid_step(emb: DataFrame, centroids: list[list[float]]) -> list[list[float]]:
    """One Lloyd update: nearest-centroid assignment (map-side) then the
    per-cluster per-dimension mean (ONE distributed partial aggregation;
    only K*DIM rounded scalars reach the driver)."""
    rows = (
        _assigned_df(emb, centroids)
        .select("cluster", F.posexplode("e").alias("i", "x"))
        .groupBy("cluster", "i")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .collect()
    )
    new = [list(c) for c in centroids]  # empty cluster keeps its centroid
    for r in rows:
        new[r["cluster"]][r["i"]] = r["m"]
    return new


def _fit(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    init = (
        emb.filter(F.col("vec_id") < _K).orderBy("vec_id").select("e").collect()
    )
    centroids = [list(r["e"]) for r in init]
    for _ in range(_STEPS):
        centroids = _centroid_step(emb, centroids)
    return emb, centroids


def _oracle_assign_ctes(steps: int = _STEPS) -> str:
    """CTE chain deriving the same centroid trajectory in DuckDB: cent0
    = first K vectors; each step re-assigns (rounded-dist argmin, ties
    on cid) and averages per dimension (ROUND 6dp).  Distances are
    explicit 64-term `+` chains against the centroid's c0..c63 columns —
    same association as the Spark fold, so rows are bit-identical and
    only the order-dependent AVG needs the 6dp rounding."""
    ecols = ", ".join(f"e[{i + 1}] AS c{i}" for i in range(_DIM))
    parts = [
        "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"cent0 AS (SELECT vec_id AS cid, {ecols} FROM d WHERE vec_id < {_K})",
    ]
    for k in range(steps):
        dist = " + ".join(
            f"(e[{i + 1}]-c.c{i})*(e[{i + 1}]-c.c{i})" for i in range(_DIM)
        )
        parts.append(
            f"a{k} AS (SELECT vec_id, e, cid, ROUND({dist}, 6) AS dd"
            f" FROM d CROSS JOIN cent{k} c)"
        )
        mcols = ", ".join(f"ROUND(AVG(e[{i + 1}]), 6) AS c{i}" for i in range(_DIM))
        parts.append(
            f"cent{k + 1} AS (SELECT cid, {mcols} FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, cid)"
            f" AS rk FROM a{k}) WHERE rk = 1 GROUP BY cid)"
        )
    dist = " + ".join(
        f"(e[{i + 1}]-c.c{i})*(e[{i + 1}]-c.c{i})" for i in range(_DIM)
    )
    parts.append(
        f"afin AS (SELECT vec_id, e, cid, ROUND({dist}, 6) AS dd"
        f" FROM d CROSS JOIN cent{steps} c)"
    )
    parts.append(
        "assigned AS (SELECT vec_id, e, CAST(cid AS INT) AS cluster, dd FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rk"
        " FROM afin) WHERE rk = 1)"
    )
    return ",\n".join(parts)


@register(
    "kmeans_fit",
    _oracle_assign_ctes()
    + "\nSELECT vec_id, cluster, dd AS dist FROM assigned",
)
def kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means (K=8, 2 Lloyd steps, first-K init) over the
    embedding corpus; returns every vector's final cluster and rounded
    squared distance.  The engine-portable twin of `pca2_fit`'s MLlib
    path (reference `exercise provided.ipynb` cells 12/17 are the
    fit-on-embeddings precedent); iterative fitting with the rounded
    deterministic-trajectory discipline gets a full SQL oracle."""
    emb, centroids = _fit(spark, sf_dir)
    return _assigned_df(emb, centroids).select("vec_id", "cluster", "dist")


@register(
    "semdedup",
    _oracle_assign_ctes()
    + f"""
SELECT a.vec_id AS keep_id, b.vec_id AS drop_id,
       ROUND(list_cosine_similarity(a.e, b.e), 6) AS cos
FROM assigned a JOIN assigned b
  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= {_SEM_THRESHOLD!r}
""",
)
def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup shape): near-duplicate embedding pairs
    found WITHIN k-means clusters only — the cluster id buckets the
    pair join (~N²/K candidates, an equi-join, never all-pairs), which
    is what makes embedding dedup tractable at corpus scale.  The
    lower vec_id of each pair is the kept representative.

    K=8 matches the 500-vector fixture; at corpus scale K grows with N
    (SemDeDup uses ~100k clusters) so the equi-join key stays
    high-cardinality and per-cluster fan-in stays bounded — K is the
    skew/parallelism knob, exactly like bands x buckets in MinHash-LSH."""
    emb, centroids = _fit(spark, sf_dir)
    assigned = _assigned_df(emb, centroids).select("vec_id", "e", "cluster")
    a = assigned.alias("a")
    b = assigned.alias("b")
    # same cosine formula + fold association as dedup_embedding (whose
    # oracle pairing with list_cosine_similarity is proven): filter on
    # the UNROUNDED value in both engines, round only for output
    dot = F.aggregate(
        F.zip_with(F.col("a.e"), F.col("b.e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(F.col(f"{side}.e"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / (norm("a") * norm("b"))
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
            "inner",
        )
        .select(
            F.col("a.vec_id").alias("keep_id"),
            F.col("b.vec_id").alias("drop_id"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= _SEM_THRESHOLD)
        .select("keep_id", "drop_id", F.round("cos", 6).alias("cos"))
    )


@register(
    "embedding_outliers",
    _oracle_assign_ctes()
    + """,
q AS (
  SELECT vec_id, cluster, dd,
         quantile_disc(dd, 0.25) OVER (PARTITION BY cluster) AS q1,
         quantile_disc(dd, 0.75) OVER (PARTITION BY cluster) AS q3
  FROM assigned
)
SELECT vec_id, cluster, dd AS dist, q3 + 0.75 * (q3 - q1) AS fence
FROM q WHERE dd > q3 + 0.75 * (q3 - q1)
""",
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier flagging: vectors whose squared distance
    to their k-means centroid clears the per-cluster Tukey-style upper
    fence q3 + 0.75*(q3 - q1).  The curation read on the SAME fit that
    `semdedup` consumes — semdedup removes the over-dense core
    (near-duplicates), this flags the sparse fringe (mislabeled /
    off-distribution / junk vectors a pretraining pipeline drops or
    routes to review) — together the two ends of density-based
    curation over one clustering.

    Quartiles are DISCRETE rank selections at exact-binary p (value at
    1-based rank ceil(n/4) / ceil(3n/4): Spark window rank == DuckDB
    ``quantile_disc``, the r9 discipline — no interpolation
    arithmetic to diverge), taken over the 6dp-rounded bit-identical
    distances `kmeans_fit` proved; the fence is then three IEEE ops on
    identical inputs (0.75 is exact binary), so the strict `>`
    membership test is engine-deterministic and the fence ships
    unrounded (the `mad_outliers` argument).

    Fence dial: the classical 1.5x outer fence flags NOTHING on the
    fixture at any sf — squared distances of isotropic 64-dim vectors
    concentrate (chi-square-like, low relative IQR), the same
    concentration that forced `semdedup`'s threshold to 0.25.
    0.75 (exact binary, so the fence arithmetic stays bit-portable)
    flags a real fringe (17 vectors at sf0.01, 36 at sf0.1, measured
    2026-08-16); on production trained embeddings with genuine junk
    modes the classical 1.5 is the right dial.

    100 TB shape: the assignment pass is the one corpus-sized stage
    (map-side Arrow kernel, centroids broadcast as literals); the
    quartiles are four window ops stacked over ONE cluster-keyed
    exchange of (id, cluster, dist) — K partitions of N/K skinny rows,
    K the parallelism dial exactly as in `semdedup`; output is the
    flagged fringe only."""
    emb, centroids = _fit(spark, sf_dir)
    a = _assigned_df(emb, centroids).select("vec_id", "cluster", "dist")
    w = Window.partitionBy("cluster")
    wo = Window.partitionBy("cluster").orderBy("dist", "vec_id")
    ranked = (
        a.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn(
            "q1",
            F.max(
                F.when(F.col("_rn") == F.expr("(_n + 3) div 4"), F.col("dist"))
            ).over(w),
        )
        .withColumn(
            "q3",
            F.max(
                F.when(
                    F.col("_rn") == F.expr("(3 * _n + 3) div 4"), F.col("dist")
                )
            ).over(w),
        )
    )
    fence = F.col("q3") + F.lit(0.75) * (F.col("q3") - F.col("q1"))
    return (
        ranked.withColumn("fence", fence)
        .filter(F.col("dist") > F.col("fence"))
        .select("vec_id", "cluster", "dist", "fence")
    )
