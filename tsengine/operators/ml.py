"""ML estimators/evaluators as engine operators (SURVEY.md §2 A.8).

Scope rule from SURVEY.md §0: iterative *fitting* is MLlib's job
(rows-only checked — sklearn/MLlib solver parity is approximate);
*inference with frozen parameters* is pure dataflow and gets a full SQL
oracle.  The frozen parameters here are deterministic arithmetic
stand-ins for trained weights (FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

_DIM = 64

# frozen logreg coefficients: w_i = ((i*37) % 19 - 9) / 100, b = 0.1
_W = [((i * 37) % 19 - 9) / 100.0 for i in range(_DIM)]
_B = 0.1

# frozen PCA loadings: l(k,i) = (((i+1)*(k+7)*2654435761) % 200 - 100) / 1000
_LOADINGS = [
    [(((i + 1) * (k + 7) * 2654435761) % 200 - 100) / 1000.0 for i in range(_DIM)]
    for k in (0, 1)
]


def _dot_const(vec_col: str, weights: list[float]):
    """JVM-side dot product with a constant vector: zip_with + aggregate
    over an array literal — no UDF, stays in whole-stage codegen."""
    warr = F.array(*[F.lit(w) for w in weights])
    return F.aggregate(
        F.zip_with(F.col(vec_col), warr, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@register(
    "logreg_predict",
    f"""
SELECT vec_id,
       ROUND(1.0 / (1.0 + exp(-({_B} + s))), 6) AS prob,
       CASE WHEN {_B} + s > 0 THEN 1 ELSE 0 END AS pred
FROM (
  SELECT vec_id, SUM(x * (((i * 37) % 19 - 9) / 100.0)) AS s
  FROM (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
               unnest(range(0, {_DIM})) AS i
        FROM embeddings)
  GROUP BY vec_id
)
""",
)
def logreg_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression scoring with frozen coefficients (reference
    `unsupervised.py:200-201`): sigmoid(b + w·x) is a plain projection."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    s = _dot_const("e", _W)
    return emb.select(
        "vec_id",
        F.round(1.0 / (1.0 + F.exp(-(F.lit(_B) + s))), 6).alias("prob"),
        F.when(F.lit(_B) + s > 0, 1).otherwise(0).alias("pred"),
    )


@register(
    "pca2_apply",
    f"""
SELECT vec_id,
       ROUND(SUM(x * ((((i + 1) * 7 * 2654435761) % 200 - 100) / 1000.0)), 6) AS pc1,
       ROUND(SUM(x * ((((i + 1) * 8 * 2654435761) % 200 - 100) / 1000.0)), 6) AS pc2
FROM (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
             unnest(range(0, {_DIM})) AS i
      FROM embeddings)
GROUP BY vec_id
""",
)
def pca2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection with frozen loadings (reference `exercise
    provided.ipynb` cells 12/17: 2-component PCA of context vectors) —
    two dot products per row."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return emb.select(
        "vec_id",
        F.round(_dot_const("e", _LOADINGS[0]), 6).alias("pc1"),
        F.round(_dot_const("e", _LOADINGS[1]), 6).alias("pc2"),
    )


# ---------------------------------------------------------------------------
# MLlib fits — iterative, driver-coordinated; rows-only checked
# ---------------------------------------------------------------------------


def _features_df(spark: SparkSession, sf_dir: str, binary: bool) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    label = (F.col("label") % 2).cast("double") if binary else F.col("label").cast("double")
    return emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        label.alias("label"),
    )


# --- deterministic full-batch gradient-descent logreg fit -----------------

_LR_STEPS = 3
_LR_RATE = 0.5


def _logreg_fit_oracle_sql(steps: int = _LR_STEPS, lr: float = _LR_RATE) -> str:
    """DuckDB twin of the deterministic GD fit.  The weights are
    data-derived, so (unlike the frozen-kernel oracles) they cannot be
    literals: each step's gradient is an aggregate CTE and the updated
    weights a 1-row CTE cross-joined into the next step.  Per-row
    arithmetic is written with the exact association of the Spark fold
    (``b + (t0 + t1 + ...)`` left-assoc == ``aggregate`` seeded 0.0), so
    rows are bit-identical; only the gradient AVG is order-dependent and
    both engines ROUND it to 6dp before it enters the weights."""
    wl = [repr(w) for w in _W]
    parts = [
        "WITH d AS (SELECT embedding::DOUBLE[] AS e,"
        " CAST(label % 2 AS INT) AS y FROM embeddings)"
    ]
    prev = None  # None => step-0 literal weights
    for k in range(1, steps + 1):
        if prev is None:
            dot = " + ".join(f"({wl[i]})*e[{i + 1}]" for i in range(_DIM))
            bexpr, src = f"({_B!r})", "d"
        else:
            dot = " + ".join(f"{prev}.c{i}*e[{i + 1}]" for i in range(_DIM))
            bexpr, src = f"{prev}.cb", f"d CROSS JOIN {prev}"
        parts.append(
            f"err{k} AS (SELECT e, y,"
            f" 1.0/(1.0 + EXP(-({bexpr} + ({dot})))) - y AS err FROM {src})"
        )
        gcols = ", ".join(
            f"ROUND(AVG(err*e[{i + 1}]), 6) AS g{i}" for i in range(_DIM)
        )
        parts.append(
            f"g{k} AS (SELECT {gcols}, ROUND(AVG(err), 6) AS gb FROM err{k})"
        )
        if prev is None:
            wcols = ", ".join(
                f"({wl[i]}) - ({lr!r})*g{i} AS c{i}" for i in range(_DIM)
            )
            parts.append(
                f"w{k} AS (SELECT {wcols}, ({_B!r}) - ({lr!r})*gb AS cb FROM g{k})"
            )
        else:
            wcols = ", ".join(
                f"{prev}.c{i} - ({lr!r})*g{k}.g{i} AS c{i}" for i in range(_DIM)
            )
            parts.append(
                f"w{k} AS (SELECT {wcols}, {prev}.cb - ({lr!r})*g{k}.gb AS cb"
                f" FROM g{k} CROSS JOIN {prev})"
            )
        prev = f"w{k}"
    dot = " + ".join(f"{prev}.c{i}*e[{i + 1}]" for i in range(_DIM))
    return (
        ",\n".join(parts)
        + f""",
scored AS (SELECT y, 1.0/(1.0 + EXP(-({prev}.cb + ({dot})))) AS prob
           FROM d CROSS JOIN {prev})
SELECT y AS label, CASE WHEN prob > 0.5 THEN 1 ELSE 0 END AS pred,
       COUNT(*) AS n, ROUND(AVG(prob), 6) AS avg_prob
FROM scored GROUP BY 1, 2
"""
    )


@register("logreg_fit", _logreg_fit_oracle_sql())
def logreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit binary logistic regression by deterministic full-batch
    gradient descent (reference sklearn LogisticRegression at
    `unsupervised.py:196-198`; `supervised.py:155-157`), warm-started
    from the frozen coefficients.

    Each step is ONE distributed aggregation — posexplode(features ++
    [1.0]) -> per-component partial sums combined map-side, with only
    the 65 aggregated gradient scalars reduced to the driver (the same
    dataflow shape as MLlib's treeAggregate; data rows never leave
    executors).  Gradients are rounded to 6dp before the update in BOTH
    engines so the weight trajectory is engine-portable (SURVEY.md
    §4.4), which upgrades an iterative *fit* from rows-only to a full
    SQL-oracle check.  The MLlib LBFGS estimator path is retained as
    `logreg_fit_mllib`."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e"),
        (F.col("label") % 2).cast("int").alias("y"),
    )
    w, b = list(_W), _B
    for _ in range(_LR_STEPS):
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(b) + _dot_const("e", w))))
        grad_rows = (
            emb.select(
                (prob - F.col("y")).alias("err"),
                F.concat(F.col("e"), F.array(F.lit(1.0))).alias("xe"),
            )
            .select("err", F.posexplode("xe").alias("i", "x"))
            .groupBy("i")
            .agg(F.round(F.avg(F.col("err") * F.col("x")), 6).alias("g"))
            .collect()
        )
        g = {r["i"]: r["g"] for r in grad_rows}
        w = [wi - _LR_RATE * g[i] for i, wi in enumerate(w)]
        b = b - _LR_RATE * g[_DIM]
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(b) + _dot_const("e", w))))
    return (
        emb.select("y", prob.alias("prob"))
        .select(
            F.col("y").alias("label"),
            F.when(F.col("prob") > 0.5, 1).otherwise(0).alias("pred"),
            "prob",
        )
        .groupBy("label", "pred")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("prob"), 6).alias("avg_prob"),
        )
    )


@register("logreg_fit_mllib", None)
def logreg_fit_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib LBFGS logistic regression (the production estimator path
    for `unsupervised.py:196-198`).  Rows-only: solver trajectories are
    not oracle-reproducible (SURVEY.md §2 A.8)."""
    from pyspark.ml.classification import LogisticRegression

    df = _features_df(spark, sf_dir, binary=True)
    model = LogisticRegression(maxIter=20, regParam=0.01).fit(df)
    pred = model.transform(df)
    return pred.groupBy("label", "prediction").count()


# --- frozen-weight MLP forward pass (ClassifierNN inference) --------------

_MLP_LAYERS = (_DIM, 32, 16, 10)
_MLP_SEED = 2024


def mlp_weights(seed: int = _MLP_SEED) -> list[tuple["np.ndarray", "np.ndarray"]]:
    """Seeded Kaiming-style frozen parameters for the 64->32->16->10
    classifier head (deterministic stand-in for trained weights,
    FIXTURES.md §3 — numpy Philox is platform-stable)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    for n_in, n_out in zip(_MLP_LAYERS, _MLP_LAYERS[1:]):
        k = (1.0 / n_in) ** 0.5
        out.append(
            (rng.uniform(-k, k, size=(n_out, n_in)), rng.uniform(-k, k, size=n_out))
        )
    return out


def _mlp_oracle_sql() -> str:
    """DuckDB twin of the frozen MLP forward pass, generated from the
    same weight arrays the Spark kernel uses (repr() round-trips
    doubles exactly) — the `_gru_oracle_sql` technique applied to the
    chained matmul+ReLU.  The BLAS matmul and the SQL sum chain differ
    at ulp scale; outputs are integers (argmax counts) plus a 6dp-
    rounded mean confidence, so ulp drift cannot surface."""
    ws = mlp_weights()

    def layer(prev_cols: list[str], W, b, relu: bool, prefix: str) -> list[str]:
        exprs = []
        for j in range(W.shape[0]):
            dot = " + ".join(
                f"({W[j, i]!r})*{prev_cols[i]}" for i in range(W.shape[1])
            )
            e = f"(({b[j]!r}) + ({dot}))"
            if relu:
                e = f"GREATEST(0.0, {e})"
            exprs.append(f"{e} AS {prefix}{j}")
        return exprs

    x = [f"e[{i + 1}]" for i in range(_DIM)]
    h1 = layer(x, ws[0][0], ws[0][1], True, "h1_")
    h2 = layer([f"h1_{j}" for j in range(32)], ws[1][0], ws[1][1], True, "h2_")
    lg = layer([f"h2_{j}" for j in range(16)], ws[2][0], ws[2][1], False, "l")
    lmax = "GREATEST(" + ", ".join(f"l{j}" for j in range(10)) + ")"
    pred = (
        "CASE " + lmax + " "
        + " ".join(f"WHEN l{j} THEN {j}" for j in range(10))
        + " END"
    )
    conf_den = " + ".join(f"EXP(l{j} - lmax)" for j in range(10))
    return f"""
WITH d AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
h1 AS (SELECT label, {", ".join(h1)} FROM d),
h2 AS (SELECT label, {", ".join(h2)} FROM h1),
lg AS (SELECT label, {", ".join(lg)} FROM h2),
p AS (SELECT label, {pred} AS pred, {lmax} AS lmax,
             {", ".join(f"l{j}" for j in range(10))} FROM lg)
SELECT label, pred, COUNT(*) AS n,
       ROUND(AVG(1.0/({conf_den})), 6) AS avg_conf
FROM p GROUP BY label, pred
"""


def mlp_forward_np(X: "np.ndarray") -> "np.ndarray":
    """ReLU(W2·ReLU(W1·x+b1)+b2)·W3+b3 — logits [n, 10], batch BLAS."""
    import numpy as np

    h = X
    for li, (W, b) in enumerate(mlp_weights()):
        h = h @ W.T + b
        if li < len(_MLP_LAYERS) - 2:
            h = np.maximum(h, 0.0)
    return h


@register("mlp_fit_predict", _mlp_oracle_sql())
def mlp_fit_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hidden-layer MLP classifier forward pass (reference
    ClassifierNN 32->64->64->2 at `unsupervised.py:171-183, 205-234`;
    here 64->32->16->10 on the 10-class embeddings fixture) with frozen
    seeded weights — inference is pure dataflow, so it gets a full
    generated-SQL oracle (chained matmul+ReLU as literal expression
    trees, the `gru_context` technique).  One Arrow mapInPandas batch
    matmul, map-side only, then a 20-group aggregate: the 100 TB path.
    The iterative MLlib estimator is retained as `mlp_fit_mllib`."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            logits = mlp_forward_np(X)
            lmax = logits.max(axis=1)
            conf = 1.0 / np.exp(logits - lmax[:, None]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "label": pdf["label"].to_numpy(),
                    "pred": logits.argmax(axis=1).astype(np.int32),
                    "conf": conf,
                }
            )

    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    scored = emb.mapInPandas(fn, schema="label int, pred int, conf double")
    return scored.groupBy("label", "pred").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("conf"), 6).alias("avg_conf"),
    )


@register("mlp_fit_mllib", None)
def mlp_fit_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative MLlib MultilayerPerceptronClassifier fit (the
    production estimator path), seeded for determinism.  Rows-only:
    solver trajectories are not oracle-reproducible."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier

    df = _features_df(spark, sf_dir, binary=False)
    mlp = MultilayerPerceptronClassifier(
        layers=[_DIM, 32, 16, 10], maxIter=30, seed=42, blockSize=64
    )
    model = mlp.fit(df)
    return model.transform(df).groupBy("label", "prediction").count()


@register("pca2_fit", None)
def pca2_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit 2-component PCA (reference cells 12/17) via MLlib —
    eigendecomposition of the covariance; returns per-component
    explained variance (rows-only; sign/rotation is solver-defined)."""
    from pyspark.ml.feature import PCA

    df = _features_df(spark, sf_dir, binary=True)
    model = PCA(k=2, inputCol="features", outputCol="pc").fit(df)
    ev = model.explainedVariance
    return spark.createDataFrame(
        [(i, round(float(v), 6)) for i, v in enumerate(ev)],
        ["component", "explained_variance"],
    )


def roc_auc_mllib(preds: DataFrame, score_col: str = "score", label_col: str = "label") -> float:
    """MLlib evaluator twin of the rank-sum `roc_auc` operator —
    parity asserted in tests/test_metrics.py."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.functions import array_to_vector

    df = preds.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(
            F.array(1.0 - F.col(score_col), F.col(score_col))
        ).alias("rawPrediction"),
    )
    ev = BinaryClassificationEvaluator(metricName="areaUnderROC")
    return ev.evaluate(df)
