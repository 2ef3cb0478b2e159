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


@register("logreg_fit", None)
def logreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit binary logistic regression on the embedding features
    (reference sklearn LogisticRegression at `unsupervised.py:196-198`
    -> MLlib LogisticRegression).  Rows-only: solver trajectories are
    not oracle-reproducible (SURVEY.md §2 A.8)."""
    from pyspark.ml.classification import LogisticRegression

    df = _features_df(spark, sf_dir, binary=True)
    model = LogisticRegression(maxIter=20, regParam=0.01).fit(df)
    pred = model.transform(df)
    return pred.groupBy("label", "prediction").count()


@register("mlp_fit_predict", None)
def mlp_fit_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hidden-layer MLP classifier (reference ClassifierNN
    32->64->64->2 at `unsupervised.py:171-183` -> MLlib
    MultilayerPerceptronClassifier 64->32->16->10 on the 10-class
    embeddings fixture), seeded for determinism."""
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
