"""Shared DuckDB CTE fragments for oracle SQL.

Each fragment mirrors (bit-for-bit) a Spark-side fixture builder:
  * ``wearable_long``   ↔ tsengine.sources.wearable.wearable_long
  * ``unsup_metrics``   ↔ tsengine.operators.relational.unsup_metrics
  * ``sup_metrics``     ↔ tsengine.operators.relational.sup_metrics
  * ``window_preds``    ↔ tsengine.operators.metrics.window_preds

Discipline: only arithmetic both engines evaluate identically (IEEE
double ops, integer %, FLOOR-before-CAST), floats rounded at the output
boundary (SURVEY.md §4.4).
"""

from __future__ import annotations

from tsengine.sources.wearable import wearable_long_sql

# Result-table fixture shaped like UNSUPERVISED.csv (reference
# `unsupervised.py:485`): (n_epochs, model, classification, batch_size,
# roc_auc), derived deterministically from lineitem.
UNSUP_METRICS_CTE = """
unsup_metrics AS (
  SELECT month(l_shipdate) % 10 AS n_epochs,
         CASE l_returnflag WHEN 'R' THEN 'T_CPC' WHEN 'A' THEN 'TS_CPC' ELSE 'S_CPC' END AS model,
         CASE WHEN l_linestatus = 'O' THEN 'LogisticRegression' ELSE 'ClassifierNN' END AS classification,
         1024 AS batch_size,
         ROUND(0.5 + AVG(l_discount) * 5, 6) AS roc_auc
  FROM lineitem
  GROUP BY 1, 2, 3, 4
)"""

# Result-table fixture shaped like SUPERVISED.csv (reference
# `supervised.py:395` — no classification column), from orders.
SUP_METRICS_CTE = """
sup_metrics AS (
  SELECT month(o_orderdate) % 10 AS n_epochs,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'T_CPC'
              WHEN o_orderpriority = '3-MEDIUM' THEN 'TS_CPC'
              ELSE 'S_CPC' END AS model,
         1024 AS batch_size,
         ROUND(0.5 + AVG(fmod(o_totalprice, 100000.0)) / 250000, 6) AS roc_auc
  FROM orders
  GROUP BY 1, 2, 3
)"""

# Per-window (pred, label) pairs from a fixed arithmetic classifier —
# the stand-in for "model predictions" so metric aggregations
# (accuracy_agg, classification_report, roc_auc) are pure functions.
WINDOW_PREDS_CTE = """
window_preds AS (
  SELECT window_id,
         MAX(label) AS label,
         CASE WHEN AVG(CAST(ibi AS DOUBLE)) > 1050 THEN 1 ELSE 0 END AS pred,
         ROUND(AVG(CAST(ibi AS DOUBLE)) / 1500, 6) AS score
  FROM wearable_long
  GROUP BY window_id
)"""


def with_ctes(*frags: str) -> str:
    """Compose a WITH clause; ``wearable`` is always available first."""
    parts = [wearable_long_sql()]
    parts += [f.strip() for f in frags]
    return "WITH " + ",\n".join(p.strip() for p in parts)
