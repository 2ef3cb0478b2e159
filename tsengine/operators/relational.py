"""Relational core: scans, filters, aggregations, joins, set ops over
result tables (SURVEY.md §2 A.1, A.5, A.6 partial, A.7).

Everything here is pure ``pyspark.sql.functions`` — whole-stage-codegen
territory; Catalyst provides pushdown/pruning/broadcast for free
(SURVEY.md §4.2).  Each operator registers its DuckDB oracle twin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsengine.oracle.frags import SUP_METRICS_CTE, UNSUP_METRICS_CTE, with_ctes
from tsengine.registry import register
from tsengine.sources.tables import load_table, sf_scoped_dir
from tsengine.sources.wearable import wearable_long, wearable_wide

# ---------------------------------------------------------------------------
# fixtures: result tables shaped like the reference's CSVs
# ---------------------------------------------------------------------------


def unsup_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNSUPERVISED.csv-shaped table (reference `unsupervised.py:485`:
    ['n_Epochs','Model','Classification','Batch Size','ROC_AUC']),
    derived deterministically from lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            (F.month("l_shipdate") % 10).alias("n_epochs"),
            F.when(F.col("l_returnflag") == "R", "T_CPC")
            .when(F.col("l_returnflag") == "A", "TS_CPC")
            .otherwise("S_CPC")
            .alias("model"),
            F.when(F.col("l_linestatus") == "O", "LogisticRegression")
            .otherwise("ClassifierNN")
            .alias("classification"),
            F.lit(1024).alias("batch_size"),
        )
        .agg(F.round(F.lit(0.5) + F.avg("l_discount") * 5, 6).alias("roc_auc"))
    )


def sup_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPERVISED.csv-shaped table (reference `supervised.py:395` — no
    classification column), derived from orders."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            (F.month("o_orderdate") % 10).alias("n_epochs"),
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "T_CPC")
            .when(F.col("o_orderpriority") == "3-MEDIUM", "TS_CPC")
            .otherwise("S_CPC")
            .alias("model"),
            F.lit(1024).alias("batch_size"),
        )
        .agg(
            F.round(F.lit(0.5) + F.avg(F.col("o_totalprice") % 100000.0) / 250000, 6).alias(
                "roc_auc"
            )
        )
    )


def windows_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per derived wearable window (window-level view)."""
    return (
        wearable_long(spark, sf_dir)
        .select("patient_id", "window_id", "label", "split")
        .distinct()
    )


_WINDOWS_CTE = """
windows AS (
  SELECT DISTINCT patient_id, window_id, label, split FROM wearable_long
)"""


# ---------------------------------------------------------------------------
# A.1 sources / sinks
# ---------------------------------------------------------------------------


@register(
    "scan_examples",
    with_ctes() + "\nSELECT * FROM wearable_long",
)
def scan_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the windowed-sequence table (reference loads pickle at
    `unsupervised.py:379-392`; here: parquet scan + window derivation)."""
    return wearable_long(spark, sf_dir)


_CSV_DIR = os.environ.get("TSENGINE_CSV_DIR", "/tmp/tsengine_csv")

_CSV_SCHEMA = T.StructType(
    [
        T.StructField("n_epochs", T.IntegerType()),
        T.StructField("model", T.StringType()),
        T.StructField("classification", T.StringType()),
        T.StructField("batch_size", T.IntegerType()),
        T.StructField("roc_auc", T.DoubleType()),
    ]
)


@register(
    "scan_csv_results",
    with_ctes(UNSUP_METRICS_CTE)
    + "\nSELECT CAST(n_epochs AS INTEGER) AS n_epochs, model, classification,"
    "\n       CAST(batch_size AS INTEGER) AS batch_size, roc_auc"
    "\nFROM unsup_metrics",
)
def scan_csv_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + scan round trip (reference `unsupervised.py:485-493`:
    results DataFrame -> to_csv -> read_csv).  The Spark path writes the
    metric table to CSV and reads it back with an explicit schema; the
    oracle recomputes the same table directly — verifying round-trip
    fidelity of the sink."""
    out = sf_scoped_dir(_CSV_DIR, sf_dir, "unsup_metrics")
    df = unsup_metrics(spark, sf_dir).select(
        F.col("n_epochs").cast("int"),
        "model",
        "classification",
        F.col("batch_size").cast("int"),
        "roc_auc",
    )
    write_csv_single(df, out)
    return spark.read.csv(out, header=True, schema=_CSV_SCHEMA)


def write_csv_single(df: DataFrame, path: str) -> None:
    """CSV sink helper (reference `unsupervised.py:485-488`): write a
    small metric table as a single-header CSV.  coalesce(1) is correct
    here — metric tables are tiny by construction; large outputs keep
    their parallelism."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


_SUP_CSV_SCHEMA = T.StructType(
    [
        T.StructField("n_epochs", T.IntegerType()),
        T.StructField("model", T.StringType()),
        T.StructField("batch_size", T.IntegerType()),
        T.StructField("roc_auc", T.DoubleType()),
    ]
)


@register(
    "sink_csv_results",
    with_ctes(SUP_METRICS_CTE)
    + "\nSELECT CAST(n_epochs AS INTEGER) AS n_epochs, model,"
    "\n       CAST(batch_size AS INTEGER) AS batch_size, roc_auc"
    "\nFROM sup_metrics",
)
def sink_csv_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink fidelity check (reference `supervised.py:395-398`:
    results DataFrame -> to_csv, index=False).  Writes the SUPERVISED-
    shaped metric table to a header CSV and reads it back with an
    explicit schema; the oracle recomputes the table directly, so a
    hash match proves the sink loses nothing (types, header, values)."""
    out = sf_scoped_dir(_CSV_DIR, sf_dir, "sup_metrics")
    df = sup_metrics(spark, sf_dir).select(
        F.col("n_epochs").cast("int"),
        "model",
        F.col("batch_size").cast("int"),
        "roc_auc",
    )
    write_csv_single(df, out)
    return spark.read.csv(out, header=True, schema=_SUP_CSV_SCHEMA)


_JSON_DIR = os.environ.get("TSENGINE_JSON_DIR", "/tmp/tsengine_json")

_JSON_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("text_md5", T.StringType()),
    ]
)


@register(
    "scan_json",
    """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, md5(text) AS text_md5
FROM documents
""",
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON source round trip (engine extension — the reference has no
    JSON I/O, SURVEY.md §2 Part B): write the documents metadata as
    newline-delimited JSON, read it back with an explicit schema.  The
    oracle recomputes the table from parquet directly, so a hash match
    proves the JSON sink+scan is lossless (ids, strings, md5 of the
    full text).  NDJSON is line-splittable — at 100 TB each file chunk
    scans in parallel exactly like the CSV/parquet paths."""
    out = sf_scoped_dir(_JSON_DIR, sf_dir, "documents")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long"),
        F.md5("text").alias("text_md5"),
    )
    docs.coalesce(1).write.mode("overwrite").json(out)
    return spark.read.json(out, schema=_JSON_SCHEMA)


_ORC_DIR = os.environ.get("TSENGINE_ORC_DIR", "/tmp/tsengine_orc")

_XML_DIR = os.environ.get("TSENGINE_XML_DIR", "/tmp/tsengine_xml")
_XML_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderpriority string"
)


@register(
    "scan_xml",
    """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
""",
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source round trip (engine extension — Spark 4's built-in XML
    datasource, the third row-oriented text format beside CSV/NDJSON):
    write the orders projection as XML row elements, read it back with
    an EXPLICIT schema (inference would re-derive types per run).  The
    oracle recomputes the projection from parquet, so a hash match
    proves the XML sink+scan preserves int64, double and string values
    exactly — doubles survive because the writer emits Java's
    shortest-roundtrip decimal form, which parseDouble restores
    bit-identically.  XML files split per row tag, so chunked parallel
    scan behaves like the NDJSON path at 100 TB (row-tag framing is
    the XML analog of NDJSON's line framing)."""
    out = sf_scoped_dir(_XML_DIR, sf_dir, "orders")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    o.write.mode("overwrite").format("xml").option("rowTag", "order").save(out)
    return (
        spark.read.schema(_XML_SCHEMA)
        .format("xml")
        .option("rowTag", "order")
        .load(out)
    )



@register(
    "scan_orc",
    """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
""",
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source round trip (engine extension — second columnar format
    beside parquet): write the orders projection as ORC, read it back.
    The oracle recomputes the projection from parquet directly, so a
    hash match proves the ORC sink+scan preserves every type exactly
    (int64, double, strings).  ORC stripes are splittable and carry
    min/max indexes, so pushdown and parallel scan behave like the
    parquet path at 100 TB."""
    out = sf_scoped_dir(_ORC_DIR, sf_dir, "orders")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    o.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@register(
    "sink_metrics_log",
    """
SELECT event_type AS metric,
       CAST(hour(ts) AS INTEGER) AS step,
       ROUND(AVG(value), 6) AS value,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
""",
)
def sink_metrics_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only metrics log (reference wandb.log at
    `unsupervised.py:247-263`): per-step metric key/value rows."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("metric"), F.hour("ts").alias("step")
    ).agg(F.round(F.avg("value"), 6).alias("value"), F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# A.5 filters
# ---------------------------------------------------------------------------


@register(
    "patient_in_set",
    with_ctes(_WINDOWS_CTE)
    + "\nSELECT * FROM windows WHERE patient_id IN (145, 106, 116, 176, 6, 11)",
)
def patient_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit patient-list filter (reference `exercise provided.ipynb`
    cell 12: boolean-OR mask over 4 patient ids -> isin). Pushed down to
    the parquet scan by Catalyst."""
    return windows_table(spark, sf_dir).filter(
        F.col("patient_id").isin(145, 106, 116, 176, 6, 11)
    )


@register(
    "patient_gt",
    with_ctes(_WINDOWS_CTE) + "\nSELECT * FROM windows WHERE patient_id > 100",
)
def patient_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate (reference cell 17: patient_id > 100)."""
    return windows_table(spark, sf_dir).filter(F.col("patient_id") > 100)


@register(
    "class_mask",
    with_ctes(_WINDOWS_CTE) + "\nSELECT * FROM windows WHERE label = 0",
)
def class_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class row selection (reference `unsupervised.py:277-278`:
    X_test[Y_test == 0])."""
    return windows_table(spark, sf_dir).filter(F.col("label") == 0)


@register(
    "model_subset",
    with_ctes(UNSUP_METRICS_CTE) + "\nSELECT * FROM unsup_metrics WHERE model = 'T_CPC'",
)
def model_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter on a dimension column (reference
    `supervised.py:413`: df[df['Model'] == model])."""
    return unsup_metrics(spark, sf_dir).filter(F.col("model") == "T_CPC")


# ---------------------------------------------------------------------------
# A.6 aggregations (window-level; classifier metrics live in metrics.py)
# ---------------------------------------------------------------------------


@register(
    "label_counts",
    with_ctes(_WINDOWS_CTE)
    + "\nSELECT label, COUNT(*) AS n_windows FROM windows GROUP BY label",
)
def label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count windows per class (reference cell 6: (labellist==1).sum())."""
    return windows_table(spark, sf_dir).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_windows")
    )


@register(
    "prevalence",
    with_ctes(_WINDOWS_CTE)
    + "\nSELECT ROUND(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)"
    " AS prevalence FROM windows",
)
def prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive-class prevalence (reference cell 7: 328/1805 = 0.1817)."""
    return windows_table(spark, sf_dir).agg(
        F.round(
            F.sum(F.when(F.col("label") == 1, 1).otherwise(0)) / F.count(F.lit(1)), 6
        ).alias("prevalence")
    )


@register(
    "avg_loss",
    "SELECT event_type, ROUND(AVG(value), 6) AS avg_loss, COUNT(*) AS n_batches"
    " FROM events GROUP BY event_type",
)
def avg_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum/count -> mean per group (reference
    `unsupervised.py:62-63, 84`: total_loss/batch_count).  Catalyst
    plans this as partial (map-side) + final aggregation — the
    at-scale shape of every metric mean."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("avg_loss"),
        F.count(F.lit(1)).alias("n_batches"),
    )


@register(
    "hist_bins",
    """
SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bin, COUNT(*) AS n
FROM events GROUP BY 1
""",
)
def hist_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (reference `supervised.py:203-204`: 30-bin
    score histograms per class)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 10.0).cast("bigint").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "batch_union_collect",
    with_ctes(_WINDOWS_CTE) + "\nSELECT * FROM windows",
)
def batch_union_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate per-batch chunks (reference torch.cat at
    `unsupervised.py:87-88`) = UNION ALL.  In Spark batches are
    partitions, so the union of disjoint splits is a no-op plan-wise —
    demonstrated by splitting and re-unioning."""
    w = windows_table(spark, sf_dir)
    return w.filter(F.col("patient_id") % 2 == 0).unionAll(
        w.filter(F.col("patient_id") % 2 == 1)
    )


# ---------------------------------------------------------------------------
# A.7 grouping / distinct / joins / set ops
# ---------------------------------------------------------------------------


@register(
    "distinct_models",
    with_ctes(UNSUP_METRICS_CTE) + "\nSELECT DISTINCT model FROM unsup_metrics",
)
def distinct_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct dimension values (reference `supervised.py:412`:
    df['Model'].unique())."""
    return unsup_metrics(spark, sf_dir).select("model").distinct()


@register(
    "grid_product",
    with_ctes(UNSUP_METRICS_CTE)
    + """
SELECT m.model, c.classification, b.batch_size
FROM (SELECT DISTINCT model FROM unsup_metrics) m
CROSS JOIN (VALUES ('LogisticRegression'), ('ClassifierNN')) c(classification)
CROSS JOIN (VALUES (64), (256), (1024)) b(batch_size)
""",
)
def grid_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperparameter grid = cross join of small dims (reference
    itertools.product at `unsupervised.py:430`).  Dimension sides are
    broadcast — no shuffle."""
    models = unsup_metrics(spark, sf_dir).select("model").distinct()
    classifiers = spark.createDataFrame(
        [("LogisticRegression",), ("ClassifierNN",)], ["classification"]
    )
    batch_sizes = spark.createDataFrame([(64,), (256,), (1024,)], ["batch_size"])
    # broadcast: keeps the product a nested-loop over tiny in-memory dims
    # instead of multiplying partition counts (32x32 tasks otherwise)
    return models.crossJoin(F.broadcast(classifiers)).crossJoin(F.broadcast(batch_sizes))


@register(
    "unsup_sup_join",
    with_ctes(UNSUP_METRICS_CTE, SUP_METRICS_CTE)
    + """
SELECT u.model, u.n_epochs,
       MAX(u.roc_auc) AS unsup_auc,
       MAX(s.roc_auc) AS sup_auc
FROM unsup_metrics u
JOIN sup_metrics s ON u.model = s.model AND u.n_epochs = s.n_epochs
GROUP BY u.model, u.n_epochs
""",
)
def unsup_sup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair unsupervised vs supervised AUC curves per (model, epoch) —
    the reference's filter-per-key loop in `un-sup comparison.ipynb`
    evaluated as a proper inner equi-join (broadcast: both sides tiny)."""
    u = unsup_metrics(spark, sf_dir)
    s = sup_metrics(spark, sf_dir)
    joined = u.join(
        F.broadcast(s.select("model", "n_epochs", F.col("roc_auc").alias("sup_auc"))),
        ["model", "n_epochs"],
    )
    # MAX (order-insensitive, exact) — never re-average already-rounded
    # floats: a second rounding can land on a half-ulp boundary and
    # diverge between engines
    return joined.groupBy("model", "n_epochs").agg(
        F.max("roc_auc").alias("unsup_auc"),
        F.max("sup_auc").alias("sup_auc"),
    )


@register(
    "results_append",
    with_ctes(UNSUP_METRICS_CTE, SUP_METRICS_CTE)
    + """
SELECT n_epochs, model, classification, batch_size, roc_auc, 'unsupervised' AS source
FROM unsup_metrics
UNION ALL
SELECT n_epochs, model, 'finetune' AS classification, batch_size, roc_auc, 'supervised' AS source
FROM sup_metrics
""",
)
def results_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulate result rows across runs (reference
    `unsupervised.py:478-479`) = UNION ALL of result tables."""
    u = unsup_metrics(spark, sf_dir).withColumn("source", F.lit("unsupervised"))
    s = (
        sup_metrics(spark, sf_dir)
        .withColumn("classification", F.lit("finetune"))
        .withColumn("source", F.lit("supervised"))
        .select("n_epochs", "model", "classification", "batch_size", "roc_auc", "source")
    )
    return u.unionByName(s)


@register(
    "train_test_tables",
    with_ctes(_WINDOWS_CTE)
    + """
SELECT split, COUNT(*) AS n_windows, COUNT(DISTINCT patient_id) AS n_patients
FROM windows GROUP BY split
""",
)
def train_test_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic patient-level train/test split (reference keeps two
    pickles split upstream at patient level, `unsupervised.py:379-386`).
    Split is a pure function of patient_id (% 10 < 8), never rand()."""
    return windows_table(spark, sf_dir).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.countDistinct("patient_id").alias("n_patients"),
    )


# ---------------------------------------------------------------------------
# A.2 scalar projections over result tables
# ---------------------------------------------------------------------------


@register(
    "label_concat",
    with_ctes(UNSUP_METRICS_CTE)
    + "\nSELECT DISTINCT model || ' | ' || classification AS model_clf FROM unsup_metrics",
)
def label_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String concat with separator (reference `unsupervised.py:495`:
    Model + ' | ' + Classification)."""
    return (
        unsup_metrics(spark, sf_dir)
        .select(F.concat_ws(" | ", "model", "classification").alias("model_clf"))
        .distinct()
    )


@register(
    "lr_scale",
    """
SELECT batch_size, ROUND(CAST(batch_size AS DOUBLE) / 1024 * 0.001, 9) AS lr
FROM (VALUES (64), (256), (1024)) b(batch_size)
""",
)
def lr_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column arithmetic (reference `unsupervised.py:442`:
    lr = (bs/1024)*lrl)."""
    bs = spark.createDataFrame([(64,), (256,), (1024,)], ["batch_size"])
    return bs.select(
        "batch_size",
        F.round(F.col("batch_size").cast("double") / 1024 * 0.001, 9).alias("lr"),
    )


@register(
    "sink_partitioned",
    """
SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM events
WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-pruned scan —
    the at-rest layout a 100 TB event table actually uses (engine
    extension; the reference persists via pickle, `unsupervised.py:379`).

    Writes events partitioned by ``event_type``, reads back with an
    equality filter on the partition column — Catalyst prunes to the one
    matching directory (PartitionFilters in the scan; pinned by the plan
    contract test) so the query touches 1/5 of the files — then
    aggregates.  The oracle recomputes from the source table directly:
    a hash match proves the partitioned round trip loses nothing."""
    import hashlib

    ev = load_table(spark, sf_dir, "events")
    # key the sink on a digest of the FULL sf_dir (two roots sharing a
    # basename, or concurrent runs over them, must not race on the same
    # mode('overwrite') directory); note the write happens eagerly here
    # at plan-build time
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    out = os.path.join(_CSV_DIR, f"events_by_type_{tag}")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


@register(
    "dpp_pruned_scan",
    """
WITH dim AS (
  SELECT event_type FROM events GROUP BY event_type HAVING AVG(value) > 50
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(e.value), 6) AS sum_value
FROM events e JOIN dim USING (event_type)
GROUP BY e.event_type
""",
)
def dpp_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning — the second Catalyst runtime-filter
    pillar next to `bloom_pruned_join`: a fact table partitioned on the
    join key, joined to a dimension whose qualifying keys are only
    known at RUNTIME (types with mean value > 50), so static pruning is
    impossible; Catalyst plants a ``dynamicpruning`` subquery in the
    fact scan's PartitionFilters (SubqueryAdaptiveBroadcast reusing the
    broadcast dim), and entire partition directories are skipped before
    a single row is read.  At 100 TB this is THE dominant scan-cost
    lever for star-schema layouts (date/tenant/type-partitioned event
    tables).  Pinned by tests/test_plan_contracts.py.

    The partitioned at-rest copy is written eagerly at plan-build time
    (the `sink_partitioned` layout); the oracle recomputes from the
    source table directly — a hash match proves both the round trip and
    the pruned join lose nothing.  DPP is on by default
    (``spark.sql.optimizer.dynamicPartitionPruning.enabled``) — no conf
    scoping needed, unlike the size-gated bloom rewrite."""
    import hashlib

    ev = load_table(spark, sf_dir, "events")
    # key the copy on a CONTENT fingerprint of the source (path + every
    # file's name/size/mtime): repeat calls in a sweep reuse the copy,
    # while regenerated testdata gets a fresh directory — a stale
    # at-rest copy can never silently diverge from the oracle's source
    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    h = hashlib.md5(src.encode())
    paths = (
        [os.path.join(r, f) for r, _d, fs in sorted(os.walk(src)) for f in sorted(fs)]
        if os.path.isdir(src)
        else [src]
    )
    for p in paths:
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}".encode())
    out = os.path.join(_CSV_DIR, f"events_dpp_{h.hexdigest()[:12]}")
    # reuse only a COMMITTED copy (_SUCCESS marker): an interrupted prior
    # write must not be silently reused.  Write to a temp dir and
    # atomically rename on success; prune stale copies of older
    # fingerprints so _CSV_DIR doesn't accumulate unboundedly.
    import shutil

    if not os.path.isfile(os.path.join(out, "_SUCCESS")):
        tmp = out + ".inprogress"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        ev.write.mode("overwrite").partitionBy("event_type").parquet(tmp)
        os.replace(tmp, out)
    for d in os.listdir(_CSV_DIR):
        p = os.path.join(_CSV_DIR, d)
        if d.startswith("events_dpp_") and p != out:
            shutil.rmtree(p, ignore_errors=True)
    fact = spark.read.parquet(out)
    dim = (
        ev.groupBy("event_type")
        .agg(F.avg("value").alias("_av"))
        .filter(F.col("_av") > 50)
        .select("event_type")
    )
    # PIN the broadcast: the dim is provably tiny (<= |event_type| rows
    # after the HAVING), but its size ESTIMATE scales with the events
    # table it aggregates, so past ~x100 Catalyst silently switches to a
    # shuffle join — and DPP (reuseBroadcastOnly by default) then plants
    # NO pruning subquery at all: tools/dpp_probe.py measured 5/5
    # partitions read, pruning time 0, at the x100 tier before this
    # hint.  With the broadcast pinned the scan reads exactly the
    # qualifying 3/5 partitions at every tier.
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


_BUCKET_DB = "tsengine_buckets"
_BUCKET_DIR = os.environ.get("TSENGINE_BUCKET_DIR", "/tmp/tsengine_buckets")


@register(
    "bucketed_join_agg",
    """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located fact-fact join (README §Scale, sources/bucketed):
    lineitem ⋈ orders on orderkey is the one join shape that neither
    broadcasts (both sides large) nor salts away (not skew — raw
    volume).  Both tables are bucketed+sorted on the join key at WRITE
    time, so the join reads bucket i against bucket i with NO exchange
    on either side (plan pinned in tests/test_bucketed.py) — at 100 TB
    the pipeline's biggest recurring shuffle becomes a one-time storage
    layout decision.

    The bucketed at-rest copies are managed tables written eagerly at
    plan-build time into a /tmp-located database (content-fingerprinted
    names; in-session reuse via the catalog).  The oracle recomputes
    the same join+agg from the raw parquet — a hash match proves the
    bucketed round trip loses nothing."""
    import hashlib

    from tsengine.sources.bucketed import bucketed_join, ensure_bucketed

    h = hashlib.md5(os.path.abspath(sf_dir).encode())
    for t in ("lineitem", "orders"):
        src = os.path.join(os.path.abspath(sf_dir), f"{t}.parquet")
        paths = (
            [os.path.join(r, f) for r, _d, fs in sorted(os.walk(src)) for f in sorted(fs)]
            if os.path.isdir(src)
            else [src]
        )
        for p in paths:
            st = os.stat(p)
            h.update(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}".encode())
    fp = h.hexdigest()[:10]
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {_BUCKET_DB} LOCATION '{_BUCKET_DIR}'"
    )
    li_t, o_t = f"{_BUCKET_DB}.li_{fp}", f"{_BUCKET_DB}.o_{fp}"
    ensure_bucketed(
        spark, sf_dir, "lineitem", "l_orderkey", li_t,
        os.path.join(_BUCKET_DIR, f"li_{fp}"),
    )
    ensure_bucketed(
        spark, sf_dir, "orders", "o_orderkey", o_t,
        os.path.join(_BUCKET_DIR, f"o_{fp}"),
    )
    j = bucketed_join(
        spark, li_t, o_t, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )
