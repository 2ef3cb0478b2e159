"""User-defined execution surface (SURVEY.md §2 A.9) — the mechanisms
the reference's torch/numpy kernels map onto, each registered as a
driver-checkable query:

* scalar vectorized pandas_udf  -> spectral.fft_mag, ml kernels
* grouped-map applyInPandas     -> recurrence.gru_context
* SQL-aggregate UDAF            -> timeseries.ema_smooth (higher-order
  ``aggregate``)
* pandas GROUPED_AGG UDAF       -> ``grouped_geomean_udaf`` (here)
* Python UDTF (Spark 4 API)     -> ``tokenize_udtf`` (here)

The two operators here complete the matrix with the mechanisms the
engine's kernels don't otherwise exercise.  Both are deliberately
simple functions whose semantics a SQL oracle can replicate exactly —
the check is about the execution path (Arrow UDTF emission, grouped-agg
partial application), not about novel math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table


@register(
    "tokenize_udtf",
    """
WITH l AS (SELECT doc_id, string_split(text, ' ') AS ss FROM documents)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, ss[i] AS token
FROM l, UNNEST(range(1, len(ss) + 1)) AS r(i)
WHERE ss[i] <> ''
""",
)
def tokenize_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenizer as a PYTHON UDTF (Spark 4 ``udtf`` API,
    Arrow-optimized): one input row fans out to one row per token via
    a lateral join — the table-function execution path, distinct from
    the built-in ``posexplode`` used elsewhere (dedup.tokens_df).

    The UDTF runs per-partition in the Python worker (no shuffle — the
    lateral join is map-side); the oracle replicates the exact
    split-and-enumerate semantics relationally.  At 100 TB this is the
    escape hatch for tokenizers that are NOT expressible as SQL (BPE,
    sentencepiece): same plumbing, heavier eval().
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string", useArrow=True)
    class Tokenize:
        def eval(self, doc_id, text):
            pos = 0
            for tok in (text or "").split(" "):
                if tok != "":
                    yield doc_id, pos, tok
                pos += 1

    # register for the SQL lateral-join syntax (the natural UDTF call
    # site); view name is per-sf to avoid cross-run collisions
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("tsengine_tokenize", Tokenize)
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM _udtf_docs, LATERAL tsengine_tokenize(doc_id, text) t"
    )


@register(
    "grouped_geomean_udaf",
    """
SELECT event_type,
       ROUND(EXP(AVG(LN(value))), 6) AS geomean,
       COUNT(*) AS n
FROM events
WHERE value > 0
GROUP BY 1
""",
)
def grouped_geomean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean per event type as a pandas GROUPED_AGG UDAF —
    the Arrow-vectorized aggregate path (SeriesToScalar), completing
    the A.9 matrix next to the higher-order-function UDAF
    (ema_smooth's ``aggregate``).

    Note the scale contract difference vs built-in aggs: a grouped-agg
    pandas UDF has no partial-aggregation (map-side combine) — every
    group's values ship to one reducer.  Fine for |event_type| groups
    of bounded size; for high-cardinality aggregation the built-in
    log-sum decomposition (exp(avg(ln))) below is the production
    rewrite, which is exactly what the oracle states.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Spark forbids mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg(), so the count is a pandas UDAF too
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.round(geomean("value"), 6).alias("geomean"),
        n_rows("value").alias("n"),
    )
