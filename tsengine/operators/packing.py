"""Chunking / packing / quantization operators for LLM training-data
preparation (project north star; not in the reference — Spark-native
designs extending the corpus/text families, SURVEY.md §7.2 M6).

Three standard stages between a cleaned corpus and a training run:

  * ``doc_chunk``          — overlapping token-window chunking (the RAG /
                             long-context split): windows of ``_CHUNK_W``
                             tokens advancing by ``_CHUNK_S``.  Pure
                             map-side explode — zero shuffles at any
                             scale; output cardinality is a constant
                             factor of the input.
  * ``pack_sequences``     — GPT-style sequence packing: per source
                             shard, documents are concatenated in
                             doc_id order into one token stream and cut
                             into fixed ``_PACK_C``-token blocks; each
                             document reports its stream offset and the
                             block span it lands in.  One shuffle (the
                             per-shard cumulative sum); shards are the
                             parallelism unit, exactly how a 100 TB
                             corpus is packed per input shard.
  * ``embedding_quantize`` — symmetric int8 scalar quantization of the
                             embedding column (the on-disk format for
                             billion-vector ANN): per-vector scale =
                             max|x|/127, codes = floor(x/scale + 0.5).
                             Map-side, no shuffle; emits codes plus the
                             reconstruction MSE (bit-identical fold, so
                             no output rounding is needed).

Portability notes (SURVEY.md §4.4): all packing arithmetic is integer
(exact in both engines); quantization uses ``floor(x + 0.5)`` instead
of ROUND for the codes (floor of identical doubles is identical — no
HALF_UP-vs-double boundary risk) and the same left fold for the MSE
(Spark ``aggregate`` from 0.0 vs DuckDB 2-arg ``list_reduce``; IEEE
``0.0 + x == x`` makes the chains bit-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

_CHUNK_W = 32  # chunk width, whitespace tokens
_CHUNK_S = 24  # chunk stride (overlap = W - S = 8)
_PACK_C = 128  # packed block capacity, tokens
_QMAX = 127  # int8 symmetric range


@register(
    "doc_chunk",
    f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
)
SELECT doc_id,
       CAST(k AS INT) AS chunk_id,
       CAST(k * {_CHUNK_S} AS BIGINT) AS tok_start,
       CAST(len(toks[k * {_CHUNK_S} + 1 : least(k * {_CHUNK_S} + {_CHUNK_W}, n)])
            AS INT) AS n_tok,
       array_to_string(
         toks[k * {_CHUNK_S} + 1 : least(k * {_CHUNK_S} + {_CHUNK_W}, n)],
         ' ') AS chunk_text
FROM t, unnest(range(0, CAST(FLOOR((n - 1) / {_CHUNK_S}) AS BIGINT) + 1)) AS u(k)
""",
)
def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: every document becomes
    ceil(n/stride) chunks of up to {W} tokens, each starting {S} tokens
    after the previous (so consecutive chunks share W-S tokens of
    context).  Entirely map-side — `sequence` + `explode` + `slice`
    inside the row, no shuffle, no window function — so it scales as a
    pure narrow transform over the 100 TB corpus scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    k = F.explode(
        F.sequence(F.lit(0), F.floor((n - 1) / _CHUNK_S).cast("int"))
    ).alias("chunk_id")
    chunk = F.slice(F.col("toks"), F.col("chunk_id") * _CHUNK_S + 1, _CHUNK_W)
    return (
        docs.select("doc_id", toks.alias("toks"), k)
        .select(
            "doc_id",
            "chunk_id",
            (F.col("chunk_id").cast("long") * _CHUNK_S).alias("tok_start"),
            F.size(chunk).alias("n_tok"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@register(
    "pack_sequences",
    f"""
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS tok_offset
  FROM t
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(tok_offset AS BIGINT) AS tok_offset,
       CAST(FLOOR(tok_offset / {_PACK_C}) AS BIGINT) AS first_block,
       CAST(FLOOR((tok_offset + n_tokens - 1) / {_PACK_C}) AS BIGINT) AS last_block
FROM c
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: per source shard the documents form
    one concatenated token stream (doc_id order) cut into fixed
    {C}-token training blocks; each document reports its offset in the
    stream and the [first_block, last_block] span it occupies (a doc
    longer than the capacity straddles blocks — the concat-and-split
    model used by GPT/Llama pretraining, not bin packing).

    Scale shape: ONE shuffle (hash by source shard), then a running sum
    within each shard — shards are the parallelism unit, and a real
    pipeline has thousands of them.  All arithmetic is integer, so the
    oracle matches exactly with no rounding discipline needed."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = docs.select(
        "doc_id", "source", n.cast("long").alias("n_tokens")
    ).withColumn("tok_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        "tok_offset",
        F.floor(F.col("tok_offset") / _PACK_C).alias("first_block"),
        F.floor((F.col("tok_offset") + F.col("n_tokens") - 1) / _PACK_C).alias(
            "last_block"
        ),
    )


@register(
    "embedding_quantize",
    f"""
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
s AS (
  SELECT vec_id, e,
         greatest(list_max(list_transform(e, x -> abs(x))) / {_QMAX}, 1e-30)
           AS scale
  FROM d
),
q AS (
  SELECT vec_id, e, scale,
         list_transform(e, x -> CAST(FLOOR(x / scale + 0.5) AS BIGINT)) AS codes
  FROM s
)
SELECT vec_id,
       scale,
       array_to_string(codes, ',') AS codes_str,
       list_reduce(
         list_transform(list_zip(e, codes),
                        p -> (p[1] - p[2] * scale) * (p[1] - p[2] * scale)),
         (a, b) -> a + b) / 64 AS mse
FROM q
""",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding corpus —
    the standard on-disk compression for billion-vector ANN serving
    (4x smaller than float32, recall loss ~0): per-vector scale =
    max|x|/127, code_i = floor(x_i/scale + 0.5) in [-127, 127].
    Emits the code vector (as a comma string, hash-checkable) and the
    reconstruction MSE.  Pure map-side projection — no shuffle; at
    100 TB this runs inside the corpus scan like every other narrow
    transform."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    scale = F.greatest(
        F.array_max(F.transform("e", lambda x: F.abs(x))) / _QMAX, F.lit(1e-30)
    )
    s = emb.withColumn("scale", scale)
    codes = F.transform(
        "e", lambda x: F.floor(x / F.col("scale") + 0.5)
    )
    q = s.withColumn("codes", codes)
    err2 = F.zip_with(
        "e", "codes", lambda x, c: (x - c * F.col("scale")) * (x - c * F.col("scale"))
    )
    mse = F.aggregate(err2, F.lit(0.0), lambda acc, x: acc + x) / 64
    return q.select(
        "vec_id",
        "scale",
        F.concat_ws(",", F.transform("codes", lambda c: c.cast("string"))).alias(
            "codes_str"
        ),
        mse.alias("mse"),
    )


_SHARD_B = 4096  # shard token budget


@register(
    "shard_manifest",
    f"""
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS tok_offset
  FROM t
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(tok_offset AS BIGINT) AS tok_offset,
       CAST(FLOOR(tok_offset / {_SHARD_B}) AS BIGINT) AS shard_id
FROM c
""",
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic export sharding — the last mile of a curation
    pipeline: documents are laid out in ONE GLOBAL doc_id-ordered
    token stream and assigned to fixed {_SHARD_B}-token shards by
    their (exclusive) stream offset, so any consumer can rebuild the
    exact same shard set from the manifest.

    The interesting part is HOW the global prefix sum is computed at
    scale.  ``pack_sequences`` could partition its running sum by
    source; a GLOBAL ordering admits no partition key, and the naive
    ``Window.orderBy(doc_id)`` with no partitionBy drags the entire
    corpus through ONE task — the canonical Spark scale-killer.  This
    uses the two-level distributed scan instead:

      1. range-repartition by doc_id (partition i holds smaller ids
         than partition i+1) and stamp ``spark_partition_id()``;
         localCheckpoint so both consumers below read the SAME
         boundaries (range sampling is not otherwise replay-stable);
      2. per-partition token totals -> a partitions-sized table,
         collected (bounded by CLUSTER parallelism, never by data —
         the same bounded-collect class as the PQ codebooks) and
         prefix-summed driver-side into per-partition global offsets;
      3. broadcast the offsets back and add the within-partition
         running sum (window PARTITIONED by pid — parallel).  No
         partition-less Window anywhere, at any scale.

    Exclusive-prefix semantics: a document straddling a boundary
    belongs to the shard its first token lands in.  All integer
    arithmetic — exact in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    base = (
        docs.select("doc_id", "source", n.cast("long").alias("n_tokens"))
        .repartitionByRange(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    ptots = sorted(
        base.groupBy("pid").agg(F.sum("n_tokens").alias("ptot")).collect()
    )
    rows, cum = [], 0
    for r in ptots:
        rows.append((r.pid, cum))
        cum += r.ptot
    offsets = spark.createDataFrame(rows, "pid int, poff long")
    w = Window.partitionBy("pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        base.withColumn("run", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (F.col("poff") + F.col("run")).alias("tok_offset"),
            F.floor((F.col("poff") + F.col("run")) / _SHARD_B).alias("shard_id"),
        )
    )
