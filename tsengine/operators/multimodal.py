"""Multimodal (binary-column) plumbing for training-data pipelines
(north-star extension, BASELINE.json).

Pattern: media lives as opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` UDFs so each executor processes whole record batches
without JVM round trips.  The decode libraries (PIL/ffmpeg/...) are NOT
in this container, so the decode kernel is a clearly-marked
deterministic stub — but everything Spark-side (schema, binary column
handling, batch iteration, UDF signature, partition independence) is
real and oracle-checked: the stub derives its "metadata" arithmetically
from the byte length, which DuckDB can recompute from octet_length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

_DECODE_AVAILABLE = False
try:  # gate optional decode libs (not installed in this container)
    from PIL import Image  # noqa: F401

    _DECODE_AVAILABLE = True
except ImportError:
    pass


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake media table: document text bytes as the opaque payload +
    typed metadata — the schema a real pipeline would carry
    (media_id, payload binary, media_type, n_bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.octet_length("text").alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder.  A production build
    replaces this with PIL/torchaudio/ffmpeg; the Spark plumbing around
    it is unchanged."""
    if _DECODE_AVAILABLE:
        raise NotImplementedError(
            "real decode path intentionally not implemented in this container"
        )
    n = len(payload)
    return {
        "width": 16 + n % 64,
        "height": 16 + (n * 7) % 64,
        "n_frames": 1 + n % 4,
        "mean_luma": round((n % 255) / 255.0, 6),
    }


@register(
    "mm_decode",
    """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       octet_length(encode(text)) AS n_bytes,
       16 + octet_length(encode(text)) % 64 AS width,
       16 + (octet_length(encode(text)) * 7) % 64 AS height,
       1 + octet_length(encode(text)) % 4 AS n_frames,
       ROUND((octet_length(encode(text)) % 255) / 255.0, 6) AS mean_luma
FROM documents
""",
)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode binary media to typed metadata via mapInPandas: iterates
    Arrow batches, calls the (stubbed) decoder per payload, emits a
    typed row — the exact plumbing a real image/audio decode uses.
    The oracle recomputes the stub's arithmetic from octet_length,
    which verifies the binary column survived the Arrow round trip
    byte-for-byte."""
    media = media_table(spark, sf_dir)
    schema = (
        "media_id long, media_type string, n_bytes long, "
        "width long, height long, n_frames long, mean_luma double"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(meta)
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            out.insert(1, "media_type", pdf["media_type"].to_numpy())
            out.insert(2, "n_bytes", pdf["n_bytes"].to_numpy())
            yield out

    return media.mapInPandas(decode, schema=schema)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: explode decoded frame indices, keep every n-th —
    shows the explode-then-filter shape (filter folds into the
    generator, no materialized blowup)."""
    decoded = media
    return (
        decoded.select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_n == 0)
    )


def resize_stub(decoded: DataFrame, target: int = 224) -> DataFrame:
    """Resize metadata transform (a real build maps the payload through
    the decoder; the aspect-ratio arithmetic is the real logic)."""
    scale = F.least(
        F.lit(target) / F.col("width"), F.lit(target) / F.col("height")
    )
    return decoded.select(
        "media_id",
        F.floor(F.col("width") * scale).cast("long").alias("out_width"),
        F.floor(F.col("height") * scale).cast("long").alias("out_height"),
    )


_DECODED_CTE = """
decoded AS (
  SELECT doc_id AS media_id,
         16 + octet_length(encode(text)) % 64 AS width,
         16 + (octet_length(encode(text)) * 7) % 64 AS height,
         1 + octet_length(encode(text)) % 4 AS n_frames
  FROM documents
)"""


@register(
    "mm_frame_sample",
    "WITH "
    + _DECODED_CTE
    + """
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx
FROM decoded, UNNEST(range(0, n_frames)) AS u(frame_idx)
WHERE frame_idx % 2 = 0
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over decoded video metadata: explode the frame
    index range, keep every 2nd frame.  The filter folds into the
    generator output — no materialized full frame list — and the op is
    embarrassingly partition-parallel (a real build maps frame_idx to a
    payload-slice decode in the same pass)."""
    return frame_sample(mm_decode(spark, sf_dir), every_n=2)


@register(
    "mm_resize",
    "WITH "
    + _DECODED_CTE
    + """
SELECT media_id,
       CAST(FLOOR(width * LEAST(224.0 / width, 224.0 / height)) AS BIGINT) AS out_width,
       CAST(FLOOR(height * LEAST(224.0 / width, 224.0 / height)) AS BIGINT) AS out_height
FROM decoded
""",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize-to-fit (224px) of decoded dimensions.
    The scale expression is mirrored token-for-token in the oracle so
    the IEEE division/multiply sequence is identical — FLOOR at a
    near-integer boundary is then bit-stable across engines."""
    return resize_stub(mm_decode(spark, sf_dir), target=224)


def _md5_nibble_hist_sql() -> str:
    hexchars = "0123456789abcdef"
    cols = ", ".join(
        f"CAST(len(regexp_extract_all(md5(text), "
        f"'[{hexchars[2 * h]}{hexchars[2 * h + 1]}]')) AS BIGINT) AS h{h}"
        for h in range(8)
    )
    return f"SELECT doc_id AS media_id, {cols} FROM documents"


@register("mm_feature_extract", _md5_nibble_hist_sql())
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction from the raw binary payload: an 8-bin
    digest-nibble histogram per media item, computed with REAL per-byte
    Python work inside mapInPandas (hashlib over the payload bytes) —
    the exact kernel shape a CLIP/encoder embedding job uses, with a
    deterministic digest standing in for the model forward pass.  The
    oracle recomputes the histogram from DuckDB's md5(text), verifying
    the binary column's bytes AND the batch plumbing end-to-end."""
    import hashlib

    media = media_table(spark, sf_dir)
    schema = "media_id long, " + ", ".join(f"h{h} long" for h in range(8))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                hexd = hashlib.md5(bytes(payload)).hexdigest()
                counts = [0] * 8
                for ch in hexd:
                    counts[int(ch, 16) // 2] += 1
                rows.append([mid, *counts])
            yield pd.DataFrame(rows, columns=["media_id"] + [f"h{h}" for h in range(8)])

    return media.select("media_id", "payload").mapInPandas(extract, schema=schema)
