"""Multimodal (binary-column) plumbing for training-data pipelines
(north-star extension, BASELINE.json).

Pattern: media lives as opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` UDFs so each executor processes whole record batches
without JVM round trips.  The decode step is REAL: payloads are
structurally valid PNG / WAV / GIF containers (built deterministically
from the documents table by :mod:`tsengine.operators.media_codec`) and
the decoder walks the actual binary structure — PNG chunk CRCs, RIFF
chunk layout, GIF block grammar.  The DuckDB oracle recomputes the
embedded metadata arithmetically from (doc_id, text), so a decoder
that misparses any offset hash-mismatches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

_WAV_RATES = (8000, 16000, 22050, 44100)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw media table: document text bytes as the opaque payload +
    typed metadata — the schema a real pipeline would carry
    (media_id, payload binary, media_type, n_bytes).  Used by the
    digest/feature kernels; :func:`media_payload_table` wraps the same
    rows in real media containers for the decode path."""
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


def build_payload(doc_id: int, text: str) -> bytes:
    """Deterministic real-container payload for one document row.
    The embedded parameters are pure functions of (doc_id, |text|) so
    the DuckDB oracle can recompute what a correct decode must yield."""
    from tsengine.operators import media_codec as mc

    tb = text.encode("utf-8")
    m = doc_id % 3
    if m == 0:  # image → PNG with a REAL raster (pixel k = (seed+k)%256)
        return mc.build_png_image(
            16 + (doc_id * 7) % 240, 16 + (doc_id * 13) % 240, doc_id % 256
        )
    if m == 1:  # audio → WAV
        return mc.build_wav(
            _WAV_RATES[doc_id % 4], 1 + doc_id % 2, 100 + len(tb) % 1000
        )
    # video → GIF89a, one image-descriptor block per frame
    n_frames = 1 + doc_id % 4
    return mc.build_gif(
        16 + (doc_id * 5) % 200,
        16 + (doc_id * 11) % 200,
        [tb[:128] or b"x"] * n_frames,
    )


def media_payload_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose payload column holds REAL container bytes
    (PNG/WAV/GIF) built per row inside mapInPandas — the Arrow-batched
    ingest shape of a real media pipeline."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return media_payload_table_from(docs)


_DECODE_SCHEMA = (
    "media_id long, media_type string, width long, height long, "
    "n_frames long, sample_rate long, n_channels long, duration_ms long"
)

_WAV_RATE_SQL = (
    "CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000 "
    "WHEN 2 THEN 22050 ELSE 44100 END"
)


@register(
    "mm_decode",
    f"""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id * 7) % 240
                 WHEN doc_id % 3 = 2 THEN 16 + (doc_id * 5) % 200 END AS BIGINT) AS width,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id * 13) % 240
                 WHEN doc_id % 3 = 2 THEN 16 + (doc_id * 11) % 200 END AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                 WHEN doc_id % 3 = 2 THEN 1 + doc_id % 4 END AS BIGINT) AS n_frames,
       CAST(CASE WHEN doc_id % 3 = 1 THEN {_WAV_RATE_SQL} END AS BIGINT) AS sample_rate,
       CAST(CASE WHEN doc_id % 3 = 1 THEN 1 + doc_id % 2 END AS BIGINT) AS n_channels,
       CAST(CASE WHEN doc_id % 3 = 1 THEN FLOOR(
            (100 + octet_length(encode(text)) % 1000) * 1000.0 / ({_WAV_RATE_SQL})
       ) END AS BIGINT) AS duration_ms
FROM documents
""",
)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode binary media to typed metadata via mapInPandas: each
    Arrow batch's payloads are sniffed by magic bytes and parsed by
    walking the real container structure (PNG IHDR + per-chunk CRC-32
    verification, RIFF fmt/data chunks, GIF image-descriptor block
    grammar — media_codec.decode_media).  The oracle recomputes the
    builder-embedded metadata arithmetically from (doc_id, text): a
    hash match proves the decoder read genuine structure, not a
    formula.  Fields a modality doesn't carry are NULL."""
    from tsengine.operators.media_codec import _FIELDS, decode_media

    media = media_payload_table(spark, sf_dir)
    mtype = (
        F.when(F.col("media_id") % 3 == 0, "image")
        .when(F.col("media_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_media(p) for p in pdf["payload"]]
            out = pd.DataFrame(meta, columns=list(_FIELDS))
            for c in _FIELDS:
                out[c] = out[c].astype("Int64")
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    decoded = media.mapInPandas(
        decode,
        schema=(
            "media_id long, width long, height long, n_frames long, "
            "sample_rate long, n_channels long, duration_ms long"
        ),
    )
    return decoded.select(
        "media_id",
        mtype,
        "width",
        "height",
        "n_frames",
        "sample_rate",
        "n_channels",
        "duration_ms",
    )


def frame_sample(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: explode decoded frame indices, keep every n-th —
    shows the explode-then-filter shape (filter folds into the
    generator, no materialized blowup).  Audio rows carry no frames
    (n_frames NULL) and drop out."""
    return (
        decoded.filter(F.col("n_frames").isNotNull())
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_n == 0)
    )


def resize_fit(decoded: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving resize-to-fit arithmetic over decoded
    dimensions (the payload resample itself would ride the same pass);
    audio rows (width NULL) drop out."""
    scale = F.least(
        F.lit(target) / F.col("width"), F.lit(target) / F.col("height")
    )
    return decoded.filter(F.col("width").isNotNull()).select(
        "media_id",
        F.floor(F.col("width") * scale).cast("long").alias("out_width"),
        F.floor(F.col("height") * scale).cast("long").alias("out_height"),
    )


# decoded dims/frames for the visual modalities (doc_id % 3 != 1),
# mirroring what a correct parse of the built containers yields
_DECODED_CTE = """
decoded AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id * 7) % 240
              ELSE 16 + (doc_id * 5) % 200 END AS width,
         CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id * 13) % 240
              ELSE 16 + (doc_id * 11) % 200 END AS height,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 1 + doc_id % 4 END AS n_frames
  FROM documents
  WHERE doc_id % 3 <> 1
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
    """Frame sampling over genuinely decoded media: explode the frame
    index range (GIF frame count from walking image-descriptor blocks;
    PNG = 1), keep every 2nd frame.  The filter folds into the
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
    """Aspect-preserving resize-to-fit (224px) of genuinely decoded
    dimensions (PNG IHDR / GIF logical screen).  The scale expression
    is mirrored token-for-token in the oracle so the IEEE
    division/multiply sequence is identical — FLOOR at a near-integer
    boundary is then bit-stable across engines."""
    return resize_fit(mm_decode(spark, sf_dir), target=224)


def _sum_range_sql(p: str, n: str) -> str:
    """DuckDB closed form for Σ_{j=0}^{n-1} (p + j) % 256 with p < 256:
    full 256-cycles each sum to 32640; the partial run either stays
    below the wrap (arithmetic series from p) or splits at 256."""
    full, rem = f"(({n}) // 256)", f"(({n}) % 256)"
    return (
        f"({full} * 32640 + CASE WHEN ({p}) + {rem} <= 256"
        f" THEN {rem} * ({p}) + {rem} * ({rem} - 1) // 2"
        f" ELSE (256 - ({p})) * ({p}) + (256 - ({p})) * (255 - ({p})) // 2"
        f" + ({rem} - 256 + ({p})) * ({rem} - 257 + ({p})) // 2 END)"
    )


def _hist_bin_sql(p: str, n: str, b: int) -> str:
    """DuckDB closed form for |{j < n : ((p + j) % 256) // 32 = b}|:
    32 per full cycle plus the overlap of the partial run (possibly
    wrapped at 256) with the bin's value interval [32b, 32b+32)."""
    full, rem = f"(({n}) // 256)", f"(({n}) % 256)"
    e1 = f"LEAST(256, ({p}) + {rem})"
    e2 = f"GREATEST(0, ({p}) + {rem} - 256)"
    lo, hi = 32 * b, 32 * b + 32
    return (
        f"({full} * 32 + GREATEST(0, LEAST({hi}, {e1}) - GREATEST({lo}, ({p})))"
        f" + GREATEST(0, LEAST({hi}, {e2}) - {lo}))"
    )


def _pixel_stats_sql() -> str:
    hist = ",\n       ".join(
        f"CAST({_hist_bin_sql('seed', 'n', b)} AS BIGINT) AS h{b}" for b in range(8)
    )
    return f"""
WITH dims AS (
  SELECT doc_id AS media_id,
         16 + (doc_id * 7) % 240 AS w,
         16 + (doc_id * 13) % 240 AS h,
         doc_id % 256 AS seed
  FROM documents WHERE doc_id % 3 = 0
), px AS (
  SELECT media_id, w, h, seed, w * 3 AS bpr, h * w * 3 AS n,
         (seed + (h - 1) * w * 3) % 256 AS lastp
  FROM dims
)
SELECT media_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(n AS BIGINT) AS n_bytes,
       CAST({_sum_range_sql('seed', 'n')} AS BIGINT) AS pixel_sum,
       CAST({_sum_range_sql('seed', 'bpr')} AS BIGINT) AS first_row_sum,
       CAST({_sum_range_sql('lastp', 'bpr')} AS BIGINT) AS last_row_sum,
       {hist}
FROM px
"""


@register("mm_pixel_stats", _pixel_stats_sql())
def mm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE pixel statistics from fully decoded PNG rasters: the
    payload's IDAT chunks are concatenated, zlib-inflated, and each
    scanline un-filtered (None/Sub/Up cycle) to the raw raster
    (media_codec.decode_png_pixels); the kernel then reports raster
    byte count, total / first-scanline / last-scanline pixel sums and
    an 8-bin pixel-value histogram — all exact integers.  The oracle
    recomputes every statistic in closed form from the builder's pixel
    formula (pixel k = (doc_id + k) % 256), so a decoder that drops an
    IDAT byte, mis-inverts a filter, or mis-orders scanlines
    hash-mismatches: this is raster-level verification, not metadata
    parsing.  Filters 2 (Up) propagate row-to-row, so first/last-row
    sums pin scanline order end-to-end."""
    from tsengine.operators.media_codec import decode_png_pixels

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    ).select("doc_id", "text")
    media = media_payload_table_from(docs)

    cols = ["media_id", "width", "height", "n_bytes", "pixel_sum",
            "first_row_sum", "last_row_sum"] + [f"h{b}" for b in range(8)]

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, raster = decode_png_pixels(bytes(payload))
                flat = raster.ravel()
                hist = np.bincount(flat >> 5, minlength=8)
                rows.append(
                    [
                        int(mid), w, h, flat.size, int(flat.sum(dtype=np.int64)),
                        int(raster[0].sum(dtype=np.int64)),
                        int(raster[-1].sum(dtype=np.int64)),
                        *(int(x) for x in hist),
                    ]
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(stats, schema=", ".join(f"{c} long" for c in cols))


def media_payload_table_from(docs: DataFrame) -> DataFrame:
    """media_payload_table over an arbitrary (doc_id, text) relation —
    lets callers pre-filter (e.g. images only) so only needed payloads
    are built."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].to_numpy(),
                    "payload": [
                        build_payload(int(d), t)
                        for d, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    return docs.mapInPandas(build, schema="media_id long, payload binary")


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


def _thumb_sql() -> str:
    """Oracle for mm_thumbnail: replay the NN resample arithmetically —
    out pixel (i, j) maps to source pixel (i*h//out_h, j*w//out_w),
    whose 3 bytes are ((seed + base + k) % 256, k<3) by the builder's
    pixel formula; the per-pixel 3-byte sum has the same closed form as
    the pixel_stats run sums.  The grid is a lateral UNNEST(range) per
    image — exact integer arithmetic end-to-end."""
    p3 = _sum_range_sql("p", "3")
    return f"""
WITH dims AS (
  SELECT doc_id AS media_id,
         16 + (doc_id * 7) % 240 AS w,
         16 + (doc_id * 13) % 240 AS h,
         doc_id % 256 AS seed
  FROM documents WHERE doc_id % 3 = 0
), od AS (
  SELECT *, CAST(FLOOR(w * LEAST({_THUMB}.0 / w, {_THUMB}.0 / h)) AS BIGINT) AS out_w,
            CAST(FLOOR(h * LEAST({_THUMB}.0 / w, {_THUMB}.0 / h)) AS BIGINT) AS out_h
  FROM dims
), grid AS (
  SELECT media_id, out_w, out_h, i,
         (seed + ((i * h) // out_h) * 3 * w + 3 * ((j * w) // out_w)) % 256 AS p
  FROM od, UNNEST(range(0, out_h)) t1(i), UNNEST(range(0, out_w)) t2(j)
)
SELECT media_id, out_w, out_h,
       CAST(SUM({p3}) AS BIGINT) AS thumb_sum,
       CAST(SUM(CASE WHEN i = 0 THEN {p3} ELSE 0 END) AS BIGINT) AS first_row_sum
FROM grid GROUP BY media_id, out_w, out_h
"""


_THUMB = 32  # resize-to-fit target (thumbnail edge)


@register("mm_thumbnail", _thumb_sql())
def mm_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE pixel resample: decode the PNG raster
    (media_codec.decode_png_pixels), nearest-neighbor resize to fit a
    32px box (aspect-preserving, the mm_resize scale formula), and
    report exact integer statistics of the RESIZED raster (total +
    first-row byte sums).  This closes the last honesty increment on
    the multimodal path: mm_decode parses containers, mm_pixel_stats
    verifies the decoded raster, mm_thumbnail verifies a real pixel
    TRANSFORM of it — the oracle replays the index mapping
    arithmetically, so an off-by-one in either resample axis, a
    transposed raster, or a channel-stride bug hash-mismatches.

    Scale shape: decode + resample is one map-side Arrow kernel over
    the payload scan (zero exchanges); per-row state is one raster
    (bounded by media dimensions)."""
    import numpy as np

    from tsengine.operators.media_codec import decode_png_pixels

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", "text")
    )
    media = media_payload_table_from(docs)
    cols = ["media_id", "out_w", "out_h", "thumb_sum", "first_row_sum"]

    def thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, raster = decode_png_pixels(bytes(payload))
                scale = min(_THUMB / w, _THUMB / h)
                out_w, out_h = int(np.floor(w * scale)), int(np.floor(h * scale))
                src_r = (np.arange(out_h) * h) // out_h
                src_c = (np.arange(out_w) * w) // out_w
                byte_idx = (src_c[:, None] * 3 + np.arange(3)[None, :]).ravel()
                resized = raster[src_r][:, byte_idx]  # [out_h, out_w*3]
                rows.append(
                    [
                        int(mid), out_w, out_h,
                        int(resized.sum(dtype=np.int64)),
                        int(resized[0].sum(dtype=np.int64)),
                    ]
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(thumb, schema=", ".join(f"{c} long" for c in cols))


def _audio_stats_sql() -> str:
    return f"""
WITH audio AS (
  SELECT doc_id,
         (100 + octet_length(encode(text)) % 1000) AS n_frames,
         (1 + doc_id % 2) AS n_channels
  FROM documents WHERE doc_id % 3 = 1
),
vals AS (
  SELECT doc_id, n_frames, n_channels,
         CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
  FROM (
    SELECT doc_id, n_frames, n_channels,
           ((2 * j * 31) % 256) + 256 * (((2 * j + 1) * 31) % 256) AS u
    FROM (SELECT doc_id, n_frames, n_channels,
                 unnest(range(0, n_frames * n_channels)) AS j
          FROM audio)
  )
)
SELECT doc_id AS media_id,
       CAST({_WAV_RATE_SQL} AS BIGINT) AS sample_rate,
       CAST(n_channels AS BIGINT) AS n_channels,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(s) AS BIGINT) AS pcm_sum,
       CAST(SUM(ABS(s)) AS BIGINT) AS pcm_abs_sum,
       CAST(SUM(s * s) AS BIGINT) AS pcm_sq_sum,
       CAST(MIN(s) AS BIGINT) AS pcm_min,
       CAST(MAX(s) AS BIGINT) AS pcm_max
FROM vals
GROUP BY doc_id, n_channels, n_frames
"""


@register("mm_audio_stats", _audio_stats_sql())
def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE PCM statistics from fully decoded WAV payloads — the audio
    twin of `mm_pixel_stats`: the RIFF data chunk is decoded to the
    int16 little-endian sample stream (media_codec.decode_wav_samples)
    and the kernel reports exact integer aggregates (sum, |sum|, energy,
    min/max) plus the stream geometry.  The oracle recomputes every
    statistic in closed form from the builder's byte formula
    (byte i = (i*31) % 256 -> sample j = signed16(b[2j] + 256*b[2j+1])),
    so a byte-order flip, signedness bug, or dropped data byte
    hash-mismatches: sample-level verification, not header parsing.

    Scale shape: one map-side Arrow kernel over the payload scan (zero
    exchanges); per-row state is one PCM buffer, bounded by media
    duration."""
    from tsengine.operators.media_codec import decode_wav_samples

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select("doc_id", "text")
    )
    media = media_payload_table_from(docs)

    cols = [
        "media_id", "sample_rate", "n_channels", "n_frames", "n_samples",
        "pcm_sum", "pcm_abs_sum", "pcm_sq_sum", "pcm_min", "pcm_max",
    ]

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, nch, s = decode_wav_samples(bytes(payload))
                s64 = s.astype(np.int64)
                rows.append(
                    [
                        int(mid), rate, nch, s.size // nch, s.size,
                        int(s64.sum()), int(np.abs(s64).sum()),
                        int((s64 * s64).sum()), int(s64.min()), int(s64.max()),
                    ]
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(stats, schema=", ".join(f"{c} long" for c in cols))
