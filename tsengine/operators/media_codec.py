"""Pure-Python media codecs for the multimodal operators.

Real binary formats, no PIL/ffmpeg needed: a builder side writes
structurally valid PNG / WAV / GIF89a payloads (correct magic bytes,
CRC-32 on every PNG chunk, RIFF chunk layout, GIF sub-block framing),
and a decoder side parses them back by walking the actual container
structure — IHDR fields, RIFF `fmt `/`data` chunks, GIF image-descriptor
blocks.  Builder and parser are independent code paths over the same
byte layout, so the DuckDB oracle (which recomputes the embedded
metadata arithmetically from doc_id/text) is checking genuine decoding:
a parser that misreads an offset or skips a block wrong hash-mismatches.

The reference persists media-free pickles (`unsupervised.py:379-392`);
this module is the engine's north-star multimodal extension
(BASELINE.json), upgraded from the round-2 deterministic stub.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# builders (fixture side — deterministic functions of (doc_id, text))
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def build_png(width: int, height: int, idat: bytes) -> bytes:
    """8-bit RGB PNG container: signature, IHDR, one IDAT, IEND."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def build_png_image(width: int, height: int, seed: int) -> bytes:
    """8-bit RGB PNG with a REAL raster: pixel byte k (row-major
    [y][x][channel]) = (seed + k) % 256.  Scanlines are PNG-filtered
    with the type cycle None/Sub/Up (row % 3) and the zlib stream is
    split across TWO IDAT chunks, so a correct decode must concatenate
    IDATs, inflate, and invert each row's filter against the previous
    reconstructed row — not just read IHDR."""
    import numpy as np

    bpr = width * 3
    raster = ((seed + np.arange(height * bpr, dtype=np.int64)) % 256).astype(
        np.uint8
    ).reshape(height, bpr)
    filtered = bytearray()
    for r in range(height):
        ftype = r % 3
        row = raster[r]
        if ftype == 0:  # None
            out = row
        elif ftype == 1:  # Sub: minus left neighbour (bpp=3), uint8 wrap
            px = row.reshape(width, 3)
            out = np.concatenate([px[:1], px[1:] - px[:-1]]).reshape(bpr)
        else:  # Up: minus previous raw row (== previous reconstructed row)
            out = row - raster[r - 1] if r else row
        filtered.append(ftype)
        filtered += out.tobytes()
    z = zlib.compress(bytes(filtered), 6)
    half = max(1, len(z) // 2)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z[:half])
        + _png_chunk(b"IDAT", z[half:])
        + _png_chunk(b"IEND", b"")
    )


def build_wav(sample_rate: int, n_channels: int, n_samples: int) -> bytes:
    """PCM-16 RIFF/WAVE: fmt chunk + data chunk with real sample bytes."""
    bits = 16
    block_align = n_channels * bits // 8
    data = bytes((i * 31) % 256 for i in range(n_samples * block_align))
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _gif_subblocks(data: bytes) -> bytes:
    """LZW payload framed as GIF length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def build_gif(width: int, height: int, frames: list[bytes]) -> bytes:
    """GIF89a with one image-descriptor block per frame (no color
    tables), each preceded by a graphic-control extension — the block
    grammar a frame counter must actually walk."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x00, 0x00, 0x00])  # no GCT, bg index, aspect
    for payload in frames:
        # graphic control extension: introducer, label, block size 4,
        # flags/delay/transparent-index, terminator
        out += bytes([0x21, 0xF9, 0x04, 0x00, 0x02, 0x00, 0x00, 0x00])
        out += bytes([0x2C])  # image descriptor
        out += struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x00])  # no local color table
        out += bytes([0x08])  # LZW minimum code size
        out += _gif_subblocks(payload)
    out += bytes([0x3B])  # trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (the operator side)
# ---------------------------------------------------------------------------


def _parse_png(b: bytes) -> dict:
    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height = 8, None, None
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        if pos + 12 + length > len(b):  # data + CRC must fit
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height = struct.unpack_from(">II", data, 0)
        pos += 12 + length
        if ctype == b"IEND":
            break
    else:
        raise ValueError("truncated PNG (no IEND)")
    if width is None:
        raise ValueError("PNG missing IHDR")
    return {"width": width, "height": height, "n_frames": 1}


def decode_png_pixels(b: bytes):
    """Full PNG raster decode, pure Python + numpy: walk the chunk
    stream (CRC-verified), concatenate every IDAT, zlib-inflate, then
    invert each scanline's filter byte against the previously
    reconstructed row (None/Sub/Up — Sub via a uint8 prefix-sum along
    the pixel axis, Up via a uint8 add against the prior row; uint8
    arithmetic wraps mod 256 exactly as the PNG spec requires).
    Returns (width, height, raster) with raster a (height, width*3)
    uint8 array in raw scanline order."""
    import numpy as np

    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height = 8, None, None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        if pos + 12 + length > len(b):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, bitdepth, ctype_ihdr = struct.unpack_from(">IIBB", data, 0)
            if bitdepth != 8 or ctype_ihdr != 2:
                raise ValueError("only 8-bit RGB supported")
        elif ctype == b"IDAT":
            idat += data
        pos += 12 + length
        if ctype == b"IEND":
            break
    else:
        raise ValueError("truncated PNG (no IEND)")
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    raw = zlib.decompress(bytes(idat))
    bpr = width * 3
    if len(raw) != height * (bpr + 1):
        raise ValueError("PNG raster size mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(height, bpr + 1)
    recon = np.empty((height, bpr), dtype=np.uint8)
    for r in range(height):
        ftype = int(scan[r, 0])
        row = scan[r, 1:]
        if ftype == 0:
            recon[r] = row
        elif ftype == 1:  # Sub: prefix-sum over pixels, per channel
            recon[r] = np.add.accumulate(
                row.reshape(width, 3), axis=0, dtype=np.uint8
            ).reshape(bpr)
        elif ftype == 2:  # Up
            recon[r] = row + recon[r - 1] if r else row
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
    return int(width), int(height), recon


def _parse_wav(b: bytes) -> dict:
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    pos = 12
    rate = channels = bits = data_size = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if pos + 8 + size > len(b):
            raise ValueError(f"WAVE chunk {cid!r} truncated")
        if cid == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", b, pos + 8)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or data_size is None:
        raise ValueError("WAVE missing fmt/data chunk")
    if not channels or not bits or bits % 8 or not rate:
        raise ValueError(
            f"degenerate WAVE fmt: channels={channels} bits={bits} rate={rate}"
        )
    n_samples = data_size // (channels * bits // 8)
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "duration_ms": n_samples * 1000 // rate,
    }


def decode_wav_samples(b: bytes):
    """Full PCM decode of a RIFF/WAVE payload: returns
    (sample_rate, n_channels, samples) where ``samples`` is the
    int16 little-endian PCM stream as a numpy array (channel-
    interleaved, one entry per sample value).  Walks the real chunk
    grammar with the same bounds discipline as :func:`_parse_wav`;
    only 16-bit PCM is supported (the only format the builder emits —
    anything else raises ValueError like other malformed containers).
    """
    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    pos = 12
    rate = channels = bits = fmt_tag = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if pos + 8 + size > len(b):
            raise ValueError(f"WAVE chunk {cid!r} truncated")
        if cid == b"fmt ":
            # a declared fmt size < 16 would otherwise silently read
            # into the next chunk's bytes
            if size < 16:
                raise ValueError(f"WAVE fmt chunk too small ({size} < 16)")
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", b, pos + 8
            )
        elif cid == b"data":
            data = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    if fmt_tag != 1 or not channels or bits != 16 or not rate:
        # fmt_tag 1 = integer PCM; 3 (IEEE float) / 0xFFFE (extensible)
        # are 16-bit-framed but NOT int16 — misdecoding them would
        # return garbage samples instead of an error
        raise ValueError(
            f"unsupported WAVE fmt: tag={fmt_tag} channels={channels} "
            f"bits={bits} rate={rate}"
        )
    if len(data) % 2:
        raise ValueError("odd PCM-16 data length")
    return rate, channels, np.frombuffer(data, dtype="<i2")


def _skip_gif_subblocks(b: bytes, pos: int) -> int:
    while True:
        if pos >= len(b):
            raise ValueError("GIF truncated inside sub-blocks")
        size = b[pos]
        pos += 1
        if size == 0:
            return pos
        pos += size


def _parse_gif(b: bytes) -> dict:
    if len(b) < 13 or b[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack_from("<HH", b, 6)
    flags = b[10]
    pos = 13
    if flags & 0x80:  # global color table present
        pos += 3 * (2 << (flags & 0x07))
    n_frames = 0
    saw_trailer = False
    while pos < len(b):
        introducer = b[pos]
        pos += 1
        if introducer == 0x3B:  # trailer
            saw_trailer = True
            break
        if introducer == 0x21:  # extension: label byte then sub-blocks
            pos = _skip_gif_subblocks(b, pos + 1)
        elif introducer == 0x2C:  # image descriptor
            if pos + 9 > len(b):
                raise ValueError("truncated GIF image descriptor")
            n_frames += 1
            lflags = b[pos + 8]
            pos += 9
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos += 1  # LZW minimum code size
            pos = _skip_gif_subblocks(b, pos)
        else:
            raise ValueError(f"unknown GIF block introducer 0x{introducer:02x}")
    if not saw_trailer:
        raise ValueError("truncated GIF (no trailer)")
    return {"width": width, "height": height, "n_frames": n_frames}


_FIELDS = (
    "width",
    "height",
    "n_frames",
    "sample_rate",
    "n_channels",
    "duration_ms",
)


def decode_media(payload: bytes) -> dict:
    """Sniff the container by magic bytes and parse its real structure.
    Returns a dict over the full metadata field set with None for
    fields the modality doesn't carry."""
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        meta = _parse_png(b)
    elif b[:4] == b"RIFF":
        meta = _parse_wav(b)
    elif b[:6] in (b"GIF89a", b"GIF87a"):
        meta = _parse_gif(b)
    else:
        raise ValueError("unrecognized media container")
    return {f: meta.get(f) for f in _FIELDS}
