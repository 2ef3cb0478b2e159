"""Unit tests for the pure-Python media codec (no Spark needed):
builder->parser round trips, structural edge cases, and corruption
detection — the properties the mm_decode oracle hash cannot see."""

import pytest

from tsengine.operators import media_codec as mc
from tsengine.operators.multimodal import _WAV_RATES, build_payload


def test_png_round_trip_and_crc():
    p = mc.build_png(320, 200, b"payload-bytes")
    meta = mc.decode_media(p)
    assert meta["width"] == 320 and meta["height"] == 200
    assert meta["n_frames"] == 1
    assert meta["sample_rate"] is None
    # flip one IHDR byte -> CRC check must reject
    bad = bytearray(p)
    bad[18] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mc.decode_media(bytes(bad))


def test_wav_round_trip_including_odd_chunk_padding():
    p = mc.build_wav(22050, 2, 22050)  # exactly 1 s stereo
    meta = mc.decode_media(p)
    assert meta["sample_rate"] == 22050
    assert meta["n_channels"] == 2
    assert meta["duration_ms"] == 1000
    # truncated file (no data chunk) must be rejected, not mis-parsed
    with pytest.raises(ValueError):
        mc.decode_media(p[:20])


def test_gif_frame_walk_counts_blocks_not_bytes():
    # frames of very different payload sizes, incl. one spanning
    # multiple 255-byte sub-blocks — the walker must consume sub-block
    # framing correctly or the frame count drifts
    frames = [b"a", b"b" * 700, b"c" * 255, b"d" * 256]
    p = mc.build_gif(64, 48, frames)
    meta = mc.decode_media(p)
    assert meta == {
        "width": 64,
        "height": 48,
        "n_frames": 4,
        "sample_rate": None,
        "n_channels": None,
        "duration_ms": None,
    }
    # truncating inside a sub-block is detected
    with pytest.raises(ValueError):
        mc.decode_media(p[:-5])


def test_unknown_container_rejected():
    with pytest.raises(ValueError, match="unrecognized"):
        mc.decode_media(b"\x00\x01\x02\x03\x04\x05\x06\x07\x08")


@pytest.mark.parametrize("doc_id", range(12))
def test_build_payload_decodes_to_embedded_params(doc_id):
    text = "word " * (doc_id * 17 + 1)
    meta = mc.decode_media(build_payload(doc_id, text))
    m = doc_id % 3
    if m == 0:
        assert meta["width"] == 16 + (doc_id * 7) % 240
        assert meta["height"] == 16 + (doc_id * 13) % 240
        assert meta["n_frames"] == 1
    elif m == 1:
        rate = _WAV_RATES[doc_id % 4]
        n_samples = 100 + len(text.encode()) % 1000
        assert meta["sample_rate"] == rate
        assert meta["n_channels"] == 1 + doc_id % 2
        assert meta["duration_ms"] == n_samples * 1000 // rate
    else:
        assert meta["width"] == 16 + (doc_id * 5) % 200
        assert meta["height"] == 16 + (doc_id * 11) % 200
        assert meta["n_frames"] == 1 + doc_id % 4


@pytest.mark.parametrize("seed,w,h", [(0, 16, 16), (123, 37, 21), (255, 224, 198), (7, 1, 1), (42, 2, 300)])
def test_png_pixel_decode_reconstructs_raster(seed, w, h):
    import numpy as np

    png = mc.build_png_image(w, h, seed)
    W, H, recon = mc.decode_png_pixels(png)
    assert (W, H) == (w, h)
    expect = ((seed + np.arange(h * w * 3)) % 256).astype(np.uint8).reshape(h, w * 3)
    assert np.array_equal(recon, expect)
    # the metadata parser handles the multi-IDAT layout too
    meta = mc.decode_media(png)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, 1)


def test_png_pixel_decode_detects_idat_corruption():
    import struct
    import zlib

    png = bytearray(mc.build_png_image(20, 20, 5))
    # flip one bit inside the first IDAT payload, re-stamp its CRC so
    # the chunk walk passes — the raster must then disagree, and a
    # truncated/invalid zlib stream must raise, never silently succeed
    idx = png.index(b"IDAT")
    (length,) = struct.unpack_from(">I", png, idx - 4)
    png[idx + 4 + 8] ^= 0xFF
    crc = zlib.crc32(bytes(png[idx : idx + 4 + length])) & 0xFFFFFFFF
    struct.pack_into(">I", png, idx + 4 + length, crc)
    try:
        _, _, recon = mc.decode_png_pixels(bytes(png))
        import numpy as np

        expect = ((5 + np.arange(20 * 60)) % 256).astype(np.uint8).reshape(20, 60)
        assert not np.array_equal(recon, expect)
    except (ValueError, zlib.error):
        pass


@pytest.mark.parametrize("cut_step", [7])
def test_truncated_containers_raise_valueerror(cut_step):
    payloads = [
        mc.build_png_image(24, 18, 3),
        mc.build_wav(16000, 2, 150),
        mc.build_gif(20, 20, [b"abc" * 10] * 3),
    ]
    for full in payloads:
        for cut in range(8, len(full), cut_step):
            try:
                mc.decode_media(full[:cut])
            except ValueError:
                continue
            # a prefix that still parses must be structurally complete
            # (only possible if the cut landed exactly at the end)
            assert cut == len(full)


def test_degenerate_wav_fmt_raises_valueerror():
    import struct

    wav = bytearray(mc.build_wav(8000, 1, 10))
    pos = wav.index(b"fmt ") + 8
    struct.pack_into("<H", wav, pos + 2, 0)  # channels = 0
    with pytest.raises(ValueError, match="degenerate"):
        mc.decode_media(bytes(wav))


def test_thumbnail_nn_matches_per_pixel_loop():
    """The vectorized NN resample (fancy-index gather) must equal a
    brute-force per-output-pixel loop over the decoded raster."""
    import numpy as np

    w, h, seed = 45, 23, 77
    pw, ph, raster = mc.decode_png_pixels(mc.build_png_image(w, h, seed))
    assert (pw, ph) == (w, h)
    target = 32
    scale = min(target / w, target / h)
    out_w, out_h = int(np.floor(w * scale)), int(np.floor(h * scale))

    # kernel's vectorized gather (mirrors multimodal.mm_thumbnail)
    src_r = (np.arange(out_h) * h) // out_h
    src_c = (np.arange(out_w) * w) // out_w
    byte_idx = (src_c[:, None] * 3 + np.arange(3)[None, :]).ravel()
    fast = raster[src_r][:, byte_idx]

    slow = np.zeros((out_h, out_w * 3), dtype=raster.dtype)
    for i in range(out_h):
        for j in range(out_w):
            r, c = (i * h) // out_h, (j * w) // out_w
            slow[i, 3 * j : 3 * j + 3] = raster[r, 3 * c : 3 * c + 3]
    assert (fast == slow).all()


def test_decode_wav_samples_roundtrip():
    import numpy as np

    from tsengine.operators.media_codec import build_wav, decode_wav_samples

    rate, nch, s = decode_wav_samples(build_wav(16000, 2, 50))
    assert (rate, nch) == (16000, 2)
    assert s.size == 100
    # builder byte formula: sample j = signed16((2j*31)%256 + 256*((2j+1)*31)%256)
    j = np.arange(100)
    u = (2 * j * 31) % 256 + 256 * (((2 * j + 1) * 31) % 256)
    expect = np.where(u >= 32768, u - 65536, u)
    assert (s == expect).all()


def test_decode_wav_samples_rejects_malformed():
    import pytest as _pytest

    from tsengine.operators.media_codec import build_wav, decode_wav_samples

    good = build_wav(8000, 1, 10)
    with _pytest.raises(ValueError):
        decode_wav_samples(good[:20])  # truncated chunk
    with _pytest.raises(ValueError):
        decode_wav_samples(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks
