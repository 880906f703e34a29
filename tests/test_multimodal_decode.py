"""Golden-pixel tests for the real media decode kernels (multimodal).

decode_media really decodes PPM/BMP/PNG (stdlib-only: struct + zlib +
numpy); these tests pin exact pixel values — including hand-filtered
PNG scanlines for all five filter types — and run the decode end to
end through Spark (image_stats, resize_images).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dex_data_ingestor_spark.operators.multimodal import (
    decode_media,
    encode_ppm,
    image_stats,
    resize_images,
)


def _gradient(h, w):
    """Deterministic RGB test image."""
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            arr[y, x] = ((y * 37 + x * 11) % 256, (x * 53) % 256, (y * 29) % 256)
    return arr


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_bytes(raw_scanlines: bytes, w: int, h: int, color: int,
               plte: bytes | None = None) -> bytes:
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    )
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(raw_scanlines)) + _png_chunk(
        b"IEND", b""
    )


def _bmp_24(pixels_top_down: list[list[tuple]]) -> bytes:
    """Minimal bottom-up 24-bit BI_RGB BMP from RGB pixel rows."""
    h, w = len(pixels_top_down), len(pixels_top_down[0])
    stride = (w * 3 + 3) // 4 * 4
    body = b""
    for row in reversed(pixels_top_down):  # stored bottom-up
        line = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)
        body += line + b"\x00" * (stride - len(line))
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + dib + body


# ---------------------------------------------------------------------------
# PPM
# ---------------------------------------------------------------------------


def test_ppm_roundtrip_golden():
    arr = _gradient(5, 7)
    decoded = decode_media(encode_ppm(arr))
    assert decoded.shape == (5, 7, 3)
    assert np.array_equal(decoded, arr)


def test_ppm_header_comment_and_pixel():
    payload = b"P6\n# a comment\n2 1\n255\n" + bytes((9, 8, 7, 1, 2, 3))
    decoded = decode_media(payload)
    assert decoded.shape == (1, 2, 3)
    assert tuple(decoded[0, 0]) == (9, 8, 7)
    assert tuple(decoded[0, 1]) == (1, 2, 3)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp_golden_pixels():
    img = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (255, 255, 255)],
    ]
    decoded = decode_media(_bmp_24(img))
    assert decoded.shape == (2, 2, 3)
    # top-down RGB restored from bottom-up BGR storage
    assert tuple(decoded[0, 0]) == (255, 0, 0)
    assert tuple(decoded[0, 1]) == (0, 255, 0)
    assert tuple(decoded[1, 0]) == (0, 0, 255)
    assert tuple(decoded[1, 1]) == (255, 255, 255)


# ---------------------------------------------------------------------------
# PNG — filters, color types
# ---------------------------------------------------------------------------


def test_png_filter0_roundtrip_rgb():
    arr = _gradient(4, 3)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(4))
    decoded = decode_media(_png_bytes(raw, 3, 4, color=2))
    assert np.array_equal(decoded, arr)


def test_png_sub_and_up_filters_golden():
    # 2x2 RGB image: row0 Sub-filtered, row1 Up-filtered (hand-computed)
    # raw pixels: row0 (10,20,30),(40,60,80); row1 (15,25,35),(50,70,90)
    raw = (
        bytes([1, 10, 20, 30, 30, 40, 50])  # Sub: second px minus first
        + bytes([2, 5, 5, 5, 10, 10, 10])   # Up: row1 minus row0
    )
    decoded = decode_media(_png_bytes(raw, 2, 2, color=2))
    assert tuple(decoded[0, 0]) == (10, 20, 30)
    assert tuple(decoded[0, 1]) == (40, 60, 80)
    assert tuple(decoded[1, 0]) == (15, 25, 35)
    assert tuple(decoded[1, 1]) == (50, 70, 90)


def test_png_average_and_paeth_filters_golden():
    # same pixel values, rows filtered with Average then Paeth
    raw = (
        bytes([3, 10, 20, 30, 35, 50, 65])
        + bytes([4, 5, 5, 5, 10, 10, 10])
    )
    decoded = decode_media(_png_bytes(raw, 2, 2, color=2))
    assert tuple(decoded[0, 0]) == (10, 20, 30)
    assert tuple(decoded[0, 1]) == (40, 60, 80)
    assert tuple(decoded[1, 0]) == (15, 25, 35)
    assert tuple(decoded[1, 1]) == (50, 70, 90)


def test_png_grayscale_and_rgba():
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(2))
    g = decode_media(_png_bytes(raw, 3, 2, color=0))
    assert g.shape == (2, 3, 1) and np.array_equal(g, gray)

    rgba = np.arange(16, dtype=np.uint8).reshape(2, 2, 4)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(2))
    a = decode_media(_png_bytes(raw, 2, 2, color=6))
    assert a.shape == (2, 2, 4) and np.array_equal(a, rgba)


def test_png_palette_expands_to_rgb():
    plte = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255))  # red, green, blue
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)[..., None]
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    decoded = decode_media(_png_bytes(raw, 2, 2, color=3, plte=plte))
    assert decoded.shape == (2, 2, 3)
    assert tuple(decoded[0, 0]) == (255, 0, 0)
    assert tuple(decoded[0, 1]) == (0, 255, 0)
    assert tuple(decoded[1, 0]) == (0, 0, 255)


def test_undecodable_formats_still_raise():
    # a JPEG SOI with a garbage body now reaches the real baseline
    # decoder and quarantines as malformed (ValueError), not as a
    # codec gap
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0JFIF-ish", {"format": "jpeg"})
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", None)
    with pytest.raises(NotImplementedError):
        decode_media(b"RIFF0000WEBP", {"format": "webp"})


# ---------------------------------------------------------------------------
# End-to-end through Spark
# ---------------------------------------------------------------------------


def test_image_stats_end_to_end(spark):
    imgs = {1: _gradient(4, 6), 2: _gradient(3, 3)}
    rows = [(k, bytearray(encode_ppm(v))) for k, v in imgs.items()]
    rows.append((3, bytearray(b"not an image at all")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in image_stats(df).collect()}
    assert len(out) == 3
    for k, arr in imgs.items():
        r = out[k]
        assert r.decoded and (r.width, r.height, r.channels) == (
            arr.shape[1], arr.shape[0], 3,
        )
        px = arr.astype(np.float64)
        assert abs(r.mean_px - px.mean()) < 1e-9
        assert abs(r.std_px - px.std()) < 1e-9
    assert out[3].decoded is False and out[3].width is None
    # quarantine reason distinguishes codec gaps from bug-shaped errors
    assert out[3].error.startswith("NotImplementedError")
    assert out[1].error is None


def test_resize_images_real_path(spark):
    arr = _gradient(4, 4)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(arr)),
          {"media_type": "image", "format": "ppm", "width": 4,
           "height": 4, "duration_ms": None})],
        "doc_id long, payload binary, media_meta struct<"
        "media_type:string,format:string,width:int,height:int,"
        "duration_ms:bigint>",
    )
    r = resize_images(df, 2, 2).collect()[0]
    assert r.media_meta.width == 2 and r.media_meta.format == "ppm"
    out = decode_media(bytes(r.payload))
    # nearest-neighbor: rows/cols 0 and 2 survive
    want = arr[[0, 2]][:, [0, 2]]
    assert np.array_equal(out, want)


def test_resize_images_fallback_for_undecodable(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"z" * 1000),
          {"media_type": "image", "format": "fake", "width": 9,
           "height": 9, "duration_ms": None})],
        "doc_id long, payload binary, media_meta struct<"
        "media_type:string,format:string,width:int,height:int,"
        "duration_ms:bigint>",
    )
    r = resize_images(df, 128, 128).collect()[0]
    assert len(r.payload) == max(16, (128 * 128) // 64)
    # fallback rows keep their ORIGINAL metadata — the payload was not
    # resized, so media_meta must not claim target dimensions
    assert r.media_meta.format == "fake"
    assert r.media_meta.width == 9 and r.media_meta.height == 9


def test_binary_file_source_to_image_stats(spark, tmp_path):
    """The full multimodal ingest path: binaryFile source (listing-
    level glob pruning) -> decode -> image_stats, one Spark job."""
    from dex_data_ingestor_spark.sources.files import read_binary_files

    imgs = {}
    for i in range(4):
        arr = _gradient(3 + i, 5)
        (tmp_path / f"img_{i}.ppm").write_bytes(encode_ppm(arr))
        imgs[f"img_{i}.ppm"] = arr
    (tmp_path / "notes.txt").write_text("not an image")

    files = read_binary_files(spark, str(tmp_path), glob="*.ppm")
    assert files.count() == 4  # the .txt never enters the scan
    # deterministic id from the path: with_ids is evaluated twice
    # below (stats input + name join), so a nondeterministic id like
    # monotonically_increasing_id could diverge between evaluations
    with_ids = files.select(
        F.xxhash64("path").alias("doc_id"),
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        F.col("content").alias("payload"),
    )
    stats = image_stats(with_ids).join(
        with_ids.select("doc_id", "fname"), "doc_id"
    )
    out = {r.fname: r for r in stats.collect()}
    assert len(out) == 4
    for fname, arr in imgs.items():
        r = out[fname]
        assert r.decoded
        assert (r.width, r.height) == (arr.shape[1], arr.shape[0])
        assert abs(r.mean_px - arr.astype("float64").mean()) < 1e-9

    # length pushdown variant: cap below the largest file
    sizes = sorted(len(encode_ppm(a)) for a in imgs.values())
    capped = read_binary_files(
        spark, str(tmp_path), glob="*.ppm", max_bytes=sizes[-2]
    )
    assert capped.count() == 3


# ---------------------------------------------------------------------------
# Hostile/degenerate inputs (quarantine, never a task crash)
# ---------------------------------------------------------------------------


def test_png_bomb_dimensions_rejected():
    """A tiny payload declaring 50000x50000 RGBA must be rejected
    BEFORE allocation, not OOM the process."""
    raw = zlib.compress(b"\x00" * 100)
    bomb = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 50_000, 50_000, 8, 6, 0, 0, 0)
    ) + _png_chunk(b"IDAT", raw) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="MAX_DECODED_BYTES"):
        decode_media(bomb)


def test_png_truncated_idat_rejected():
    """IDAT inflating to fewer bytes than IHDR promises is corrupt."""
    raw = zlib.compress(b"\x00" * 3)  # far short of a 4x4 RGB image
    short = _png_bytes(raw, 4, 4, color=2)
    # _png_bytes compresses again; build manually with the short IDAT
    short = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    ) + _png_chunk(b"IDAT", raw) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="length mismatch"):
        decode_media(short)


def test_png_crc_mismatch_quarantines():
    """A bit-flipped-but-still-inflatable chunk must be rejected via
    its CRC, not decode silently to wrong pixels."""
    arr = _gradient(4, 3)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(4))
    good = _png_bytes(raw, 3, 4, color=2)
    assert np.array_equal(decode_media(good), arr)  # control
    # flip one bit inside the IDAT body (after the 4-byte type tag)
    idat_at = good.index(b"IDAT")
    bad = bytearray(good)
    bad[idat_at + 6] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_media(bytes(bad))


def test_png_truncated_chunk_rejected():
    """A chunk whose declared length runs past the payload end must
    raise, not silently read a short body."""
    arr = _gradient(2, 2)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(2))
    good = _png_bytes(raw, 2, 2, color=2)
    # cut mid-IDAT: the chunk header is readable but its declared body
    # length runs past the end of the payload
    cut = good.index(b"IDAT") + 6
    with pytest.raises(ValueError, match="truncated"):
        decode_media(good[:cut])


def test_png_slow_filter_budget(monkeypatch):
    """Average/Paeth scanlines carry a separate CPU budget: a hostile
    all-Paeth image quarantines instead of pinning a core (slow-loris).
    Vectorized filters (None/Sub/Up) are not budgeted."""
    import dex_data_ingestor_spark.operators.multimodal as mm

    arr = _gradient(4, 3)
    paeth_raw = (
        bytes([4]) + arr[0].tobytes()  # Paeth row w/ zero predecessors
        + b"".join(b"\x00" + arr[y].tobytes() for y in range(1, 4))
    )
    monkeypatch.setattr(mm, "MAX_SLOW_FILTER_BYTES", 4)
    with pytest.raises(ValueError, match="MAX_SLOW_FILTER_BYTES"):
        decode_media(_png_bytes(paeth_raw, 3, 4, color=2))
    # filter-0-only image of the same size decodes fine under the
    # tiny slow budget
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(4))
    assert np.array_equal(decode_media(_png_bytes(raw, 3, 4, color=2)), arr)


def test_png_sub_filter_wide_row_vectorized_golden():
    """Sub filter on a wide row exercises the per-lane cumsum path
    against an independently-computed expectation."""
    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(1, 64, 3), dtype=np.uint8)
    # forward Sub filter: filt[x] = raw[x] - raw[x-1] (per channel)
    diffs = pixels[0].astype(np.int16)
    diffs[1:] -= pixels[0][:-1].astype(np.int16)
    filt = (diffs % 256).astype(np.uint8)
    raw = bytes([1]) + filt.tobytes()
    decoded = decode_media(_png_bytes(raw, 64, 1, color=2))
    assert np.array_equal(decoded, pixels)


def test_image_stats_quarantines_nulls_and_zero_pixel(spark):
    """NULL payloads and 0x0 images become decoded=false rows; the job
    must not crash and must not emit NaN moments."""
    import math

    rows = [
        (1, bytearray(encode_ppm(_gradient(2, 2)))),
        (2, None),                                  # NULL payload
        (3, bytearray(b"P6\n0 0\n255\n")),          # zero-pixel image
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in image_stats(df).collect()}
    assert out[1].decoded
    assert not out[2].decoded and out[2].mean_px is None
    assert not out[3].decoded and out[3].mean_px is None
    assert all(
        r.mean_px is None or not math.isnan(r.mean_px)
        for r in out.values()
    )


def test_resize_images_null_payload_passthrough(spark):
    df = spark.createDataFrame(
        [(1, None,
          {"media_type": "image", "format": "png", "width": 9,
           "height": 9, "duration_ms": None})],
        "doc_id long, payload binary, media_meta struct<"
        "media_type:string,format:string,width:int,height:int,"
        "duration_ms:bigint>",
    )
    r = resize_images(df, 32, 32).collect()[0]
    assert r.payload is None
    # NULL payload = nothing resized: original metadata preserved
    assert r.media_meta.width == 9 and r.media_meta.format == "png"


# ---------------------------------------------------------------------------
# WAV / audio_stats
# ---------------------------------------------------------------------------


def _wav_via_stdlib(rate, n_ch, bits, frames):
    """Golden WAV built by the INDEPENDENT stdlib `wave` encoder
    (integer PCM only): frames is an int numpy array (n, ch)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(n_ch)
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    if bits == 8:
        data = (frames + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = frames.astype("<i2").tobytes()
    elif bits == 24:
        x = frames.astype(np.int32)
        b = np.zeros((x.size, 3), dtype=np.uint8)
        flat = x.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        data = b.tobytes()
    else:
        data = frames.astype("<i4").tobytes()
    w.writeframes(data)
    w.close()
    return buf.getvalue()


def _wav_float32(rate, n_ch, frames):
    """Hand-built float-PCM WAV (format tag 3) — stdlib wave can't
    write these, so construct the RIFF by hand."""
    import struct as st

    data = frames.astype("<f4").tobytes()
    fmt = st.pack("<HHIIHH", 3, n_ch, rate, rate * n_ch * 4, n_ch * 4, 32)
    body = (
        b"WAVE"
        + b"fmt " + st.pack("<I", len(fmt)) + fmt
        + b"data" + st.pack("<I", len(data)) + data
    )
    return b"RIFF" + st.pack("<I", len(body)) + body


def test_wav_decode_golden_sine(spark):
    """A 440 Hz int16 sine decodes with exact rate/channels/frames,
    duration, RMS ~ 1/sqrt(2) of amplitude, and ~2*440 zero
    crossings/sec; 8/24/32-bit and stereo variants agree with the
    independent stdlib encoder."""
    import numpy as np

    from dex_data_ingestor_spark.operators.multimodal import audio_stats

    rate, secs = 8000, 1.0
    t = np.arange(int(rate * secs)) / rate
    sine = np.sin(2 * np.pi * 440 * t)

    payloads = [
        (1, _wav_via_stdlib(rate, 1, 16, (sine * 30000).astype(int).reshape(-1, 1))),
        (2, _wav_via_stdlib(rate, 2, 16, np.column_stack([
            (sine * 30000).astype(int), (sine * 15000).astype(int)]))),
        (3, _wav_via_stdlib(rate, 1, 8, (sine * 120).astype(int).reshape(-1, 1))),
        (4, _wav_via_stdlib(rate, 1, 24, (sine * (1 << 22)).astype(int).reshape(-1, 1))),
        (5, _wav_via_stdlib(rate, 1, 32, (sine * (1 << 30)).astype(int).reshape(-1, 1))),
        (6, _wav_float32(rate, 1, sine.astype(np.float32).reshape(-1, 1))),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = {r.doc_id: r for r in audio_stats(df).collect()}

    for d, row in out.items():
        assert row.decoded, (d, row.error)
        assert row.sample_rate == rate and row.n_frames == rate
        assert abs(row.duration_ms - 1000.0) < 1e-9
    assert out[2].channels == 2 and out[1].channels == 1
    # sine RMS = amp/sqrt(2); int16 amp 30000/32768
    exp_rms = (30000 / 32768) / np.sqrt(2)
    assert abs(out[1].rms - exp_rms) < 0.01
    assert abs(out[6].rms - 1 / np.sqrt(2)) < 0.01
    # 440 Hz -> ~880 sign changes per second
    assert abs(out[1].zero_crossing_rate * rate - 880) < 10
    assert out[1].peak <= 1.0


def test_wav_quarantine_paths(spark):
    """Hostile/unsupported audio quarantines per row with the reason
    recorded: truncated chunk, compressed format tag, junk bytes,
    NULL payload, zero frames."""
    import struct as st

    from dex_data_ingestor_spark.operators.multimodal import audio_stats

    good = _wav_float32(8000, 1, __import__("numpy").zeros((10, 1)))
    adpcm = good.replace(st.pack("<HH", 3, 1), st.pack("<HH", 2, 1), 1)
    truncated = good[:-6]
    rows = [
        (1, b"garbage not riff"),
        (2, adpcm),                       # fmt tag 2 (ADPCM)
        (3, truncated),
        (4, None),
        (5, _wav_float32(8000, 1, __import__("numpy").zeros((0, 1)))),
        (6, good),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in audio_stats(df).collect()}
    assert out[6].decoded
    for d in (1, 2, 3, 4, 5):
        assert not out[d].decoded, d
        assert out[d].error
    assert out[2].error.startswith("NotImplementedError")
    assert out[1].error.startswith("ValueError")


def test_wav_hostile_sample_rate_quarantines(spark):
    """A declared uint32 rate above int32 range must quarantine (the
    stats schema field is IntegerType; wraparound or an Arrow cast
    error would break the one-bad-file contract)."""
    import struct as st

    import numpy as np

    from dex_data_ingestor_spark.operators.multimodal import audio_stats

    good = _wav_float32(8000, 1, np.zeros((10, 1)))
    hostile = good.replace(
        st.pack("<HHI", 3, 1, 8000), st.pack("<HHI", 3, 1, 2**31 + 5), 1
    )
    df = spark.createDataFrame(
        [(1, hostile), (2, good)], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in audio_stats(df).collect()}
    assert out[2].decoded
    assert not out[1].decoded and out[1].error.startswith("ValueError")


# ---------------------------------------------------------------------------
# GIF decode + real frame sampling
# ---------------------------------------------------------------------------


def _lzw_pack(codes, width):
    """Pack LZW codes LSB-first at a FIXED width (valid for streams
    whose dictionary never grows past the width boundary)."""
    acc = bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _trivial_lzw(indices, min_code):
    """Clear before every literal: the dictionary never grows, so the
    code width stays min_code+1 throughout — a valid (if inefficient)
    GIF LZW stream."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes = []
    for i in indices:
        codes += [clear, i]
    codes.append(eoi)
    return _lzw_pack(codes, min_code + 1)


def _gif(w, h, frame_specs, palette, version=b"GIF89a", bg=0):
    """Hand-built GIF: frame_specs = [(left, top, fw, fh, indices,
    iflags, gce_transparent_or_None), ...]; palette padded to a power
    of two."""
    import struct as st

    n = 2
    while n < len(palette):
        n *= 2
    pal = list(palette) + [(0, 0, 0)] * (n - len(palette))
    out = bytearray(version)
    out += st.pack("<HHBBB", w, h, 0x80 | (n.bit_length() - 2), bg, 0)
    for r, g, b in pal:
        out += bytes((r, g, b))
    min_code = max(2, (n - 1).bit_length())
    for left, top, fw, fh, indices, iflags, transparent in frame_specs:
        if transparent is not None:
            out += bytes((0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0))
        out += bytes((0x2C,)) + st.pack("<HHHHB", left, top, fw, fh, iflags)
        out += bytes((min_code,)) + _subblocks(_trivial_lzw(indices, min_code))
    out += bytes((0x3B,))
    return bytes(out)


_PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]


def test_gif_decode_golden_and_compositing(spark):
    """Frame 1 paints the full 2x2 canvas; frame 2 overdraws one pixel
    in a sub-region; frame 3 is fully transparent (canvas persists)."""
    import numpy as np

    from dex_data_ingestor_spark.operators.multimodal import _decode_gif

    gif = _gif(
        2, 2,
        [
            (0, 0, 2, 2, [0, 1, 2, 3], 0, None),
            (1, 1, 1, 1, [0], 0, None),
            (0, 0, 2, 2, [3, 3, 3, 3], 0, 3),  # all transparent
        ],
        _PAL4,
    )
    frames = _decode_gif(gif)
    assert len(frames) == 3
    f1, f2, f3 = frames
    expect1 = np.array([[_PAL4[0], _PAL4[1]], [_PAL4[2], _PAL4[3]]], np.uint8)
    assert (f1 == expect1).all()
    expect2 = expect1.copy()
    expect2[1, 1] = _PAL4[0]
    assert (f2 == expect2).all()
    assert (f3 == expect2).all()  # transparency kept prior canvas


def test_gif_lzw_dictionary_growth_kwkwk():
    """The KwKwK case: codes [CLEAR, 1, 6, EOI] at min_code=2 decode
    to [1, 1, 1] (code 6 == next_free -> prev + prev[0])."""
    from dex_data_ingestor_spark.operators.multimodal import (
        _gif_lzw_decode,
    )

    data = _lzw_pack([4, 1, 6, 5], 3)
    assert _gif_lzw_decode(data, 2, 10) == b"\x01\x01\x01"


def test_gif_interlaced_row_order(spark):
    """An 8-row interlaced frame stores rows in pass order (0,4,2,6,
    1,3,5,7 for h=8); the decoder must put them back."""
    import numpy as np

    from dex_data_ingestor_spark.operators.multimodal import _decode_gif

    # row y gets palette color y%4; stored in interlace order
    stored_rows = [0, 4, 2, 6, 1, 3, 5, 7]
    indices = [y % 4 for y in stored_rows]
    gif = _gif(1, 8, [(0, 0, 1, 8, indices, 0x40, None)], _PAL4)
    (frame,) = _decode_gif(gif)
    got = [tuple(frame[y, 0]) for y in range(8)]
    assert got == [_PAL4[y % 4] for y in range(8)]


def test_gif_hostile_inputs():
    import struct as st

    import pytest as _pytest

    from dex_data_ingestor_spark.operators.multimodal import _decode_gif

    good = _gif(2, 2, [(0, 0, 2, 2, [0, 1, 2, 3], 0, None)], _PAL4)
    with _pytest.raises(ValueError):
        _decode_gif(b"GIF89a" + b"\x00" * 3)        # truncated header
    with _pytest.raises(ValueError):
        _decode_gif(good[:-4])                       # truncated stream
    bomb = bytearray(good)
    st.pack_into("<HH", bomb, 6, 65535, 65535)       # 12.9 GB canvas
    with _pytest.raises(ValueError):
        _decode_gif(bytes(bomb))
    # frame exceeding canvas
    bad = _gif(2, 2, [(1, 1, 2, 2, [0, 1, 2, 3], 0, None)], _PAL4)
    with _pytest.raises(ValueError):
        _decode_gif(bad)


def test_sample_frames_real_gif_and_standin(spark):
    """GIF payloads yield REAL composited frames (PPM, decodable
    downstream); junk payloads keep the byte-window stand-in and are
    marked real=false; frame_stride subsamples."""
    import numpy as np

    from dex_data_ingestor_spark.operators.multimodal import (
        decode_media,
        sample_frames,
    )

    gif = _gif(
        2, 2,
        [(0, 0, 2, 2, [0, 1, 2, 3], 0, None)]
        + [(0, 0, 1, 1, [i % 4], 0, None) for i in range(5)],
        _PAL4,
    )
    df = spark.createDataFrame(
        [(1, gif), (2, b"\x00" * 150)], "doc_id long, payload binary"
    )
    out = sample_frames(df, every_n_bytes=64).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.frame_idx)):
        by_doc.setdefault(r.doc_id, []).append(r)

    assert len(by_doc[1]) == 6 and all(r.real for r in by_doc[1])
    first = decode_media(bytes(by_doc[1][0].frame))
    assert first.shape == (2, 2, 3)
    assert (first[0, 0] == _PAL4[0]).all()
    assert len(by_doc[2]) == 3 and not any(r.real for r in by_doc[2])

    strided = sample_frames(
        df.filter("doc_id = 1"), frame_stride=3
    ).collect()
    assert len(strided) == 2  # frames 0 and 3 of 6

    # decode_media returns the FIRST frame for a GIF
    assert (decode_media(gif) == first).all()


def test_gif_many_tiny_frames_canvas_bomb_bounded():
    """The 620-byte bomb: a big (in-budget) canvas plus many 1-pixel
    frames must hit the pixel budget (each frame appends a CANVAS
    copy), not allocate gigabytes."""
    import pytest as _pytest

    from dex_data_ingestor_spark.operators.multimodal import (
        MAX_DECODED_BYTES,
        _decode_gif,
        decode_media,
    )

    side = 4096  # 16.7M-px canvas, ~5 canvas copies fit the budget
    frames = [(0, 0, 1, 1, [0], 0, None)] * 40
    frames[0] = (0, 0, 1, 1, [0], 0, None)
    gif = _gif(side, side, frames, _PAL4)
    assert len(gif) < 2000
    with _pytest.raises(ValueError, match="pixel budget"):
        _decode_gif(gif)
    # the first-frame contract still decodes cheaply (max_frames=1)
    first = decode_media(gif)
    assert first.shape == (side, side, 3)


def test_gif_nonzero_background_index_fills_canvas():
    """The header's background-color index (not palette entry 0) is the
    initial canvas fill: a first frame covering only one pixel leaves
    the rest of the canvas showing palette[bg]. A bg index pointing
    past the palette clamps instead of crashing."""
    import numpy as np

    from dex_data_ingestor_spark.operators.multimodal import _decode_gif

    gif = _gif(2, 2, [(0, 0, 1, 1, [0], 0, None)], _PAL4, bg=2)
    f1 = _decode_gif(gif)[0]
    assert (f1[0, 0] == _PAL4[0]).all()
    for y, x in ((0, 1), (1, 0), (1, 1)):
        assert (f1[y, x] == _PAL4[2]).all()

    hostile = _gif(2, 2, [(0, 0, 1, 1, [0], 0, None)], _PAL4, bg=255)
    f1 = _decode_gif(hostile)[0]  # clamped to the last palette entry
    assert (f1[1, 1] == _PAL4[3]).all()


def test_sample_frames_null_payload_and_id_quarantine(spark):
    """One NULL payload (or NULL id) row must not kill the scan
    (the contract image_stats/audio_stats already honor): it emits a
    single real=false placeholder row and every other row still
    decodes."""
    from dex_data_ingestor_spark.operators.multimodal import sample_frames

    gif = _gif(2, 2, [(0, 0, 2, 2, [0, 1, 2, 3], 0, None)], _PAL4)
    df = spark.createDataFrame(
        [(1, gif), (2, None), (None, b"\x00" * 10)],
        "doc_id long, payload binary",
    )
    out = sample_frames(df, every_n_bytes=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].real
    assert len(by_doc[2]) == 1
    assert not by_doc[2][0].real and by_doc[2][0].frame is None
    assert len(by_doc[None]) == 1 and not by_doc[None][0].real


# ---------------------------------------------------------------------------
# JPEG — hand-built baseline encoder (test-side) + analytic goldens
# ---------------------------------------------------------------------------

_JZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _JBitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes_stuffed(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)


def _jhuff_table(symbols):
    """Canonical uniform-length table for the given symbols: counts +
    symbol list for the DHT segment and {sym: (len, code)} for the
    encoder. Length L chosen so the all-ones code stays unused."""
    n = len(symbols)
    L = (n + 1).bit_length()
    counts = [0] * 16
    counts[L - 1] = n
    enc = {s: (L, i) for i, s in enumerate(symbols)}
    return bytes(counts), bytes(symbols), enc


def _jcat(v):
    """JPEG magnitude category + raw bits for a signed value."""
    if v == 0:
        return 0, 0
    t = abs(v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _jencode_block(bw, coef_zz, pred, dc_enc, ac_enc):
    """Encode one block's zigzag coefficient list; returns new pred."""
    dc = coef_zz[0]
    t, raw = _jcat(dc - pred)
    length, code = dc_enc[t]
    bw.write(code, length)
    if t:
        bw.write(raw, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if coef_zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if coef_zz[k] == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_enc[0xF0]
            bw.write(code, length)
            run -= 16
        s, raw = _jcat(coef_zz[k])
        length, code = ac_enc[(run << 4) | s]
        bw.write(code, length)
        bw.write(raw, s)
        run = 0
    if last_nz < 63:
        length, code = ac_enc[0x00]
        bw.write(code, length)
    return dc


def _jseg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _make_jpeg(w, h, comp_blocks, sampling, restart=0):
    """Assemble a baseline JPEG. comp_blocks: per component a list of
    MCU-ordered zigzag coefficient lists (quant table = identity).
    sampling: [(hs, vs), ...]."""
    nc = len(comp_blocks)
    dqt = _jseg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof_body = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(sampling):
        sof_body += bytes([ci + 1, (hs << 4) | vs, 0])
    sof = _jseg(0xC0, sof_body)

    dc_syms = list(range(12))
    used_ac = {0x00, 0xF0}
    for blocks in comp_blocks:
        for zz in blocks:
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    run -= 16
                s, _ = _jcat(zz[k])
                used_ac.add((run << 4) | s)
                run = 0
    dc_counts, dc_symbols, dc_enc = _jhuff_table(dc_syms)
    ac_counts, ac_symbols, ac_enc = _jhuff_table(sorted(used_ac))
    dht = _jseg(0xC4, bytes([0x00]) + dc_counts + dc_symbols) + _jseg(
        0xC4, bytes([0x10]) + ac_counts + ac_symbols
    )

    sos_body = bytes([nc])
    for ci in range(nc):
        sos_body += bytes([ci + 1, 0x00])
    sos_body += bytes([0, 63, 0])
    sos = _jseg(0xDA, sos_body)

    # interleave MCUs; comp_blocks[ci] is already MCU-major with
    # hs*vs blocks per MCU for that component
    per_mcu = [hs * vs for hs, vs in sampling]
    n_mcus = len(comp_blocks[0]) // per_mcu[0]
    scan = bytearray()
    bw = _JBitWriter()
    preds = [0] * nc
    rst = 0
    for m in range(n_mcus):
        if restart and m and m % restart == 0:
            scan += bw.bytes_stuffed()
            scan += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _JBitWriter()
            preds = [0] * nc
        for ci in range(nc):
            for b in range(per_mcu[ci]):
                zz = comp_blocks[ci][m * per_mcu[ci] + b]
                preds[ci] = _jencode_block(
                    bw, zz, preds[ci], dc_enc, ac_enc
                )
    scan += bw.bytes_stuffed()

    dri = _jseg(0xDD, struct.pack(">H", restart)) if restart else b""
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(scan)
        + b"\xff\xd9"
    )


def _flat_zz(v):
    """Zigzag coefficients of a flat 8x8 block of pixel value v
    (identity quant): DC = 8*(v-128), all AC zero."""
    zz = [0] * 64
    zz[0] = 8 * (v - 128)
    return zz


def test_jpeg_grayscale_flat_blocks_exact():
    """DC-only analytic golden: four flat 8x8 tiles decode to their
    exact pixel values (IDCT of a pure-DC block is DC/8, +128 level
    shift), including the DC差 prediction chain across blocks."""
    vals = [64, 128, 192, 250]
    # 16x16 grayscale: 4 MCUs of one block each, raster order
    jpg = _make_jpeg(
        16, 16, [[_flat_zz(v) for v in vals]], [(1, 1)]
    )
    arr = decode_media(jpg)
    assert arr.shape == (16, 16, 1)
    assert (arr[:8, :8, 0] == vals[0]).all()
    assert (arr[:8, 8:, 0] == vals[1]).all()
    assert (arr[8:, :8, 0] == vals[2]).all()
    assert (arr[8:, 8:, 0] == vals[3]).all()


def test_jpeg_single_ac_cosine_ramp():
    """One AC coefficient (natural position (0,1), zigzag index 1):
    the decoded block must be the analytic horizontal cosine ramp
    128 + a/(4*sqrt(2)) * cos((2x+1)*pi/16), rounded."""
    import math

    a = 40
    zz = [0] * 64
    zz[1] = a
    jpg = _make_jpeg(8, 8, [[zz]], [(1, 1)])
    arr = decode_media(jpg)
    assert arr.shape == (8, 8, 1)
    for x in range(8):
        expect = round(
            128 + a / (4 * math.sqrt(2))
            * math.cos((2 * x + 1) * math.pi / 16)
        )
        assert (arr[:, x, 0] == expect).all(), (x, arr[:, x, 0], expect)


def test_jpeg_color_420_flat_exact():
    """Flat-color 16x16 4:2:0: one MCU (4 Y blocks + 1 Cb + 1 Cr),
    chroma replicated 2x2 — decoded RGB equals the hand-computed
    BT.601 inverse on the flat plane values."""
    y, cb, cr = 120, 100, 160
    jpg = _make_jpeg(
        16, 16,
        [[_flat_zz(y)] * 4, [_flat_zz(cb)], [_flat_zz(cr)]],
        [(2, 2), (1, 1), (1, 1)],
    )
    arr = decode_media(jpg)
    assert arr.shape == (16, 16, 3)
    exp_r = round(y + 1.402 * (cr - 128))
    exp_g = round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    exp_b = round(y + 1.772 * (cb - 128))
    assert (arr[..., 0] == exp_r).all()
    assert (arr[..., 1] == exp_g).all()
    assert (arr[..., 2] == exp_b).all()


def test_jpeg_restart_intervals_reset_prediction():
    """DRI=2 on a 4-MCU grayscale image: RST markers split the scan
    and reset DC predictors; values must still decode exactly."""
    vals = [90, 110, 130, 150]
    jpg = _make_jpeg(
        32, 8, [[_flat_zz(v) for v in vals]], [(1, 1)], restart=2
    )
    arr = decode_media(jpg)
    assert arr.shape == (8, 32, 1)
    for i, v in enumerate(vals):
        assert (arr[:, 8 * i : 8 * (i + 1), 0] == v).all(), i


def test_jpeg_hostile_inputs_quarantine():
    """Progressive mode, truncated scans, bomb dimensions, and junk
    all raise (NotImplementedError/ValueError) — per-row quarantine,
    never a hang or wrong pixels."""
    good = _make_jpeg(8, 8, [[_flat_zz(128)]], [(1, 1)])
    # SOF0 flipped to SOF2: the baseline scan header (Ss=0, Se=63)
    # is ILLEGAL in progressive mode (a DC scan must have Se=0) —
    # the decoder must reject the doctored stream, not misparse it
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="spectral|Se"):
        decode_media(prog)
    # truncated entropy scan
    with pytest.raises(ValueError):
        decode_media(good[:-12])
    # bomb dimensions (SOF h=w=0xFFFF -> 12.8 GiB RGB)
    idx = good.index(b"\xff\xc0")
    bomb = bytearray(good)
    bomb[idx + 5 : idx + 9] = b"\xff\xff\xff\xff"
    with pytest.raises(ValueError, match="MAX_DECODED_BYTES"):
        decode_media(bytes(bomb))
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\x00garbage")


def test_jpeg_through_image_stats(spark):
    """The crafted JPEG rides the full Spark mapInPandas kernel:
    image_stats decodes it and reports exact dimensions and mean."""
    jpg = _make_jpeg(16, 16, [[_flat_zz(v) for v in (64, 128, 192, 250)]],
                     [(1, 1)])
    df = spark.createDataFrame(
        [(1, bytearray(jpg))], "doc_id long, payload binary"
    )
    out = image_stats(df).collect()[0]
    assert out.decoded and (out.width, out.height) == (16, 16)
    assert abs(out.mean_px - (64 + 128 + 192 + 250) / 4) < 1e-9


def test_jpeg_dense_block_matches_independent_idct():
    """A block with many AC terms (and a 16-zero run forcing ZRL)
    must match an independently-coded textbook IDCT to within one
    grey level (the decoder's only freedom is final rounding)."""
    import math

    zz = [0] * 64
    zz[0] = 8 * (140 - 128)
    for k, v in ((1, 31), (2, -17), (5, 23), (9, -40), (28, 55),
                 (47, -12), (63, 7)):
        zz[k] = v
    jpg = _make_jpeg(8, 8, [[zz]], [(1, 1)])
    arr = decode_media(jpg).astype(np.float64)[..., 0]

    # independent IDCT: natural-order coefficients via the zigzag map
    nat = np.zeros((8, 8))
    for k, v in enumerate(zz):
        nat[_JZZ[k] // 8, _JZZ[k] % 8] = v

    def c(u):
        return 1 / math.sqrt(2) if u == 0 else 1.0

    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    acc += (
                        c(u) * c(v) / 4 * nat[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            expect = min(max(acc + 128.0, 0.0), 255.0)
            assert abs(arr[x, y] - expect) <= 1.0, (x, y, arr[x, y], expect)


def _make_avi(jpeg_frames):
    """Minimal MJPEG AVI: RIFF('AVI ') > LIST('movi') > '00dc' chunks."""
    movi = b"movi"
    for jf in jpeg_frames:
        movi += b"00dc" + struct.pack("<I", len(jf)) + jf
        if len(jf) & 1:
            movi += b"\x00"
    lst = b"LIST" + struct.pack("<I", len(movi)) + movi
    return b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst


def test_avi_mjpeg_frame_sampling(spark):
    """Video is real for MJPEG AVI: each '00dc' chunk decodes through
    the baseline JPEG path to an exact flat frame; frame_stride skips
    frames WITHOUT decoding them; a non-MJPEG AVI falls back to the
    byte-window stand-in marked real=false."""
    from dex_data_ingestor_spark.operators.multimodal import sample_frames

    vals = [70, 140, 210]
    avi = _make_avi(
        [_make_jpeg(8, 8, [[_flat_zz(v)]], [(1, 1)]) for v in vals]
    )
    bogus = _make_avi([b"not a jpeg frame at all"])
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(bogus))],
        "doc_id long, payload binary",
    )
    out = sorted(
        sample_frames(df, every_n_bytes=64).collect(),
        key=lambda r: (r.doc_id, r.frame_idx),
    )
    mine = [r for r in out if r.doc_id == 1]
    assert len(mine) == 3 and all(r.real for r in mine)
    for r, v in zip(mine, vals):
        arr = decode_media(bytes(r.frame))
        assert arr.shape == (8, 8, 3)
        assert (arr == v).all()
    theirs = [r for r in out if r.doc_id == 2]
    assert theirs and not any(r.real for r in theirs)

    strided = sample_frames(
        df.filter("doc_id = 1"), frame_stride=2
    ).collect()
    assert len(strided) == 2  # frames 0 and 2


def test_jpeg_fill_bytes_and_grayscale_sampling_declared():
    """Two T.81 conformance cases the first cut rejected: 0xFF fill
    bytes may pad any marker (B.1.1.2), and a single-component scan
    is NON-interleaved — a grayscale frame declaring 2x2 sampling
    still codes plain ceil(w/8) x ceil(h/8) blocks (A.2.2)."""
    good = _make_jpeg(16, 16, [[_flat_zz(v) for v in (60, 90, 120, 150)]],
                      [(1, 1)])
    # inject fill bytes before the SOF marker
    idx = good.index(b"\xff\xc0")
    padded = good[:idx] + b"\xff\xff\xff" + good[idx:]
    arr = decode_media(padded)
    assert (arr[:8, :8, 0] == 60).all() and (arr[8:, 8:, 0] == 150).all()

    # same block stream, but the SOF declares 2x2 sampling factors —
    # scan geometry must ignore them for a 1-component frame
    declared = _make_jpeg(16, 16,
                          [[_flat_zz(v) for v in (60, 90, 120, 150)]],
                          [(2, 2)])
    arr2 = decode_media(declared)
    assert np.array_equal(arr2, decode_media(good))


def test_avi_deeply_nested_lists_quarantine_not_crash(spark):
    """A hostile AVI nesting thousands of LIST chunks must fall back
    to byte windows (quarantine path), not blow the recursion limit
    and kill the scan."""
    from dex_data_ingestor_spark.operators.multimodal import sample_frames

    depth = 5000
    inner = b"JUNK" + struct.pack("<I", 0)
    body = inner
    for _ in range(depth):
        body = b"LIST" + struct.pack("<I", 4 + len(body)) + b"rec " + body
    avi = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "doc_id long, payload binary"
    )
    out = sample_frames(df, every_n_bytes=4096).collect()
    assert out and not any(r.real for r in out)


def test_jpeg_random_coefficient_blocks_roundtrip():
    """Seeded-random coefficient patterns (negative DC chains, long
    zero runs, high categories) through the full Huffman/zigzag/
    dequant path: the decode must match this test's OWN textbook
    reconstruction of the same integer coefficients to <= 1 grey
    level (rounding is the decoder's only freedom)."""
    import math
    import random

    rng = random.Random(20260814)

    def reference(zz):
        nat = np.zeros((8, 8))
        for k, v in enumerate(zz):
            nat[_JZZ[k] // 8, _JZZ[k] % 8] = v

        def c(u):
            return 1 / math.sqrt(2) if u == 0 else 1.0

        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                acc = 0.0
                for u in range(8):
                    for v in range(8):
                        acc += (
                            c(u) * c(v) / 4 * nat[u, v]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                out[x, y] = min(max(acc + 128.0, 0.0), 255.0)
        return out

    blocks = []
    for _ in range(6):
        zz = [0] * 64
        zz[0] = rng.randint(-1000, 1000)
        for _ in range(rng.randint(0, 12)):
            zz[rng.randint(1, 63)] = rng.randint(-255, 255)
        blocks.append(zz)

    jpg = _make_jpeg(48, 8, [blocks], [(1, 1)])
    arr = decode_media(jpg).astype(np.float64)[..., 0]
    assert arr.shape == (8, 48)
    for i, zz in enumerate(blocks):
        got = arr[:, 8 * i : 8 * (i + 1)]
        want = reference(zz)
        assert np.abs(got - want).max() <= 1.0, i


def test_jpeg_422_subsampling_geometry():
    """4:2:2 (hs=2, vs=1): the MCU is 16x8 with two Y blocks beside
    one Cb/Cr block; chroma replicates horizontally only. Flat planes
    make the expected RGB exact."""
    y, cb, cr = 200, 90, 150
    jpg = _make_jpeg(
        16, 8,
        [[_flat_zz(y)] * 2, [_flat_zz(cb)], [_flat_zz(cr)]],
        [(2, 1), (1, 1), (1, 1)],
    )
    arr = decode_media(jpg)
    assert arr.shape == (8, 16, 3)
    exp_r = round(y + 1.402 * (cr - 128))
    exp_g = round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    exp_b = round(y + 1.772 * (cb - 128))
    assert (arr[..., 0] == exp_r).all()
    assert (arr[..., 1] == exp_g).all()
    assert (arr[..., 2] == exp_b).all()


def test_jpeg_entropy_block_budget_quarantines():
    """A frame whose pixel count passes the byte budget but whose
    data-unit count exceeds MAX_JPEG_BLOCKS must quarantine BEFORE
    entering the per-bit Python entropy loop (slow-loris guard, the
    PNG Paeth lesson)."""
    from dex_data_ingestor_spark.operators.multimodal import (
        MAX_JPEG_BLOCKS,
    )

    good = _make_jpeg(8, 8, [[_flat_zz(128)]], [(1, 1)])
    idx = good.index(b"\xff\xc0")
    big = bytearray(good)
    # 4096 x 600 grayscale = 38400 blocks > 32768, bytes well in budget
    big[idx + 5 : idx + 9] = struct.pack(">HH", 600, 4096)
    assert 4096 * 600 * 3 < 1 << 28
    assert (4096 // 8) * (600 // 8) > MAX_JPEG_BLOCKS
    with pytest.raises(ValueError, match="MAX_JPEG_BLOCKS"):
        decode_media(bytes(big))


def test_video_stats_motion_and_quarantine(spark):
    """video_stats over MJPEG AVIs: a static clip scores motion 0, an
    alternating-frame clip scores the exact hand-computable mean
    inter-frame delta, frame_stride changes what 'sampled' means, and
    junk/NULL rows quarantine instead of failing the scan."""
    from dex_data_ingestor_spark.operators.multimodal import video_stats

    static = _make_avi(
        [_make_jpeg(8, 8, [[_flat_zz(100)]], [(1, 1)])] * 3
    )
    blink = _make_avi(
        [_make_jpeg(8, 8, [[_flat_zz(v)]], [(1, 1)])
         for v in (50, 250, 50, 250)]
    )
    df = spark.createDataFrame(
        [(1, bytearray(static)), (2, bytearray(blink)),
         (3, bytearray(b"mp4 stand-in")), (4, None)],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in video_stats(df).collect()}
    assert out[1].decoded and out[1].n_frames == 3
    assert out[1].motion == 0.0 and out[1].mean_px == 100.0
    assert out[2].decoded and out[2].n_frames == 4
    assert out[2].motion == 200.0  # |250-50| per pixel, every gap
    assert out[2].mean_px == 150.0
    assert not out[3].decoded and "not an AVI" in out[3].error
    assert not out[4].decoded and "NULL payload" in out[4].error
    # striding: frames 0 and 2 of the blink clip are both 50 -> static
    strided = {
        r.doc_id: r
        for r in video_stats(
            df.filter("doc_id = 2"), frame_stride=2
        ).collect()
    }
    assert strided[2].n_frames == 2 and strided[2].motion == 0.0


def test_extract_features_real_for_decodable_payloads(spark):
    """Decodable payloads yield the 4x4 mean-luminance grid (exact for
    flat quadrant images); undecodable bytes keep the digest
    pseudo-features; and visually-near images land closer in feature
    space than unrelated ones — the property the digest could never
    provide."""
    quad = np.zeros((8, 8, 3), np.uint8)
    quad[:4, :4] = 255          # top-left white, rest black
    near = quad.copy()
    near[0, 7] = 60             # one perturbed pixel
    far = 255 - quad            # inverted
    rows = [
        (1, bytearray(encode_ppm(quad))),
        (2, bytearray(encode_ppm(near))),
        (3, bytearray(encode_ppm(far))),
        (4, bytearray(b"not decodable media")),
    ]
    from dex_data_ingestor_spark.operators.multimodal import (
        extract_features,
    )

    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: list(r.features) for r in
           extract_features(df, "doc_id", "payload").collect()}
    # flat 2x2-pixel cells: exact luminance means
    assert out[1][0] == 1.0 and out[1][5] == 1.0  # white quadrant cells
    assert out[1][2] == 0.0 and out[1][15] == 0.0
    d_near = sum((a - b) ** 2 for a, b in zip(out[1], out[2]))
    d_far = sum((a - b) ** 2 for a, b in zip(out[1], out[3]))
    assert d_near < d_far
    # digest fallback unchanged for undecodable bytes
    from dex_data_ingestor_spark.operators.multimodal import _fake_features
    assert out[4] == pytest.approx(_fake_features(b"not decodable media"))


# ---------------------------------------------------------------------------
# Progressive JPEG — test-side progressive encoder (T.81 Annex G) + parity
# against the baseline decode of the SAME coefficients
# ---------------------------------------------------------------------------


def _trunc_div(v, d):
    """T.81 AC point transform: divide truncating TOWARD ZERO."""
    v = int(v)
    return -((-v) // d) if v < 0 else v // d


class _SymRecorder(dict):
    """Stand-in encoder table for the dry-run pass: accepts any
    symbol, records it, emits nothing meaningful."""

    def __init__(self):
        super().__init__()
        self.used = set()

    def __getitem__(self, sym):
        self.used.add(sym)
        return (1, 0)


def _jencode_dc_prog(bw, blocks_zz, al, ah, dc_enc, preds, ci=0):
    """DC scans: first (Ah=0) codes diffs of the arithmetic-shifted
    values; refine sends bit Al raw."""
    for zz in blocks_zz:
        dc = int(zz[0])
        if ah == 0:
            hi = dc >> al  # DC point transform = arithmetic shift
            t, raw = _jcat(hi - preds[ci])
            length, code = dc_enc[t]
            bw.write(code, length)
            if t:
                bw.write(raw, t)
            preds[ci] = hi
        else:
            bw.write((dc >> al) & 1, 1)


def _jencode_ac_first(bw, blocks_zz, ss, se, al, ac_enc):
    eobn = 0

    def flush():
        nonlocal eobn
        if eobn:
            r = eobn.bit_length() - 1
            length, code = ac_enc[(r << 4) | 0]
            bw.write(code, length)
            if r:
                bw.write(eobn - (1 << r), r)
            eobn = 0

    for zz in blocks_zz:
        band = {k: _trunc_div(zz[k], 1 << al) for k in range(ss, se + 1)}
        nzs = [k for k in range(ss, se + 1) if band[k]]
        if not nzs:
            eobn += 1
            continue
        flush()
        run = 0
        for k in range(ss, nzs[-1] + 1):
            v = band[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_enc[0xF0]
                bw.write(code, length)
                run -= 16
            s, raw = _jcat(v)
            length, code = ac_enc[(run << 4) | s]
            bw.write(code, length)
            bw.write(raw, s)
            run = 0
        if nzs[-1] < se:
            eobn = 1
    flush()


def _jencode_ac_refine(bw, blocks_zz, ss, se, al, ac_enc):
    """AC refine (Ah = Al + 1): newly-nonzero coefficients emit
    (run-of-zero-history, size 1) + sign, correction bits for
    crossed/remaining nonzero-history coefficients ride behind each
    symbol and behind the EOB, in block order."""
    eobn = 0
    pending = []

    def flush():
        nonlocal eobn, pending
        if eobn:
            r = eobn.bit_length() - 1
            length, code = ac_enc[(r << 4) | 0]
            bw.write(code, length)
            if r:
                bw.write(eobn - (1 << r), r)
            for b in pending:
                bw.write(b, 1)
            pending = []
            eobn = 0

    for zz in blocks_zz:
        hi = {k: _trunc_div(zz[k], 1 << (al + 1)) for k in range(ss, se + 1)}
        bit = {k: (abs(int(zz[k])) >> al) & 1 for k in range(ss, se + 1)}
        newly = [k for k in range(ss, se + 1) if hi[k] == 0 and bit[k]]
        if not newly:
            eobn += 1
            pending.extend(bit[k] for k in range(ss, se + 1) if hi[k])
            continue
        flush()
        run = 0
        corr = []
        for k in range(ss, newly[-1] + 1):
            if hi[k] != 0:
                corr.append(bit[k])
                continue
            if bit[k] == 0:
                run += 1
                assert run <= 15, "test encoder keeps runs <= 15"
                continue
            length, code = ac_enc[(run << 4) | 1]
            bw.write(code, length)
            bw.write(1 if int(zz[k]) > 0 else 0, 1)
            for b in corr:
                bw.write(b, 1)
            corr = []
            run = 0
        eobn = 1
        pending.extend(
            bit[k] for k in range(newly[-1] + 1, se + 1) if hi[k]
        )
    flush()


def _make_progressive_jpeg(w, h, comp_blocks, scans, sampling=None):
    """Assemble a progressive (SOF2) JPEG. comp_blocks: per component
    a list of block-row-major zigzag coefficient lists (identity
    quant). scans: list of (comp_indices, ss, se, ah, al); DC scans
    may be interleaved (multiple components), AC scans single."""
    nc = len(comp_blocks)
    sampling = sampling or [(1, 1)] * nc

    def encode_all(dc_enc, ac_enc):
        bodies = []
        for cis, ss, se, ah, al in scans:
            bw = _JBitWriter()
            if ss == 0:
                preds = {ci: 0 for ci in cis}
                if len(cis) > 1:
                    n_mcus = len(comp_blocks[cis[0]])
                    for m in range(n_mcus):
                        for ci in cis:
                            _jencode_dc_prog(
                                bw, [comp_blocks[ci][m]], al, ah,
                                dc_enc, preds, ci,
                            )
                else:
                    _jencode_dc_prog(
                        bw, comp_blocks[cis[0]], al, ah, dc_enc,
                        preds, cis[0],
                    )
            elif ah == 0:
                _jencode_ac_first(
                    bw, comp_blocks[cis[0]], ss, se, al, ac_enc
                )
            else:
                _jencode_ac_refine(
                    bw, comp_blocks[cis[0]], ss, se, al, ac_enc
                )
            bodies.append(bw.bytes_stuffed())
        return bodies

    rec_dc, rec_ac = _SymRecorder(), _SymRecorder()
    rec_dc.update({t: (1, 0) for t in range(12)})
    encode_all(rec_dc, rec_ac)
    dc_counts, dc_symbols, dc_enc = _jhuff_table(list(range(12)))
    ac_syms = sorted(rec_ac.used | {0x00})
    ac_counts, ac_symbols, ac_enc = _jhuff_table(ac_syms)
    bodies = encode_all(dc_enc, ac_enc)

    dqt = _jseg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof_body = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(sampling):
        sof_body += bytes([ci + 1, (hs << 4) | vs, 0])
    sof = _jseg(0xC2, sof_body)
    dht = _jseg(0xC4, bytes([0x00]) + dc_counts + dc_symbols) + _jseg(
        0xC4, bytes([0x10]) + ac_counts + ac_symbols
    )
    out = b"\xff\xd8" + dqt + sof + dht
    for (cis, ss, se, ah, al), body in zip(scans, bodies):
        sos_body = bytes([len(cis)])
        for ci in cis:
            sos_body += bytes([ci + 1, 0x00])
        sos_body += bytes([ss, se, (ah << 4) | al])
        out += _jseg(0xDA, sos_body) + body
    return out + b"\xff\xd9"


def test_progressive_spectral_selection_matches_baseline():
    """Spectral selection only (Ah=Al=0, three scans: DC, AC 1-5,
    AC 6-63) must decode bit-identically to the baseline encoding of
    the SAME coefficients — including a multi-block EOBRUN (blocks 2-4
    have an empty high band, folded into one EOB run of 3)."""
    from dex_data_ingestor_spark.operators.multimodal import decode_media

    blocks = []
    for b in range(4):
        zz = [0] * 64
        zz[0] = 8 * (40 + 30 * b - 128)
        zz[1] = 20 - 9 * b
        zz[3] = -15 + 4 * b
        if b == 0:
            zz[7] = 11   # only block 0 has high-band content
            zz[40] = -6
        blocks.append(zz)
    base = _make_jpeg(16, 16, [blocks], [(1, 1)])
    prog = _make_progressive_jpeg(
        16, 16, [blocks],
        [((0,), 0, 0, 0, 0), ((0,), 1, 5, 0, 0), ((0,), 6, 63, 0, 0)],
    )
    a, p = decode_media(base), decode_media(prog)
    assert a.shape == p.shape == (16, 16, 1)
    assert (a == p).all()


def test_progressive_successive_approximation_exact():
    """Full successive approximation: DC first at Al=1 + DC refine,
    AC first at Al=1 + AC refine (Ah=1, Al=0). Coefficients chosen to
    exercise every refine path: positive/negative corrections on
    known-nonzero values (odd magnitudes), newly-nonzero +/-1
    insertions, and untouched zeros. Must equal the baseline decode
    of the same coefficients exactly."""
    from dex_data_ingestor_spark.operators.multimodal import decode_media

    blocks = []
    for b in range(2):
        zz = [0] * 64
        zz[0] = 8 * (100 + 13 * b - 128)  # odd DC deltas refine
        zz[1] = 5       # 101b: first sends 2, refine bit 1
        zz[2] = -5      # negative correction path
        zz[4] = 4       # even: refine bit 0
        zz[9] = 1 if b == 0 else -1  # newly nonzero in refine only
        zz[11] = -3
        blocks.append(zz)
    base = _make_jpeg(8, 16, [blocks], [(1, 1)])
    prog = _make_progressive_jpeg(
        8, 16, [blocks],
        [
            ((0,), 0, 0, 0, 1),   # DC first, Al=1
            ((0,), 1, 63, 0, 1),  # AC first, Al=1
            ((0,), 0, 0, 1, 0),   # DC refine
            ((0,), 1, 63, 1, 0),  # AC refine
        ],
    )
    a, p = decode_media(base), decode_media(prog)
    assert (a == p).all()


def test_progressive_color_interleaved_dc_matches_baseline():
    """A 3-component progressive frame: one INTERLEAVED DC scan (the
    common layout) + per-component AC scans, against the baseline
    interleaved encoding of the same coefficient sets."""
    from dex_data_ingestor_spark.operators.multimodal import decode_media

    comps = []
    for c in range(3):
        zz = [0] * 64
        zz[0] = 8 * (90 + 25 * c - 128)
        zz[2] = 7 - 5 * c
        comps.append([zz])
    base = _make_jpeg(8, 8, comps, [(1, 1)] * 3)
    prog = _make_progressive_jpeg(
        8, 8, comps,
        [
            ((0, 1, 2), 0, 0, 0, 0),
            ((0,), 1, 63, 0, 0),
            ((1,), 1, 63, 0, 0),
            ((2,), 1, 63, 0, 0),
        ],
    )
    a, p = decode_media(base), decode_media(prog)
    assert a.shape == p.shape == (8, 8, 3)
    assert (a == p).all()


def test_progressive_hostile_inputs_raise_not_loop():
    """Spec-violating progressive streams must raise, not decode
    garbage: a multi-component AC scan, and an AC-refine symbol with
    size > 1."""
    from dex_data_ingestor_spark.operators.multimodal import _decode_jpeg

    comps = [[[0] * 64] for _ in range(2)]
    good = _make_progressive_jpeg(
        8, 8, comps,
        [((0, 1), 0, 0, 0, 0), ((0,), 1, 63, 0, 0), ((1,), 1, 63, 0, 0)],
        sampling=[(1, 1), (1, 1)],
    )
    # 2-component frames aren't a supported color model anyway, but
    # the AC-scan arity check must fire first on a doctored stream
    with pytest.raises((ValueError, NotImplementedError)):
        _decode_jpeg(good)

    # rebuild a grayscale progressive stream, then doctor the AC scan
    # header to cover both components -> must raise, not misparse
    zz = [0] * 64
    zz[1] = 3
    ok = _make_progressive_jpeg(
        8, 8, [[zz]], [((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0)]
    )
    assert _decode_jpeg(ok).shape == (8, 8, 1)


def test_progressive_subsampled_chroma_matches_baseline():
    """4:2:0 progressive with NON-interleaved per-component scans
    (each scan walks its own component's block region): Y carries 4
    blocks, each chroma 1. Must equal the baseline interleaved
    encoding of the same coefficients."""
    from dex_data_ingestor_spark.operators.multimodal import decode_media

    y_blocks = []
    for b in range(4):
        zz = [0] * 64
        zz[0] = 8 * (60 + 40 * b - 128)
        zz[1 + b] = 9 - 3 * b
        y_blocks.append(zz)
    cb = [0] * 64
    cb[0] = 8 * (120 - 128)
    cr = [0] * 64
    cr[0] = 8 * (140 - 128)
    cr[2] = 5
    comps = [y_blocks, [cb], [cr]]
    sampling = [(2, 2), (1, 1), (1, 1)]
    base = _make_jpeg(16, 16, comps, sampling)
    prog = _make_progressive_jpeg(
        16, 16, comps,
        [
            ((0,), 0, 0, 0, 0),
            ((1,), 0, 0, 0, 0),
            ((2,), 0, 0, 0, 0),
            ((0,), 1, 63, 0, 0),
            ((1,), 1, 63, 0, 0),
            ((2,), 1, 63, 0, 0),
        ],
        sampling=sampling,
    )
    a, p = decode_media(base), decode_media(prog)
    assert a.shape == p.shape == (16, 16, 3)
    assert (a == p).all()


def test_png_zero_height_bomb_quarantines_before_inflating():
    """IHDR h=0 makes expected=0, and zlib decompress(data, 0) means
    UNLIMITED — a deflate bomb would inflate in full before the length
    check. The dimension guard must reject it up front."""
    import struct
    import zlib

    import pytest

    from dex_data_ingestor_spark.operators.multimodal import decode_media

    def chunk(ctype, body):
        c = struct.pack(">I", len(body)) + ctype + body
        return c + struct.pack(">I", zlib.crc32(ctype + body))

    ihdr = struct.pack(">IIBBBBB", 64, 0, 8, 2, 0, 0, 0)  # h = 0
    bomb = zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)  # 64 MiB -> tiny
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="dimensions invalid"):
        decode_media(png)


def test_extract_features_quarantines_zero_pixel_images(spark):
    """A decodable 0-width image must take the digest pseudo-feature
    path, not emit an all-NaN grid vector into downstream cosines."""
    import math

    from dex_data_ingestor_spark.operators.multimodal import (
        extract_features,
    )

    payload = b"P6\n0 5\n255\n"
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = extract_features(df).collect()[0]
    assert row.features is not None
    assert not any(math.isnan(x) for x in row.features)
