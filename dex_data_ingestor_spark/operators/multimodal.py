"""Multimodal column plumbing (north-star J5).

Images/audio/video ride through the engine as opaque ``binary``
payload columns plus a typed metadata struct; decode / feature
extraction runs as Arrow-batched pandas functions over ``mapInPandas``
so each partition streams through Python in columnar batches.

``decode_media`` REALLY decodes the stdlib-decodable image formats —
PPM (P6), uncompressed BMP (24/32-bit), and PNG (8-bit gray / RGB /
RGBA / palette, non-interlaced; inflate via ``zlib``, all five
scanline filters) — into ``numpy`` ``(H, W, C)`` uint8 arrays, with
``image_stats`` and the ``resize_images`` decodable path running that
kernel end-to-end over ``mapInPandas``; audio is real too —
``audio_stats`` decodes RIFF/WAVE integer and float PCM (stdlib
struct) and screens on RMS/peak/zero-crossings; baseline sequential
JPEG decodes for real too (``_decode_jpeg`` — Huffman entropy
decode, dequant, vectorized IDCT, chroma upsampling, YCbCr->RGB).
Formats whose codecs are genuinely absent from this container
(WebP, arithmetic-coded JPEG, compressed audio, video) raise
NotImplementedError; ``extract_features`` keeps its
deterministic digest features so the distributed plumbing stays
testable on arbitrary payloads.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: Metadata carried alongside every media payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic stand-in payload: the utf-8 bytes of the text
    column plus a synthetic metadata struct. Exercises the real binary
    column path end-to-end without media files."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.length(F.col(text_col)) % 1024).cast("int").alias("width"),
            F.lit(256).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) -> (H, W, 3) uint8."""
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> data;
    # '#' comments may appear between tokens.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (only 255)")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 24/32-bit BMP -> (H, W, 3|4) uint8.
    BMP stores rows bottom-up, pixels as BGR(A); both are normalized."""
    if len(payload) < 54:
        raise ValueError("BMP truncated")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"BMP compression {compression} unsupported")
    if bpp not in (24, 32):
        raise ValueError(f"BMP bit depth {bpp} unsupported (24/32 only)")
    bottom_up, h = h > 0, abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
    if bottom_up:
        rows = rows[::-1]
    # BGR(A) -> RGB(A)
    out = rows.copy()
    out[..., 0], out[..., 2] = rows[..., 2], rows[..., 0]
    return out


#: PNG color type -> channels per pixel (at bit depth 8).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Hard ceiling on a single decoded image's bytes (256 MiB). IHDR
#: dimensions are untrusted input; anything larger is rejected before
#: allocation so a hostile header cannot OOM an executor.
MAX_DECODED_BYTES = 1 << 28

#: Separate CPU budget for the per-byte Python filter paths
#: (Average/Paeth — a sequential left-neighbor recurrence with a
#: floor-div, not vectorizable as a prefix sum). None/Up/Sub are numpy
#: ops and may use the full MAX_DECODED_BYTES; a hostile max-size
#: all-Paeth PNG otherwise pins an executor core for minutes (a
#: slow-loris, not an OOM). Once cumulative Average/Paeth scanline
#: bytes exceed this, the image quarantines (ValueError -> row).
MAX_SLOW_FILTER_BYTES = 1 << 24


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse the five PNG scanline filters (None/Sub/Up/Average/
    Paeth). None/Up/Sub are vectorized (Sub is a per-lane prefix sum
    mod 256); Average/Paeth keep a per-byte Python loop bounded by
    MAX_SLOW_FILTER_BYTES — a deployment with real photo corpora swaps
    PIL in at decode_media's dispatch."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    slow_bytes = 0
    for y in range(h):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype in (3, 4):
            slow_bytes += stride
            if slow_bytes > MAX_SLOW_FILTER_BYTES:
                raise ValueError(
                    "PNG Average/Paeth filter work exceeds "
                    f"MAX_SLOW_FILTER_BYTES ({MAX_SLOW_FILTER_BYTES})"
                )
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: recon[i] = filt[i] + recon[i-ch] —
            # per-channel-lane running sum, i.e. cumsum mod 256
            lanes = np.frombuffer(bytes(row), dtype=np.uint8).reshape(w, ch)
            row = bytearray(
                np.cumsum(lanes, axis=0, dtype=np.uint8).tobytes()
            )
        elif ftype == 2:  # Up
            row = bytearray(
                (np.frombuffer(bytes(row), dtype=np.uint8) + prev).tobytes()
            )
        elif ftype == 3:  # Average
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = int(prev[i])
                c = int(out[y - 1, i - ch]) if (i >= ch and y > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
    return out.reshape(h, w, ch)


def _decode_png(payload: bytes) -> np.ndarray:
    """PNG (bit depth 8, non-interlaced; gray/RGB/RGBA/gray+alpha/
    palette) -> (H, W, C) uint8 via zlib inflate + unfilter. Palette
    images are expanded to RGB."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, ihdr, idat, plte = 8, None, b"", None
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        if pos + 12 + length > len(payload):
            raise ValueError(f"PNG chunk {ctype!r} truncated")
        body = payload[pos + 8 : pos + 8 + length]
        # Chunk CRC is load-bearing: a bit-flipped-but-still-inflatable
        # IDAT must quarantine as corrupt, not decode silently to wrong
        # pixels feeding wrong mean/std into image_stats.
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    # w/h >= 1 BEFORE the byte-budget check: h=0 makes expected=0, and
    # zlib decompress(idat, max_length=0) means UNLIMITED — a deflate
    # bomb would then inflate in full before the length mismatch could
    # raise, defeating the bomb guard below
    if w < 1 or h < 1:
        raise ValueError(f"PNG dimensions invalid ({w}x{h})")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit depth {depth} / interlace {interlace} unsupported "
            "(8-bit non-interlaced only)"
        )
    ch = _PNG_CHANNELS.get(color)
    if ch is None:
        raise ValueError(f"PNG color type {color} invalid")
    # Decompression-bomb guards: IHDR dimensions are attacker-
    # controlled, so bound the decoded size BEFORE any allocation and
    # cap the inflate at exactly the expected byte count (a tiny IDAT
    # must not be allowed to expand into gigabytes) — a corrupt file
    # must quarantine as a row, never OOM an executor.
    expected = (w * ch + 1) * h
    if expected > MAX_DECODED_BYTES:
        raise ValueError(
            f"PNG {w}x{h}x{ch} exceeds MAX_DECODED_BYTES "
            f"({expected} > {MAX_DECODED_BYTES})"
        )
    d = zlib.decompressobj()
    raw = d.decompress(idat, expected)
    if len(raw) != expected or d.decompress(d.unconsumed_tail, 1):
        raise ValueError(
            f"PNG data length mismatch (got {len(raw)}, want {expected})"
        )
    arr = _png_unfilter(raw, w, h, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        arr = plte[arr[..., 0]]
    return arr


# ---------------------------------------------------------------------------
# JPEG (ITU T.81 baseline sequential DCT, Huffman entropy coding)
# ---------------------------------------------------------------------------

#: Zigzag scan order: _JPEG_ZIGZAG[k] = (row, col) of the k-th
#: transmitted coefficient in the natural 8x8 layout.
_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _jpeg_idct_matrix() -> np.ndarray:
    """8x8 DCT-II basis A with A[u, x] = c(u)/2 * cos((2x+1)u*pi/16);
    the 2-D inverse transform is f = A.T @ F @ A."""
    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_JPEG_IDCT_A = _jpeg_idct_matrix()


#: Slow-loris guard for the per-bit Python entropy loop (the JPEG
#: analog of MAX_SLOW_FILTER_BYTES): total 8x8 data units decoded per
#: image. 1<<15 blocks ~ 2 Mpx grayscale / ~8 Mpx 4:2:0 — ample for
#: screening corpora; a hostile max-dimension file otherwise pins an
#: executor core for minutes inside pure Python. Deployments that
#: need full-size photo decode swap PIL in at decode_media's dispatch.
MAX_JPEG_BLOCKS = 1 << 15


class _JpegBitReader:
    """MSB-first bit reader over one entropy-coded segment (byte
    stuffing already removed). Running off the end raises — a
    truncated scan must quarantine, not loop."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_build_huffman(counts: bytes, symbols: bytes) -> dict:
    """Canonical JPEG Huffman table -> {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(symbols):
                raise ValueError("JPEG DHT symbol count mismatch")
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG invalid Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t raw magnitude bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_split_scan(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Collect the entropy-coded bytes from ``pos`` to the next
    non-RST marker, unstuffing 0xFF00 and splitting on RST0-7.
    Returns (segments, position_of_terminating_marker)."""
    segments: list[bytearray] = [bytearray()]
    cur = segments[0]
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            raise ValueError("JPEG scan ends inside a marker")
        m = payload[pos + 1]
        if m == 0x00:  # stuffed data byte
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            cur = bytearray()
            segments.append(cur)
            pos += 2
        else:
            return [bytes(s) for s in segments], pos
    raise ValueError("JPEG scan missing terminating marker")


def _decode_jpeg(payload: bytes) -> np.ndarray:
    """Sequential (SOF0/SOF1) AND progressive (SOF2) DCT JPEG,
    Huffman -> (H, W, C) uint8; C = 1 (grayscale) or 3 (YCbCr -> RGB,
    BT.601 full range). Supports arbitrary chroma subsampling with
    integer replication upsampling, restart intervals, 8- and 16-bit
    quant tables, multi-segment DQT/DHT; progressive covers spectral
    selection AND successive approximation (T.81 Annex G: DC
    first/refine, AC first/refine with EOB runs), coefficients
    accumulating across scans and reconstructed once at EOI.
    Arithmetic coding and hierarchical modes raise
    NotImplementedError (the quarantine contract). Entropy decoding is a per-bit Python loop —
    correct and bounded, not fast; the block math (dequant + IDCT +
    color transform) is vectorized numpy. Bomb guards: dimensions are
    checked against MAX_DECODED_BYTES before any allocation, and a
    truncated/garbage scan raises instead of looping.

    Parity note: unlike PNG, JPEG decoding has no bit-exact contract —
    T.81 Annex A only bounds IDCT error — so outputs match libjpeg to
    within rounding, not bitwise. Tests pin ANALYTIC cases (flat
    DC-only blocks, single-AC cosine ramps) where the exact answer is
    derivable by hand."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(payload)
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps) ; comps = [(cid, hs, vs, tq)]
    restart = 0
    out_planes = None
    progressive = False
    prog_coef: list[np.ndarray] | None = None

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        if payload[pos + 1] == 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if seglen < 2 or pos + 2 + seglen > n:
            raise ValueError("JPEG segment truncated")
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    if i + 64 > len(body):
                        raise ValueError("JPEG DQT truncated")
                    q = np.frombuffer(body[i : i + 64], np.uint8)
                    i += 64
                elif pq == 1:
                    if i + 128 > len(body):
                        raise ValueError("JPEG DQT truncated")
                    q = np.frombuffer(body[i : i + 128], ">u2")
                    i += 128
                else:
                    raise ValueError(f"JPEG DQT precision {pq}")
                quant[tq] = q.astype(np.float64)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG {nc}-component frame")
            if fh < 1 or fw < 1:
                raise ValueError(f"bad JPEG dimensions {fw}x{fh}")
            if fh * fw * max(nc, 3) > MAX_DECODED_BYTES:
                raise ValueError(
                    f"JPEG {fw}x{fh}x{nc} exceeds MAX_DECODED_BYTES"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"JPEG sampling {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} (non-baseline mode)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                i += 1
                if i + 16 > len(body):
                    raise ValueError("JPEG DHT truncated")
                counts = body[i : i + 16]
                i += 16
                total = sum(counts)
                if i + total > len(body):
                    raise ValueError("JPEG DHT symbols truncated")
                table = _jpeg_build_huffman(counts, body[i : i + total])
                i += total
                (huff_dc if tc == 0 else huff_ac)[th] = table
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            fh, fw, comps = frame
            ns = body[0]
            sel = {}
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                sel[cs] = (tables >> 4, tables & 0x0F)
            if progressive:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                segments, pos = _jpeg_split_scan(payload, pos)
                if prog_coef is None:
                    pcomps, _hm, _vm, mcux, mcuy = _jpeg_prog_geometry(
                        frame
                    )
                    prog_coef = [
                        np.zeros(
                            (mcuy * vs, mcux * hs, 64), dtype=np.int64
                        )
                        for _cid, hs, vs, _tq in pcomps
                    ]
                _jpeg_decode_prog_scan(
                    segments, frame, sel, huff_dc, huff_ac, restart,
                    ss, se, ahal >> 4, ahal & 0x0F, prog_coef,
                )
            else:
                if ns != len(comps):
                    raise NotImplementedError(
                        "JPEG multi-scan frame (non-interleaved)"
                    )
                segments, pos = _jpeg_split_scan(payload, pos)
                out_planes = _jpeg_decode_scan(
                    segments, frame, sel, quant, huff_dc, huff_ac,
                    restart,
                )
        else:
            # APPn / COM / DNL / unknown with a length field: skip
            pass

    if progressive and prog_coef is not None:
        pcomps, hmax, vmax, _mx, _my = _jpeg_prog_geometry(frame)
        out_planes = _jpeg_reconstruct(
            prog_coef, pcomps, quant, hmax, vmax
        )
    if frame is None or out_planes is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame
    if len(comps) == 1:
        g = np.clip(np.round(out_planes[0][:fh, :fw]), 0, 255)
        return g.astype(np.uint8)[..., None]
    y = out_planes[0][:fh, :fw]
    cb = out_planes[1][:fh, :fw] - 128.0
    cr = out_planes[2][:fh, :fw] - 128.0
    rgb = np.empty((fh, fw, 3), dtype=np.float64)
    rgb[..., 0] = y + 1.402 * cr
    rgb[..., 1] = y - 0.344136 * cb - 0.714136 * cr
    rgb[..., 2] = y + 1.772 * cb
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _jpeg_decode_scan(
    segments: list[bytes],
    frame,
    sel: dict,
    quant: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart: int,
) -> list[np.ndarray]:
    """Entropy-decode an interleaved baseline scan and return one
    upsampled float64 plane per component (MCU-padded size; caller
    crops). Restart intervals: DC predictors reset and the bit reader
    jumps to the next RST-delimited segment."""
    fh, fw, comps = frame
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved —
        # the MCU is one data unit and sampling factors do not apply
        # to the scan geometry (a grayscale frame declaring 2x2
        # sampling still codes ceil(w/8) x ceil(h/8) blocks)
        cid, _hs, _vs, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    n_mcus = mcux * mcuy
    units_per_mcu = sum(hs * vs for _c, hs, vs, _t in comps)
    if n_mcus * units_per_mcu > MAX_JPEG_BLOCKS:
        raise ValueError(
            f"JPEG entropy work {n_mcus * units_per_mcu} blocks "
            f"exceeds MAX_JPEG_BLOCKS ({MAX_JPEG_BLOCKS})"
        )

    # per component: coefficient array (blocks_y, blocks_x, 64)
    coef = []
    for _cid, hs, vs, _tq in comps:
        coef.append(
            np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.float64)
        )

    seg_iter = iter(segments)
    reader = _JpegBitReader(next(seg_iter))
    preds = [0] * len(comps)
    for mcu in range(n_mcus):
        if restart and mcu and mcu % restart == 0:
            try:
                reader = _JpegBitReader(next(seg_iter))
            except StopIteration:
                raise ValueError("JPEG missing restart segment") from None
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, (cid, hs, vs, _tq) in enumerate(comps):
            if cid not in sel:
                raise ValueError(f"JPEG SOS missing component {cid}")
            dc_id, ac_id = sel[cid]
            if dc_id not in huff_dc or ac_id not in huff_ac:
                raise ValueError("JPEG scan references missing DHT")
            dc_tab, ac_tab = huff_dc[dc_id], huff_ac[ac_id]
            for by in range(vs):
                for bx in range(hs):
                    block = np.zeros(64, dtype=np.float64)
                    t = _jpeg_huff_decode(reader, dc_tab)
                    if t > 11:
                        raise ValueError("JPEG DC category > 11")
                    diff = _jpeg_extend(reader.read_bits(t), t)
                    preds[ci] += diff
                    block[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(reader, ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        block[k] = _jpeg_extend(reader.read_bits(s), s)
                        k += 1
                    coef[ci][my * vs + by, mx * hs + bx] = block

    return _jpeg_reconstruct(coef, comps, quant, hmax, vmax)


def _jpeg_reconstruct(
    coef: list[np.ndarray],
    comps,
    quant: dict,
    hmax: int,
    vmax: int,
) -> list[np.ndarray]:
    """Shared back half of baseline and progressive decoding: dequant
    the zigzag coefficient arrays, batched 2-D IDCT, replicate-upsample
    each component to full resolution."""
    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        if tq not in quant:
            raise ValueError(f"JPEG missing quant table {tq}")
        # dequantize in zigzag order, scatter to natural order
        zz = coef[ci].astype(np.float64) * quant[tq][None, None, :]
        nat = np.zeros_like(zz)
        nat[:, :, _JPEG_ZIGZAG] = zz
        by, bx = nat.shape[0], nat.shape[1]
        blocks = nat.reshape(by, bx, 8, 8)
        # batched 2-D IDCT: f = A.T @ F @ A
        a = _JPEG_IDCT_A
        spatial = np.einsum("ua,yxab,bv->yxuv", a.T, blocks, a)
        spatial += 128.0
        # blocks -> plane, then integer-replicate to full resolution
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if hs != hmax or vs != vmax:
            if hmax % hs or vmax % vs:
                raise NotImplementedError(
                    f"JPEG fractional subsampling {hs}x{vs} of "
                    f"{hmax}x{vmax}"
                )
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        planes.append(np.clip(plane, 0.0, 255.0))
    return planes


def _jpeg_prog_geometry(frame):
    """Progressive frames keep per-component coefficient arrays ACROSS
    scans. Arrays are MCU-padded (like baseline); non-interleaved
    scans touch only the component's own ceil(comp/8) block region,
    which always fits inside the padding. The baseline A.2.2 rule
    applies: a single-component FRAME is non-interleaved everywhere,
    so its declared sampling factors do not shape the geometry."""
    fh, fw, comps = frame
    if len(comps) == 1:
        cid, _hs, _vs, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    return comps, hmax, vmax, mcux, mcuy


def _jpeg_refine_nonzero(reader, coef_blk, k: int, p1: int, m1: int):
    """AC successive-approximation correction of one already-nonzero
    coefficient (T.81 G.1.2.3): read one bit; if set and the Al bit is
    still clear, nudge the magnitude toward the true value."""
    if reader.read_bit():
        v = coef_blk[k]
        if v > 0 and not (v & p1):
            coef_blk[k] = v + p1
        elif v < 0 and not (-v & p1):
            coef_blk[k] = v + m1
    return coef_blk[k]


def _jpeg_decode_prog_scan(
    segments: list[bytes],
    frame,
    sel: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
    coef: list[np.ndarray],
) -> None:
    """Entropy-decode ONE progressive scan (T.81 G.2) into the
    persistent per-component int64 zigzag coefficient arrays. Four
    scan kinds: DC first (diff << Al, interleaved or not), DC refine
    (one raw bit per block), AC first (run/size with EOBRUN, values
    << Al; single-component by spec), AC refine (correction bits for
    known-nonzero coefficients + insertion of new ±1<<Al ones, with
    EOBRUN carrying corrections through skipped blocks). Restart
    intervals reset DC predictors AND the EOB run."""
    fh, fw, comps = frame
    comps, hmax, vmax, mcux, mcuy = _jpeg_prog_geometry(frame)
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("JPEG progressive DC scan with Se != 0")
    if not is_dc and len(sel) != 1:
        raise ValueError("JPEG progressive AC scan must be 1-component")
    if not (0 <= al <= 13 and se <= 63 and ss <= se + (1 if is_dc else 0)):
        raise ValueError("JPEG bad spectral/approximation parameters")
    p1, m1 = 1 << al, -1 << al

    scan_cis = []
    for ci, (cid, _hs, _vs, _tq) in enumerate(comps):
        if cid in sel:
            scan_cis.append(ci)
    if len(scan_cis) != len(sel):
        raise ValueError("JPEG scan references unknown component")

    interleaved = len(scan_cis) > 1
    if interleaved:
        n_units = mcux * mcuy
        units_per = sum(comps[ci][1] * comps[ci][2] for ci in scan_cis)
    else:
        ci = scan_cis[0]
        _cid, hs, vs, _tq = comps[ci]
        cw = -(-fw * hs // hmax)
        chh = -(-fh * vs // vmax)
        bw, bh = -(-cw // 8), -(-chh // 8)
        n_units = bw * bh
        units_per = 1
    if n_units * units_per > MAX_JPEG_BLOCKS:
        raise ValueError(
            f"JPEG entropy work {n_units * units_per} blocks "
            f"exceeds MAX_JPEG_BLOCKS ({MAX_JPEG_BLOCKS})"
        )

    seg_iter = iter(segments)
    reader = _JpegBitReader(next(seg_iter))
    preds = {ci: 0 for ci in scan_cis}
    eobrun = 0

    def blocks_of(unit: int):
        """Yield (ci, by, bx) block coordinates for one decode unit."""
        if interleaved:
            my, mx = divmod(unit, mcux)
            for ci in scan_cis:
                _c, hs, vs, _t = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        yield ci, my * vs + by, mx * hs + bx
        else:
            by, bx = divmod(unit, bw)
            yield scan_cis[0], by, bx

    for unit in range(n_units):
        if restart and unit and unit % restart == 0:
            try:
                reader = _JpegBitReader(next(seg_iter))
            except StopIteration:
                raise ValueError("JPEG missing restart segment") from None
            preds = {ci: 0 for ci in scan_cis}
            eobrun = 0
        for ci, by, bx in blocks_of(unit):
            blk = coef[ci][by, bx]
            if is_dc and ah == 0:  # DC first
                cid = comps[ci][0]
                dc_id = sel[cid][0]
                if dc_id not in huff_dc:
                    raise ValueError("JPEG scan references missing DHT")
                t = _jpeg_huff_decode(reader, huff_dc[dc_id])
                if t > 11:
                    raise ValueError("JPEG DC category > 11")
                preds[ci] += _jpeg_extend(reader.read_bits(t), t)
                blk[0] = preds[ci] << al
            elif is_dc:  # DC refine: one raw bit
                if reader.read_bit():
                    blk[0] = int(blk[0]) | p1
            elif ah == 0:  # AC first
                if eobrun > 0:
                    eobrun -= 1
                    continue
                cid = comps[ci][0]
                ac_id = sel[cid][1]
                if ac_id not in huff_ac:
                    raise ValueError("JPEG scan references missing DHT")
                ac_tab = huff_ac[ac_id]
                k = ss
                while k <= se:
                    rs = _jpeg_huff_decode(reader, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC index overflow")
                    blk[k] = _jpeg_extend(reader.read_bits(s), s) << al
                    k += 1
            else:  # AC refine (T.81 G.1.2.3)
                cid = comps[ci][0]
                ac_id = sel[cid][1]
                if ac_id not in huff_ac:
                    raise ValueError("JPEG scan references missing DHT")
                ac_tab = huff_ac[ac_id]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _jpeg_huff_decode(reader, ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r < 15:
                                eobrun = (1 << r)
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            newval = 0  # ZRL: skip 16 zero-history
                        elif s == 1:
                            newval = p1 if reader.read_bit() else m1
                        else:
                            raise ValueError(
                                "JPEG AC refine size != 1"
                            )
                        # advance past r ZERO-HISTORY positions,
                        # refining the nonzero ones along the way
                        while k <= se:
                            if blk[k] != 0:
                                _jpeg_refine_nonzero(
                                    reader, blk, k, p1, m1
                                )
                            else:
                                if r == 0:
                                    if newval:
                                        blk[k] = newval
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    # EOB region: still refine remaining nonzeros
                    while k <= se:
                        if blk[k] != 0:
                            _jpeg_refine_nonzero(reader, blk, k, p1, m1)
                        k += 1
                    eobrun -= 1


def decode_media(payload: bytes, media_meta=None) -> np.ndarray:
    """Decode an image payload to an ``(H, W, C)`` uint8 numpy array.

    Real decode for the formats a stdlib+numpy codec can honestly
    cover, sniffed from the payload's magic bytes: PPM ``P6``,
    uncompressed BMP, 8-bit non-interlaced PNG (inflate is stdlib
    ``zlib``), GIF (first frame), and Huffman JPEG — baseline
    sequential AND progressive (_decode_jpeg — Huffman + dequant +
    IDCT + YCbCr). Anything else — WebP, arithmetic-coded JPEG,
    audio, video — needs a codec that is genuinely not in this
    environment and raises NotImplementedError; deployments with
    PIL/av/torchaudio extend the dispatch below.
    """
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        # max_frames=1: the still-image contract never pays for (or
        # composites) the rest of an animation
        return _decode_gif(payload, max_frames=1)[0]
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    fmt = (dict(media_meta).get("format") if media_meta else None) or "unknown"
    raise NotImplementedError(
        f"no stdlib codec for payload format '{fmt}' "
        "(PPM/BMP/PNG/GIF/baseline-JPEG decode natively; plug PIL/av "
        "for the rest)"
    )


def _gif_lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """GIF-variant LZW: variable-width codes packed LSB-first, CLEAR
    resets the table, EOI terminates; the KwKwK case (a code equal to
    the next free slot) outputs prev + prev[0]. Bounded: the table
    can never exceed 4096 entries (spec) and output is capped at
    ``max_pixels`` (decompression-bomb guard). Output and table
    entries are ``bytes`` — every emitted symbol is a palette index
    < 256, and a list[int] here cost ~28x the intended byte budget
    in CPython object overhead."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table():
        return {i: bytes((i,)) for i in range(clear)}

    table = fresh_table()
    next_free = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = fresh_table()
                next_free = eoi + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code not in table:
                    raise ValueError(f"bad first LZW code {code}")
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_free:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError(f"LZW code {code} out of sequence")
            out += entry
            if len(out) > max_pixels:
                raise ValueError("LZW output exceeds pixel budget")
            if prev is not None and next_free < 4096:
                table[next_free] = prev + entry[:1]
                next_free += 1
                if next_free == (1 << width) and width < 12:
                    width += 1
            prev = entry
    raise ValueError("LZW stream ended without EOI")


#: Interlaced GIF row order: 4 passes with (start, step).
_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(
    payload: bytes, max_frames: int | None = None
) -> list[np.ndarray]:
    """Decode GIF87a/89a to a list of full-canvas ``(H, W, 3)`` uint8
    frames (at most ``max_frames`` when given — decoding stops there,
    so a first-frame caller never pays for the whole animation).
    Stdlib-only: header + color tables via struct slicing, image data
    via :func:`_gif_lzw_decode`. Handles local/global palettes,
    interlacing, frame offsets, restore-to-background / keep-previous
    disposal (both approximated as draw-over-previous, the common
    browser behavior for the corpora this screens), and the 89a
    transparency index (transparent pixels keep the prior canvas).

    Bomb guards: the budget counts FULL-CANVAS pixels per emitted
    frame (each frame appends a canvas copy — a 620-byte GIF with a
    big canvas and many 1-pixel frames otherwise allocates
    gigabytes), bounding both the canvas allocation and the copies;
    LZW output is capped per frame. One hostile file must never pin
    an executor."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    width, height, flags, bg_idx, _ar = struct.unpack_from(
        "<HHBBB", payload, 6
    )
    if width < 1 or height < 1:
        raise ValueError(f"bad GIF dimensions {width}x{height}")
    pixel_budget = MAX_DECODED_BYTES // 3
    # the canvas allocation IS the first bomb surface: bound it before
    # np.zeros, not after
    if width * height > pixel_budget:
        raise ValueError(
            f"GIF canvas {width}x{height} exceeds pixel budget"
        )
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(-1, 3)
        if global_pal.shape[0] != n:
            raise ValueError("truncated global color table")
        pos += 3 * n

    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if global_pal is not None and global_pal.shape[0]:
        # header's background-color index fills the initial canvas
        # (clamped: hostile files can point past the palette)
        canvas[:, :] = global_pal[min(bg_idx, global_pal.shape[0] - 1)]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    total_px = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(payload):
                raise ValueError("truncated sub-blocks")
            n = payload[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            chunks.append(payload[p : p + n])
            if len(payload[p : p + n]) != n:
                raise ValueError("truncated sub-block body")
            p += n

    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated extension")
            label = payload[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                transparent = body[3] if body[0] & 0x01 else None
            continue
        if marker != 0x2C:
            raise ValueError(f"unknown GIF block marker 0x{marker:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated image descriptor")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + w > width or top + h > height or w < 1 or h < 1:
            raise ValueError("GIF frame exceeds canvas")
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            if pal.shape[0] != n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any color table")
        if pos >= len(payload):
            raise ValueError("truncated LZW header")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad LZW min code size {min_code}")
        data, pos = read_subblocks(pos)
        # budget the CANVAS copy this frame will append, not just the
        # sub-frame: that copy is the dominant allocation
        total_px += width * height
        if total_px > pixel_budget:
            raise ValueError("GIF frames exceed pixel budget")
        idx = _gif_lzw_decode(data, min_code, w * h)
        if len(idx) < w * h:
            raise ValueError("LZW underrun: fewer pixels than frame")
        ia = np.frombuffer(idx[: w * h], dtype=np.uint8).astype(np.int32)
        if int(ia.max()) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        if iflags & 0x40:  # interlaced: reorder rows
            rows = ia.reshape(h, w)
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for y in range(start, h, step):
                    ordered[y] = rows[src]
                    src += 1
            rows = ordered
        else:
            rows = ia.reshape(h, w)
        region = canvas[top : top + h, left : left + w]
        rgb = pal[rows]
        if transparent is not None:
            mask = rows != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        transparent = None
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to ``(samples, sample_rate)`` where
    samples is float64 shape ``(n_frames, n_channels)`` scaled to
    [-1, 1]. Stdlib-only manual RIFF chunk walk (no ``wave`` module:
    it cannot read float PCM and swallows chunk-order variants):
    integer PCM 8/16/24/32-bit (format tag 1) and IEEE float32/64
    (tag 3) decode; compressed formats (ADPCM, mu-law, MP3-in-WAV...)
    raise NotImplementedError. Hardened like the image path: bounded
    by MAX_DECODED_BYTES, truncated chunks rejected, declared sizes
    never trusted past the buffer."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        body_end = body_start + csize
        if body_end > end:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too short")
            tag, n_ch, rate, _br, block, bits = struct.unpack_from(
                "<HHIIHH", payload, body_start
            )
            fmt = (tag, n_ch, rate, block, bits)
        elif cid == b"data":
            data = payload[body_start:body_end]
        pos = body_end + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_ch, rate, block, bits = fmt
    # rate is a raw uint32 from the wire: bound it so a hostile value
    # can neither wrap the IntegerType stats schema nor blow up
    # duration math (no real format exceeds 384 kHz; 2^31-1 is the
    # schema's hard ceiling)
    if n_ch < 1 or not 1 <= rate <= (1 << 31) - 1:
        raise ValueError(f"bad fmt: channels={n_ch} rate={rate}")
    if tag not in (1, 3):
        raise NotImplementedError(
            f"no stdlib codec for WAVE format tag {tag} "
            "(integer/float PCM decode natively)"
        )
    if (tag, bits) not in ((1, 8), (1, 16), (1, 24), (1, 32), (3, 32), (3, 64)):
        raise NotImplementedError(f"unsupported PCM width {bits} (tag {tag})")
    bytes_per = bits // 8
    if 8 * len(data) > MAX_DECODED_BYTES:
        raise ValueError(
            f"decoded audio would exceed {MAX_DECODED_BYTES} bytes"
        )
    n_frames = len(data) // (bytes_per * n_ch)
    usable = n_frames * bytes_per * n_ch
    raw = data[:usable]
    # explicit little-endian dtypes: WAV is LE by definition; native
    # np.int16/np.float32 would silently byte-swap on a BE host
    if tag == 3:
        x = np.frombuffer(raw, dtype="<f4" if bits == 32 else "<f8")
        samples = x.astype(np.float64)
    elif bits == 8:
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x)
        samples = x.astype(np.float64) / float(1 << 23)
    else:
        dtype = "<i2" if bits == 16 else "<i4"
        samples = np.frombuffer(raw, dtype=dtype).astype(np.float64) / float(
            1 << (bits - 1)
        )
    return samples.reshape(-1, n_ch), rate


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def audio_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode over mapInPandas: per WAV payload, decode via
    :func:`_decode_wav` and emit rate/channels/duration plus the
    screening features an audio training pipeline gates on — RMS
    level (silence / clipping screen), absolute peak, and
    zero-crossing rate of the first channel (a crude
    noisiness/voicedness signal). Undecodable or compressed payloads
    quarantine per row with the error recorded, exactly like
    image_stats: one bad file must never kill a 100 TB scan."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                did = None if pd.isna(doc_id) else int(doc_id)
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    samples, rate = _decode_wav(bytes(payload))
                    if samples.shape[0] == 0:
                        raise ValueError("zero-frame audio")
                    mono = samples[:, 0]
                    zc = (
                        float(np.count_nonzero(np.diff(np.signbit(mono))))
                        / max(len(mono) - 1, 1)
                    )
                    rows.append(
                        (
                            did,
                            True,
                            int(rate),
                            int(samples.shape[1]),
                            int(samples.shape[0]),
                            1000.0 * samples.shape[0] / rate,
                            float(np.sqrt(np.mean(samples**2))),
                            float(np.max(np.abs(samples))),
                            zc,
                            None,
                        )
                    )
                except _QUARANTINE_ERRORS as e:
                    reason = f"{type(e).__name__}: {e}"[:200]
                    rows.append(
                        (did, False, None, None, None, None, None, None,
                         None, reason)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, AUDIO_STATS_SCHEMA
    )


VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("motion", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def video_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_stride: int = 1,
) -> DataFrame:
    """REAL video decode over mapInPandas (the third modality kernel
    beside image_stats/audio_stats): per Motion-JPEG AVI payload,
    decode every ``frame_stride``-th frame (:func:`_avi_mjpeg_frames`
    — skipped frames never decode) and emit the screening features a
    video training pipeline gates on — frame count, dimensions, mean
    pixel level (black/blank screen), and MOTION: the mean absolute
    inter-frame pixel delta of the sampled frames (a static-slide
    'video' scores ~0; noise/scene-change content scores high).
    Undecodable payloads (non-AVI, non-MJPEG streams, corrupt or
    bomb-sized frames) quarantine per row with the error recorded —
    one bad file must never kill a 100 TB scan."""
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1: {frame_stride}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                did = None if pd.isna(doc_id) else int(doc_id)
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    frames = _avi_mjpeg_frames(bytes(payload), frame_stride)
                    h, w = frames[0].shape[:2]
                    if any(f.shape != frames[0].shape for f in frames):
                        raise ValueError("AVI frame dimensions vary")
                    stack = np.stack(frames).astype(np.float64)
                    motion = (
                        float(np.abs(np.diff(stack, axis=0)).mean())
                        if len(frames) > 1
                        else 0.0
                    )
                    rows.append(
                        (did, True, len(frames), int(w), int(h),
                         float(stack.mean()), motion, None)
                    )
                except _QUARANTINE_ERRORS as e:
                    reason = f"{type(e).__name__}: {e}"[:200]
                    rows.append(
                        (did, False, None, None, None, None, None, reason)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_STATS_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, VIDEO_STATS_SCHEMA
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6) bytes — the stdlib-writable
    re-encode target for decoded/resized images."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_ppm needs (H, W, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic pseudo-features from the payload digest — keeps
    the distributed plumbing testable without a decoder."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0
        for i in range(FEATURE_DIM)
    ]


def _image_grid_features(arr: np.ndarray) -> list[float]:
    """REAL image features: a 4x4 grid of mean luminance (BT.601 luma
    for color, the channel itself for grayscale), scaled to [0, 1] —
    FEATURE_DIM=16 values. Deterministic, resolution-invariant (each
    cell averages its pixel block), and meaningful for the downstream
    similarity/dedup ops: near-identical images land near-identical
    vectors, unlike a digest."""
    a = arr.astype(np.float64)
    if a.shape[2] >= 3:
        luma = (
            0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        )
    else:
        luma = a[..., 0]
    h, w = luma.shape
    ys = [round(i * h / 4) for i in range(5)]
    xs = [round(i * w / 4) for i in range(5)]
    out = []
    for i in range(4):
        for j in range(4):
            cell = luma[ys[i] : max(ys[i + 1], ys[i] + 1),
                        xs[j] : max(xs[j + 1], xs[j] + 1)]
            out.append(float(cell.mean()) / 255.0)
    return out


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    DECODABLE image payloads (PPM/BMP/PNG/GIF/baseline JPEG) get REAL
    features — a 4x4 mean-luminance grid (:func:`_image_grid_features`),
    the classic cheap perceptual embedding whose cosine distance
    tracks visual similarity; undecodable payloads keep the
    deterministic digest pseudo-features so the distributed plumbing
    (and anything keyed on the vector shape) behaves identically on
    arbitrary bytes.

    Each batch is processed columnar-side; only this stage crosses the
    JVM/Python boundary, and it streams (never materializes a
    partition). At 100 TB, payload size dominates: repartition by size
    beforehand and keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
    tuned so a batch of payloads fits executor memory.
    """

    def features_of(p):
        if p is None:
            return None
        try:
            arr = decode_media(bytes(p))
            if arr.size == 0:
                # a decodable 0-pixel image would emit all-NaN grid
                # features (empty-slice means), silently corrupting
                # every downstream cosine — same guard as image_stats
                raise ValueError("zero-pixel image")
            return _image_grid_features(arr)
        except _QUARANTINE_ERRORS:
            return _fake_features(p)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    # ids pass through untouched (NULL-safe, schema
                    # re-applied by Arrow)
                    "doc_id": pdf[id_col],
                    "payload_sha": [
                        None if p is None else hashlib.sha256(p).hexdigest()
                        for p in payloads
                    ],
                    "n_bytes": [
                        None if p is None else len(p) for p in payloads
                    ],
                    "features": [features_of(p) for p in payloads],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, FEATURES_SCHEMA
    )


#: Exceptions a malformed/hostile payload may raise inside a decode
#: kernel. These quarantine the ROW (decoded=false / fallback path);
#: anything else is a real bug and should still fail the task. The
#: contract: one bad file must never kill a 100 TB scan.
#: MemoryError is included deliberately — the PNG pre-allocation
#: guards make it unlikely, but a row is still better than a dead
#: executor if an allocation slips through.
_QUARANTINE_ERRORS = (
    NotImplementedError,
    ValueError,
    TypeError,
    zlib.error,
    struct.error,
    IndexError,
    MemoryError,
)

IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
        # Why the row quarantined ("ExcClass: msg", None when decoded).
        # Bug-shaped failures (TypeError/IndexError) stay distinguishable
        # from expected codec gaps (NotImplementedError) in aggregate.
        T.StructField("error", T.StringType()),
    ]
)


def image_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image decode over mapInPandas: per payload, decode via
    :func:`decode_media` and emit dimensions plus pixel mean/std — the
    corrupted-file / degenerate-image screen a multimodal training
    pipeline runs before feature extraction. Payloads in formats this
    container cannot decode come back ``decoded=false`` with null
    dims (quarantine rows, not job failures — one bad file must never
    kill a 100 TB scan). Same streaming/batching posture as
    extract_features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                # doc_id may be NULL (pandas NaN) — quarantine, don't
                # int(None)-crash the task.
                did = None if pd.isna(doc_id) else int(doc_id)
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    arr = decode_media(bytes(payload))
                    if arr.size == 0:
                        # 0x0 image: decoded=true with NaN moments
                        # would poison downstream aggregates
                        raise ValueError("zero-pixel image")
                    px = arr.astype(np.float64)
                    rows.append(
                        (did, True, arr.shape[1], arr.shape[0],
                         arr.shape[2], float(px.mean()), float(px.std()),
                         None)
                    )
                except _QUARANTINE_ERRORS as e:
                    reason = f"{type(e).__name__}: {e}"[:200]
                    rows.append(
                        (did, False, None, None, None, None, None, reason)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, IMAGE_STATS_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Image resize over mapInPandas.

    Decodable payloads (PPM/BMP/PNG — :func:`decode_media`) are REALLY
    resized: nearest-neighbor resample to ``(target_w, target_h)``,
    re-encoded as PPM (the stdlib-writable format; alpha/gray expand
    to RGB first), ``media_meta.format`` updated to ``'ppm'`` and
    ``width``/``height`` to the target dims. Undecodable/NULL payloads
    fall back to a deterministic truncation stand-in and — the
    convention consumers key on — their ``media_meta`` is left
    UNTOUCHED: only rows whose ``media_meta.format == 'ppm'`` and
    ``width == target_w`` were actually resized; fallback rows never
    claim dimensions their payload doesn't have. Swap PIL into
    decode_media's dispatch and the fallback disappears. The
    Spark-side contract (schema, Arrow batching, partition behavior)
    is identical on both paths."""

    def _resize_one(
        payload: bytes | None, meta: dict
    ) -> tuple[bytes | None, bool]:
        if payload is None:
            # NULL payload rides through as NULL, not a task crash
            return None, False
        try:
            arr = decode_media(payload, meta)
            if arr.size == 0:
                raise ValueError("zero-pixel image")
        except _QUARANTINE_ERRORS:
            cap = max(16, (target_w * target_h) // 64)
            return bytes(payload[:cap]), False
        h, w = arr.shape[:2]
        yy = (np.arange(target_h) * h) // max(target_h, 1)
        xx = (np.arange(target_w) * w) // max(target_w, 1)
        out = arr[yy][:, xx]
        if out.shape[2] == 1:  # gray -> RGB
            out = np.repeat(out, 3, axis=2)
        elif out.shape[2] == 2:  # gray+alpha -> RGB (drop alpha)
            out = np.repeat(out[..., :1], 3, axis=2)
        elif out.shape[2] == 4:  # RGBA -> RGB
            out = out[..., :3]
        return encode_ppm(out), True

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, payloads = [], []
            for m, p in zip(pdf[meta_col], pdf[payload_col]):
                m = dict(m) if m is not None else {}
                data, resized = _resize_one(
                    None if p is None else bytes(p), m
                )
                if resized:
                    m["width"], m["height"] = target_w, target_h
                    m["format"] = "ppm"
                metas.append(m)
                payloads.append(data)
            yield pd.DataFrame(
                {
                    # pass ids through untouched: astype('int64') would
                    # crash on a NULL id; Arrow re-applies the schema
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_meta": metas,
                }
            )

    return df.select(
        F.col(id_col), F.col(payload_col), F.col(meta_col)
    ).mapInPandas(kernel, RESIZED_SCHEMA)


def _avi_mjpeg_frames(
    payload: bytes, frame_stride: int = 1
) -> list[np.ndarray]:
    """Motion-JPEG-in-AVI (RIFF) -> decoded frames, every
    ``frame_stride``-th one. The RIFF tree is walked for video chunks
    ('##dc'/'##db', including nested 'rec ' lists); each selected
    chunk body is a standalone baseline JPEG decoded by
    :func:`_decode_jpeg`. Unlike GIF (whose frames composite, so all
    must decode), MJPEG frames are independent — striding skips the
    DECODE cost of unsampled frames, exactly why MJPEG is the
    screening-friendly video codec. Cumulative decoded bytes are
    bomb-bounded by MAX_DECODED_BYTES; a non-JPEG video stream or
    truncated chunk raises (quarantine)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)
    locs: list[tuple[int, int]] = []

    # ITERATIVE walk (explicit stack): a hostile file nesting
    # thousands of LIST chunks must quarantine via the normal error
    # path, never blow Python's recursion limit (RecursionError is
    # not in _QUARANTINE_ERRORS and would kill the whole scan)
    stack: list[tuple[int, int]] = [(12, end)]
    while stack:
        pos, stop = stack.pop()
        while pos + 8 <= stop:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if body + size > stop:
                raise ValueError("AVI chunk truncated")
            if fourcc in (b"RIFF", b"LIST"):
                stack.append((body + 4, body + size))
            elif fourcc[2:4] in (b"dc", b"db"):
                locs.append((body, size))
            pos = body + size + (size & 1)
    if not locs:
        raise ValueError("AVI contains no video chunks")
    out: list[np.ndarray] = []
    total = 0
    for i, (body, size) in enumerate(locs):
        if i % frame_stride:
            continue
        data = payload[body : body + size]
        if data[:2] != b"\xff\xd8":
            raise ValueError("AVI video stream is not MJPEG")
        arr = _decode_jpeg(data)
        total += arr.nbytes
        if total > MAX_DECODED_BYTES:
            raise ValueError(
                "AVI decoded frames exceed MAX_DECODED_BYTES"
            )
        if arr.shape[2] == 1:  # grayscale MJPEG -> RGB for the PPM
            arr = np.repeat(arr, 3, axis=2)
        out.append(arr)
    return out


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_stride: int = 1,
) -> DataFrame:
    """Frame sampling (animation/video -> frame rows), exploding 1->N
    through mapInPandas — the batch/row-fanout shape a real ffmpeg
    kernel needs. For GIF payloads the frames are REAL: every
    ``frame_stride``-th composited full-canvas frame, re-encoded as
    PPM (the stdlib-writable interchange format, decodable by
    decode_media downstream). VIDEO is real for Motion-JPEG AVI
    (:func:`_avi_mjpeg_frames` — RIFF walk + per-frame baseline JPEG
    decode, striding skips undecoded frames entirely). For formats
    with no in-container codec (MP4/H.264 etc.) the deterministic
    byte-window stand-in keeps the distributed plumbing exercised;
    its rows are distinguishable by ``real=false``."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
            T.StructField("real", T.BooleanType()),
        ]
    )
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1: {frame_stride}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, real = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                # per-row quarantine, like image_stats/audio_stats: a
                # NULL payload/id emits one real=false placeholder row
                # instead of raising through the whole scan
                if payload is None or pd.isna(doc_id):
                    ids.append(None if pd.isna(doc_id) else int(doc_id))
                    idxs.append(0)
                    frames.append(None)
                    real.append(False)
                    continue
                b = bytes(payload)
                if b[:6] in (b"GIF87a", b"GIF89a"):
                    try:
                        decoded = _decode_gif(b)[::frame_stride]
                        for i, fr in enumerate(decoded):
                            ids.append(int(doc_id))
                            idxs.append(i)
                            frames.append(encode_ppm(fr))
                            real.append(True)
                        continue
                    except _QUARANTINE_ERRORS:
                        pass  # corrupt GIF falls back to byte windows
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    try:
                        decoded = _avi_mjpeg_frames(b, frame_stride)
                        for i, fr in enumerate(decoded):
                            ids.append(int(doc_id))
                            idxs.append(i)
                            frames.append(encode_ppm(fr))
                            real.append(True)
                        continue
                    except _QUARANTINE_ERRORS:
                        pass  # corrupt/non-MJPEG AVI -> byte windows
                for i, start in enumerate(range(0, len(b), every_n_bytes)):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(b[start : start + every_n_bytes])
                    real.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "real": real,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, schema
    )
