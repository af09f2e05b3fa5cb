"""Generate the frozen VALUES oracle for the tdp_multimodal driver query.

The query decodes the deterministic ``make_media_df(n=24, seed=42)`` fixture
with the package's numpy/stdlib codecs (graphene_spark/tdp/multimodal.py).
This script computes the SAME features with an INDEPENDENT pure-Python
decoder — its own BMP/PPM/WAV parsers and float arithmetic, no numpy in the
decode path, no Spark anywhere — and freezes them into
``graphene_spark/media_expected.py`` for ``oracle_sql()`` to render as a
DuckDB VALUES relation (the gen_kg_oracles.py pattern: fixtures shared,
decision logic independent).

Float robustness: every double feature is frozen as its ROUND(x, 6) decimal
string.  The script asserts that each value's distance from the nearest
rounding boundary exceeds 1e-9 (so the numpy implementation, differing by
summation order at ~1e-15, must round identically), and that every phash
bit decision has a luma margin above 1e-9 (so no average-hash bit can flip
between float implementations).  If either assertion ever fires, change the
fixture seed here AND in q_tdp_multimodal.

Run: python scripts/gen_media_oracle.py
"""

from __future__ import annotations

import io
import math
import os
import struct
import sys
import wave

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT_PATH = os.path.join(ROOT, "graphene_spark", "media_expected.py")

N, SEED = 24, 42  # MUST mirror q_tdp_multimodal's fixture
EVERY_N = 10


# ---------------------------------------------------------------------------
# independent pure-Python decoders (no numpy)
# ---------------------------------------------------------------------------

def parse_ppm(payload: bytes, offset: int = 0):
    """-> (width, height, pixel_rows as list[list[(r,g,b)]], end_offset)."""
    assert payload[offset : offset + 2] == b"P6"
    pos = offset + 2
    fields = []
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1
    w, h, maxval = fields
    assert maxval == 255
    end = pos + w * h * 3
    assert end <= len(payload), "truncated PPM"
    px = [
        [tuple(payload[pos + (y * w + x) * 3 + c] for c in range(3)) for x in range(w)]
        for y in range(h)
    ]
    return w, h, px, end


def parse_bmp(payload: bytes):
    """24-bit uncompressed BMP -> (width, height, pixel rows, RGB)."""
    assert payload[:2] == b"BM"
    (data_off,) = struct.unpack_from("<I", payload, 10)
    _hdr, w, h_signed, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    assert bpp == 24 and comp == 0
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for ry in range(h):
        base = data_off + ry * row_bytes
        row = []
        for x in range(w):
            b, g, r = payload[base + x * 3 : base + x * 3 + 3]
            row.append((r, g, b))
        rows.append(row)
    if h_signed > 0:  # bottom-up
        rows.reverse()
    return w, h, rows


def luma_grid(px):
    return [[(0.299 * r + 0.587 * g + 0.114 * b) / 255.0 for (r, g, b) in row] for row in px]


def mean2d(grid):
    return sum(sum(row) for row in grid) / (len(grid) * len(grid[0]))


def average_hash(grid):
    """Pure-Python mirror of multimodal._average_hash + tie-margin report."""
    h, w = len(grid), len(grid[0])
    ri = [(i * h) // 8 for i in range(8)]
    ci = [(i * w) // 8 for i in range(8)]
    cells = [grid[y][x] for y in ri for x in ci]
    m = sum(cells) / 64.0
    margin = min(abs(c - m) for c in cells)
    val = 0
    for c in cells:
        val = (val << 1) | (1 if c > m else 0)
    signed = val - (1 << 64) if val >= (1 << 63) else val
    return signed, margin


def decode_image_features(payload: bytes):
    if payload[:2] == b"BM":
        w, h, px = parse_bmp(payload)
    else:
        w, h, px, _ = parse_ppm(payload)
    grid = luma_grid(px)
    phash, margin = average_hash(grid)
    return w, h, mean2d(grid), phash, margin


def decode_audio_features(payload: bytes):
    with wave.open(io.BytesIO(payload), "rb") as wv:
        assert wv.getsampwidth() == 2 and wv.getnchannels() == 1
        rate = wv.getframerate()
        raw = wv.readframes(wv.getnframes())
    samples = [
        int.from_bytes(raw[i : i + 2], "little", signed=True) for i in range(0, len(raw), 2)
    ]
    n = len(samples)
    rms = math.sqrt(sum(float(s) * s for s in samples) / n) / 32768.0 if n else 0.0
    peak = max(abs(s) for s in samples) / 32768.0 if n else 0.0
    return rate, n, rms, peak


def video_frame_lumas(payload: bytes, every_n: int):
    pos, idx, out = 0, 0, []
    while pos < len(payload):
        w, h, px, pos = parse_ppm(payload, pos)
        if idx % every_n == 0:
            out.append((idx, mean2d(luma_grid(px))))
        idx += 1
    return out


# ---------------------------------------------------------------------------
# freezing
# ---------------------------------------------------------------------------

def round6(x: float) -> str:
    """ROUND(x, 6) as a decimal literal, with a boundary-margin assertion so
    HALF_UP (Spark) and round-half-even (Python) cannot disagree and a
    ~1e-15 cross-implementation wobble cannot change the result."""
    scaled = x * 1e6
    frac = abs(scaled - math.floor(scaled) - 0.5)
    assert frac > 1e-9 * max(1.0, abs(scaled)), f"value {x!r} too close to a rounding boundary"
    return f"{round(x, 6):.6f}"


def main() -> None:
    # fixture payloads come from the package ENCODERS (shared, like datagen
    # in gen_kg_oracles.py); everything after the bytes is independent
    from graphene_spark.tdp import multimodal as mm

    rows = []  # (media_id, feature, ival, dval_literal)
    min_phash_margin = math.inf
    for i in range(N):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w0, h0 = 64 + i % 32, 48 + i % 16
            pixels = mm._gradient(h0, w0, SEED + i)
            payload = bytes(mm.encode_bmp(pixels) if i % 2 == 0 else mm.encode_ppm(pixels))
            w, h, ml, phash, margin = decode_image_features(payload)
            assert (w, h) == (w0, h0)
            min_phash_margin = min(min_phash_margin, margin)
            assert margin > 1e-9, f"phash tie at media {i} (margin {margin})"
            rows += [
                (i, "width", w, None),
                (i, "height", h, None),
                (i, "mean_luma", None, round6(ml)),
                (i, "phash", phash, None),
            ]
        elif kind == "audio":
            rate, n_samp = 16000, 1600
            freq = 220.0 + 10.0 * (i % 40)
            import numpy as np  # encoder side only, mirrors make_media_df

            t = np.arange(n_samp)
            samples = (12000 * np.sin(2 * math.pi * freq * t / rate)).astype(np.int16)
            payload = mm.encode_wav(samples, rate)
            rate_d, n_d, rms, peak = decode_audio_features(payload)
            assert (rate_d, n_d) == (rate, n_samp)
            rows += [
                (i, "sample_rate", rate_d, None),
                (i, "n_samples", n_d, None),
                (i, "rms", None, round6(rms)),
                (i, "peak", None, round6(peak)),
            ]
        else:
            w0, h0, n_frames = 16, 12, 30
            frames = [mm._gradient(h0, w0, SEED + i + 13 * f) for f in range(n_frames)]
            payload = mm.encode_video_ppm(frames)
            for idx, ml in video_frame_lumas(payload, EVERY_N):
                rows.append((i, f"frame_{idx}_luma", None, round6(ml)))

    with open(OUT_PATH, "w") as f:
        f.write(
            '"""FROZEN multimodal oracle — GENERATED by scripts/gen_media_oracle.py.\n\n'
            "Expected feature rows for the make_media_df(n=%d, seed=%d) fixture,\n"
            "computed by an independent pure-Python decoder (no numpy in the\n"
            "decode path, no Spark).  Do not edit by hand; re-run the generator\n"
            'when the fixture or the feature set changes."""\n\n'
            % (N, SEED)
        )
        f.write("MEDIA_COLUMNS = ['media_id', 'feature', 'ival', 'dval']\n")
        f.write("MEDIA_TYPES = ['BIGINT', 'VARCHAR', 'BIGINT', 'DOUBLE']\n")
        f.write("MEDIA_ROWS = [\n")
        # sentinels instead of NULLs: a nullable BIGINT column round-trips
        # through pandas as float64 and loses phash precision (2^63-scale
        # ints are not representable); -1/-1.0 keep both columns non-null
        # and exactly typed on every comparison path
        for mid, feat, ival, dval in rows:
            f.write(
                f"    ({mid}, {feat!r}, {ival if ival is not None else -1}, "
                f"{dval if dval is not None else '-1.0'}),\n"
            )
        f.write("]\n")
    print(f"froze {len(rows)} rows to {OUT_PATH}; min phash margin {min_phash_margin:.3e}")


if __name__ == "__main__":
    main()
