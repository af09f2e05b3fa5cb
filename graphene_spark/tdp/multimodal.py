"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with a metadata struct, and the
decode step is REAL, stdlib-only (the sandbox has no imaging libs, and none
are needed for these formats):

* images — BMP (24-bit uncompressed, ``struct`` header parse) and binary
  PPM (``P6``), pixels lifted into numpy for luminance / average-hash;
* audio  — WAV PCM16 via the stdlib ``wave`` module, RMS/peak from numpy;
* video  — a concatenated-``P6``-frame stream (motion-PPM), frame-seekable
  by walking the self-describing frame headers.

Features derive from real pixels/samples: ``mean_luma`` is the Rec.601 luma
mean over every pixel, ``phash`` is a 64-bit average-hash (8x8 nearest-
neighbor downsample, bit = cell > grid mean), ``rms``/``peak`` are computed
over the decoded int16 samples.

Scale notes baked into the design:
* binary payloads dominate row size -> keep them OUT of shuffles: derive
  features first (narrow mapInPandas), then drop the payload before any join;
* ``maxRecordsPerBatch`` bounds Arrow batch memory; metadata-only plans never
  deserialize payload bytes thanks to Parquet column pruning;
* video work units fan out as (media_id, frame_idx) pairs planned from
  metadata alone (``frame_sample_plan``) so the decode stage touches only
  sampled frames.
"""

from __future__ import annotations

import io
import math
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, mime:string>"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, mean_luma double, phash long"
)
AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_samples int, rms double, peak double"
)
VIDEO_FRAME_SCHEMA = "media_id long, frame_idx int, mean_luma double"


# ---------------------------------------------------------------------------
# encoders (deterministic payload generation for tests / fixtures)
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (``P6``)."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up, BGR,
    4-byte row padding — the classic Windows 3.x layout)."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack(
        "<2sIHHI"  # BITMAPFILEHEADER
        "IiiHHIIiiII",  # BITMAPINFOHEADER
        b"BM", 14 + 40 + img_size, 0, 0, 14 + 40,
        40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    bgr = pixels[:, :, ::-1].astype(np.uint8)  # RGB -> BGR
    rows = []
    pad = b"\x00" * (row_bytes - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(bgr[y].tobytes() + pad)
    return header + b"".join(rows)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 array -> mono PCM16 WAV bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def encode_video_ppm(frames: list[np.ndarray]) -> bytes:
    """Concatenated-P6 motion stream: each frame is a self-describing PPM."""
    return b"".join(encode_ppm(f) for f in frames)


# ---------------------------------------------------------------------------
# decoders (real, stdlib-only)
# ---------------------------------------------------------------------------

def _luma(pixels: np.ndarray) -> np.ndarray:
    """Rec.601 luma in [0, 1] from (H, W, 3) uint8 RGB."""
    p = pixels.astype(np.float64)
    return (0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]) / 255.0


def _average_hash(luma: np.ndarray) -> int:
    """64-bit average-hash: 8x8 nearest-neighbor downsample, bit = cell >
    grid mean, packed row-major, returned as a SIGNED 64-bit int (Spark
    ``long``).  Robust to any image size >= 1x1."""
    h, w = luma.shape
    ri = (np.arange(8) * h) // 8
    ci = (np.arange(8) * w) // 8
    small = luma[ri][:, ci]
    bits = (small > small.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def _parse_ppm_header(payload: bytes, offset: int) -> tuple[int, int, int, int]:
    """Parse one binary-PPM header starting at ``offset``; returns
    (width, height, data_start, end) WITHOUT touching the pixel bytes —
    the frame walk uses this to skip unsampled frames at header cost."""
    if payload[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 PPM at offset %d" % offset)
    pos = offset + 2
    fields = []
    while len(fields) < 3:
        # skip whitespace and '#' comment lines between header fields
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPMs supported, got %d" % maxval)
    end = pos + w * h * 3
    if end > len(payload):
        # must fail at HEADER parse: the frame-walk skip path never touches
        # pixel bytes, so without this a truncated final video frame was
        # silently skipped over (frame count off by one) instead of rejected
        raise ValueError(
            "truncated PPM payload: frame at offset %d needs %d bytes, have %d"
            % (offset, end - offset, len(payload) - offset)
        )
    return w, h, pos, end


def _parse_ppm_at(payload: bytes, offset: int) -> tuple[np.ndarray, int]:
    """Parse one binary PPM starting at ``offset``; returns (pixels, end)."""
    w, h, data_start, end = _parse_ppm_header(payload, offset)
    pixels = np.frombuffer(payload[data_start:end], dtype=np.uint8).reshape(h, w, 3)
    return pixels, end


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (``P6``) -> (H, W, 3) uint8 RGB."""
    pixels, _ = _parse_ppm_at(payload, 0)
    return pixels


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB.  Handles bottom-up
    and top-down (negative height) layouts and 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, w, h_signed, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={comp})")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload[data_off : data_off + row_bytes * h], dtype=np.uint8)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage -> flip to top-down
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def decode_image(payload: bytes) -> dict:
    """Decode a BMP or PPM payload into real pixel-derived features."""
    payload = bytes(payload)
    if payload[:2] == b"BM":
        pixels = decode_bmp(payload)
    elif payload[:2] == b"P6":
        pixels = decode_ppm(payload)
    else:
        raise ValueError("unsupported image format (magic %r)" % payload[:2])
    luma = _luma(pixels)
    return {
        "width": pixels.shape[1],
        "height": pixels.shape[0],
        "mean_luma": float(luma.mean()),
        "phash": _average_hash(luma),
    }


def decode_audio(payload: bytes) -> dict:
    """WAV PCM16 -> {sample_rate, n_samples, rms, peak} over real samples."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        rate = wv.getframerate()
        n = wv.getnframes()
        n_ch = wv.getnchannels()
        samples = np.frombuffer(wv.readframes(n), dtype="<i2").astype(np.float64)
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    scale = 32768.0
    rms = float(math.sqrt((samples**2).mean()) / scale) if len(samples) else 0.0
    peak = float(np.abs(samples).max() / scale) if len(samples) else 0.0
    return {"sample_rate": rate, "n_samples": int(len(samples)), "rms": rms, "peak": peak}


def iter_video_frames(payload: bytes) -> Iterator[np.ndarray]:
    """Walk a concatenated-P6 stream, yielding each frame's pixels."""
    payload = bytes(payload)
    pos = 0
    while pos < len(payload):
        pixels, pos = _parse_ppm_at(payload, pos)
        yield pixels


def decode_video_frame(payload: bytes, frame_idx: int) -> np.ndarray:
    """Seek to frame ``frame_idx`` by walking the self-describing headers —
    skipped frames cost a header parse only, no pixel materialization."""
    payload = bytes(payload)
    pos = 0
    idx = 0
    while pos < len(payload):
        if idx == frame_idx:
            pixels, _ = _parse_ppm_at(payload, pos)
            return pixels
        _, _, _, pos = _parse_ppm_header(payload, pos)
        idx += 1
    raise IndexError(f"frame {frame_idx} beyond end of stream")


# ---------------------------------------------------------------------------
# fixture generation
# ---------------------------------------------------------------------------

def _gradient(h: int, w: int, phase: int) -> np.ndarray:
    """Deterministic full-color test raster (no RNG: reproducible anywhere)."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 3 + y * 5 + phase) % 256
    g = (x * 7 + y * 2 + phase * 3) % 256
    b = (x + y * 11 + phase * 7) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def make_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL payloads: BMP/PPM
    images, PCM16 WAV audio, concatenated-PPM video."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 64 + i % 32, 48 + i % 16
            pixels = _gradient(h, w, seed + i)
            payload = encode_bmp(pixels) if i % 2 == 0 else encode_ppm(pixels)
            mime = "image/bmp" if i % 2 == 0 else "image/x-portable-pixmap"
            meta = (w, h, None, 1, mime)
        elif kind == "audio":
            rate, n_samp = 16000, 1600
            t = np.arange(n_samp)
            freq = 220.0 + 10.0 * (i % 40)
            samples = (12000 * np.sin(2 * math.pi * freq * t / rate)).astype(np.int16)
            payload = encode_wav(samples, rate)
            meta = (None, None, rate, 1, "audio/wav")
        else:
            w, h, n_frames = 16, 12, 30
            frames = [_gradient(h, w, seed + i + 13 * f) for f in range(n_frames)]
            payload = encode_video_ppm(frames)
            meta = (w, h, None, n_frames, "video/x-motion-ppm")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# distributed feature extraction (payload never shuffled)
# ---------------------------------------------------------------------------

def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over image rows — real decode.

    The Arrow batch shape (payload bytes in, small feature rows out) and the
    pre-filter (only kind='image' rows reach Python) keep payload bytes out
    of every shuffle; dimensions come from the DECODED header, not the
    metadata struct, so corrupt/mislabeled payloads surface immediately."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "mean_luma": [], "phash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                feats = decode_image(payload)
                out["media_id"].append(mid)
                out["width"].append(feats["width"])
                out["height"].append(feats["height"])
                out["mean_luma"].append(feats["mean_luma"])
                out["phash"].append(feats["phash"])
            yield pd.DataFrame(out)

    images = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return images.mapInPandas(extract, schema=IMAGE_FEATURE_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas WAV decode over audio rows: rate/RMS/peak from samples."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "n_samples": [], "rms": [], "peak": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                feats = decode_audio(payload)
                out["media_id"].append(mid)
                out["sample_rate"].append(feats["sample_rate"])
                out["n_samples"].append(feats["n_samples"])
                out["rms"].append(feats["rms"])
                out["peak"].append(feats["peak"])
            yield pd.DataFrame(out)

    audio = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return audio.mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index,
    computed from metadata only (no payload decode) — sequence+explode stays
    JVM-side; the decoder consumes (media_id, frame_idx) work units."""
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def extract_video_frame_features(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Decode only the SAMPLED frames of each video (real P6 parse).

    One payload pass per video: unsampled frames are skipped at
    header-parse cost (no pixel materialization — frame count isn't known
    until the stream ends, so the walk must reach EOF, but it only ever
    decodes every_n-th frame), and the payload never leaves the narrow
    mapInPandas stage — output rows are (media_id, frame_idx, mean_luma)
    work-unit results, matching ``frame_sample_plan``'s row set."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "mean_luma": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                pos = 0
                idx = 0
                while pos < len(payload):
                    if idx % every_n == 0:
                        frame, pos = _parse_ppm_at(payload, pos)
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["mean_luma"].append(float(_luma(frame).mean()))
                    else:
                        _, _, _, pos = _parse_ppm_header(payload, pos)
                    idx += 1
            yield pd.DataFrame(out)

    videos = media.filter(F.col("kind") == "video").select("media_id", "payload")
    return videos.mapInPandas(extract, schema=VIDEO_FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must prune the payload column at scan."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.avg("meta.width").alias("avg_width"),
        F.sum(F.length("payload")).alias("total_bytes"),
    )
