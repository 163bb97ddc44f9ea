"""Multimodal column plumbing — image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched kernels.

Decode capability (round 4): WAV (RIFF/WAVE PCM — 8/16/32-bit int and
32-bit float) and BMP (BI_RGB 24-bit) are UNCOMPRESSED containers, so they
decode with struct+numpy alone and are fully supported here — header
parse, padding/bottom-up rows, integer-exact luma.  Only the COMPRESSED
codecs (JPEG/PNG/MP4), which genuinely require external libraries absent
from this container, remain a declared NotImplementedError boundary.
Everything Spark-side is real and tested: the asset schema, the
mapInPandas batch shape (pandas.Series of bytes → numpy), partitioning,
and a deterministic FAKE container format (`FAKI`/`FAKA` headers) that
exercises the full decode → feature → resize pipeline end-to-end.

Kernels:
  asset_table       wrap any bytes-like column into the canonical asset
                    schema (asset_id, kind, data, meta)
  probe_assets      header sniff → (kind, width, height, sample_rate, ...)
                    — real metadata for WAV and BMP, not just magic names
  decode_image      FAKI + BMP → numpy grayscale; JPEG/PNG →
                    NotImplementedError (compressed, libs absent)
  decode_audio      FAKA + WAV-PCM → per-asset sample stats
  resize_images     nearest-neighbor resize on any decodable image
  byte_histogram    bucketed byte-value histogram of the raw payload —
                    a pure-bytes feature extractor with a DuckDB oracle
  sample_frames     fixed-stride frame sampling over a decodable payload

Scale notes: all kernels are mapInPandas over binary columns — Arrow moves
the bytes executor-side in batches, numpy does the math; no per-row Python
object churn beyond the bytes handle. Assets are value-heavy, so upstream
repartitioning should target bytes per partition (maxPartitionBytes), not
row counts.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC_IMAGE = b"FAKI"
MAGIC_AUDIO = b"FAKA"

_REAL_MAGICS = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "wav",
    b"BM": "bmp",
}


# ------------------------- real uncompressed containers (WAV / BMP) -----

def make_wav(samples: np.ndarray, sample_rate: int = 16000,
             n_channels: int = 1) -> bytes:
    """Standard RIFF/WAVE PCM16 writer (mono or interleaved) — test/helper
    encoder for the real decoder below."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block = 2 * n_channels
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * block, block, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, samples[n_frames, n_channels] float64) —
    RIFF/WAVE chunk walk; PCM 8-bit unsigned / 16- / 32-bit signed and
    IEEE float32 supported.  Raw PCM in a RIFF container is a header
    parse, not a compressed codec — no external library involved."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(b), 8 + struct.unpack("<I", b[4:8])[0])
    fmt = data = None
    while pos + 8 <= end:
        cid = b[pos:pos + 4]
        sz = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        chunk = b[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            if len(chunk) < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        pos += 8 + sz + (sz & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _, _, bits = fmt
    if audio_format == 1 and bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float64)
    elif audio_format == 1 and bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
    elif audio_format == 1 and bits == 32:
        arr = np.frombuffer(data, dtype="<i4").astype(np.float64)
    elif audio_format == 3 and bits == 32:
        arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV format {audio_format}/{bits}-bit not supported "
            f"(PCM 8/16/32 and float32 are)")
    n_frames = arr.size // n_ch
    return rate, n_ch, arr[:n_frames * n_ch].reshape(n_frames, n_ch)


def make_bmp(gray: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BMP from a grayscale uint8 array (R=G=B) —
    test/helper encoder for the real decoder below."""
    h, w = gray.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):        # bottom-up storage order
        row = np.repeat(gray[y].astype(np.uint8), 3).tobytes()
        rows.append(row + b"\x00" * (row_bytes - len(row)))
    pixels = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                      2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return header + dib + pixels


def decode_bmp_gray(b: bytes) -> np.ndarray:
    """BMP (BITMAPINFOHEADER, BI_RGB, 24-bit) → uint8 grayscale via the
    integer-exact luma (299R + 587G + 114B) // 1000.  Handles 4-byte row
    padding and both bottom-up (h > 0) and top-down (h < 0) storage."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload (or header truncated)")
    data_off = struct.unpack("<I", b[10:14])[0]
    hdr_sz, w, h = struct.unpack("<Iii", b[14:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    compression = struct.unpack("<I", b[30:34])[0]
    if hdr_sz < 40 or compression != 0 or bpp != 24:
        raise NotImplementedError(
            f"BMP variant not supported (header {hdr_sz}, bpp {bpp}, "
            f"compression {compression}); BI_RGB 24-bit is")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raw = np.frombuffer(b, dtype=np.uint8, count=row_bytes * h,
                        offset=data_off).reshape(h, row_bytes)
    bgr = raw[:, :w * 3].reshape(h, w, 3).astype(np.uint32)
    gray = ((299 * bgr[:, :, 2] + 587 * bgr[:, :, 1] + 114 * bgr[:, :, 0])
            // 1000).astype(np.uint8)
    return gray if top_down else gray[::-1]


def make_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image: 4B magic + u16 w + u16 h + w*h uint8."""
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return MAGIC_IMAGE + struct.pack("<HH", width, height) + payload.tobytes()


def make_fake_audio(n_samples: int, sample_rate: int = 16000,
                    seed: int = 0) -> bytes:
    """4B magic + u32 rate + u32 n + int16 samples."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32767, size=n_samples, dtype=np.int16)
    return MAGIC_AUDIO + struct.pack("<II", sample_rate, n_samples) + pcm.tobytes()


def asset_table(df: DataFrame, id_col: str, data_col: str,
                kind: str = "bytes") -> DataFrame:
    """Canonical asset schema: (asset_id, kind, data, meta.n_bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(kind).alias("kind"),
        F.col(data_col).cast("binary").alias("data"),
        F.struct(
            F.length(F.col(data_col).cast("binary")).cast("long")
            .alias("n_bytes")).alias("meta"),
    )


_PROBE_SCHEMA = ("asset_id long, kind string, n_bytes long, width int, "
                 "height int, sample_rate int, n_samples int")


def probe_assets(assets: DataFrame) -> DataFrame:
    """Header sniff → typed metadata.  WAV and BMP yield REAL metadata
    (parsed headers, round 4); compressed formats (JPEG/PNG) are
    recognized by magic but their metadata stays null (decode libs
    absent)."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                row = {"asset_id": int(aid), "kind": "unknown",
                       "n_bytes": len(b), "width": None, "height": None,
                       "sample_rate": None, "n_samples": None}
                if b[:4] == MAGIC_IMAGE:
                    w, h = struct.unpack("<HH", b[4:8])
                    row.update(kind="fake_image", width=w, height=h)
                elif b[:4] == MAGIC_AUDIO:
                    sr, n = struct.unpack("<II", b[4:12])
                    row.update(kind="fake_audio", sample_rate=sr, n_samples=n)
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    try:
                        sr, n_ch, samples = decode_wav(b)
                        row.update(kind="wav", sample_rate=sr,
                                   n_samples=samples.shape[0])
                    except (ValueError, NotImplementedError, struct.error):
                        row["kind"] = "wav"
                elif b[:2] == b"BM":
                    try:
                        px = decode_bmp_gray(b)
                        row.update(kind="bmp", width=px.shape[1],
                                   height=px.shape[0])
                    except (ValueError, NotImplementedError, struct.error):
                        row["kind"] = "bmp"
                else:
                    for magic, kind in _REAL_MAGICS.items():
                        if b[:len(magic)] == magic:
                            row["kind"] = kind
                            break
                out.append(row)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "data").mapInPandas(
        probe, schema=_PROBE_SCHEMA)


def _decode_gray_image(b: bytes) -> np.ndarray:
    """Any decodable image container → uint8 grayscale array.  FAKI and
    BMP decode for real; the NotImplementedError boundary is exactly the
    COMPRESSED codecs (JPEG/PNG), whose libraries this environment lacks."""
    if b[:4] == MAGIC_IMAGE:
        w, h = struct.unpack("<HH", b[4:8])
        return np.frombuffer(b, dtype=np.uint8, count=w * h,
                             offset=8).reshape(h, w)
    if b[:2] == b"BM":
        return decode_bmp_gray(b)
    raise NotImplementedError(
        "compressed image codecs (JPEG/PNG) unavailable in this "
        "environment; FAKI and uncompressed BMP decode")


_decode_fake_image = _decode_gray_image      # backwards-compatible name


def decode_image_stats(assets: DataFrame) -> DataFrame:
    """Decode images (FAKI or BMP) → per-image pixel stats.  Compressed
    codecs remain the NotImplementedError boundary; the batch plumbing and
    vectorized stats are real for the decodable containers."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                px = _decode_gray_image(bytes(data))
                out.append({
                    "asset_id": int(aid),
                    "width": px.shape[1], "height": px.shape[0],
                    "mean_px": float(px.mean()), "std_px": float(px.std()),
                })
            yield pd.DataFrame(out)

    return assets.select("asset_id", "data").mapInPandas(
        stats, schema="asset_id long, width int, height int, "
                      "mean_px double, std_px double")


def decode_audio_stats(assets: DataFrame) -> DataFrame:
    """Decode audio (FAKA or RIFF/WAVE PCM) → per-asset sample stats:
    (asset_id, sample_rate, n_channels, n_samples, duration_s, rms, peak).
    n_samples counts FRAMES (per-channel samples); rms/peak are over all
    channels."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                b = bytes(data)
                if b[:4] == MAGIC_AUDIO:
                    sr, n = struct.unpack("<II", b[4:12])
                    arr = np.frombuffer(b, dtype="<i2", count=n,
                                        offset=12).astype(np.float64)
                    n_ch, n_frames = 1, n
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    sr, n_ch, frames = decode_wav(b)
                    arr = frames.ravel()
                    n_frames = frames.shape[0]
                else:
                    raise NotImplementedError(
                        "compressed audio codecs unavailable; FAKA and "
                        "RIFF/WAVE PCM decode")
                out.append({
                    "asset_id": int(aid), "sample_rate": int(sr),
                    "n_channels": int(n_ch), "n_samples": int(n_frames),
                    "duration_s": float(n_frames / sr) if sr else 0.0,
                    "rms": float(np.sqrt(np.mean(arr ** 2))) if arr.size else 0.0,
                    "peak": float(np.abs(arr).max()) if arr.size else 0.0,
                })
            yield pd.DataFrame(out)

    return assets.select("asset_id", "data").mapInPandas(
        stats, schema="asset_id long, sample_rate int, n_channels int, "
                      "n_samples long, duration_s double, rms double, "
                      "peak double")


def resize_images(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decodable images (FAKI/BMP) → new
    fake-image (FAKI) binaries."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                px = _decode_gray_image(bytes(data))
                ys = (np.arange(out_h) * px.shape[0] // out_h)
                xs = (np.arange(out_w) * px.shape[1] // out_w)
                small = px[np.ix_(ys, xs)]
                blobs.append(MAGIC_IMAGE + struct.pack("<HH", out_w, out_h)
                             + small.tobytes())
                ids.append(int(aid))
            yield pd.DataFrame({"asset_id": ids, "data": blobs})

    return assets.select("asset_id", "data").mapInPandas(
        resize, schema="asset_id long, data binary")


def byte_histogram(assets: DataFrame, n_buckets: int = 16) -> DataFrame:
    """(asset_id, bucket, count) — histogram of payload byte values into
    256/n_buckets-wide buckets; numpy bincount per Arrow batch. Buckets with
    zero bytes are omitted."""
    width = 256 // n_buckets

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, buckets, counts = [], [], []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                arr = np.frombuffer(bytes(data), dtype=np.uint8)
                bc = np.bincount(arr // width, minlength=n_buckets)
                nz = np.flatnonzero(bc)
                ids.extend([int(aid)] * nz.size)
                buckets.extend(nz.tolist())
                counts.extend(bc[nz].tolist())
            yield pd.DataFrame({"asset_id": ids, "bucket": buckets,
                                "count": counts})

    return assets.select("asset_id", "data").mapInPandas(
        hist, schema="asset_id long, bucket long, count long")


def sample_frames(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Treat a fake-image payload as a 'video' whose rows are frames; emit
    every n-th row as a frame record — the shape of video frame sampling
    without a real demuxer."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                px = _decode_gray_image(bytes(data))
                for fi in range(0, px.shape[0], every_n):
                    row = px[fi]
                    out.append({"asset_id": int(aid), "frame_no": fi,
                                "frame": row.tobytes(),
                                "mean_px": float(row.mean())})
            yield pd.DataFrame(out)

    return assets.select("asset_id", "data").mapInPandas(
        frames, schema="asset_id long, frame_no long, frame binary, "
                       "mean_px double")
