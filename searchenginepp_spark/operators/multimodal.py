"""Multimodal column plumbing — image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched kernels.

The decode step for real codecs (JPEG/PNG/WAV/MP4) is STUBBED — the
image/audio libraries are not available in this container — but everything
Spark-side is real and tested: the asset schema, the mapInPandas batch
shape (pandas.Series of bytes → numpy), partitioning, and a deterministic
FAKE container format (`FAKI`/`FAKA` headers) that exercises the full
decode → feature → resize pipeline end-to-end.

Kernels:
  asset_table       wrap any bytes-like column into the canonical asset
                    schema (asset_id, kind, data, meta)
  probe_assets      header sniff → (kind, width, height, sample_rate, ...)
  decode_image      FAKE format: header-described uint8 pixel payload →
                    real numpy decode; real codecs → NotImplementedError
  resize_images     nearest-neighbor resize on decoded fake images
  byte_histogram    bucketed byte-value histogram of the raw payload —
                    a pure-bytes feature extractor with a DuckDB oracle
  sample_frames     fixed-stride frame sampling over a FAKE video payload

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
}


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
    """Header sniff → typed metadata; real formats recognized but metadata
    extraction for them is stubbed as nulls (decode libs absent)."""

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
                else:
                    for magic, kind in _REAL_MAGICS.items():
                        if b[:len(magic)] == magic:
                            row["kind"] = kind
                            break
                out.append(row)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "data").mapInPandas(
        probe, schema=_PROBE_SCHEMA)


def _decode_fake_image(b: bytes) -> np.ndarray:
    if b[:4] != MAGIC_IMAGE:
        raise NotImplementedError(
            "real image codecs unavailable in this environment; "
            "only the FAKI container decodes")
    w, h = struct.unpack("<HH", b[4:8])
    return np.frombuffer(b, dtype=np.uint8, count=w * h, offset=8).reshape(h, w)


def decode_image_stats(assets: DataFrame) -> DataFrame:
    """Decode (fake) images → per-image pixel stats. The decode itself is
    the stub boundary; the batch plumbing and vectorized stats are real."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                px = _decode_fake_image(bytes(data))
                out.append({
                    "asset_id": int(aid),
                    "width": px.shape[1], "height": px.shape[0],
                    "mean_px": float(px.mean()), "std_px": float(px.std()),
                })
            yield pd.DataFrame(out)

    return assets.select("asset_id", "data").mapInPandas(
        stats, schema="asset_id long, width int, height int, "
                      "mean_px double, std_px double")


def resize_images(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of fake images → new fake-image binaries."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                px = _decode_fake_image(bytes(data))
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
                px = _decode_fake_image(bytes(data))
                for fi in range(0, px.shape[0], every_n):
                    row = px[fi]
                    out.append({"asset_id": int(aid), "frame_no": fi,
                                "frame": row.tobytes(),
                                "mean_px": float(row.mean())})
            yield pd.DataFrame(out)

    return assets.select("asset_id", "data").mapInPandas(
        frames, schema="asset_id long, frame_no long, frame binary, "
                       "mean_px double")
