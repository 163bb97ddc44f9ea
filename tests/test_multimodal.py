"""Multimodal plumbing: the decode boundary is stubbed (no codec libs) but
schema, Arrow batch shape, and the numpy kernels are real and pinned here."""

import numpy as np
import pytest

from searchenginepp_spark.operators.multimodal import (
    _decode_fake_image, asset_table, byte_histogram, decode_image_stats,
    make_fake_audio, make_fake_image, probe_assets, resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, bytearray(make_fake_image(16, 8, seed=1))),
        (2, bytearray(make_fake_image(32, 32, seed=2))),
        (3, bytearray(make_fake_audio(100, 8000, seed=3))),
        (4, bytearray(b"\x89PNG\r\n\x1a\nrest-of-a-png")),
        (5, bytearray(b"garbage bytes, no magic")),
    ]
    df = spark.createDataFrame(rows, "asset_id long, data binary")
    return asset_table(df, "asset_id", "data")


def test_asset_schema(assets):
    assert [f.name for f in assets.schema.fields] == \
        ["asset_id", "kind", "data", "meta"]
    r = {x["asset_id"]: x for x in assets.collect()}
    assert r[1]["meta"]["n_bytes"] == 8 + 16 * 8


def test_probe(assets, spark):
    r = {x["asset_id"]: x for x in probe_assets(assets).collect()}
    assert (r[1]["kind"], r[1]["width"], r[1]["height"]) == ("fake_image", 16, 8)
    assert (r[3]["kind"], r[3]["sample_rate"], r[3]["n_samples"]) == \
        ("fake_audio", 8000, 100)
    assert r[4]["kind"] == "png" and r[4]["width"] is None  # stub: recognized, no decode
    assert r[5]["kind"] == "unknown"


def test_decode_stats_match_numpy(assets, spark):
    imgs = assets.filter("asset_id <= 2")
    r = {x["asset_id"]: x for x in decode_image_stats(imgs).collect()}
    px1 = _decode_fake_image(make_fake_image(16, 8, seed=1))
    assert r[1]["mean_px"] == pytest.approx(float(px1.mean()))
    assert r[1]["std_px"] == pytest.approx(float(px1.std()))
    assert (r[2]["width"], r[2]["height"]) == (32, 32)


def test_decode_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_fake_image(b"\xff\xd8\xffJFIF-jpeg-bytes")


def test_resize(assets, spark):
    imgs = assets.filter("asset_id = 2")
    out = resize_images(imgs, 8, 8).collect()[0]
    px = _decode_fake_image(bytes(out["data"]))
    assert px.shape == (8, 8)
    # nearest-neighbor: every output pixel exists in the source
    src = _decode_fake_image(make_fake_image(32, 32, seed=2))
    assert np.isin(px, src).all()


def test_byte_histogram_matches_numpy(assets, spark):
    got = byte_histogram(assets.filter("asset_id = 1"), n_buckets=16).collect()
    arr = np.frombuffer(make_fake_image(16, 8, seed=1), dtype=np.uint8)
    want = np.bincount(arr // 16, minlength=16)
    for r in got:
        assert r["count"] == want[r["bucket"]]
    assert sum(r["count"] for r in got) == arr.size


def test_sample_frames(assets, spark):
    rows = sample_frames(assets.filter("asset_id = 2"), every_n=8).collect()
    assert [r["frame_no"] for r in sorted(rows, key=lambda r: r["frame_no"])] \
        == [0, 8, 16, 24]
    src = _decode_fake_image(make_fake_image(32, 32, seed=2))
    for r in rows:
        assert bytes(r["frame"]) == src[r["frame_no"]].tobytes()
