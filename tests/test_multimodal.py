"""Multimodal plumbing: WAV-PCM and BMP decode for REAL (uncompressed
containers, struct+numpy only — round 4); the stub boundary is exactly the
compressed codecs (JPEG/PNG), whose libraries this container lacks.
Schema, Arrow batch shape, and the numpy kernels are pinned here."""

import numpy as np
import pytest

from searchenginepp_spark.operators.multimodal import (
    _decode_fake_image, asset_table, byte_histogram, decode_audio_stats,
    decode_bmp_gray, decode_image_stats, decode_wav, make_bmp,
    make_fake_audio, make_fake_image, make_wav, probe_assets, resize_images,
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


# ------------------------- real WAV / BMP decoders (round 4) ------------

def _sine_i16(n, rate=8000, hz=440.0, amp=12000):
    t = np.arange(n) / rate
    return np.round(amp * np.sin(2 * np.pi * hz * t)).astype(np.int16)


def test_wav_roundtrip_and_stats(spark):
    mono = _sine_i16(500)
    stereo = np.stack([_sine_i16(300), _sine_i16(300, hz=220.0)],
                      axis=1).ravel()           # interleaved L/R
    rows = [(1, bytearray(make_wav(mono, 8000))),
            (2, bytearray(make_wav(stereo, 44100, n_channels=2)))]
    assets = asset_table(
        spark.createDataFrame(rows, "asset_id long, data binary"),
        "asset_id", "data")
    r = {x["asset_id"]: x for x in decode_audio_stats(assets).collect()}
    assert (r[1]["sample_rate"], r[1]["n_channels"], r[1]["n_samples"]) == \
        (8000, 1, 500)
    a = mono.astype(np.float64)
    assert r[1]["rms"] == pytest.approx(float(np.sqrt(np.mean(a ** 2))))
    assert r[1]["peak"] == float(np.abs(a).max())
    assert r[1]["duration_s"] == pytest.approx(500 / 8000)
    assert (r[2]["sample_rate"], r[2]["n_channels"], r[2]["n_samples"]) == \
        (44100, 2, 300)
    # probe extracts REAL metadata from the RIFF header, not just the magic
    p = {x["asset_id"]: x for x in probe_assets(assets).collect()}
    assert (p[1]["kind"], p[1]["sample_rate"], p[1]["n_samples"]) == \
        ("wav", 8000, 500)


def test_wav_bit_depths():
    rate, n_ch, frames = decode_wav(make_wav(_sine_i16(64), 16000))
    assert (rate, n_ch, frames.shape) == (16000, 1, (64, 1))
    # hand-build an 8-bit PCM and a float32 WAV
    import struct

    def wav(fmt_code, bits, payload):
        fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000,
                          8000 * bits // 8, bits // 8, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    u8 = np.array([0, 128, 255], dtype=np.uint8)
    _, _, f = decode_wav(wav(1, 8, u8.tobytes()))
    assert f.ravel().tolist() == [-128.0, 0.0, 127.0]
    f32 = np.array([0.5, -0.25], dtype="<f4")
    _, _, f = decode_wav(wav(3, 32, f32.tobytes()))
    assert f.ravel().tolist() == [0.5, -0.25]
    with pytest.raises(NotImplementedError):
        decode_wav(wav(2, 4, b"\x00"))       # ADPCM: genuinely compressed


def test_bmp_roundtrip_padding_and_topdown(spark):
    # width 3 → each row pads 9 → 12 bytes; values survive the luma
    # round-trip exactly because make_bmp writes R=G=B
    gray = np.arange(15, dtype=np.uint8).reshape(5, 3) * 17
    assert (decode_bmp_gray(make_bmp(gray)) == gray).all()
    # hand-flip to top-down: negate height, reverse stored row order
    import struct

    b = bytearray(make_bmp(gray))
    w, h = 3, 5
    b[18:26] = struct.pack("<ii", w, -h)
    row_bytes = (w * 3 + 3) & ~3
    rows = [bytes(b[54 + i * row_bytes:54 + (i + 1) * row_bytes])
            for i in range(h)]
    b[54:] = b"".join(reversed(rows))
    assert (decode_bmp_gray(bytes(b)) == gray).all()


def test_bmp_through_image_kernels(spark):
    gray = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    rows = [(1, bytearray(make_bmp(gray)))]
    assets = asset_table(
        spark.createDataFrame(rows, "asset_id long, data binary"),
        "asset_id", "data")
    st = decode_image_stats(assets).collect()[0]
    assert (st["width"], st["height"]) == (8, 8)
    assert st["mean_px"] == pytest.approx(float(gray.mean()))
    out = resize_images(assets, 4, 4).collect()[0]
    px = _decode_fake_image(bytes(out["data"]))
    assert px.shape == (4, 4) and np.isin(px, gray).all()
    p = probe_assets(assets).collect()[0]
    assert (p["kind"], p["width"], p["height"]) == ("bmp", 8, 8)
    fr = sample_frames(assets, every_n=4).collect()
    assert sorted(r["frame_no"] for r in fr) == [0, 4]


def test_compressed_codecs_remain_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_fake_image(b"\x89PNG\r\n\x1a\nrest")
    with pytest.raises(NotImplementedError):
        _decode_fake_image(b"\xff\xd8\xffJFIF")


def test_probe_degrades_on_truncated_real_headers(spark):
    """ADVICE round 4: a truncated WAV/BMP payload (struct.error territory)
    must degrade to kind-only metadata, not crash the probe job."""
    import struct

    from searchenginepp_spark.operators.multimodal import (
        decode_bmp_gray, decode_wav,
    )

    payloads = [
        (1, b"RIFF"),                                  # 4-byte RIFF stub
        (2, b"RIFF" + struct.pack("<I", 100) + b"WAVE"
            + b"fmt " + struct.pack("<I", 4) + b"ab"), # fmt chunk too short
        (3, b"BM"),                                    # 2-byte BMP stub
        (4, b"BM" + b"\x00" * 20),                     # header truncated
        (5, b"\x89PNG" + b"x"),                        # compressed magic
    ]
    df = spark.createDataFrame(payloads, "asset_id long, data binary")
    rows = {r["asset_id"]: r for r in probe_assets(
        asset_table(df, "asset_id", "data")).collect()}
    assert rows[2]["kind"] == "wav" and rows[2]["sample_rate"] is None
    assert rows[3]["kind"] == "bmp" and rows[3]["width"] is None
    assert rows[4]["kind"] == "bmp" and rows[4]["width"] is None
    assert rows[5]["kind"] == "png"
    # the decoders themselves raise ValueError (not struct.error) on
    # truncation, so non-probe callers get the documented exception type
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_wav(payloads[0][1])
    with _pytest.raises(ValueError):
        decode_bmp_gray(payloads[3][1])
