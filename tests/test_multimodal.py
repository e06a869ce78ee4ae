"""Multimodal asset plumbing tests: schema, batch shapes, determinism,
metadata-only pruning. Decode is the documented deterministic stub."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from error_analysis_spark.extensions import multimodal as MM


def test_features_deterministic_and_shaped(spark):
    assets = MM.synth_assets(spark, n=30, seed=7).cache()
    f1 = MM.extract_features(assets, batch_rows=4).toPandas() \
        .sort_values("asset_id").reset_index(drop=True)
    f2 = MM.extract_features(assets.repartition(5), batch_rows=16).toPandas() \
        .sort_values("asset_id").reset_index(drop=True)
    # same features regardless of partitioning/batch size
    assert (f1["mean_value"] == f2["mean_value"]).all()
    assert len(f1) == 30
    # shapes consistent with declared metadata
    meta = assets.select("asset_id", "kind", "width", "height",
                         "n_frames", "sample_rate").toPandas() \
        .set_index("asset_id")
    for _, r in f1.iterrows():
        m = meta.loc[r["asset_id"]]
        if r["kind"] == "image":
            assert list(r["shape"]) == [m["height"], m["width"], 3]
        elif r["kind"] == "audio":
            assert list(r["shape"]) == [m["sample_rate"]]
        else:
            assert list(r["shape"]) == [m["n_frames"], m["height"],
                                        m["width"], 3]


def test_resize_payload_size(spark):
    assets = MM.synth_assets(spark, n=12, seed=3)
    out = MM.resize_images(assets, out_w=8, out_h=8).toPandas()
    n_images = assets.where(F.col("kind") == "image").count()
    assert len(out) == n_images
    assert all(len(p) == 8 * 8 * 3 for p in out["payload"])


def test_frame_sampling_counts(spark):
    assets = MM.synth_assets(spark, n=24, seed=5)
    out = MM.sample_frames(assets, every=4).toPandas()
    vids = assets.where(F.col("kind") == "video") \
        .select("asset_id", "n_frames").toPandas()
    expect = int(sum(int(np.ceil(nf / 4)) for nf in vids["n_frames"]))
    assert len(out) == expect
    assert (out.groupby("asset_id")["frame_idx"].min() == 0).all()


def test_payload_stats_prunes_decode(spark):
    assets = MM.synth_assets(spark, n=30, seed=7)
    stats = MM.payload_stats(assets).toPandas().set_index("kind")
    assert int(stats.loc["image", "n_assets"]) == 10
    assert int(stats["n_distinct_payloads"].sum()) == 30  # all unique
    assert int(stats.loc["audio", "total_bytes"]) == 10 * 4096


def test_real_png_decode_roundtrip():
    """When PIL is importable, `decode_payload` must take the REAL codec
    path: a 4×3 RGB PNG encoded in-memory decodes back to the original
    pixel array (exercises the "swap one function" claim with an actual
    payload). Skipped in containers without PIL — the fake-decode path
    is covered by the other tests either way."""
    import pytest
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(px, mode="RGB").save(buf, format="PNG")
    arr = MM.decode_payload(buf.getvalue(), "image", 4, 3, None, None)
    assert arr.shape == (3, 4, 3)
    np.testing.assert_array_equal(arr, px)


def test_ppm_decode_real_bytes_roundtrip():
    """In-container REAL byte parsing: encode an array to binary PPM,
    decode it back bit-exact — incl. a header comment line."""
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
    payload = MM.encode_ppm(arr)
    assert np.array_equal(MM.decode_ppm(payload), arr)
    commented = payload[:2] + b"\n# a comment\n" + payload[2:].lstrip()
    assert np.array_equal(MM.decode_ppm(commented), arr)


def test_bmp_decode_real_bytes_roundtrip():
    """Uncompressed 24-bit BMP: bottom-up rows, BGR order, 4-byte row
    padding (width 13 → stride 40) all round-trip exactly."""
    rng = np.random.RandomState(12)
    arr = rng.randint(0, 256, size=(7, 13, 3), dtype=np.uint8)
    payload = MM.encode_bmp(arr)
    assert np.array_equal(MM.decode_bmp(payload), arr)


def test_decode_payload_dispatches_real_formats_end_to_end(spark):
    """REAL decode through the distributed mapInPandas stage: PPM and
    BMP payloads flow through extract_features and produce the exact
    numpy stats of the encoded arrays (not the fake-decode stats)."""
    rng = np.random.RandomState(21)
    rows, want = [], {}
    for i in range(8):
        arr = rng.randint(0, 256, size=(6 + i, 10, 3), dtype=np.uint8)
        payload = MM.encode_ppm(arr) if i % 2 == 0 else MM.encode_bmp(arr)
        rows.append((i, "image", bytearray(payload), 10, 6 + i,
                     None, None, "ppm" if i % 2 == 0 else "bmp"))
        want[i] = (round(float(arr.mean()), 6), list(arr.shape))
    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    out = MM.extract_features(assets, batch_rows=3).toPandas() \
        .set_index("asset_id")
    for i, (mean, shape) in want.items():
        assert list(out.loc[i, "shape"]) == shape
        assert abs(out.loc[i, "mean_value"] - mean) < 1e-6


def test_corrupt_image_payload_falls_back_deterministically():
    """A truncated PPM never raises — it lands in the deterministic
    fake path (same payload => same array), the quarantine contract."""
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    truncated = MM.encode_ppm(arr)[:20]
    a = MM.decode_payload(truncated, "image", 4, 4, None, None)
    b = MM.decode_payload(truncated, "image", 4, 4, None, None)
    assert a.shape == (4, 4, 3) and np.array_equal(a, b)


def test_png_round_trip_all_filter_types():
    """Stdlib PNG codec: encode with every scanline filter type (0-4
    cycling) and byte-parse it back — exercises all five unfilter
    branches against real deflate-compressed bytes."""
    rng = np.random.RandomState(33)
    arr = rng.randint(0, 256, size=(10, 7, 3), dtype=np.uint8)
    payload = MM.encode_png(arr, filters=[y % 5 for y in range(10)])
    assert payload[:8] == MM._PNG_SIG
    assert np.array_equal(MM.decode_png(payload), arr)
    # default all-None filters too
    assert np.array_equal(MM.decode_png(MM.encode_png(arr)), arr)


def test_png_real_decode_src_through_dispatch():
    """PNG payloads dispatch to the real byte parser and report
    decode_src='real'; random bytes fall to the stub and report 'stub'."""
    rng = np.random.RandomState(34)
    arr = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    got, src = MM.decode_payload_src(MM.encode_png(arr), "image",
                                     6, 5, None, None)
    assert src == "real" and np.array_equal(got, arr)
    fake, src2 = MM.decode_payload_src(b"\x00" * 64, "image", 6, 5,
                                       None, None)
    assert src2 == "stub" and fake.shape == (5, 6, 3)
    # corrupt PNG (signature but truncated stream) quarantines to stub
    crp, src3 = MM.decode_payload_src(MM.encode_png(arr)[:24], "image",
                                      6, 5, None, None)
    assert src3 == "stub" and crp.shape == (5, 6, 3)


def test_decode_src_column_in_extract_features(spark):
    """decode_src surfaces per row through the mapInPandas stage: real
    PPM/BMP/PNG rows say 'real', everything else 'stub'."""
    rng = np.random.RandomState(35)
    arr = rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
    rows = [
        (0, "image", bytearray(MM.encode_png(arr)), 4, 4, None, None, "png"),
        (1, "image", bytearray(MM.encode_ppm(arr)), 4, 4, None, None, "ppm"),
        (2, "image", bytearray(b"\x01" * 32), 4, 4, None, None, "stub"),
        (3, "audio", bytearray(b"\x02" * 32), None, None, 100, None, "wav"),
    ]
    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    out = (MM.extract_features(assets, batch_rows=2).toPandas()
           .set_index("asset_id"))
    assert out.loc[0, "decode_src"] == "real"
    assert out.loc[1, "decode_src"] == "real"
    assert out.loc[2, "decode_src"] == "stub"
    assert out.loc[3, "decode_src"] == "stub"


def test_wav_round_trip_and_dispatch():
    """Stdlib WAV codec: PCM16 round-trip within quantization error,
    RIFF payloads dispatch to the real parser ('real'), corrupt WAV
    quarantines to the stub."""
    rng = np.random.RandomState(36)
    sig = (rng.rand(800) * 2 - 1).astype(np.float32) * 0.9
    payload = MM.encode_wav(sig, sample_rate=8000)
    got = MM.decode_wav(payload)
    assert got.shape == sig.shape
    assert np.abs(got - sig).max() < 1.0 / 32768 + 1e-6
    arr, src = MM.decode_payload_src(payload, "audio", None, None,
                                     8000, None)
    assert src == "real" and arr.shape == (800,)
    crp, src2 = MM.decode_payload_src(payload[:16], "audio", None, None,
                                      8000, None)
    assert src2 == "stub" and crp.shape == (8000,)


def test_wav_real_decode_through_extract_features(spark):
    """Real WAV bytes flow through the mapInPandas stage: exact numpy
    stats of the decoded signal + decode_src='real'."""
    rng = np.random.RandomState(37)
    sig = (rng.rand(400) * 2 - 1).astype(np.float32) * 0.5
    rows = [(0, "audio", bytearray(MM.encode_wav(sig, 4000)), None, None,
             4000, None, "wav")]
    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    out = MM.extract_features(assets).toPandas().set_index("asset_id")
    assert out.loc[0, "decode_src"] == "real"
    assert list(out.loc[0, "shape"]) == [400]
    want = MM.decode_wav(MM.encode_wav(sig, 4000))
    assert abs(out.loc[0, "mean_value"] - float(want.mean())) < 1e-6


def test_wav_empty_data_quarantines_to_stub():
    """A structurally valid WAV with a zero-sample data chunk must not
    surface NaN feature stats — it quarantines to the stub."""
    empty = MM.encode_wav(np.zeros(0, dtype=np.float32), 8000)
    arr, src = MM.decode_payload_src(empty, "audio", None, None, 8000,
                                     None)
    assert src == "stub" and arr.shape == (8000,)


def _smooth_img(h: int = 24, w: int = 40) -> np.ndarray:
    x = np.linspace(0, 4 * np.pi, w)
    y = np.linspace(0, 3 * np.pi, h)
    return np.stack([
        127 + 100 * np.outer(np.sin(y), np.cos(x)),
        127 + 80 * np.outer(np.cos(y), np.sin(x)),
        np.full((h, w), 200.0)], axis=2).clip(0, 255).astype(np.uint8)


def test_jpeg_round_trip_444_and_quality():
    """Baseline JPEG decode is a REAL byte-level parser: encode at
    4:4:4, decode, and the reconstruction error behaves like JPEG
    (small at q=95, monotonically worse at q=50 — not a stub echo)."""
    img = _smooth_img()
    out95 = MM.decode_jpeg(MM.encode_jpeg(img, quality=95))
    out50 = MM.decode_jpeg(MM.encode_jpeg(img, quality=50))
    e95 = np.abs(out95.astype(int) - img.astype(int)).mean()
    e50 = np.abs(out50.astype(int) - img.astype(int)).mean()
    assert out95.shape == img.shape
    assert e95 < 2.5 and e95 < e50 < 10


def test_jpeg_restart_markers_and_420_subsampling():
    """DRI/RSTn handling (predictor reset + byte realign) and 4:2:0
    chroma upsampling both decode correctly, including partial MCUs
    on odd dimensions."""
    img = _smooth_img(17, 21)
    b = MM.encode_jpeg(img, quality=90, restart_interval=2,
                       subsample=True)
    out = MM.decode_jpeg(b)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    # chroma box-mean + nearest-upsample loss only (the 17×21 fixture
    # packs 4π of signal into 21 px, so 4:2:0 loss runs ~10)
    assert err < 14


def test_jpeg_real_decode_through_dispatch_and_quarantine():
    """decode_payload_src routes JPEG magic bytes to the real parser
    (decode_src='real'); truncated payloads quarantine to the stub."""
    img = _smooth_img(8, 8)
    b = MM.encode_jpeg(img, quality=95)
    arr, src = MM.decode_payload_src(b, "image", 8, 8, None, None)
    assert src == "real" and arr.shape == (8, 8, 3)
    assert np.abs(arr.astype(int) - img.astype(int)).mean() < 3
    stub, src2 = MM.decode_payload_src(b[:40], "image", 8, 8, None, None)
    assert src2 == "stub" and stub.shape == (8, 8, 3)


def test_jpeg_real_decode_through_extract_features(spark):
    """Real JPEG bytes flow through the mapInPandas stage: the decoded
    stats equal the local decode of the same payload (bit-identical
    executor/driver decode) + decode_src='real', alongside stub rows
    in the same Arrow batch."""
    img = _smooth_img(16, 24)
    payload = MM.encode_jpeg(img, quality=92, subsample=True)
    rows = [
        (0, "image", bytearray(payload), 24, 16, None, None, "jpeg"),
        (1, "image", bytearray(b"not an image"), 8, 8, None, None,
         "stub"),
    ]
    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    out = MM.extract_features(assets, batch_rows=2).toPandas() \
        .set_index("asset_id")
    assert out.loc[0, "decode_src"] == "real"
    assert list(out.loc[0, "shape"]) == [16, 24, 3]
    want = MM.decode_jpeg(payload)
    assert abs(out.loc[0, "mean_value"] - float(want.mean())) < 1e-6
    assert out.loc[1, "decode_src"] == "stub"
