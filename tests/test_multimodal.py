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
