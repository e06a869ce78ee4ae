"""Round-11 optimization regression tests: every optimization that
changed an operator's internals gets a semantics pin here."""

from __future__ import annotations

import pandas as pd


def _rules(df):
    return [(r.step, r.left_sym, r.right_sym, r.pair_count)
            for r in df.orderBy("step").collect()]


def test_bpe_train_local_equals_distributed(spark):
    """The round-11 bounded local trainer path and the distributed
    sentinel-replace loop produce the identical rule list (rules,
    order, corpus-weighted counts) — forced onto each path via
    local_threshold on a corpus with overlap ('aaaa'), merged-symbol
    reuse and ties."""
    from error_analysis_spark.extensions.text import bpe_train
    corpus = [
        "low lower lowest low low",
        "newer newest new newer",
        "aaaa aaa aa baaab",
        "wider wide widest low",
    ]
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(corpus)), "text": corpus}))
    local = _rules(bpe_train(docs, n_merges=10, local_threshold=200_000))
    dist = _rules(bpe_train(docs, n_merges=10, local_threshold=0))
    assert local == dist
    assert len(local) == 10


def test_bpe_train_distributed_early_stop(spark):
    """The distributed path (threshold forced to 0) still early-stops
    on a single-char vocabulary."""
    from error_analysis_spark.extensions.text import bpe_train
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0], "text": "a b c a"}, index=[0]))
    assert bpe_train(docs, n_merges=5, local_threshold=0).count() == 0


def test_fused_asset_fingerprints_matches_member_kernels(spark):
    """The round-11 fused mm_pack decode pass produces EXACT int64
    parity with the three standalone member kernels on real testdata
    (images incl. real-PPM rows, audio, video). Compared as Python
    ints, not through pandas — a float64-coerced hash column truncates
    to 53-bit mantissas and the rounding can mask itself (the bug this
    pins was invisible to a nullable-column DataFrame compare)."""
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import multimodal as MM
    from error_analysis_spark.plans.queries_ext import _doc_assets

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assets = _doc_assets(spark, "/root/testdata/sf0.001")
    fused = MM.fused_asset_fingerprints(assets, batch_rows=7)

    def rows(df, *cols):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    # image_phash parity: identical ids, hashes (exact ints), srcs
    assert rows(fused.where(F.col("kind") == "image"),
                "asset_id", "phash", "decode_src") == \
        rows(MM.image_phash(assets, batch_rows=32),
             "asset_id", "phash", "decode_src")
    # audio_fingerprint parity (af_src is the WAV-parser verdict)
    assert rows(fused.where(F.col("kind") == "audio"),
                "asset_id", "afp", "af_src") == \
        rows(MM.audio_fingerprint(assets, batch_rows=32),
             "asset_id", "afp", "decode_src")
    # extract_features parity on the columns mm_pack projects
    assert rows(fused, "asset_id", "kind", "n_bytes", "shape",
                "decode_src") == \
        rows(MM.extract_features(assets, batch_rows=32),
             "asset_id", "kind", "n_bytes", "shape", "decode_src")
    # non-members carry NULL hashes (video: both; image: afp; audio: phash)
    assert fused.where((F.col("kind") != "image")
                       & F.col("phash").isNotNull()).count() == 0
    assert fused.where((F.col("kind") != "audio")
                       & F.col("afp").isNotNull()).count() == 0


def test_fused_hashes_survive_pandas_exactly(spark):
    """64-bit hashes with >53 significant bits cross the fused kernel's
    Arrow boundary bit-exactly even when their column holds NULLs (the
    pandas Int64 pin)."""
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import multimodal as MM

    # two image payloads whose dHash has high bit-entropy plus an
    # audio row forcing NULL phash into the same Arrow batch
    pdf = pd.DataFrame({
        "asset_id": [1, 2, 3],
        "kind": ["image", "image", "audio"],
        "payload": [b"img-a" * 40, b"img-b" * 40, b"aud" * 50],
        "width": [33, 65, None], "height": [17, 31, None],
        "sample_rate": [None, None, 1600], "n_frames": [None] * 3,
    })
    assets = spark.createDataFrame(pdf)
    got = {r.asset_id: r.phash
           for r in MM.fused_asset_fingerprints(assets).collect()}
    for aid in (1, 2):
        a = pdf[pdf.asset_id == aid].iloc[0]
        arr, _ = MM.decode_payload_src(bytes(a.payload), "image",
                                       int(a.width), int(a.height),
                                       None, None)
        assert got[aid] == MM.dhash64(arr)  # exact int equality
    assert got[3] is None


def test_hyperplane_ndarray_planes_bit_parity(spark):
    """The round-11 ndarray-literal plane fold produces bit-identical
    buckets to the per-element F.lit construction (numpy float64
    round-trips Python floats exactly; same HOF fold on top) on the
    real embeddings table, all four lsh_topk tables."""
    import hashlib

    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import similarity as SIM

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    embc = SIM._as_double(F.col("embedding"))
    dim = len(emb.select("embedding").first()[0])

    def weight(seed, j, i):
        h = hashlib.md5(f"{seed}_{j}_{i}".encode()).hexdigest()
        return int(h[:8], 16) / float(1 << 32) - 0.5

    def bucket_per_element_lits(n_planes, seed):
        out = F.lit(0).cast("long")
        for j in range(n_planes):
            plane = F.array(*[F.lit(weight(seed, j, i))
                              for i in range(dim)])
            proj = SIM.dot(embc, plane)
            out = out + F.when(proj > 0,
                               F.lit(1 << j).cast("long")).otherwise(0)
        return out

    for t in range(4):
        seed = 42 + 1000 * t
        n_diff = emb.where(
            SIM._hyperplane_bucket_expr(embc, 10, seed, dim)
            != bucket_per_element_lits(10, seed)).count()
        assert n_diff == 0, f"table {t}: {n_diff} bucket flips"
