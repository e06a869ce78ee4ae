"""Round-9 regressions: the three ADVICE r08 items in the PQ stack.

ADVICE r08 (all similarity.py):
1. pq_train's seeds list must be positionally indexed by code no matter
   what order collect() returns the window rows in.
2. The hist distortion must use exact integer division (`div`), not
   double `/`, and over-magnitude inputs must fail loudly instead of
   silently overflowing the int64 combined key.
3. The dim probe must raise a clear ValueError on an empty frame or a
   NULL first vector, not an opaque TypeError.
"""

import numpy as np
import pandas as pd
import pytest

from error_analysis_spark.extensions import similarity as S


def test_pq_train_empty_frame_raises_clear_error(spark):
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        S.pq_train(empty)


def test_pq_train_null_first_vector_raises_clear_error(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1], "embedding": [None]}),
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="NULL"):
        S.pq_train(df)


def test_pq_seed_list_is_code_indexed(spark):
    """The codebook's list position must equal code-1: pq_train with
    train_mod beyond the id domain returns the PURE seed book, whose
    row b/position c-1 must be the (b, c) sub-vector of the c-th
    vector in md5(id) order — recomputed here independently."""
    import hashlib
    # vec_id >= 1: id 0 satisfies `id % train_mod == 0` for ANY
    # train_mod, so including it refines one code per block — excluding
    # it makes the training set empty and the book pure seeds
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet") \
        .where("vec_id >= 1 and vec_id < 200")
    pdf = emb.toPandas()
    book = S.pq_train(emb, train_mod=10 ** 9)   # empty codes → seeds
    nb, nc = len(book), len(book[0])
    bd = len(book[0][0])

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
    order = sorted(pdf.vec_id.astype(int), key=lambda i: (h(i), i))[:nc]
    by_id = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
             for r in pdf.itertuples(index=False)}
    for c, vid in enumerate(order):
        fp = np.floor(by_id[vid] * 10.0 ** 6 + 0.5).astype(np.int64)
        for b in range(nb):
            assert book[b][c] == fp[b * bd:(b + 1) * bd].tolist(), \
                f"seed code {c + 1} block {b + 1} is not the " \
                f"md5-order-{c + 1} vector's sub-vector"


def test_pq_over_magnitude_input_fails_loudly(spark):
    """Values around ±1e5 at quantize=6 exceed the int64 combined-key
    bound; the Arrow kernel must raise, not corrupt ranks."""
    base = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").where("vec_id < 64")
    from pyspark.sql import functions as F
    big = base.select(
        "vec_id",
        F.transform("embedding", lambda x: x * 1e5).alias("embedding"))
    with pytest.raises(Exception, match="int64 key bound"):
        book = S.pq_train(big)
        S.pq_topk(big, [0.0] * 64, book, k=5).collect()


def test_pq_hist_distortion_is_exact_integer_division(spark):
    """The distortion column must equal the exact integer k // cw sum
    (recomputed from the kernel's own keys in numpy int64) — the old
    double `/` would diverge past 2^53."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").where("vec_id < 500")
    book = S.pq_train(emb)
    cw = 32
    out = S.pq_topk(emb, [0.0] * 64, book, k=5).toPandas()
    hist = out[out.part == "hist"]
    enc = S._pq_encode(
        emb.select(F_id("vec_id"), S._fp_arr(F_col("embedding"), 6)
                   .alias("q")), book, cw).toPandas()
    ks = np.stack(enc.ks.values).astype(np.int64)       # (n, nb)
    expect = {}
    for b in range(ks.shape[1]):
        for kv in ks[:, b]:
            key = (b + 1, int(kv % cw) + 1)
            expect[key] = expect.get(key, 0) + int(kv) // cw
    got = {(int(r.i), int(r.j)): r.v for r in hist.itertuples(index=False)}
    assert set(got) == set(expect)
    for key, v in expect.items():
        assert got[key] == float(v), key


def F_id(name):
    from pyspark.sql import functions as F
    return F.col(name).cast("long").alias("id")


def F_col(name):
    from pyspark.sql import functions as F
    return F.col(name)


# --------------------------------------------------------------------------
# audio perceptual dedup (round-9 new operator, VERDICT r08 #5)
# --------------------------------------------------------------------------

def _synth_pcm(rng, n=16000):
    """Speech-shaped synthetic signal: a few sinusoids, PCM16 ints."""
    tt = np.arange(n)
    x = sum(a * np.sin(2 * np.pi * f * tt + p) for a, f, p in zip(
        rng.uniform(0.05, 0.25, 5), rng.uniform(0.001, 0.45, 5),
        rng.uniform(0, 6, 5)))
    return x


def test_audio_fp64_scale_invariant_and_separating():
    """Amplitude scaling leaves the fingerprint bit-identical (energies
    scale uniformly, only signs are kept); unrelated signals sit far
    apart in Hamming space."""
    from error_analysis_spark.extensions import multimodal as MM
    rng = np.random.default_rng(7)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    fps = []
    for _ in range(20):
        x = _synth_pcm(rng)
        pcm = np.clip(x * 32768, -32768, 32767).astype(np.int64)
        fp = MM.audio_fp64(pcm)
        fps.append(fp)
        assert MM.audio_fp64(pcm * 3) == fp          # exact scaling
        assert MM.audio_fp64(pcm + 1000) == fp       # DC offset
        pcm_q = np.clip(x * 0.9 * 32768, -32768, 32767).astype(np.int64)
        assert ham(fp, MM.audio_fp64(pcm_q)) <= 4    # re-quantized 0.9×
    cross = [ham(fps[i], fps[j]) for i in range(len(fps))
             for j in range(i + 1, len(fps))]
    assert min(cross) > 12


def test_audio_near_dup_planted_recall(spark):
    """End-to-end planted-pair recall over the REAL WAV decode path:
    40 base clips + a noisy near-duplicate of each (SNR ≈ 30 dB, PCM
    re-quantized) through audio_fingerprint → afp_near_pairs at radius
    8. Every planted pair must surface (recall 1.0) and no unrelated
    pair may appear at the radius."""
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import multimodal as MM
    rng = np.random.default_rng(11)
    rows = []
    planted = set()
    for i in range(40):
        x = _synth_pcm(rng, n=8000)
        noisy = x + rng.normal(0, 0.005, len(x))
        rows.append((2 * i, MM.encode_wav(x, 1600)))
        rows.append((2 * i + 1, MM.encode_wav(noisy, 1600)))
        planted.add((2 * i, 2 * i + 1))
    assets = spark.createDataFrame(
        [(i, p, 1600) for i, p in rows],
        "asset_id long, payload binary, sample_rate int") \
        .withColumn("kind", F.lit("audio"))
    af = MM.audio_fingerprint(assets)
    got = af.toPandas()
    assert set(got.decode_src) == {"real"}          # byte parser, not stub
    pairs = MM.afp_near_pairs(af, max_hamming=8).toPandas()
    found = {(int(r.id_a), int(r.id_b)) for r in pairs.itertuples()}
    assert planted <= found, f"missed planted pairs: {planted - found}"
    assert found == planted, f"false pairs at radius: {found - planted}"


def test_afp_banding_matches_brute_force(spark):
    """The banded Hamming search over audio fingerprints is an EXACT
    decomposition: same pairs as the brute-force quadratic check."""
    from error_analysis_spark.extensions import multimodal as MM
    rng = np.random.default_rng(3)
    sigs = []
    base = rng.integers(-2 ** 62, 2 ** 62, size=30, dtype=np.int64)
    for i, b in enumerate(base):
        sigs.append((i, int(b)))
        # a few 1-3 bit perturbations
        if i % 3 == 0:
            flip = int(b) ^ (1 << int(rng.integers(0, 64)))
            sigs.append((100 + i, flip))
    df = spark.createDataFrame(sigs, "asset_id long, afp long")
    got = MM.afp_near_pairs(df, max_hamming=8).toPandas()
    got_set = {(int(r.id_a), int(r.id_b), int(r.hamming))
               for r in got.itertuples()}
    brute = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            a, sa = sigs[i]
            b, sb = sigs[j]
            h = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
            if h <= 8:
                lo, hi = min(a, b), max(a, b)
                brute.add((lo, hi, h))
    assert got_set == brute


def test_cc_numpy_local_matches_reference_union_find(spark):
    """The vectorized hash-min local path (round 9) produces the exact
    min-id fixpoint labeling on random graphs — checked against an
    independent in-test union-find over many shapes (chains, cliques,
    stars, random sparse) including string-typed ids."""
    from error_analysis_spark.extensions.dedup import connected_components
    rng = np.random.default_rng(13)
    for trial in range(5):
        n = int(rng.integers(10, 120))
        m = int(rng.integers(5, 300))
        edges = [(int(a), int(b)) for a, b in
                 zip(rng.integers(0, n, m), rng.integers(0, n, m))
                 if a != b]
        if not edges:
            continue
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {}
        touched = {v for e in edges for v in e}
        for v in range(n):
            expect[v] = find(v) if v in touched else v
        # min-id canonicalization: find() roots are min ids because
        # unions always point the larger root at the smaller one
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        verts = spark.createDataFrame([(v,) for v in range(n)],
                                      "id long")
        got = {r["id"]: r["component"]
               for r in connected_components(pairs, verts).collect()}
        assert got == expect, f"trial {trial}"


def test_cc_numpy_local_string_ids(spark):
    """String ids order lexicographically through the factorization."""
    from error_analysis_spark.extensions.dedup import connected_components
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "aa"), ("x", "y")], "id_a string, id_b string")
    verts = spark.createDataFrame(
        [("aa",), ("b",), ("c",), ("x",), ("y",), ("zz",)], "id string")
    got = {r["id"]: r["component"]
           for r in connected_components(pairs, verts).collect()}
    assert got == {"aa": "aa", "b": "aa", "c": "aa",
                   "x": "x", "y": "x", "zz": "zz"}


def test_ivfpq_rerank_tier_beats_plain_adc(spark, tmp_path):
    """The exact-rerank tier (round 9): an ADC shortlist of 100
    reranked against the source table must recover most of the exact
    top-10 that plain 8-block PQ codes lose on unstructured vectors
    (PQ's worst case), and must never do worse."""
    from error_analysis_spark.sources import ann_store as ANN
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.toPandas()
    X = np.stack(pdf.embedding.values)
    U = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    q = [float(v) for v in X[5]]
    qU = np.asarray(q) / np.linalg.norm(q)
    exact = set(pdf.vec_id.values[
        np.argsort(((U - qU) ** 2).sum(1), kind="stable")][:10])
    path = str(tmp_path / "ivfpqr")
    ANN.write_ivfpq_index(emb, path, n_lists=4, seed=7)
    plain = {int(r["vec_id"]) for r in ANN.query_ivfpq(
        spark, path, q, k=10, n_probe=4).collect()}
    rr_rows = ANN.query_ivfpq(spark, path, q, k=10, n_probe=4,
                              rerank_source=emb, shortlist=100).collect()
    rr = {int(r["vec_id"]) for r in rr_rows}
    assert len(rr) == 10
    assert len(exact & rr) >= max(len(exact & plain), 7)
    # reranked rows carry the true distance, ascending
    dists = [r["exact_dist"] for r in rr_rows]
    assert dists == sorted(dists)


def test_wav_intsum_matches_float_decode(spark):
    """_wav_pcm_intsum is the exact-integer sibling of decode_wav:
    intsum / (32768 · n_ch) == the float mono mix."""
    from error_analysis_spark.extensions import multimodal as MM
    rng = np.random.default_rng(5)
    x = _synth_pcm(rng, n=2000)
    w = MM.encode_wav(x, 1600)
    ints = MM._wav_pcm_intsum(w)
    flt = MM.decode_wav(w)
    assert np.allclose(ints / 32768.0, flt, atol=1e-6)
