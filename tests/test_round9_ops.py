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
