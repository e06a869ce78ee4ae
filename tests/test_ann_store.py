"""Persisted IVF-flat ANN store (sources/ann_store.py): layout
round-trip, partition pruning in the probe scan, exactness at full
probe, recall at partial probe."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from error_analysis_spark.sources import ann_store as ANN
from tests.conftest import SF_DIR

N_LISTS = 8


@pytest.fixture(scope="module")
def index_path(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = tempfile.mkdtemp(prefix="ivf_store_")
    ANN.write_ivf_index(emb, path, n_lists=N_LISTS, seed=7)
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="module")
def query_vec(spark):
    row = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .orderBy("vec_id").first()
    return [float(x) for x in row["embedding"]]


def test_full_probe_is_exact(spark, index_path, query_vec):
    from error_analysis_spark.extensions.similarity import cosine_topk
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = [(r["vec_id"], r["sim"]) for r in
             cosine_topk(emb, query_vec, k=10).collect()]
    got = [(r["vec_id"], r["sim"]) for r in
           ANN.query_ivf(spark, index_path, query_vec, k=10,
                         n_probe=N_LISTS).collect()]
    assert got == exact


def test_partial_probe_recall(spark, index_path, query_vec):
    from error_analysis_spark.extensions.similarity import cosine_topk
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {r["vec_id"] for r in
             cosine_topk(emb, query_vec, k=10).collect()}
    got = {r["vec_id"] for r in
           ANN.query_ivf(spark, index_path, query_vec, k=10,
                         n_probe=3).collect()}
    assert len(got & exact) / len(exact) >= 0.5


def test_probe_scan_is_partition_pruned(spark, index_path, query_vec):
    df = ANN.query_ivf(spark, index_path, query_vec, k=5, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the list_id predicate must sit in the partition filters of the
    # scan (pruned at file-listing time), not as a post-scan Filter
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "list_id" in pf.group(1), plan
    # (df.inputFiles() lists the relation BEFORE partition filters, so
    # the plan assertion above is the pruning evidence)
    # results come only from the probed cells
    vecs = spark.read.parquet(index_path + "/vectors")
    hit_cells = (vecs.join(df.select("vec_id"), "vec_id")
                 .select("list_id").distinct().count())
    assert hit_cells <= 2


def test_vectors_layout_round_trip(spark, index_path):
    vecs = spark.read.parquet(index_path + "/vectors")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert vecs.count() == emb.count()
    assert vecs.select("list_id").distinct().count() <= N_LISTS
    # every original id survives exactly once with its vector intact
    j = (vecs.select("vec_id", F.col("embedding").alias("e1"))
         .join(emb.select("vec_id", F.col("embedding").alias("e2")),
               "vec_id"))
    assert j.count() == emb.count()
    assert j.where(F.col("e1") != F.col("e2")).count() == 0


# --------------------------------------------------------------------------
# IVF-PQ (round 8): codes-only storage, residual ADC probe
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ivfpq_path(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = tempfile.mkdtemp(prefix="ivfpq_store_")
    ANN.write_ivfpq_index(emb, path, n_lists=N_LISTS, seed=7)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_ivfpq_storage_is_codes_only(spark, ivfpq_path):
    """The stored table carries NO raw vectors — n_blocks one-int codes
    per row (the 32× compression that is PQ's point), every id exactly
    once, partitioned by cell."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = spark.read.parquet(ivfpq_path + "/vectors")
    assert set(vecs.columns) == {"vec_id", "codes", "list_id"}
    assert vecs.count() == emb.count()
    assert vecs.select("vec_id").distinct().count() == emb.count()
    assert vecs.select(F.size("codes")).distinct().collect() \
        == [((8,))]  # n_blocks codes per vector
    book = spark.read.parquet(ivfpq_path + "/codebook")
    assert book.count() == 8 * 16


def test_ivfpq_self_query_ranks_first(spark, ivfpq_path):
    """Querying with an indexed vector's own embedding returns that id
    at rank 1 under full probe: the residual ADC of the vector against
    its own code is the reconstruction minimum (measured invariant of
    the deterministic pipeline across several probes)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    for vid in (0, 7, 123):
        row = emb.where(F.col("vec_id") == vid).first()
        q = [float(x) for x in row["embedding"]]
        got = ANN.query_ivfpq(spark, ivfpq_path, q, k=10,
                              n_probe=N_LISTS).collect()
        assert got[0]["vec_id"] == vid, (vid, got[:3])


def test_ivfpq_recall_floor_vs_exact(spark, ivfpq_path):
    """Approximate-recall floor vs exact cosine top-10 on the random
    sf embeddings (PQ's worst case — unstructured vectors; the pinned
    floors are the measured deterministic values)."""
    from error_analysis_spark.extensions.similarity import cosine_topk
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    row = emb.where(F.col("vec_id") == 7).first()
    q = [float(x) for x in row["embedding"]]
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    full = {r["vec_id"] for r in ANN.query_ivfpq(
        spark, ivfpq_path, q, k=10, n_probe=N_LISTS).collect()}
    part = {r["vec_id"] for r in ANN.query_ivfpq(
        spark, ivfpq_path, q, k=10, n_probe=3).collect()}
    assert len(full & exact) >= 3
    assert len(part & exact) >= 2


def test_ivfpq_probe_scan_is_partition_pruned(spark, ivfpq_path):
    """Same pruning contract as IVF-flat: the list_id predicate sits in
    the scan's PartitionFilters, and no raw-vector column is read."""
    import re
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in emb.first()["embedding"]]
    df = ANN.query_ivfpq(spark, ivfpq_path, q, k=5, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "list_id" in pf.group(1), plan
    assert "embedding" not in plan  # codes-only scan
    vecs = spark.read.parquet(ivfpq_path + "/vectors")
    hit_cells = (vecs.join(df.select("vec_id"), "vec_id")
                 .select("list_id").distinct().count())
    assert hit_cells <= 2
