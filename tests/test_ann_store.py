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
