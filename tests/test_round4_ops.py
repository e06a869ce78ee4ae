"""Round-4 operators: normalization, OOV coverage, Bloom
decontamination, per-domain caps."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ---------------------------------------------------------------- normalize

def test_normalize_idempotent(spark, docs):
    from error_analysis_spark.extensions.text import normalize_expr
    once = docs.select(normalize_expr("text").alias("n1"))
    twice = once.select(F.col("n1").alias("text")) \
        .select(normalize_expr("text").alias("n2"), F.col("text").alias("n1"))
    assert twice.where(F.col("n2") != F.col("n1")).count() == 0


def test_normalize_semantics(spark):
    from error_analysis_spark.extensions.text import normalize_stats
    df = spark.createDataFrame(
        [(1, "  Hello   WORLD \t x"), (2, "already normal"), (3, "")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in normalize_stats(df).collect()}
    # collapse + trim + lowercase
    assert rows[1]["n_norm"] == len("hello world x")
    assert rows[1]["changed"] == 1
    assert rows[2]["changed"] == 0
    assert rows[3]["n_norm"] == 0
    # equal texts modulo case/whitespace share a norm_hash
    df2 = spark.createDataFrame(
        [(1, "a  B c"), (2, "A b C")], ["doc_id", "text"])
    hashes = [r["norm_hash"] for r in normalize_stats(df2).collect()]
    assert hashes[0] == hashes[1]


# ---------------------------------------------------------------- OOV rate

def test_oov_stats_bounds_and_crosscheck(spark, docs):
    from error_analysis_spark.extensions.sketches import oov_stats, vocab_topk
    out = oov_stats(docs, vocab_k=16, min_df=2).toPandas()
    assert len(out) == docs.count()
    got = out.dropna(subset=["oov_frac"])
    assert ((got["oov_frac"] >= 0) & (got["oov_frac"] <= 1)).all()
    # manual recount on a few docs
    vocab = set(r["token"] for r in
                vocab_topk(docs, k=16, min_df=2).collect())
    sample = docs.orderBy("doc_id").limit(5).collect()
    by_id = out.set_index("doc_id")
    for r in sample:
        toks = [t for t in r["text"].split() if t]
        oov = sum(1 for t in toks if t not in vocab)
        assert by_id.loc[r["doc_id"], "n_tokens"] == len(toks)
        assert by_id.loc[r["doc_id"], "n_oov"] == oov


def test_oov_empty_doc_null_frac(spark):
    from error_analysis_spark.extensions.sketches import oov_stats
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "   "), (3, "a b c")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in oov_stats(df, vocab_k=2,
                                              min_df=1).collect()}
    assert rows[2]["n_tokens"] == 0 and rows[2]["oov_frac"] is None


# ---------------------------------------------------------------- Bloom

def test_bloom_no_false_negatives(spark, docs):
    """Bloom positivity must be a SUPERSET of exact gram membership:
    per doc, n_hits >= exact n_matched, and every exactly-contaminated
    doc is bloom-flagged at the same threshold."""
    from error_analysis_spark.extensions import contamination as CT
    bench = docs.where(F.col("doc_id") % 13 == 0)
    train = docs.where(F.col("doc_id") % 13 != 0)
    exact = CT.contamination_report(train, bench, n=5, threshold=0.3) \
        .select("doc_id", "n_matched", "contaminated").toPandas() \
        .set_index("doc_id")
    bloom = CT.bloom_contamination(train, bench, n=5, m_bits=1 << 18,
                                   k_hashes=4, threshold=0.3) \
        .select("doc_id", "n_hits", "contaminated").toPandas() \
        .set_index("doc_id")
    joined = exact.join(bloom, lsuffix="_e", rsuffix="_b")
    assert (joined["n_hits"] >= joined["n_matched"]).all()
    assert joined.loc[joined["contaminated_e"], "contaminated_b"].all()


def test_bloom_build_bounded(spark, docs):
    from error_analysis_spark.extensions.contamination import bloom_build
    m = 1 << 10
    words = bloom_build(docs.limit(20), n=5, m_bits=m, k_hashes=3)
    assert len(words) == m // 32
    assert all(0 <= w < (1 << 32) for w in words)


# ---------------------------------------------------------------- domain cap

def test_domain_cap_matches_naive_window(spark, docs):
    from error_analysis_spark.extensions import text as TX
    from error_analysis_spark.extensions.curation import domain_cap
    cap = 6
    kept = domain_cap(docs, cap=cap).select("doc_id").toPandas()
    # naive: per-source row_number over (quality desc, doc_id)
    q_fp = F.round(TX.quality_expr("text") * 1e6).cast("long")
    naive = (docs.withColumn("_q", q_fp).where(F.col("_q").isNotNull())
             .withColumn("_rn", F.row_number().over(
                 Window.partitionBy("source")
                 .orderBy(F.col("_q").desc(), F.col("doc_id"))))
             .where(F.col("_rn") <= cap).select("doc_id").toPandas())
    assert sorted(kept["doc_id"]) == sorted(naive["doc_id"])


def test_domain_cap_respects_cap_and_small_domains(spark):
    from error_analysis_spark.extensions.curation import domain_cap
    rows = [(i, f"word{i % 7} " * (i % 11 + 1), f"d{i % 3}")
            for i in range(40)] + [(99, "solo doc here", "tiny")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    kept = domain_cap(df, cap=5).groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in kept}
    assert all(c <= 5 for c in counts.values())
    assert counts["tiny"] == 1  # domains under the cap keep everything


# ---------------------------------------------------------------- rolling

def test_rolling_stats_brute_parity(spark):
    import random
    rnd = random.Random(7)
    rows = [(i, k, 1_700_000_000_000_000 + rnd.randrange(0, 7200) * 1_000_000,
             round(rnd.uniform(0, 10), 2))
            for i, k in enumerate([j % 5 for j in range(300)])]
    from pyspark.sql import types as T
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "tus", "value"]).select(
        "event_id", "user_id",
        F.timestamp_micros(F.col("tus")).alias("ts"), "value")
    from error_analysis_spark.operators.temporal import rolling_stats
    out = rolling_stats(df, window_minutes=30).toPandas()
    # brute force in python
    by_key = {}
    for eid, k, tus, v in rows:
        by_key.setdefault(k, []).append((tus, v))
    win = 30 * 60_000_000
    got = out.set_index("event_id")
    for eid, k, tus, v in rows:
        frame = [vv for (tt, vv) in by_key[k] if tus - win <= tt <= tus]
        assert got.loc[eid, "n_window"] == len(frame)
        assert abs(got.loc[eid, "sum_window"] - round(sum(frame), 6)) < 1e-9


def test_rolling_stats_tie_peers(spark):
    # two events at the SAME timestamp must see each other (RANGE frame)
    df = spark.createDataFrame(
        [(1, 1, 1000, 2.0), (2, 1, 1000, 3.0)],
        ["event_id", "user_id", "tus", "value"]).select(
        "event_id", "user_id",
        F.timestamp_micros(F.col("tus")).alias("ts"), "value")
    from error_analysis_spark.operators.temporal import rolling_stats
    rows = rolling_stats(df, window_minutes=1).collect()
    assert all(r["n_window"] == 2 and r["sum_window"] == 5.0 for r in rows)


# ---------------------------------------------------------------- quantiles

def test_grouped_quantiles_matches_sorted_pick(spark):
    import math
    import random
    rnd = random.Random(11)
    rows = [(f"g{i % 3}", round(rnd.uniform(0, 50), 2)) for i in range(999)]
    df = spark.createDataFrame(rows, ["grp", "value"])
    from error_analysis_spark.extensions.sketches import grouped_quantiles
    out = grouped_quantiles(df, "grp", "value", qs=(0.25, 0.5, 0.9))
    got = {(r["grp"], r["q"]): r["v"] for r in out.collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        for q in (0.25, 0.5, 0.9):
            want = vals[math.ceil(q * len(vals)) - 1]
            assert abs(got[(g, q)] - want) < 1e-9, (g, q)


def test_grouped_quantiles_null_and_extremes(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0), ("a", 4.0)],
        ["grp", "value"])
    from error_analysis_spark.extensions.sketches import grouped_quantiles
    got = {r["q"]: r["v"] for r in
           grouped_quantiles(df, "grp", "value", qs=(0.5, 1.0)).collect()}
    assert got[0.5] == 2.0  # ceil(0.5*4)=2nd of [1,2,3,4]; NULL carries no mass
    assert got[1.0] == 4.0
