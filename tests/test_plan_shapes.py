"""Physical-plan regression guards for the wave-3 extension operators —
the 100 TB story is a property of the PLAN, so assert it directly:
narrow ops must stay exchange-free, wide ops must shuffle on the right
bounded keys, and rank windows must never collapse to a single
partition over unbounded input."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from error_analysis_spark.extensions import mixing as MX
from error_analysis_spark.extensions import text as TX
from error_analysis_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunk_windows_no_exchange(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(TX.chunk_windows(docs, window=32, stride=24))
    assert "Exchange" not in plan, plan  # pure narrow fan-out


def test_dup_ngrams_shuffles_hashes_not_strings(spark):
    # plan-shape assertions inspect the FileScan — drop any cached
    # relation another module may have left over this file
    spark.catalog.clearCache()
    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(TX.dup_ngram_stats(docs, n=8))
    # wide columns are the 64-bit gram hash + counts; the gram STRING
    # (array_join of 8 tokens) must be consumed row-locally, never
    # carried through an exchange
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "array_join" not in line, line
    # scan pruned to the two needed columns
    assert "ReadSchema" in plan
    import re
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    # (the doc-frequency branch prunes even doc_id — only `text` flows)
    assert all(("text" in s and "lang" not in s
                and "source" not in s) for s in schemas), schemas


def test_weighted_sample_window_is_partitioned(spark):
    pdf = pd.DataFrame({"doc_id": range(100),
                        "source": ["s" + str(i % 4) for i in range(100)],
                        "w": [1.0] * 100})
    df = spark.createDataFrame(pdf)
    plan = _plan(MX.weighted_sample_k(df, k=3, weight_col="w"))
    # the rank window must partition by the group key — a
    # SinglePartition exchange here would funnel the corpus through
    # one task at scale
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan


def test_domain_weights_window_is_bounded(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(MX.domain_mix_weights(docs))
    # the ONLY single-partition stage permitted is the normalization
    # window over the ≤|domains|-row aggregate — it must sit above the
    # source-keyed hash aggregate, never above the raw scan
    assert plan.index("SinglePartition") < plan.index("FileScan"), \
        "normalization window must consume the aggregated (tiny) side"
    assert "hashpartitioning(source" in plan, plan
