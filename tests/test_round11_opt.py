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
