"""Edge semantics of delta-vs-corpus incremental dedup: zero-token
docs, delta⊂corpus overlap, empty delta, and match-id canonicality."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from error_analysis_spark.extensions import dedup as DD


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_incremental_statuses_and_match_ids(spark):
    corpus = _df(spark, [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # corpus-internal dup
        (3, "one two three four five six"),
        (4, ""),                                     # zero-token corpus doc
    ])
    delta = _df(spark, [
        (10, "alpha beta gamma delta epsilon zeta"),  # exact → min cid 1
        (11, "alpha beta gamma delta epsilon eta"),   # near (5/7 = 0.714)
        (12, "totally different words here now yes"), # kept
        (13, ""),                                     # zero-token: exact vs 4
        (14, "   "),                                  # whitespace ≠ "" text
    ])
    out = {r["doc_id"]: (r["status"], r["match_id"])
           for r in DD.incremental_dedup(corpus, delta, num_perm=16,
                                         bands=8, threshold=0.5).collect()}
    assert out[10] == ("exact_dup", 1)   # min corpus id among 1,2
    assert out[11][0] == "near_dup" and out[11][1] == 1
    assert out[12] == ("kept", None)
    assert out[13] == ("exact_dup", 4)   # byte-equal empty text
    # whitespace-only text is byte-distinct and has no signature → kept
    assert out[14] == ("kept", None)
    assert len(out) == 5  # one row per delta doc, no dups/losses


def test_incremental_empty_delta(spark):
    corpus = _df(spark, [(1, "alpha beta")])
    delta = _df(spark, [(99, "x")]).where(F.lit(False))
    out = DD.incremental_dedup(corpus, delta)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "status", "match_id"}
