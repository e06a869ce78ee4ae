"""Property-based invariants for the wave-3 text operators: chunk
windows must tile every document exactly (coverage, overlap, hash
integrity) and dup-ngram stats must equal a pure-Python reference on
arbitrary corpora — including adversarial all-same-token documents."""

from __future__ import annotations

import hashlib

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from error_analysis_spark.extensions import text as TX

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from error_analysis_spark.session import get_spark
        _spark = get_spark("text-prop", shuffle_partitions=4)
    return _spark


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_doc = st.lists(_word, min_size=0, max_size=40).map(" ".join)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(_doc, min_size=1, max_size=12),
       window=st.integers(2, 9), stride=st.integers(1, 9))
def test_chunk_windows_tile_exactly(docs, window, stride):
    spark = _get_spark()
    stride = min(stride, window)  # standard overlap regime
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    out = TX.chunk_windows(spark.createDataFrame(pdf), window=window,
                          stride=stride).toPandas()
    for did, text in enumerate(docs):
        toks = text.split()
        mine = out[out["doc_id"] == did].sort_values("chunk_idx")
        if not toks:
            assert len(mine) == 0
            continue
        starts = list(range(0, len(toks), stride))
        assert list(mine["chunk_idx"]) == list(range(len(starts)))
        for ci, s in enumerate(starts):
            row = mine[mine["chunk_idx"] == ci].iloc[0]
            piece = toks[s:s + window]
            assert row["chunk_tokens"] == len(piece)
            assert row["chunk_hash"] == hashlib.md5(
                " ".join(piece).encode()).hexdigest()
        # every token position covered by at least one chunk
        covered = set()
        for s in starts:
            covered.update(range(s, min(s + window, len(toks))))
        assert covered == set(range(len(toks)))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(_doc, min_size=1, max_size=12),
       n=st.integers(2, 5))
def test_dup_ngram_stats_matches_reference(docs, n):
    spark = _get_spark()
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    out = TX.dup_ngram_stats(spark.createDataFrame(pdf), n=n) \
        .toPandas().set_index("doc_id")

    # pure-Python reference
    from collections import Counter
    per_doc: dict[int, Counter] = {}
    for did, text in enumerate(docs):
        toks = text.split()
        if len(toks) < n:
            continue
        per_doc[did] = Counter(
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
    doc_freq = Counter()
    for c in per_doc.values():
        doc_freq.update(c.keys())
    assert set(out.index) == set(per_doc.keys())
    for did, c in per_doc.items():
        n_grams = sum(c.values())
        n_dup = sum(v for g, v in c.items()
                    if doc_freq[g] >= 2 or v >= 2)
        assert out.loc[did, "n_grams"] == n_grams
        assert out.loc[did, "n_dup"] == n_dup
        assert abs(out.loc[did, "dup_frac"] - round(n_dup / n_grams, 6)) \
            < 1e-12
