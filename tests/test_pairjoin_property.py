"""Property-based exactness of the bucketed self-range-join (J4):
for ANY point set, bucketed pair_bins ≡ exact crossJoin pair_bins —
bucket-boundary pairs are the classic off-by-one risk (SURVEY §7 hard
part #1), so the generator biases points toward cell boundaries."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from error_analysis_spark.operators.variogram import pair_bins

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from error_analysis_spark.session import get_spark
        _spark = get_spark("pairjoin-prop", shuffle_partitions=4)
    return _spark


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(2, 120),
    max_lag=st.sampled_from([7.0, 25.0, 64.0]),
    bin_width=st.sampled_from([3.0, 10.0]),
    boundary_frac=st.floats(0.0, 0.9),
)
def test_bucketed_equals_exact(seed, n, max_lag, bin_width, boundary_frac):
    rs = np.random.RandomState(seed)
    xy = rs.uniform(0, 200, (n, 2))
    # snap a fraction of points onto bucket boundaries (x = k·max_lag)
    nb = int(n * boundary_frac)
    if nb:
        xy[:nb, 0] = np.round(xy[:nb, 0] / max_lag) * max_lag
        xy[nb // 2:nb, 1] = np.round(xy[nb // 2:nb, 1] / max_lag) * max_lag
    pdf = pd.DataFrame({
        "sample_id": np.arange(n), "run": np.arange(n) % 2,
        "x": xy[:, 0], "y": xy[:, 1],
        "value": rs.standard_normal(n),
    })
    spark = _get_spark()
    df = spark.createDataFrame(pdf)
    key = ["run", "bin"]
    a = (pair_bins(df, max_lag=max_lag, bin_width=bin_width, exact=False)
         .toPandas().sort_values(key).reset_index(drop=True))
    b = (pair_bins(df, max_lag=max_lag, bin_width=bin_width, exact=True)
         .toPandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        a[key + ["pair_count"]], b[key + ["pair_count"]])
    np.testing.assert_allclose(a["ssd"].astype(float),
                               b["ssd"].astype(float), rtol=1e-9)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=8),
    min_size=2, max_size=24))
def test_jaccard_pairs_match_python_reference(spark, corpora):
    """Property: jaccard_pairs (unpruned AND max_df-pruned forms) agree
    with a pure-Python token-set reference on random corpora — the
    pruned form may only MISS pairs whose entire overlap is
    above-max_df tokens, never invent or mis-score one."""
    import pandas as pd

    from error_analysis_spark.extensions import dedup as DD
    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
    sets = {i: set(t.split()) for i, t in docs}
    want = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                j = inter / (len(sets[a]) + len(sets[b]) - inter)
                if j >= 0.3:
                    want[(a, b)] = round(j, 6)
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in DD.jaccard_pairs(df, threshold=0.3).collect()}
    assert got == want
    pruned = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in DD.jaccard_pairs(df, threshold=0.3,
                                        max_df=max(1, len(docs) // 2))
              .collect()}
    for pair, j in pruned.items():
        assert want.get(pair) == j  # never invents or mis-scores
    df_counts = {}
    for s in sets.values():
        for t in s:
            df_counts[t] = df_counts.get(t, 0) + 1
    cap = max(1, len(docs) // 2)
    for pair in set(want) - set(pruned):
        # a missed pair must have had its whole overlap above the cap
        a, b = pair
        assert all(df_counts[t] > cap for t in sets[a] & sets[b])
