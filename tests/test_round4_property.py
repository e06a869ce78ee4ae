"""Property-based invariants for the round-4 operators: grouped
quantiles must equal the sorted-pick reference for ARBITRARY (q, n)
(the float-ceil drift regression class), hash splits must partition
exactly and stably, funnels must respect order, and the snapshot diff
must invert cleanly."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from error_analysis_spark.session import get_spark
        _spark = get_spark("r4-prop", shuffle_partitions=4)
    return _spark


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(n=st.integers(1, 400),
       q100=st.integers(1, 99),
       seed=st.integers(0, 10_000))
def test_grouped_quantiles_any_q_matches_sorted_pick(n, q100, seed):
    """percentile_disc for arbitrary q and group size — the class of
    inputs where float ceil(q*n) picks the wrong rank."""
    import random
    rnd = random.Random(seed)
    q = q100 / 100.0
    vals = [round(rnd.uniform(-5, 5), 2) for _ in range(n)]
    spark = _get_spark()
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * n, "v": vals}))
    from error_analysis_spark.extensions.sketches import grouped_quantiles
    got = grouped_quantiles(df, "g", "v", qs=(q,)).collect()[0]["v"]
    svals = sorted(round(v * 100) for v in vals)
    rank = (round(q * 10000) * n + 9999) // 10000  # exact ceil(q*n)
    assert got == svals[rank - 1] / 100.0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60,
                    unique=True),
       seed=st.integers(0, 100))
def test_hash_split_partitions_exactly(ids, seed):
    """Every row lands in exactly one split; membership is a pure
    function of the id (stable under any subset)."""
    spark = _get_spark()
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    from error_analysis_spark.extensions.mixing import hash_split
    out = hash_split(df, fracs=(0.6, 0.2, 0.2), seed=seed).toPandas()
    assert len(out) == len(ids)  # fracs sum to 1 → nothing dropped
    assert out.doc_id.is_unique
    half = [i for i in ids if i % 2 == 0]
    if half:
        sub = hash_split(spark.createDataFrame(
            pd.DataFrame({"doc_id": half})), fracs=(0.6, 0.2, 0.2),
            seed=seed).toPandas()
        merged = sub.merge(out, on="doc_id", suffixes=("_s", "_f"))
        assert (merged.split_s == merged.split_f).all()


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(events=st.lists(
    st.tuples(st.integers(1, 5),            # user
              st.sampled_from(["a", "b", "c"]),
              st.integers(0, 1000)),        # ts seconds
    min_size=1, max_size=60))
def test_funnel_matches_reference(events):
    """Chained min-aggregates equal the sequential-scan reference."""
    spark = _get_spark()
    import pyspark.sql.functions as F
    pdf = pd.DataFrame(events, columns=["user_id", "event_type", "s"])
    pdf = pdf.drop_duplicates(["user_id", "event_type", "s"])
    df = spark.createDataFrame(pdf).select(
        "user_id", "event_type", F.timestamp_seconds("s").alias("ts"))
    from error_analysis_spark.operators.temporal import funnel_steps
    got = {r["user_id"]: (r["ts_1"], r["ts_2"], r["ts_3"])
           for r in funnel_steps(df, ["a", "b", "c"]).collect()}
    # reference: earliest a; earliest b after it; earliest c after that
    for u, sub in pdf.groupby("user_id"):
        def first_after(t, lo):
            c = sorted(s for e, s in zip(sub.event_type, sub.s)
                       if e == t and (lo is None or s > lo))
            return c[0] if c else None
        a = first_after("a", None)
        if a is None:
            assert u not in got
            continue
        b = first_after("b", a)
        c = first_after("c", b) if b is not None else None
        g = got[u]
        assert int(g[0].timestamp()) == a
        assert (g[1] is None) == (b is None)
        if b is not None:
            assert int(g[1].timestamp()) == b
        assert (g[2] is None) == (c is None)
        if c is not None:
            assert int(g[2].timestamp()) == c


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(old_ids=st.sets(st.integers(0, 30), max_size=20),
       new_ids=st.sets(st.integers(0, 30), max_size=20),
       changed=st.sets(st.integers(0, 30), max_size=10))
def test_corpus_delta_statuses_partition(old_ids, new_ids, changed):
    """Statuses partition the id universe: added = new-only,
    removed = old-only, changed/same split the intersection by
    content equality; swapping the sides swaps added and removed."""
    spark = _get_spark()
    if not old_ids and not new_ids:
        return
    old = spark.createDataFrame(
        pd.DataFrame({"doc_id": sorted(old_ids),
                      "text": [f"t{i}" for i in sorted(old_ids)]})) \
        if old_ids else None
    new = spark.createDataFrame(
        pd.DataFrame({"doc_id": sorted(new_ids),
                      "text": [f"t{i}x" if i in changed else f"t{i}"
                               for i in sorted(new_ids)]})) \
        if new_ids else None
    if old is None or new is None:
        return
    from error_analysis_spark.extensions.curation import corpus_delta
    got = {r["doc_id"]: r["status"]
           for r in corpus_delta(old, new).collect()}
    assert set(got) == old_ids | new_ids
    for i in sorted(old_ids | new_ids):
        if i not in old_ids:
            assert got[i] == "added"
        elif i not in new_ids:
            assert got[i] == "removed"
        elif i in changed:
            assert got[i] == "changed"
        else:
            assert got[i] == "same"
    rev = {r["doc_id"]: r["status"]
           for r in corpus_delta(new, old).collect()}
    for i, s in got.items():
        if s == "added":
            assert rev[i] == "removed"
        elif s == "removed":
            assert rev[i] == "added"
        else:
            assert rev[i] == s


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(tgt=st.lists(st.tuples(st.integers(0, 40), st.text("ab", max_size=3)),
                    min_size=0, max_size=25),
       dlt=st.lists(st.tuples(st.integers(0, 40), st.text("ab", max_size=3),
                              st.booleans()),
                    min_size=0, max_size=15))
def test_merge_upsert_matches_dict_reference(tgt, dlt):
    """MERGE semantics against a plain dict apply: last-write-wins on
    unique ids; deletes remove; delete-of-missing is a no-op."""
    tgt = list({i: (i, t) for i, t in tgt}.values())       # unique ids
    dlt = list({i: (i, t, d) for i, t, d in dlt}.values())
    spark = _get_spark()
    target = spark.createDataFrame(
        pd.DataFrame([(i, t, "en", "s", 1) for i, t in tgt]
                     or [(-(10 ** 6), "x", "en", "s", 1)],
                     columns=["doc_id", "text", "lang", "source",
                              "n_chars"]))
    delta = spark.createDataFrame(
        pd.DataFrame([(i, t, "en", "s", 1,
                       "delete" if d else "upsert") for i, t, d in dlt]
                     or [(-(10 ** 6) - 1, "x", "en", "s", 1, "delete")],
                     columns=["doc_id", "text", "lang", "source",
                              "n_chars", "_op"]))
    from error_analysis_spark.extensions.curation import merge_upsert
    got = {r["doc_id"]: r["text"]
           for r in merge_upsert(target, delta).collect()}
    ref = {i: t for i, t in tgt} if tgt else {-(10 ** 6): "x"}
    for i, t, d in (dlt or [(-(10 ** 6) - 1, "x", True)]):
        if d:
            ref.pop(i, None)
        else:
            ref[i] = t
    assert got == ref


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(st.integers(0, 50), st.text("abc", max_size=4)),
                     min_size=1, max_size=30, unique_by=lambda r: r[0]),
       seed=st.integers(0, 99))
def test_checksum_permutation_invariant_and_change_sensitive(rows, seed):
    """The corpus checksum must be identical under any row order /
    partitioning and must change when any single row's text changes."""
    import random
    rnd = random.Random(seed)
    spark = _get_spark()
    import pyspark.sql.functions as F
    from error_analysis_spark.extensions.text import doc_row_hash

    def chk(data, parts):
        df = spark.createDataFrame(
            pd.DataFrame(data, columns=["doc_id", "text"])) \
            .repartition(parts)
        r = (df.select(doc_row_hash().alias("_h"))
             .agg(F.count("*").alias("n"),
                  F.expr("bit_xor(_h)").alias("x"),
                  F.sum(F.col("_h").cast("decimal(38,0)"))
                  .cast("string").alias("s")).collect()[0])
        return (r["n"], r["x"], r["s"])

    shuffled = rows[:]
    rnd.shuffle(shuffled)
    assert chk(rows, 1) == chk(shuffled, 5)
    i = rnd.randrange(len(rows))
    mutated = [(d, t + "!") if k == i else (d, t)
               for k, (d, t) in enumerate(rows)]
    assert chk(rows, 2) != chk(mutated, 2)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(vals=st.lists(st.integers(0, 1023), min_size=2, max_size=60),
       split=st.integers(1, 59))
def test_hll_merge_equals_union(vals, split):
    """Register tables are mergeable: elementwise MAX of two halves'
    registers must give the same estimate as one pass over the union —
    the property that makes HLL a partial aggregate at scale."""
    import pyspark.sql.functions as F
    split = min(split, len(vals) - 1)
    spark = _get_spark()
    from error_analysis_spark.extensions.sketches import (
        hll_distinct, hll_estimate, hll_registers)
    whole = spark.createDataFrame(
        pd.DataFrame({"g": ["u"] * len(vals), "v": vals}))
    ra = hll_registers(spark.createDataFrame(
        pd.DataFrame({"g": ["u"] * split, "v": vals[:split]})), "g", "v")
    rb = hll_registers(spark.createDataFrame(
        pd.DataFrame({"g": ["u"] * (len(vals) - split),
                      "v": vals[split:]})), "g", "v")
    # TWO independently-built register tables, merged by union +
    # elementwise MAX — must estimate exactly like one pass over all
    merged = (ra.unionByName(rb).groupBy("g", "_bucket")
              .agg(F.max("_m").alias("_m")))
    est_whole = hll_distinct(whole, "g", "v").collect()[0]["n_est"]
    est_merge = hll_estimate(merged, "g").collect()[0]["n_est"]
    assert est_whole == est_merge
