"""Round-10 regression tests: the distributed connected-components
path (loud non-convergence + correctness at the scale SHAPE — forced
past the local path), the byte-bounded local threshold for string ids
(ADVICE r09), and the IVF-PQ rerank shortlist cap (ADVICE r09)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from error_analysis_spark.extensions.dedup import connected_components


def _chain_star_graph(spark, n_chains=2, chain_len=120, n_stars=5,
                      star_size=20):
    """Known-components graph: chains (long diameter — the adversarial
    shape for hash-min) + stars (diameter 2). Vertex layout mirrors
    bench_cc.py; expected component = min id of the chain/star."""
    chain_nodes = n_chains * chain_len
    chains = (spark.range(chain_nodes)
              .where((F.col("id") + 1) % chain_len != 0)
              .select(F.col("id").alias("id_a"),
                      (F.col("id") + 1).alias("id_b")))
    stars = (spark.range(n_stars * (star_size - 1))
             .select(
                 (F.lit(chain_nodes) + (F.col("id") / (star_size - 1))
                  .cast("long") * star_size).alias("id_a"),
                 (F.lit(chain_nodes) + (F.col("id") / (star_size - 1))
                  .cast("long") * star_size
                  + F.col("id") % (star_size - 1) + 1).alias("id_b")))
    pairs = chains.unionByName(stars)
    vertices = spark.range(chain_nodes + n_stars * star_size) \
        .select(F.col("id"))
    expected = (F.when(F.col("id") < chain_nodes,
                       (F.col("id") / chain_len).cast("long") * chain_len)
                .otherwise(F.lit(chain_nodes)
                           + ((F.col("id") - chain_nodes) / star_size)
                           .cast("long") * star_size))
    return pairs, vertices, expected


def test_distributed_cc_correct_on_chains_and_stars(spark):
    # local_threshold=0 forces the distributed hash-min + pointer-
    # jumping loop — the 100 TB path (VERDICT r09 #5)
    pairs, vertices, expected = _chain_star_graph(spark)
    comp = connected_components(pairs, vertices, max_iter=25,
                                local_threshold=0)
    bad = comp.where(F.col("component") != expected).count()
    assert bad == 0
    assert comp.count() == vertices.count()


def test_distributed_cc_raises_loudly_on_non_convergence(spark):
    # a 120-vertex chain cannot converge in 3 rounds even with pointer
    # jumping (reach ~2^3 hops << 120): partially-propagated labels
    # would be silently WRONG components, so the loop must fail loud
    pairs, vertices, _ = _chain_star_graph(spark, n_chains=1,
                                           chain_len=120, n_stars=0)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, vertices, max_iter=3,
                             local_threshold=0) \
            .agg(F.count("*")).collect()


def test_cc_string_ids_byte_bounded_local_path(spark):
    # string ids (a tested path) must still produce correct components
    # through the byte-bounded local collect (ADVICE r09): the scaled
    # threshold keeps the driver transfer ~64 MB whatever the id width
    pairs = spark.createDataFrame(
        [("doc_aaaaaaaaaaaaaaaa_1", "doc_aaaaaaaaaaaaaaaa_2"),
         ("doc_aaaaaaaaaaaaaaaa_2", "doc_aaaaaaaaaaaaaaaa_3"),
         ("doc_bbbbbbbbbbbbbbbb_9", "doc_bbbbbbbbbbbbbbbb_8")],
        "id_a string, id_b string")
    vertices = spark.createDataFrame(
        [("doc_aaaaaaaaaaaaaaaa_1",), ("doc_aaaaaaaaaaaaaaaa_2",),
         ("doc_aaaaaaaaaaaaaaaa_3",), ("doc_bbbbbbbbbbbbbbbb_8",),
         ("doc_bbbbbbbbbbbbbbbb_9",), ("doc_isolated_x",)],
        "id string")
    got = {r["id"]: r["component"]
           for r in connected_components(pairs, vertices).collect()}
    assert got["doc_aaaaaaaaaaaaaaaa_3"] == "doc_aaaaaaaaaaaaaaaa_1"
    assert got["doc_bbbbbbbbbbbbbbbb_9"] == "doc_bbbbbbbbbbbbbbbb_8"
    assert got["doc_isolated_x"] == "doc_isolated_x"


def test_ivfpq_rerank_shortlist_cap(spark):
    # the rerank tier inlines shortlist ids into an isin() plan — a
    # runaway value must be rejected, not silently planned (ADVICE r09)
    from error_analysis_spark.sources.ann_store import query_ivfpq
    with pytest.raises(ValueError, match="shortlist"):
        query_ivfpq(spark, "/nonexistent", [0.0, 1.0], k=10,
                    rerank_source=spark.range(1), shortlist=20_000)


def test_gopher_flags_rules_fire_individually(spark):
    """Planted docs: each Gopher rule trips exactly where designed
    (Rae et al. 2021 A1.1); the good doc passes all of them."""
    from error_analysis_spark.extensions.text import gopher_flags
    good = ("the quick brown fox jumps over that lazy dog have with "
            "words " * 8).strip()          # 88 words, stopwords, alpha
    short = "the quick brown fox have"     # < 50 words
    symbols = " ".join(["###word"] * 60)   # symbol ratio 3.0
    bullets = "\n".join(["• item " + ("word " * 9).strip()] * 10)
    ellipses = "\n".join([("word " * 10).strip() + " ..."] * 10)
    numeric = ("the of " + " ".join(str(i) for i in range(60)))
    nostops = " ".join(["alpha beta gamma delta"] * 15)
    rows = [(1, good), (2, short), (3, symbols), (4, bullets),
            (5, ellipses), (6, numeric), (7, nostops)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_flags(df).collect()}
    assert got[1]["passes_gopher"] is True
    assert got[2]["n_words"] < 50 and got[2]["passes_gopher"] is False
    assert got[3]["symbol_word_ratio"] > 0.1 \
        and got[3]["passes_gopher"] is False
    assert got[4]["bullet_line_frac"] == 1.0 \
        and got[4]["passes_gopher"] is False
    assert got[5]["ellipsis_line_frac"] == 1.0 \
        and got[5]["passes_gopher"] is False
    assert got[6]["alpha_word_frac"] < 0.8 \
        and got[6]["passes_gopher"] is False
    assert got[7]["n_stop_hits"] < 2 and got[7]["passes_gopher"] is False
    # degenerate: empty text fails, never NULLs
    empty = gopher_flags(spark.createDataFrame(
        [(9, " ")], "doc_id long, text string")).collect()[0]
    assert empty["passes_gopher"] is False
