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


def test_c4_clean_rules_fire_individually(spark):
    """Planted docs per C4 rule (Raffel et al. 2020 §2.2): line filters
    (terminal punctuation, ≥5 words, no javascript) and document drops
    (lorem ipsum, curly braces, <3 kept lines)."""
    from error_analysis_spark.extensions.text import c4_clean
    rows = [
        (1, "This is a good sentence with many words here.\n"
            "Another proper sentence that ends with punctuation too.\n"
            "And one more full sentence to pass the minimum bar."),
        (2, "short line\nno punct here\ntiny"),
        (3, "Lorem ipsum dolor sit amet something longer here.\n"
            "A second proper sentence for the document body now.\n"
            "A third proper sentence for the document body now."),
        (4, "function f() { return 1; } is code in this doc.\n"
            "A second proper sentence for the document body now.\n"
            "A third proper sentence for the document body now."),
        (5, "Enable JavaScript to view this page properly please.\n"
            "A second proper sentence for the document body now.\n"
            "A third proper sentence for the document body now.\n"
            "A fourth proper sentence for the document body now."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert got[1]["kept"] is True and got[1]["n_lines_kept"] == 3
    assert got[2]["kept"] is False and got[2]["n_lines_kept"] == 0
    assert got[3]["kept"] is False and got[3]["has_lorem"] is True
    assert got[4]["kept"] is False and got[4]["has_brace"] is True
    # the javascript LINE is dropped but the doc survives on the rest
    assert got[5]["kept"] is True and got[5]["n_lines_kept"] == 3
    assert "JavaScript" not in got[5]["clean_text"]


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC source/sink: schema-pinned round-trip is lossless and both
    predicate pushdown and column pruning reach the ORC scan node —
    the same scale contract as the parquet tables."""
    from error_analysis_spark.sources.ingest import (
        read_documents_orc, write_documents_orc)
    from error_analysis_spark.sources.tables import load_table
    from tests.conftest import SF_DIR
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_orc")
    write_documents_orc(docs, path)
    back = read_documents_orc(spark, path)
    assert back.count() == docs.count()
    a = docs.agg(F.expr("bit_xor(xxhash64(doc_id, text))")).first()[0]
    b = back.agg(F.expr("bit_xor(xxhash64(doc_id, text))")).first()[0]
    assert a == b
    plan = (back.where(F.col("doc_id") < 100).select("doc_id", "lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [" in plan and "LessThan(doc_id,100" in plan, \
        plan
    import re
    rs = re.search(r"ReadSchema: (\S+)", plan).group(1)
    assert "text" not in rs, rs  # pruned to the projected columns
