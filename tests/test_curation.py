"""Curation-pipeline test on a crafted corpus with known keep/drop
verdicts per stage."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from error_analysis_spark.extensions.curation import (
    CurationConfig, curate_documents,
)

GOOD = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the quiet green forest to find some food and water "
        "before the long cold night arrives with wind and rain outside")


def test_curation_funnel(spark):
    rows = [
        # survivors: distinct good english docs
        (0, GOOD),
        (1, GOOD.replace("fox", "wolf").replace("dog", "cat")
            .replace("forest", "desert").replace("water", "shade")
            .replace("rain", "dust").replace("quick", "slow")
            .replace("lazy", "busy").replace("green", "red")
            .replace("cold", "hot").replace("quiet", "loud")),
        # exact duplicate of 0 → dropped at exact dedup
        (2, GOOD),
        # near-duplicate of 0 (one word changed) → dropped at near-dup
        (3, GOOD.replace("fox", "hare")),
        # low quality: tiny + non-alpha → dropped at quality gate
        (4, "!!! ??? 123"),
        # non-english → dropped at language filter
        (5, "le chat et le chien sont dans la maison avec les enfants "
            "et ils ne veulent pas une vie sans jeux pour tous les jours"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    kept, stats = curate_documents(
        docs, CurationConfig(min_quality=0.4, keep_langs=("en",),
                             near_dup_threshold=0.6, num_perm=32, bands=16))
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids == [0, 1], ids
    s = stats.toPandas().set_index("stage")
    assert s.loc["quality_gate", "rows_out"] == 5      # dropped doc 4
    assert s.loc["language_filter", "rows_out"] == 4   # dropped doc 5
    assert s.loc["exact_dedup", "rows_out"] == 3       # dropped doc 2
    assert s.loc["near_dup_dedup", "rows_out"] == 2    # dropped doc 3
    toks = kept.select("n_bpe_tokens").toPandas()
    assert (toks["n_bpe_tokens"] > 20).all()


def test_curation_single_pass(spark):
    """The funnel's stage caches must prevent lineage re-execution: an
    accumulator counts how many times input rows are actually scanned.
    The uncached naive funnel (one eager count per stage) scans the
    input 5+ times; the cached funnel reads it once to fill the stage-1
    cache (plus at most one warm-up partition re-run)."""
    n_docs = 40
    rows = [(i, GOOD + f" variant {i}") for i in range(n_docs)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    instrumented = docs.repartition(4).mapInPandas(
        counting, "doc_id long, text string")
    kept, stats = curate_documents(
        instrumented, CurationConfig(min_quality=0.2, keep_langs=("en",),
                                     near_dup_threshold=0.99))
    kept.count()
    stats.collect()
    assert acc.value <= 2 * n_docs, (
        f"input scanned {acc.value / n_docs:.1f}x — stage caches are not "
        f"preventing lineage re-execution")


def test_quality_ops_survive_empty_docs(spark):
    """Poison-pill rows (empty / whitespace-only / NULL text) must
    score NULL under Spark's default ANSI mode — never raise
    DIVIDE_BY_ZERO — and quality_prune must never keep them (they
    carry no quality mass), even at keep_frac=1.0 where the quota
    reaches the NULL histogram bucket."""
    import pandas as pd
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import curation as CU
    from error_analysis_spark.extensions import text as TX

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta gamma", "", "   ", None],
    })
    docs = spark.createDataFrame(pdf)
    scored = docs.select("doc_id",
                         TX.quality_expr("text").alias("q")).toPandas()
    byid = scored.set_index("doc_id")["q"]
    assert byid[1] > 0
    assert byid[[2, 3, 4]].isna().all()
    stats = TX.token_stats(docs).toPandas().set_index("doc_id")
    assert stats.loc[2, "n_tokens"] == 0 and pd.isna(stats.loc[2, "ttr"])
    langs = TX.lang_scores(docs).toPandas()
    assert len(langs) == 4  # no crash; argmax may be NULL for empties

    for frac in (0.5, 1.0):
        kept = CU.quality_prune(docs, keep_frac=frac).toPandas()
        assert set(kept["doc_id"]) <= {1}
        assert len(kept) == (1 if frac >= 0.5 else 0) or frac < 0.5
    # only doc 1 carries quality mass: keep_frac=1.0 keeps exactly it
    kept_all = CU.quality_prune(docs, keep_frac=1.0).toPandas()
    assert list(kept_all["doc_id"]) == [1]
