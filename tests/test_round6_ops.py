"""Round-6 operator semantics: corpus-level line dedup (C4 rule)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from error_analysis_spark.extensions.text import corpus_line_dedup


def test_corpus_line_dedup_semantics(spark):
    """Kill rule counts occurrences CORPUS-WIDE (3+ struck), order is
    preserved, blanks are dropped, and a doc losing every line stays
    in the output with empty text."""
    boiler = "copyright footer"
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"alpha\n{boiler}\nbeta",          # boiler struck, order kept
            f"{boiler}\ngamma\n\n  \ngamma",   # blanks dropped; gamma
                                               # repeats only twice → kept
            f"  {boiler}  \ndelta",            # trimmed match still counts
            boiler,                            # loses its only line
        ],
    }))
    out = (corpus_line_dedup(docs, kill_freq=3).toPandas()
           .set_index("id").sort_index())
    assert out.loc[1, "text"] == "alpha\nbeta"
    assert out.loc[1, "n_lines_kept"] == 2
    assert out.loc[1, "n_lines_removed"] == 1
    assert out.loc[2, "text"] == "gamma\ngamma"
    assert out.loc[2, "n_lines_removed"] == 1
    assert out.loc[3, "text"] == "delta"
    # all lines struck → empty text, still present
    assert out.loc[4, "text"] == "" and out.loc[4, "n_lines_kept"] == 0


def test_corpus_line_dedup_plan_shape(spark):
    """Scale-shape guard: explode → hash aggregate → hash join →
    groupBy rebuild; no window functions, no cartesian product."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a\nb", "b\nc"]}))
    plan = (corpus_line_dedup(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
