"""JSONL documents source/sink: lossless round-trip, schema pinning
(no inference pass), corrupt-row quarantine."""

from __future__ import annotations

import json
import os

from error_analysis_spark.sources import ingest as IN
from error_analysis_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_jsonl_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_jsonl")
    IN.write_documents_jsonl(docs, out, shards=4)
    back = IN.read_documents_jsonl(spark, out)
    assert [f.simpleString() for f in back.schema.fields] == \
        [f.simpleString() for f in docs.schema.fields]
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
    # gzip shards on disk, one per requested shard
    files = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert len(files) == 4


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    rows = [{"doc_id": 1, "text": "ok", "lang": "en", "source": "s",
             "n_chars": 2}]
    with open(p / "part-0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("{not valid json\n")
    back = IN.read_documents_jsonl(spark, str(p), keep_corrupt=True)
    pdf = back.toPandas()
    assert len(pdf) == 2
    good = pdf[pdf["_corrupt_record"].isna()]
    bad = pdf[pdf["_corrupt_record"].notna()]
    assert list(good["doc_id"]) == [1] and len(bad) == 1
    assert bad["text"].isna().all()  # malformed row carries no fields
