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


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    p = tmp_path / "csv_in"
    p.mkdir()
    with open(p / "part-0.csv", "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write("1,hello world,en,web,11\n")
        f.write("2,bonjour,fr,web,7\n")
        f.write("3,broken,en,web,NOT_A_NUMBER\n")
    back = IN.read_documents_csv(spark, str(p), keep_corrupt=True)
    pdf = back.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(pdf) == 3
    good = pdf[pdf["_corrupt_record"].isna()]
    bad = pdf[pdf["_corrupt_record"].notna()]
    assert sorted(good["doc_id"]) == [1, 2]
    # the malformed row is quarantined with its raw line preserved
    assert len(bad) == 1 and "NOT_A_NUMBER" in bad.iloc[0]["_corrupt_record"]


def test_write_compacted_bin_packs(spark, tmp_path):
    import os
    docs = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "CAST(id AS STRING) AS text")
    # fragment badly first: 64 partitions of ~16 rows
    frag = docs.repartition(64)
    out = str(tmp_path / "compact")
    IN.write_compacted(frag, out, target_rows_per_file=250)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    # 1000 rows / 250 per file -> ~4 files (repartition is round-robin
    # so one straggler may split under maxRecordsPerFile) vs the 64
    # fragmented inputs; the hard guarantee is the per-file cap
    assert 4 <= len(files) <= 6, files
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.groupBy().max("doc_id").collect()[0][0] == 999
    import pyspark.sql.functions as SF
    per_file = (back.select(SF.input_file_name().alias("f"))
                .groupBy("f").count().collect())
    assert all(r["count"] <= 250 for r in per_file), per_file
