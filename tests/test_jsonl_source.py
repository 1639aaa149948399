"""JSONL source/sink: roundtrip, explicit-schema read, corrupt-line
quarantine (PERMISSIVE mode), gzip write."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from batch_processing_analysis_spark.sources.jsonl import (
    read_jsonl, split_corrupt, write_jsonl,
)
from batch_processing_analysis_spark.sources.tables import load_table


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out)
    clean, bad = split_corrupt(back)
    assert bad.count() == 0
    assert clean.columns == docs.columns
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, clean.collect()))
    assert a == b


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    df = read_jsonl(spark, str(p))
    clean, bad = split_corrupt(df)
    assert clean.count() == 2
    assert bad.count() == 1
    assert "not json" in bad.collect()[0][0]


def test_jsonl_gzip_write_reads_back(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = str(tmp_path / "gz")
    write_jsonl(docs, out, compression="gzip")
    files = list(Path(out).glob("*.json.gz"))
    assert files, "gzip part files expected"
    back, _ = split_corrupt(read_jsonl(spark, out))
    assert back.count() == 20


def test_jsonl_read_prunes_columns(spark, sf_dir, tmp_path):
    """Projection reaches the scan: a doc_id-only read must not carry
    the text column through the plan (ReadSchema pruning)."""
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "prune")
    write_jsonl(docs, out)
    plan = (
        read_jsonl(spark, out).select("doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "text" not in plan
