"""JSONL source/sink: explicit-schema read, corrupt-line quarantine,
bounded-shard write (LLM-corpus interchange format)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.sources import jsonl

SCHEMA = "doc_id long, text string, lang string"


def test_roundtrip_and_bounded_shards(spark, tmp_path):
    rows = [(i, f"document number {i}", "en") for i in range(250)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = str(tmp_path / "corpus")
    jsonl.write_jsonl(df, out, max_records_per_file=100)
    parts = glob.glob(os.path.join(out, "part-*"))
    assert parts, "no output files"
    # every shard bounded
    for p in parts:
        with open(p) as fh:
            n = sum(1 for _ in fh)
        assert n <= 100
    good, corrupt = jsonl.read_jsonl(spark, out, SCHEMA)
    assert corrupt.count() == 0
    got = sorted((r.doc_id, r.text, r.lang) for r in good.collect())
    assert got == sorted(rows)


def test_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok one", "lang": "en"}),
        "{broken json here",
        json.dumps({"doc_id": 2, "text": "ok two", "lang": "fr"}),
        "also not json at all",
        "",  # blank line: ignored by both paths
    ]
    p.write_text("\n".join(lines) + "\n")
    good, corrupt = jsonl.read_jsonl(spark, str(p), SCHEMA)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    bad = sorted(r.raw_line for r in corrupt.collect())
    assert bad == sorted(["{broken json here", "also not json at all"])


def test_read_accepts_struct_schema_and_prunes(spark, tmp_path):
    from pyspark.sql import types as T

    p = tmp_path / "wide.jsonl"
    p.write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": "t" * 50, "lang": "en"})
            for i in range(5)
        )
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    good, _ = jsonl.read_jsonl(spark, str(p), schema)
    pruned = good.select("doc_id")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.lower() or "ReadSchema" not in plan  # pruned scan
    assert pruned.count() == 5


def test_gzip_write_readback(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", "en"), (2, "b", "de")], SCHEMA)
    out = str(tmp_path / "gz")
    jsonl.write_jsonl(df, out, compression="gzip")
    assert glob.glob(os.path.join(out, "part-*.gz"))
    good, corrupt = jsonl.read_jsonl(spark, out, SCHEMA)
    assert good.count() == 2 and corrupt.count() == 0
