"""JSONL (newline-delimited JSON) source + sink — the de-facto interchange
format for LLM training corpora (one document object per line).

Extends the reference's file-format surface (the ``%%``-delimited report
codec, bin/main.py:176-204 analog in ``report_codec.py``) with the format a
modern data pipeline actually receives: web-scale corpora ship as
``*.jsonl``/``*.jsonl.gz`` shards.

Scale design (100 TB):
- The caller supplies an EXPLICIT schema. Spark's JSON schema inference
  reads the entire input once before the first real job — a full extra
  pass over 100 TB. With a schema the read is one pass, splittable per
  line, and column-pruned (unreferenced JSON fields are skipped by the
  Jackson parser per row).
- Corrupt lines must not kill a 1000-executor job: PERMISSIVE mode routes
  unparseable lines into a quarantine column instead of throwing, and
  ``read_jsonl`` splits them into a separate DataFrame so the main path
  stays clean while the damage stays auditable (count, sample, re-crawl).
- The writer shards through ``maxRecordsPerFile`` like the parquet layout
  sink (``sinks/layout.py``) so downstream loaders see bounded files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: quarantine column name (Spark's PERMISSIVE-mode capture column)
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON with an explicit schema.

    Returns ``(good, corrupt)``:
    - ``good``  — rows matching the schema, quarantine column dropped.
    - ``corrupt`` — one row per unparseable line: ``(raw_line)``.

    The two frames are INDEPENDENT lazy scans of the same splittable
    input, not a cached split: Spark's JSON source disallows filtering on
    the corrupt-record column alone, and the documented workaround
    (cache the whole scan) is exactly what a 100 TB read must not do.
    ``good`` uses DROPMALFORMED (bad lines skipped inside the reader);
    ``corrupt`` is a text scan keeping lines ``from_json`` cannot parse —
    each path costs one pass and only when actually consumed."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    good = (
        spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    )
    # from_json on malformed input yields an all-null struct (not a NULL
    # struct), so detection goes through the corrupt-record column: with
    # the quarantine field in the from_json schema, only truly unparseable
    # lines populate it — a VALID object merely missing schema fields stays
    # on the good path (as it does under DROPMALFORMED).
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = F.from_json(
        "value", full, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    )
    corrupt = (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .filter(parsed.getField(CORRUPT_COL).isNotNull())
        .select(F.col("value").alias("raw_line"))
    )
    return good, corrupt


def write_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    compression: str | None = None,
) -> None:
    """Write a DataFrame as JSONL shards with bounded file sizes.

    ``maxRecordsPerFile`` bounds each output file regardless of partition
    skew — the same contract as the parquet shard sink. ``compression``
    may be 'gzip'/'zstd'/None; compressed JSONL is what corpora
    distribute as (gzip is NOT splittable — readers re-shard on ingest,
    which bounded shard sizes make cheap)."""
    w = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if compression:
        w = w.option("compression", compression)
    w.json(path)
