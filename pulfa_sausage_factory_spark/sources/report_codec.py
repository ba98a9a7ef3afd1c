"""S2/S3 — the ``%%``-delimited Pdf-report checkpoint codec
(reference: ``Pdf.slurp``/``Pdf.serialize``, bin/main.py:71-119).

The reference's inter-stage IR is a text file: header row of sorted field
names, then one ``%%``-joined line per record; every value degrades to a
string on round-trip (ints re-cast at use sites, bin/main.py:215,219,255).
This codec reproduces those semantics distributed:

- ``serialize_report`` writes sorted-column ``%%`` text via a single
  ``concat_ws`` projection (no UDF); the header lives in a ``_header``
  sidecar so part files stay order-independent at any partition count.
- ``slurp_report`` reads it back as all-string columns (the documented
  stringly degradation). ``recast`` applies a target schema for engines
  that want types back.

At 100 TB one would checkpoint Parquet instead (types survive, pushdown
works) — ``checkpoint_parquet`` is that path; the text codec exists for
reference parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEP = "%%"


def serialize_report(df: DataFrame, path: str) -> list[str]:
    """Write ``df`` as a ``%%``-report directory at ``path``. Columns are
    sorted by name (bin/main.py:113-115); nulls render empty. Returns the
    sorted column list (the written header)."""
    cols = sorted(df.columns)
    line = F.concat_ws(SEP, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols])
    df.select(line.alias("value")).write.mode("overwrite").text(path)
    # header sidecar (driver-side, tiny); the reference put it inline at the
    # top of its single file — a sidecar keeps distributed parts symmetric
    with open(os.path.join(path, "_header"), "w", encoding="utf-8") as fh:
        fh.write(SEP.join(cols))
    return cols


def slurp_report(spark: SparkSession, path: str) -> DataFrame:
    """Read a ``%%``-report back. All columns are strings; empty → null
    (matching the reference's ``None``-init attributes)."""
    with open(os.path.join(path, "_header"), encoding="utf-8") as fh:
        cols = fh.read().strip().split(SEP)
    raw = spark.read.text(path)
    parts = F.split("value", SEP)
    return raw.select(
        *[
            F.nullif(parts.getItem(i), F.lit("")).alias(c)
            for i, c in enumerate(cols)
        ]
    )


def recast(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Re-apply types after a stringly round-trip (the ``int(...)`` re-casts
    scattered through the reference, bin/main.py:215,219,255 — centralized)."""
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def checkpoint_parquet(df: DataFrame, path: str) -> DataFrame:
    """T3 — stage checkpoint: materialize and re-read so downstream stages
    restart from disk, the engine's version of serialize→clear→slurp
    (bin/main.py:655-708)."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
