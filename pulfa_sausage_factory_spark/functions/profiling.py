"""Single-pass table/corpus profiling (extension surface — the C3
run-report diagnostics generalized to ANY table: the "what did I just
ingest" question every pipeline stage asks before trusting its input).

Scale design: the ENTIRE profile is ONE aggregation job — every statistic
(null counts, distinct sketches, numeric min/max/mean, quantile sketches,
string length bounds) is an expression in a single ``df.agg(...)``, so the
table is scanned once and the shuffle carries one partial-aggregate row
per partition regardless of table size. Distinct counts and quantiles are
mergeable sketches (HLL++ / GK) by default — the approximate-but-one-pass
trade a 100 TB profile requires; ``exact=True`` swaps in exact distinct
counts (one extra shuffle per column — test scales only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: numeric types that get min/max/mean/quantiles
_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    exact: bool = False,
    rsd: float = 0.05,
) -> dict:
    """Profile every column in one scan. Returns::

        {"rows": n,
         "columns": {col: {"type": ..., "nulls": n, "distinct": ~n,
                           # numeric columns additionally:
                           "min": ..., "max": ..., "mean": ...,
                           "quantiles": {q: v},
                           # string columns additionally:
                           "min_len": ..., "max_len": ..., "avg_len": ...}}}

    Array/map/struct/binary columns get rows/nulls only (their contents
    are domain-specific — the multimodal/text operators profile those).
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    per_col: dict[str, list[str]] = {}

    def add(col: str, name: str, expr) -> None:
        key = f"{col}__{name}"
        aggs.append(expr.alias(key))
        per_col.setdefault(col, []).append(name)

    for f in df.schema.fields:
        c = F.col(f.name)
        add(f.name, "nulls", F.sum(F.when(c.isNull(), 1).otherwise(0)))
        simple = isinstance(
            f.dataType, (*_NUMERIC, T.StringType, T.BooleanType,
                         T.DateType, T.TimestampType, T.TimestampNTZType)
        )
        if simple:
            add(
                f.name, "distinct",
                F.count_distinct(c) if exact else F.approx_count_distinct(c, rsd),
            )
        if isinstance(f.dataType, _NUMERIC):
            add(f.name, "min", F.min(c))
            add(f.name, "max", F.max(c))
            add(f.name, "mean", F.avg(c))
            if quantiles:
                add(
                    f.name, "quantiles",
                    F.percentile_approx(
                        c, F.array(*[F.lit(q) for q in quantiles]), 10_000
                    ),
                )
        elif isinstance(f.dataType, T.StringType):
            add(f.name, "min_len", F.min(F.length(c)))
            add(f.name, "max_len", F.max(F.length(c)))
            add(f.name, "avg_len", F.avg(F.length(c)))

    row = df.agg(*aggs).collect()[0].asDict()
    out: dict = {"rows": row["__rows"], "columns": {}}
    for f in df.schema.fields:
        stats: dict = {"type": f.dataType.simpleString()}
        for name in per_col.get(f.name, []):
            v = row[f"{f.name}__{name}"]
            if name == "quantiles":
                v = dict(zip(quantiles, list(v) if v is not None else []))
            stats[name] = v
        out["columns"][f.name] = stats
    return out
