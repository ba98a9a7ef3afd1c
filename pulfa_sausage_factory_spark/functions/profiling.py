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


def compare_profiles(
    spark,
    ref: dict,
    cur: dict,
    rel_tol: float = 0.10,
    null_frac_tol: float = 0.05,
) -> DataFrame:
    """Drift report between two ``profile_table`` results — the
    monitoring half of the profiler: a 100 TB ingest trusts its input by
    comparing each incoming batch's profile against a REFERENCE profile
    (the corpus the gates/classifiers/index were tuned on), and "did the
    distribution move" must be answerable without re-deriving anything.
    Returns one row per (column, statistic) as a DataFrame in the report
    convention::

        column | stat | ref | cur | delta | drifted | detail

    Statistics compared SCALE-FREE wherever the raw profile values are
    volume-dependent, so a 10× bigger batch does not read as drift:
    ``null_frac`` (nulls/rows — absolute delta vs ``null_frac_tol``) and
    ``distinct`` (volume-gated: at comparable row counts, the minimum
    of the absolute-count and distinct/rows-ratio relative deltas; when
    the row counts differ by more than ~2×, distinct grows sublinearly
    in sample size for heavy-tailed columns and the only volume-free
    test left is vocabulary-expansion monotonicity — the smaller sample
    holding more distinct values than the larger one saw; see the
    inline comment). Value-space statistics (``mean``, ``min``, ``max``,
    each quantile, string length stats) compare on relative delta
    ``|cur − ref| / max(|ref|, |cur|)`` vs ``rel_tol`` — quantile
    movement is the distribution-shape proxy available from a one-pass
    profile (no histograms are retained; a PSI-grade test would need
    binned counts the profiler deliberately does not carry at scale).
    ``rows`` is reported for context, never flagged (batch sizes vary
    by cadence, not by drift). Schema changes are findings, not errors:
    a column only in ``ref`` reports ``presence/removed``, only in
    ``cur`` ``presence/added``, and a type change ``type`` — all three
    drift by definition.

    Both inputs are plain profile dicts (driver-sized), so the compare
    itself costs nothing — the expensive part was the two one-pass
    ``profile_table`` scans that produced them. Hot paths that only want
    the drifted rows (the ingest hook) call ``compare_profile_rows``
    directly — same tuples, no Spark job for a driver-sized list."""
    return spark.createDataFrame(
        compare_profile_rows(ref, cur, rel_tol, null_frac_tol),
        "column string, stat string, ref double, cur double, "
        "delta double, drifted boolean, detail string",
    )


def compare_profile_rows(
    ref: dict,
    cur: dict,
    rel_tol: float = 0.10,
    null_frac_tol: float = 0.05,
) -> list[tuple]:
    """Driver-side core of :func:`compare_profiles`: the same
    ``(column, stat, ref, cur, delta, drifted, detail)`` tuples as a
    plain list — everything here is dict arithmetic over two
    driver-sized profiles, so callers that immediately filter/collect
    (the per-batch ingest monitor) skip the DataFrame round-trip."""
    rows: list[tuple] = []
    eps = 1e-12

    def rel(a: float, b: float) -> float:
        d = max(abs(a), abs(b))
        return 0.0 if d <= eps else abs(b - a) / d

    def emit(col, stat, r, c, delta, drifted, detail=""):
        rows.append((
            col, stat,
            float(r) if r is not None else None,
            float(c) if c is not None else None,
            float(delta) if delta is not None else None,
            bool(drifted), detail,
        ))

    n_ref = max(int(ref.get("rows", 0)), 0)
    n_cur = max(int(cur.get("rows", 0)), 0)
    emit(None, "rows", n_ref, n_cur, rel(n_ref, n_cur), False,
         "context only — batch sizes vary by cadence, not drift")

    rcols, ccols = ref.get("columns", {}), cur.get("columns", {})
    for col in sorted(set(rcols) | set(ccols)):
        r, c = rcols.get(col), ccols.get(col)
        if r is None or c is None:
            emit(col, "presence", None, None, None, True,
                 "added" if r is None else "removed")
            continue
        if r.get("type") != c.get("type"):
            emit(col, "type", None, None, None, True,
                 f"{r.get('type')} -> {c.get('type')}")
            continue

        def frac(stats, key, n):
            v = stats.get(key)
            return None if v is None or n == 0 else v / n

        pairs: list[tuple[str, float | None, float | None, bool]] = []
        rf, cf = frac(r, "nulls", n_ref), frac(c, "nulls", n_cur)
        if rf is not None and cf is not None:
            pairs.append(("null_frac", rf, cf, True))
        # distinct is regime-dependent — neither interpretation is
        # scale-free for every column: a bounded CATEGORICAL vocabulary
        # keeps its absolute distinct count under volume change (the
        # ratio moves), a KEY-like column keeps its distinct/rows ratio
        # (the absolute count moves) — and a heavy-tailed MID-cardinality
        # column (a Zipf "domain" column) keeps NEITHER: distinct grows
        # sublinearly in sample size (species accumulation), so a 100×
        # smaller batch from the same distribution moves both the count
        # and the ratio, and min(vocab Δ, ratio Δ) would flag pure
        # volume change forever (review-found). So the test is
        # volume-gated:
        # - rows within ~2× of each other → min(vocab Δ, ratio Δ): at
        #   comparable volumes each regime's invariant approximately
        #   holds, so the minimum is a usable drift signal for any
        #   column;
        # - rows differ by more → the ONLY volume-free statement left is
        #   accumulation monotonicity: the smaller sample cannot hold
        #   MORE vocabulary than the larger one saw. Drift iff
        #   distinct(smaller) > distinct(larger)·(1+tol) — unambiguous
        #   new values; contraction/ratio movement is uninformative in
        #   this regime and is reported un-flagged with the reason.
        # (Sketched distinct counts carry the profiler's rsd (~5%), and
        # HLL error at SMALL cardinalities can exceed it — build the
        # reference profile with exact=True; it is built once.)
        rd, cd = r.get("distinct"), c.get("distinct")
        if rd is not None and cd is not None and n_ref and n_cur:
            if rel(float(n_ref), float(n_cur)) <= 0.5:
                d = min(rel(float(rd), float(cd)),
                        rel(rd / n_ref, cd / n_cur))
                hit = d > rel_tol
                emit(col, "distinct", float(rd), float(cd), d, hit,
                     ("min(vocab Δ, ratio Δ) "
                      + (f"{d:.4f} > {rel_tol}" if hit else
                         "(comparable volumes)")))
            else:
                small_d, large_d = (
                    (float(cd), float(rd)) if n_cur <= n_ref
                    else (float(rd), float(cd))
                )
                d = max(0.0, small_d / max(large_d, 1.0) - 1.0)
                hit = d > rel_tol
                emit(col, "distinct", float(rd), float(cd), d, hit,
                     (f"vocabulary expansion {d:.4f} > {rel_tol} "
                      "(smaller sample exceeds larger's vocabulary)"
                      if hit else
                      "volume-mismatched rows: sublinear species "
                      "accumulation — expansion-only check"))
        for key in ("min", "max", "mean", "min_len", "max_len", "avg_len"):
            if r.get(key) is not None and c.get(key) is not None:
                pairs.append((key, float(r[key]), float(c[key]), False))
        # canonicalize quantile keys to float: a reference profile that
        # was json.dump/json.load round-tripped (the obvious way to
        # persist it across driver restarts) comes back with STRING keys
        # ('0.25'), and a raw set intersection against the fresh
        # profile's float keys would silently emit zero q* rows — the
        # shape proxy disabled with no error anywhere
        rq = {float(k): v for k, v in (r.get("quantiles") or {}).items()}
        cq = {float(k): v for k, v in (c.get("quantiles") or {}).items()}
        for q in sorted(set(rq) & set(cq)):
            if rq[q] is not None and cq[q] is not None:
                pairs.append((f"q{q}", float(rq[q]), float(cq[q]), False))

        for stat, rv, cv, absolute in pairs:
            if absolute:
                delta = abs(cv - rv)
                hit = delta > null_frac_tol
                why = (f"|Δ| {delta:.4f} > {null_frac_tol}" if hit else "")
            else:
                delta = rel(rv, cv)
                hit = delta > rel_tol
                why = (f"rel |Δ| {delta:.4f} > {rel_tol}" if hit else "")
            emit(col, stat, rv, cv, delta, hit, why)

    return rows
