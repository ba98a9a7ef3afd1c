"""Mirror of the driver's correctness gate: run every registered query in
Spark AND its DuckDB oracle SQL on the same parquet tables, compare
row-count, schema width, and an order-insensitive value multiset.

Runs at sf0.001 for speed (the driver runs sf0.01).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from pulfa_sausage_factory_spark.io import TABLE_NAMES
from pulfa_sausage_factory_spark.queries import QUERIES

ORACLED = sorted(name for name, (_, sql) in QUERIES.items() if sql is not None)
ROWS_ONLY = sorted(name for name, (_, sql) in QUERIES.items() if sql is None)


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style stabilization: repr of float is exact round-trip
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, name):
    fn, sql = QUERIES[name]
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sm = _multiset(spark_rows, spark_cols)
    dm = _multiset(duck_rows, duck_cols)
    if sm != dm:
        diff = [(a, b) for a, b in zip(sm, dm) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_types_driver_hashable(sf_dir, name):
    """The driver hashes oracle results through pandas, where DuckDB
    HUGEINT (SUM of BIGINT, plain or windowed) and DECIMAL columns
    materialize as float64/object while Spark emits int64/double —
    splitting the value hash even when every value matches (the round-2
    x5_json_props / t_sessionize regression).  DESCRIBE every oracle and
    reject any column type pandas can't round-trip losslessly; fix sites
    wrap the aggregate as CAST(SUM(...) AS BIGINT)."""
    _, sql = QUERIES[name]
    con = _duck(sf_dir)
    rows = con.execute("DESCRIBE " + sql).fetchall()
    bad = [
        (r[0], r[1])
        for r in rows
        if r[1] in ("HUGEINT", "UHUGEINT") or r[1].startswith("DECIMAL")
    ]
    assert not bad, f"{name}: driver-unhashable oracle column types {bad}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    fn, _ = QUERIES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_all_query_outputs_are_driver_hashable(spark, sf_dir):
    """The driver's canonicalizer hashes scalar cells only — a registered
    query returning array/map/struct columns crashes its pandas sort
    (unhashable type). Schema-resolve every registration and reject
    non-scalar output columns (serialize arrays to fixed-precision CSV,
    as x6_multimodal_meta does for its feature vector)."""
    from pyspark.sql import types as T

    bad = []
    for name, (fn, _) in QUERIES.items():
        for field in fn(spark, sf_dir).schema.fields:
            if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append((name, field.name, field.dataType.simpleString()))
    assert not bad, f"non-scalar driver-facing columns: {bad}"


def test_registry_fits_driver_check_window(spark):
    """The correctness gate checks exactly the FIRST 50 registrations (both
    round-1 and round-2 CORRECTNESS files have precisely 50 rows tracking
    registration order). Every registration must fit that window or it
    ships with zero driver evidence."""
    assert len(QUERIES) <= 50, (
        f"{len(QUERIES)} registrations exceed the driver's 50-row check "
        "window — consolidate (merge overlapping queries) instead of "
        "letting registrations fall off the gate"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_registry_consistency():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25


def test_approx_sketches_within_tolerance(spark, sf_dir):
    """x7_approx_profile is rows-only for the driver (sketch values are
    implementation-specific) — but the sketches must still be NEAR the
    exact answers: HLL++ distinct within 5%, quantiles inside the value
    range and ordered."""
    from pulfa_sausage_factory_spark.io import load_table
    from pulfa_sausage_factory_spark.operators import events as ev_ops
    import pyspark.sql.functions as F

    ev = load_table(spark, sf_dir, "events")
    approx = {r.event_type: r for r in ev_ops.approx_profile(ev).collect()}
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.n_users) <= max(1, 0.05 * e.n_users), et
        q50, q95, q99 = a.value_quantiles
        assert e.lo <= q50 <= q95 <= q99 <= e.hi, et


def test_portable_kmv_sketch_within_tolerance(spark, sf_dir):
    """The oracle-checked portable sketches must still be good ESTIMATES:
    KMV distinct within 25% of exact (k=64 -> ~1/sqrt(62) ~ 13% expected
    error), sampled quantiles inside the true value range and ordered."""
    from pulfa_sausage_factory_spark.io import load_table
    from pulfa_sausage_factory_spark.operators import events as ev_ops
    import pyspark.sql.functions as F

    ev = load_table(spark, sf_dir, "events")
    got = {r.event_type: r for r in ev_ops.approx_profile_portable(ev).collect()}
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for t, r in got.items():
        e = exact[t]
        assert abs(r.est_users - e.n_users) <= 0.25 * e.n_users, (
            t, r.est_users, e.n_users,
        )
        assert e.lo <= r.p50 <= r.p95 <= r.p99 <= e.hi
        assert r.n_sampled > 0
