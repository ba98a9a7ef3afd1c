"""Single-pass table profiler: every statistic checked against
straightforward per-column queries on the driver fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.functions.profiling import profile_table
from pulfa_sausage_factory_spark.io import load_table


def test_profile_matches_direct_queries(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag", "l_linestatus"
    )
    p = profile_table(li, exact=True)
    n = li.count()
    assert p["rows"] == n
    cols = p["columns"]
    assert set(cols) == {"l_orderkey", "l_quantity", "l_returnflag", "l_linestatus"}

    direct = li.agg(
        F.count_distinct("l_orderkey").alias("dk"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
        F.avg("l_quantity").alias("av"),
        F.min(F.length("l_linestatus")).alias("lmin"),
        F.max(F.length("l_linestatus")).alias("lmax"),
    ).collect()[0]
    assert cols["l_orderkey"]["distinct"] == direct.dk
    assert cols["l_orderkey"]["nulls"] == 0
    assert cols["l_quantity"]["min"] == direct.mn
    assert cols["l_quantity"]["max"] == direct.mx
    assert cols["l_quantity"]["mean"] == pytest.approx(direct.av)
    assert cols["l_linestatus"]["min_len"] == direct.lmin
    assert cols["l_linestatus"]["max_len"] == direct.lmax
    q = cols["l_quantity"]["quantiles"]
    assert set(q) == {0.25, 0.5, 0.75} and q[0.25] <= q[0.5] <= q[0.75]
    # returnflag has 3 values in TPC-H data
    assert cols["l_returnflag"]["distinct"] == 3


def test_profile_single_job_and_sketch_mode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # sketch mode: distinct estimate within rsd of exact
    approx = profile_table(docs, exact=False)
    exact = profile_table(docs, exact=True)
    a = approx["columns"]["doc_id"]["distinct"]
    e = exact["columns"]["doc_id"]["distinct"]
    assert abs(a - e) <= max(3, 0.15 * e)
    # nulls + complex columns: embeddings' array column gets nulls only
    emb = load_table(spark, sf_dir, "embeddings")
    pe = profile_table(emb)
    assert "distinct" not in pe["columns"]["embedding"]
    assert pe["columns"]["embedding"]["nulls"] == 0
    # nulls counted correctly
    with_nulls = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id long, s string"
    )
    pn = profile_table(with_nulls, exact=True)
    assert pn["columns"]["s"]["nulls"] == 2
    assert pn["columns"]["s"]["distinct"] == 1
