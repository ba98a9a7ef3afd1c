"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline at sf0.001 (smoke).
``queries()`` — one entry per implemented operator from SURVEY.md §2
(registry lives in ``pulfa_sausage_factory_spark/queries.py``).
``oracle_sql()`` — matching DuckDB ANSI SQL for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pulfa_sausage_factory_spark import queries as _registry  # noqa: E402
from pulfa_sausage_factory_spark.io import load_table  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 M0): the reference's dao-selection
    pipeline transposed onto the driver tables — compound predicate with a
    following-sibling existential window (F1/W5), preceding-sibling ordinal
    (W2), group-collect document assembly (A1), and a broadcast-dimension
    join (J1) — scan→filter→window→agg→join through Catalyst.
    """
    from pyspark.sql import functions as F

    from pulfa_sausage_factory_spark.operators import relational

    sf_dir = "/root/testdata/sf0.001"
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    w = relational.sibling_window("l_orderkey", order_col="l_linenumber")
    candidates = (
        li.withColumn(
            "has_r_after", relational.has_following(w, F.col("l_returnflag") == "R")
        )
        .filter((F.col("l_returnflag") == "N") & ~F.col("has_r_after"))
        .withColumn("pdf_idx", relational.ordinal(w, zero_based=True))
    )
    pages = relational.group_collect(
        candidates.withColumn(
            "_m", F.format_string("%08d:%d", "pdf_idx", "l_partkey")
        ),
        ["l_orderkey"],
        F.col("_m"),
    )
    return (
        pages.join(orders, pages.l_orderkey == orders.o_orderkey)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.size("members").alias("n_pages"),
            F.array_join("members", "|").alias("members"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return _registry.all_oracle_sql()
