"""Bucketed twins of the headline fact-fact join queries (q3/q5/q10).

The plain registrations (``queries.py``) shuffle ``orders ⨝ lineitem`` on
every run — the dominant cost at scale (at 100 TB that shuffle IS the
query). The cure the engine ships (``sinks/bucketed.py``) pays the shuffle
ONCE at ingest: both fact tables are written bucketed by orderkey, and
every subsequent orderkey join is a zipped per-bucket sort-merge with no
Exchange on either side. These twins run the exact q3/q5/q10 workloads
through that path so the benefit is measurable round-over-round (bench
``extra_queries``) and the plans are assertable (tests):

- fact⨝fact (lineitem⨝orders) — ZERO Exchange (bucket-co-located);
- dimension joins — broadcast (customer/supplier/nation/region);
- q3's aggregation groups by ``l_orderkey`` + order columns, whose
  clustering is satisfied by the bucket partitioning → the WHOLE q3 plan
  is Exchange-free (TakeOrderedAndProject handles the top-k);
- q5/q10 re-aggregate on non-bucket keys (n_name / c_custkey), so exactly
  ONE Exchange remains — the unavoidable final re-key.

Results are bit-identical to the plain registrations (pinned by
``tests/test_shuffle_engineering.py``); the DuckDB oracles for
q3/q5/q10 therefore cover these twins transitively.

The join order differs from the plain twins on purpose: the co-located
fact⨝fact join goes FIRST, dims broadcast onto its output — joining
customer⨝orders first (the plain q3/q10 shape) would destroy the bucket
partitioning before lineitem arrives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table, tiny_df
from .sinks import bucketed

#: managed-table names for the bucketed fact twins (+ a one-row marker
#: table recording what they were built from, for idempotent re-use)
ORDERS_TABLE = "bq_orders"
LINEITEM_TABLE = "bq_lineitem"
MARKER_TABLE = "bq_facts_meta"


def ensure_bucketed_facts(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 8,
    force: bool = False,
) -> bool:
    """Materialize ``orders``/``lineitem`` from ``sf_dir`` as managed
    tables bucketed (and sort-bucketed) by orderkey — the one-time ingest
    cost the twins amortize. Idempotent: skipped when both tables already
    exist for the same ``(sf_dir, n_buckets)`` (recorded in a one-row
    marker table, written LAST so a half-finished build is retried),
    unless ``force``. Returns True when a (re)write happened."""
    marker = f"{sf_dir}|{n_buckets}"
    if not force and _current_marker(spark) == marker:
        return False
    # invalidate FIRST: a crash mid-rebuild must leave "no marker" (next
    # call rebuilds), never a stale marker alongside half-rewritten tables
    # (a later call with the stale marker's sf_dir would skip the rebuild
    # and read the other dataset's rows)
    spark.sql(f"DROP TABLE IF EXISTS default.{MARKER_TABLE}")
    # clear ORPHANED table data: the session catalog is in-memory, so a
    # killed prior run leaves bq_* FILES under the warehouse dir with no
    # catalog entry — saveAsTable then refuses to create a managed table
    # over the non-empty location (even mode=overwrite) and the twins
    # would error forever. DROP TABLE only removes cataloged tables;
    # physically delete any leftover dirs too.
    _clear_orphan_dirs(spark)
    # resolve BOTH sources on this thread first: io.load_table temporarily
    # flips a session conf around schema inference (nanosAsLong set →
    # read → restore), so two concurrent load_table calls could interleave
    # the set/restore and read the wrong value
    orders_src = load_table(spark, sf_dir, "orders")
    li_src = load_table(spark, sf_dir, "lineitem")
    # run the two table writes CONCURRENTLY (round 14, guide §2.4): each
    # write is exactly n_buckets tasks (the bucket-aligned pre-shuffle in
    # write_bucketed), so at the bench's n_buckets=8 the sequential form
    # left 24 of 32 cores idle per write. Spark supports concurrent job
    # submission from multiple driver threads; the two saveAsTable targets
    # are distinct tables. Measured interleaved A/B at sf0.1 (5 reps,
    # alternating): write pair seq min 1.415 / med 1.52 → par min 0.952 /
    # med 1.257. At cluster scale each write already saturates the
    # executors and the overlap simply pipelines scan/sort/commit phases.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(
                bucketed.write_bucketed,
                orders_src,
                f"default.{ORDERS_TABLE}",
                "o_orderkey",
                n_buckets,
                "o_orderkey",
            ),
            pool.submit(
                bucketed.write_bucketed,
                li_src,
                f"default.{LINEITEM_TABLE}",
                "l_orderkey",
                n_buckets,
                "l_orderkey",
            ),
        ]
        for f in futs:
            f.result()  # re-raise either write's failure
    # one-slice tiny frame (round 14): the old createDataFrame(...)
    # .coalesce(1) made ONE task drain 32 python-worker partitions
    # serially — measured 5.4-7.0 s for this one-row marker write, the
    # dominant cost of every force rebuild (io.tiny_df docstring)
    tiny_df(spark, [(marker,)], "marker string").write.mode(
        "overwrite"
    ).saveAsTable(f"default.{MARKER_TABLE}")
    return True


def _current_marker(spark: SparkSession) -> str | None:
    try:
        spark.table(f"default.{ORDERS_TABLE}")  # all three must exist
        spark.table(f"default.{LINEITEM_TABLE}")
        row = spark.table(f"default.{MARKER_TABLE}").limit(1).collect()
        return row[0][0] if row else None
    except Exception:
        return None


def drop_bucketed_facts(spark: SparkSession) -> None:
    for t in (ORDERS_TABLE, LINEITEM_TABLE, MARKER_TABLE):
        spark.sql(f"DROP TABLE IF EXISTS default.{t}")
    _clear_orphan_dirs(spark)


def _clear_orphan_dirs(
    spark: SparkSession, tables: tuple[str, ...] | None = None
) -> None:
    """Delete leftover managed-table data dirs that survived a killed run
    (present on disk, absent from the in-memory catalog — DROP TABLE
    can't reach them). Only runs for tables the catalog does NOT know, so
    a healthy managed table is never deleted out from under the catalog.
    Defaults to the bench bq_* tables; ``stress.py`` reuses it for its
    ``bqs_*`` tables.

    TEMPORARY views are excluded from the existence check (round-6 ADVICE
    fix): ``listTables`` returns temp views too, and a user temp view
    named ``bq_orders`` would otherwise mask a real orphan dir — leaving
    ``saveAsTable`` to fail forever on the non-empty location."""
    from . import fsutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    # list the `default` database EXPLICITLY: every bq_* read/write above
    # is default-qualified, so consulting the session's current database
    # (which a caller may have switched) would mask orphans behind
    # same-named tables elsewhere — or worse, delete healthy default.bq_*
    # data that the current database simply doesn't list
    existing = {
        t.name
        for t in spark.catalog.listTables("default")
        if (t.tableType or "").upper() != "TEMPORARY"
    }
    for t in tables or (ORDERS_TABLE, LINEITEM_TABLE, MARKER_TABLE):
        if t not in existing:
            fsutil.delete(spark, warehouse.rstrip("/") + "/" + t)


def _facts(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    # database-qualified: a bare name resolves temp views FIRST, so a user
    # temp view called bq_orders would silently shadow the bucketed table
    # (and its bucket metadata) for every twin
    return (
        spark.table(f"default.{ORDERS_TABLE}"),
        spark.table(f"default.{LINEITEM_TABLE}"),
    )


def _disc_price() -> "F.Column":
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")


def q3_over(orders: DataFrame, li: DataFrame, cust: DataFrame) -> DataFrame:
    """The q3 workload body over caller-supplied fact frames — shared by
    the bucketed twin and the stress harness, so plain-vs-bucketed
    comparisons run the IDENTICAL plan shape and differ only in how the
    facts were stored (co-located bucketed scan vs shuffled exchange)."""
    orders = orders.filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = li.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    cust = cust.filter(F.col("c_mktsegment") == "BUILDING")
    rev = (
        li.hint("merge")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("revenue"))
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


def q5_over(
    orders: DataFrame,
    li: DataFrame,
    c: DataFrame,
    s: DataFrame,
    n: DataFrame,
    r: DataFrame,
) -> DataFrame:
    """q5 workload body over caller-supplied frames (see ``q3_over``)."""
    return (
        li.hint("merge")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("revenue"))
    )


def q10_over(orders: DataFrame, li: DataFrame, cust: DataFrame) -> DataFrame:
    """q10 workload body over caller-supplied frames (see ``q3_over``)."""
    li = li.filter(F.col("l_returnflag") == "R")
    rev = (
        li.hint("merge")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("revenue"))
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "c_mktsegment")
    )


def q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3_top_revenue over the bucketed facts — a fully Exchange-free plan:
    co-located fact join, broadcast customer, aggregation clustered by the
    bucket key, TakeOrderedAndProject top-k."""
    orders, li = _facts(spark)
    return q3_over(orders, li, load_table(spark, sf_dir, "customer"))


def q5_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5_local_supplier_volume over the bucketed facts: the
    customer⨝orders⨝lineitem chain becomes co-located fact join +
    broadcast dims; only the final ``n_name`` re-key shuffles (1
    Exchange)."""
    orders, li = _facts(spark)
    return q5_over(
        orders,
        li,
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q10_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10_returned_items over the bucketed facts: co-located fact join +
    broadcast customer; the per-customer re-aggregation is the single
    remaining Exchange."""
    orders, li = _facts(spark)
    return q10_over(orders, li, load_table(spark, sf_dir, "customer"))
