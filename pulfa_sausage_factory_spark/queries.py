"""Query registry — the driver contract surface (SURVEY.md §2 inventory).

Each entry: name → (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None).
Oracle SQL is DuckDB-runnable ANSI SQL over the same parquet tables. Column
names/aliases match exactly (the driver sorts columns by name before value
hashing).

Float-determinism policy: any multi-row float aggregation goes through
``dsum`` — cast to decimal (exact, order-independent sum) then cast the final
value back to double. Per-row double arithmetic is IEEE-deterministic across
engines as long as both evaluate the same operation tree, so projections stay
double. Sequential array folds (dot products) match DuckDB's ``list_sum``
order and are rounded to 6 decimals in both engines as a safety margin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.functions import lm, sampling, scalars, skew, text
from pulfa_sausage_factory_spark.io import load_table
from pulfa_sausage_factory_spark.operators import (
    asof,
    dedup,
    events,
    multimodal,
    rangejoin,
    relational,
    similarity,
)

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def dsum(col, scale: int = 4):
    """Decimal-exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# F1/W5 — compound predicate + following-sibling existential window
# (reference: dao candidate filter, bin/main.py:133-140)
# ---------------------------------------------------------------------------
@register(
    "f1_window_existential",
    """
    WITH flagged AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             COALESCE(MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS has_r_after
      FROM lineitem)
    SELECT l_orderkey, l_linenumber
    FROM flagged
    WHERE l_returnflag = 'N' AND has_r_after = 0
    """,
)
def f1_window_existential(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is non-unique in the driver data; the extra
    # columns make the sibling order total → deterministic across engines
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    return (
        li.withColumn(
            "has_r_after", relational.has_following(w, F.col("l_returnflag") == "R")
        )
        .filter((F.col("l_returnflag") == "N") & ~F.col("has_r_after"))
        .select("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# W2+W3/A4 — preceding-sibling ordinal (pdf_idx, bin/main.py:161-165) and
# offset renumbering after the existing-count (bin/pulfarize.rb:59-77), both
# derived from one row_number assignment (merged registration, round 3)
# ---------------------------------------------------------------------------
@register(
    "w23_sibling_renumber",
    """
    WITH existing AS (
      SELECT l_orderkey, COUNT(*) AS n FROM lineitem
      WHERE l_linestatus = 'F' GROUP BY l_orderkey)
    SELECT w.l_orderkey, w.l_linenumber,
           ROW_NUMBER() OVER (PARTITION BY w.l_orderkey ORDER BY w.l_linenumber)
             - 1 AS pdf_idx,
           ROW_NUMBER() OVER (PARTITION BY w.l_orderkey ORDER BY w.l_linenumber)
             + COALESCE(e.n, 0) AS new_number
    FROM lineitem w LEFT JOIN existing e ON w.l_orderkey = e.l_orderkey
    WHERE w.l_linestatus = 'O'
    """,
)
def w23_sibling_renumber(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    work = li.filter(F.col("l_linestatus") == "O")
    existing = li.filter(F.col("l_linestatus") == "F")
    return relational.offset_renumber(
        work, existing, ["l_orderkey"], "l_linenumber", ordinal_col="pdf_idx"
    ).select("l_orderkey", "l_linenumber", "pdf_idx", "new_number")


# ---------------------------------------------------------------------------
# W1/P5 — page numbering with %08d names (bin/main.py:268-281)
# ---------------------------------------------------------------------------
@register(
    "w1_page_numbering",
    """
    SELECT l_orderkey, l_linenumber,
           printf('%08d', ROW_NUMBER() OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber)) AS page_label
    FROM lineitem
    """,
)
def w1_page_numbering(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    w = relational.sibling_window("l_orderkey", order_col="l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        scalars.zero_pad8(relational.ordinal(w)).alias("page_label"),
    )


# ---------------------------------------------------------------------------
# A1 — group-collect with deterministic member order (bin/dao.py:173-189)
# ---------------------------------------------------------------------------
@register(
    "a1_group_collect",
    """
    SELECT l_orderkey,
           COUNT(*) AS n_members,
           STRING_AGG(printf('%03d:%d', l_linenumber, l_partkey), '|'
                      ORDER BY printf('%03d:%d', l_linenumber, l_partkey)) AS members
    FROM lineitem GROUP BY l_orderkey
    """,
)
def a1_group_collect(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    member = F.format_string("%03d:%d", "l_linenumber", "l_partkey")
    grouped = relational.group_collect(
        li.withColumn("_m", member), ["l_orderkey"], F.col("_m")
    )
    return grouped.select(
        "l_orderkey",
        F.size("members").alias("n_members"),
        F.array_join("members", "|").alias("members"),
    )


# ---------------------------------------------------------------------------
# J1 — first-match equi-join, XPath [1] semantics (bin/main.py:491-493)
# ---------------------------------------------------------------------------
@register(
    "j1_first_match_join",
    """
    WITH first_line AS (
      SELECT * FROM (
        SELECT l_orderkey, l_partkey, l_suppkey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey,
                          l_quantity, l_extendedprice) rn
        FROM lineitem) WHERE rn = 1)
    SELECT o.o_orderkey, o.o_orderstatus, f.l_partkey, f.l_suppkey
    FROM orders o JOIN first_line f ON o.o_orderkey = f.l_orderkey
    """,
)
def j1_first_match_join(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = relational.first_match_join(
        orders,
        li.select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice",
        ),
        left_on="o_orderkey",
        right_on="l_orderkey",
        right_order=[
            "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice",
        ],
    )
    return joined.select("o_orderkey", "o_orderstatus", "l_partkey", "l_suppkey")


# ---------------------------------------------------------------------------
# J5+J6 — anti-join idempotency guard (skip-if-exists, bin/main.py:184) and
# semi-join prerequisite gate (bin/publish-mets-only.rb:65), tagged union
# (merged registration, round 3)
# ---------------------------------------------------------------------------
@register(
    "j56_semi_anti",
    """
    SELECT 'anti' AS kind, c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'semi' AS kind, c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def j56_semi_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    anti = relational.anti_join_existing(
        cust, orders.select(F.col("o_custkey").alias("c_custkey")), ["c_custkey"]
    ).select(F.lit("anti").alias("kind"), "c_custkey", "c_name")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    semi = relational.semi_join_existing(cust, urgent, ["c_custkey"]).select(
        F.lit("semi").alias("kind"), "c_custkey", "c_name"
    )
    return anti.unionByName(semi)


# ---------------------------------------------------------------------------
# J4 — master↔deliverable pairing as full-outer co-group (bin/dao.py:160-178)
# ---------------------------------------------------------------------------
@register(
    "j4_cogroup_pairing",
    """
    WITH masters AS (
      SELECT l_partkey, COUNT(*) AS n_master FROM lineitem
      WHERE l_linestatus = 'F' GROUP BY l_partkey),
    delivs AS (
      SELECT l_partkey, COUNT(*) AS n_deliverable FROM lineitem
      WHERE l_linestatus = 'O' GROUP BY l_partkey)
    SELECT COALESCE(m.l_partkey, d.l_partkey) AS l_partkey,
           COALESCE(m.n_master, 0) AS n_master,
           COALESCE(d.n_deliverable, 0) AS n_deliverable
    FROM masters m FULL JOIN delivs d ON m.l_partkey = d.l_partkey
    """,
)
def j4_cogroup_pairing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    masters = (
        li.filter(F.col("l_linestatus") == "F")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_master"))
    )
    delivs = (
        li.filter(F.col("l_linestatus") == "O")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_deliverable"))
    )
    return (
        masters.withColumnRenamed("l_partkey", "mk")
        .join(
            delivs.withColumnRenamed("l_partkey", "dk"),
            F.col("mk") == F.col("dk"),
            "full_outer",
        )
        .select(
            F.coalesce("mk", "dk").alias("l_partkey"),
            F.coalesce("n_master", F.lit(0)).alias("n_master"),
            F.coalesce("n_deliverable", F.lit(0)).alias("n_deliverable"),
        )
    )


# ---------------------------------------------------------------------------
# O2 — per-group bottom-k (bin/orient_image.sh:63-65)
# ---------------------------------------------------------------------------
@register(
    "o2_topk_per_group",
    """
    SELECT l_orderkey, l_linenumber, rk FROM (
      SELECT l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice, l_linenumber) AS rk
      FROM lineitem) WHERE rk <= 2
    """,
)
def o2_topk_per_group(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return relational.top_k_per_group(
        li, ["l_orderkey"], [F.col("l_extendedprice"), F.col("l_linenumber")], 2
    ).select("l_orderkey", "l_linenumber", "rk")


# ---------------------------------------------------------------------------
# O2+O3+A2 — the full orientation-vote pipeline shape (O3's standalone
# argmin registration was absorbed here in round 3: argmin_per_group is the
# second stage of this same pipeline)
# (bottom-2 by wc then argmin by misspellings, bin/orient_image.sh:55-78)
# ---------------------------------------------------------------------------
@register(
    "o23_orientation_vote",
    """
    WITH bottom2 AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_quantity, l_linenumber,
                                           l_extendedprice) AS rk
        FROM lineitem) WHERE rk <= 2)
    SELECT l_orderkey, l_linenumber AS winner_linenumber FROM (
      SELECT l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice, l_linenumber) AS rk
      FROM bottom2) WHERE rk = 1
    """,
)
def o23_orientation_vote(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    bottom2 = relational.top_k_per_group(
        li,
        ["l_orderkey"],
        [F.col("l_quantity"), F.col("l_linenumber"), F.col("l_extendedprice")],
        2,
    ).drop("rk")
    return relational.argmin_per_group(
        bottom2, ["l_orderkey"], [F.col("l_extendedprice"), F.col("l_linenumber")]
    ).select("l_orderkey", F.col("l_linenumber").alias("winner_linenumber"))


# ---------------------------------------------------------------------------
# F4/P10+P12 — status-code dispatch (bin/main.py:495-538) with the date
# surface (month bucketing, P12) folded into the grouping (merged
# registration, round 3)
# ---------------------------------------------------------------------------
@register(
    "f4_dispatch_dates",
    """
    SELECT CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
                              ELSE 'pending' END AS category,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_totalprice
    FROM orders GROUP BY 1, 2
    """,
)
def f4_dispatch_dates(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cat = (
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("pending")
    )
    return (
        orders.groupBy(
            cat.alias("category"),
            F.date_trunc("month", "o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# F7 — integrity all-parts gate (bin/main.py:508-517,548-552)
# ---------------------------------------------------------------------------
@register(
    "f7_integrity_check",
    """
    SELECT l_orderkey, BOOL_AND(l_discount <= 0.05) AS intact
    FROM lineitem GROUP BY l_orderkey
    """,
)
def f7_integrity_check(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = relational.integrity_check(li, ["l_orderkey"], F.col("l_discount") <= 0.05)
    return out.select("l_orderkey", "intact")


# ---------------------------------------------------------------------------
# P1-P8 — scalar expression surface in one projection (SURVEY §2.b)
# ---------------------------------------------------------------------------
@register(
    "p_scalar_surface",
    """
    SELECT p_partkey,
           TRIM(regexp_replace(p_name, '\\s+', ' ', 'g')) AS norm_name,
           concat_ws(', ', p_name, p_brand) AS title,
           replace(p_name, ' ', '/') AS id_path,
           printf('%08d', p_partkey) AS padded,
           CASE p_size % 3 WHEN 0 THEN '.pbm' WHEN 1 THEN '.pgm'
                           ELSE '.ppm' END AS ext,
           CASE p_size % 3 WHEN 0 THEN 1 WHEN 1 THEN 8 ELSE 24 END AS img_bits,
           CAST(FLOOR(p_retailprice / 100) * 100 AS INT) AS floor100,
           CASE WHEN p_size * 40 < 96 THEN 0
                ELSE CAST(FLOOR(LOG2((p_size * 40) / 96.0)) + 1 AS INT)
           END AS jp2_levels
    FROM part
    """,
)
def p_scalar_surface(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    ext = (
        F.when(F.col("p_size") % 3 == 0, ".pbm")
        .when(F.col("p_size") % 3 == 1, ".pgm")
        .otherwise(".ppm")
    )
    return part.select(
        "p_partkey",
        scalars.normalize_whitespace("p_name").alias("norm_name"),
        scalars.title_concat("p_name", "p_brand").alias("title"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("/")).alias("id_path"),
        scalars.zero_pad8("p_partkey").alias("padded"),
        ext.alias("ext"),
        scalars.ext_to_bits(ext).alias("img_bits"),
        scalars.floor_to_100("p_retailprice").alias("floor100"),
        scalars.jp2_levels(F.col("p_size") * 40).alias("jp2_levels"),
    )


# ---------------------------------------------------------------------------
# Headline aggregation — TPC-H Q1 shape (pricing summary)
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,8))), 4) AS DOUBLE)
             AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    price_dec = F.col("l_extendedprice").cast("decimal(18,4)")
    disc_price = price_dec * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
    charge = price_dec * (
        (F.lit(1.0) - F.col("l_discount")) * (F.lit(1.0) + F.col("l_tax"))
    ).cast("decimal(18,8)")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge), 4).cast("double").alias("sum_charge"),
        (dsum("l_quantity") / n).alias("avg_qty"),
        (dsum("l_extendedprice") / n).alias("avg_price"),
        (dsum("l_discount") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Join+agg+topk — TPC-H Q3 shape (shipping priority)
# ---------------------------------------------------------------------------
@register(
    "q3_top_revenue",
    """
    WITH rev AS (
      SELECT l.l_orderkey,
             CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15'
        AND l.l_shipdate > TIMESTAMP '1998-03-15'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority)
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rk
      FROM rev) WHERE rk <= 10
    """,
)
def q3_top_revenue(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(disc_price), 4).cast("double").alias("revenue"))
    )
    # Global top-k via orderBy().limit() → TakeOrderedAndProject: each
    # partition keeps a local k-heap and the driver merges k*numPartitions
    # rows, vs a row_number() window that funnels the whole aggregate set
    # through one sort task. Identical result (same total order incl. the
    # l_orderkey tiebreak); plan asserted in tests/test_plan_audit.py.
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Star-schema multi-join — TPC-H Q5 shape (broadcastable dims)
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    disc_price = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(disc_price), 4).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# X1 — exact dedup (md5 digest + first-id wins)
# ---------------------------------------------------------------------------
@register(
    "x1_exact_dedup",
    """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents) WHERE rn = 1
    """,
)
def x1_exact_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# X2 — n-gram-shingle Jaccard similarity pairs (exact, inverted-index join)
# ---------------------------------------------------------------------------
@register(
    "x2_ngram_jaccard",
    """
    WITH toks AS (
      SELECT doc_id AS id, str_split(lower(text), ' ') AS t FROM documents),
    sh AS (
      SELECT id, UNNEST(list_distinct(
        [array_to_string(t[i:i+2], ' ')
         FOR i IN range(1, greatest(len(t) - 2, 0) + 1)])) AS shingle
      FROM toks),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id)
    SELECT id_a, id_b,
           CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
    """,
)
def x2_ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2)


# X2 scale paths — MinHash LSH (banded bucket join) and SimHash hamming
# pairs via pigeonhole banding, as a tagged union (merged registration,
# round 3). Fully oracle-checked since round 4: token hashes are
# md5-derived (like exact_dedup — md5 so DuckDB can reproduce them), and
# the rest of both chains is integer-exact: the oracle replays the
# position-weighted shingle combine and the 32 affine permutations in
# HUGEINT arithmetic mod 2^64, re-bands the signatures, and re-derives
# candidates from band-tuple equality (Spark's xxhash64 bucket key is
# only a join key — pairs agree iff the band tuples agree, up to a
# negligible 64-bit hash collision). Quality properties (LSH vs exact
# Jaccard, banding vs brute-force hamming) stay pinned in
# tests/test_dedup_clusters.py / test_text_ops.py.
_MINHASH_PARAMS_SQL = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(dedup._perm_params(32, 42))
)
_POW64_SQL = ", ".join(f"({k}, {1 << k})" for k in range(64))
_SIMHASH_BANDPOW_SQL = ", ".join(f"({b}, {1 << (16 * b)})" for b in range(4))
_M64 = 1 << 64


@register(
    "x2b_hash_neardup",
    rf"""
    WITH params(i, a, b) AS (VALUES {_MINHASH_PARAMS_SQL}),
    pow(k, p) AS (VALUES {_POW64_SQL}),
    bandpow(band_no, bp) AS (VALUES {_SIMHASH_BANDPOW_SQL}),
    base AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
             FROM documents),
    tok AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
            FROM base),
    th AS (SELECT doc_id, pos,
                  CAST(('0x' || substr(md5(toks[pos]), 1, 8)) AS BIGINT) AS h
           FROM tok),
    sh0 AS (SELECT doc_id, h, lead(h, 1) OVER w AS h1, lead(h, 2) OVER w AS h2
            FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    shingle AS (
      SELECT DISTINCT doc_id,
             CAST((CAST(h AS HUGEINT) * {dedup._SHINGLE_POS_MULT[0]}
                   + CAST(h1 AS HUGEINT) * {dedup._SHINGLE_POS_MULT[1]}
                   + CAST(h2 AS HUGEINT) * {dedup._SHINGLE_POS_MULT[2]})
                  % {_M64} AS HUGEINT) AS sh
      FROM sh0 WHERE h2 IS NOT NULL),
    sig AS (
      SELECT doc_id, p.i,
             CAST(min((CAST(p.a AS HUGEINT) * sh + p.b) % {_M64}) // 2
                  AS BIGINT) AS s
      FROM shingle CROSS JOIN params p GROUP BY doc_id, p.i),
    fullsig AS (SELECT doc_id, list(s ORDER BY i) AS sig FROM sig
                GROUP BY doc_id),
    band AS (SELECT doc_id, i // 4 AS band_no, list(s ORDER BY i) AS key
             FROM sig GROUP BY doc_id, i // 4),
    mh_cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM band x JOIN band y
        ON x.band_no = y.band_no AND x.key = y.key AND x.doc_id < y.doc_id),
    mh AS (
      SELECT 'minhash' AS kind, id_a, id_b, score FROM (
        SELECT c.id_a, c.id_b,
               CAST(len(list_filter(generate_series(1, 32),
                                    k -> sa.sig[k] = sb.sig[k])) AS DOUBLE)
                 / 32.0 AS score
        FROM mh_cand c
        JOIN fullsig sa ON c.id_a = sa.doc_id
        JOIN fullsig sb ON c.id_b = sb.doc_id)
      WHERE score >= 0.2),
    stok AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        FROM documents)
      WHERE tok <> ''),
    sth AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)::HUGEINT
               * 4294967296
             + CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h
      FROM stok),
    votes AS (
      SELECT doc_id, pow.k,
             SUM(CASE WHEN (h // pow.p) % 2 = 1 THEN 1 ELSE -1 END) AS v
      FROM sth CROSS JOIN pow GROUP BY doc_id, pow.k),
    simh AS (
      SELECT v.doc_id, COALESCE(SUM(pow.p) FILTER (WHERE v.v > 0), 0) AS u
      FROM votes v JOIN pow ON v.k = pow.k GROUP BY v.doc_id),
    simh2 AS (
      SELECT doc_id, u,
             CAST(CASE WHEN u >= 9223372036854775808 THEN u - {_M64}
                       ELSE u END AS BIGINT) AS simhash
      FROM simh),
    sband AS (
      SELECT doc_id, band_no, CAST((u // bp) % 65536 AS BIGINT) AS band_bits
      FROM simh2 CROSS JOIN bandpow),
    sh_cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM sband x JOIN sband y
        ON x.band_no = y.band_no AND x.band_bits = y.band_bits
           AND x.doc_id < y.doc_id),
    shp AS (
      SELECT 'simhash' AS kind, c.id_a, c.id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS DOUBLE) AS score
      FROM sh_cand c
      JOIN simh2 a ON c.id_a = a.doc_id
      JOIN simh2 b ON c.id_b = b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
    SELECT * FROM mh UNION ALL SELECT * FROM shp
    """,
)
def x2b_hash_neardup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    mh = dedup.minhash_lsh_pairs(docs, threshold=0.2).select(
        F.lit("minhash").alias("kind"),
        "id_a",
        "id_b",
        F.col("est_jaccard").cast("double").alias("score"),
    )
    sh = dedup.simhash_neardup_pairs(docs, max_hamming=3).select(
        F.lit("simhash").alias("kind"),
        "id_a",
        "id_b",
        F.col("hamming").cast("double").alias("score"),
    )
    return mh.unionByName(sh)


# ---------------------------------------------------------------------------
# X3 — exact brute-force cosine top-k similarity search
# ---------------------------------------------------------------------------
@register(
    "x3_knn_bruteforce",
    """
    WITH vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x * x)))) AS cos
      FROM vecs c CROSS JOIN q WHERE c.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, rk, ROUND(cos, 6) AS cos FROM (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored) WHERE rk <= 10
    """,
)
def x3_knn_bruteforce(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.knn_bruteforce(emb, queries, k=10)


# X3 scale path — random-hyperplane LSH ANN with multi-probe, the recall
# knob under oracle: queries probe every bucket within hamming radius 1
# (XOR-mask expansion keeps the equi-join shape; mask 0 IS the plain
# single-probe LSH bucket, so this registration covers both paths — the
# standalone single-probe registration was absorbed in round 3). The
# hyperplanes are deterministic doubles (seeded LCG + Box-Muller), so the
# oracle inlines them as literals and reproduces bucketing + probe + top-k
# exactly with DuckDB's xor().
def _x3d_oracle(bits: int = 8) -> str:
    from pulfa_sausage_factory_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim=64, bits=bits)
    rows = ",\n      ".join(
        f"({1 << i}, [{', '.join(repr(x) for x in p)}])"
        for i, p in enumerate(planes)
    )
    masks = ", ".join(f"({m})" for m in [0] + [1 << i for i in range(bits)])
    return f"""
    WITH vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    planes(bitval, p) AS (VALUES
      {rows}),
    buckets AS (
      SELECT vec_id,
             SUM(CASE WHEN list_sum(list_transform(range(1, 65),
                        i -> v[i] * p[i])) >= 0 THEN bitval ELSE 0 END) AS bucket
      FROM vecs CROSS JOIN planes GROUP BY vec_id),
    bv AS (SELECT vecs.vec_id, vecs.v, buckets.bucket
           FROM vecs JOIN buckets USING (vec_id)),
    probes AS (
      SELECT q.vec_id, q.v, xor(q.bucket, m.mask) AS bucket
      FROM bv q CROSS JOIN (VALUES {masks}) AS m(mask)
      WHERE q.vec_id < 5),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x * x)))) AS cos
      FROM bv c JOIN probes q ON c.bucket = q.bucket
      WHERE c.vec_id <> q.vec_id)
    SELECT query_id, neighbor_id, rk, ROUND(cos, 6) AS cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rk
      FROM cand) WHERE rk <= 10
    """


@register("x3d_knn_lsh_multiprobe", _x3d_oracle())
def x3d_knn_lsh_multiprobe(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.knn_lsh(emb, queries, k=10, probe_hamming=1)


# ---------------------------------------------------------------------------
# X4 — per-document text statistics + Gopher-style repetition signals
# (duplicate-segment fraction, top-bigram count/share — the repetition
# quality filters a training-data pipeline gates on; round 3)
# ---------------------------------------------------------------------------
@register(
    "x4a_doc_stats",
    """
    WITH toks AS (
      SELECT doc_id, n_chars, text, str_split(lower(text), ' ') AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
             UNNEST([array_to_string(t[i:i+1], ' ')
                     FOR i IN range(1, greatest(len(t) - 1, 0) + 1)]) AS gram
      FROM toks),
    gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2),
    rep AS (
      SELECT doc_id, MAX(c) AS top_ngram_count,
             CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_ngram_frac
      FROM gc GROUP BY doc_id)
    SELECT toks.doc_id,
           len(t) AS n_tokens,
           n_chars,
           CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS distinct_ratio,
           md5(array_to_string(t[1:8], ' ')) AS fingerprint,
           1.0 - CAST(len(list_distinct(str_split(text, '. '))) AS DOUBLE)
                 / len(str_split(text, '. ')) AS dup_seg_frac,
           COALESCE(rep.top_ngram_count, 0) AS top_ngram_count,
           COALESCE(rep.top_ngram_frac, 0.0) AS top_ngram_frac
    FROM toks LEFT JOIN rep ON toks.doc_id = rep.doc_id
    """,
)
def x4a_doc_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = F.split(F.lower(F.col("text")), " ")
    stats = docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        "n_chars",
        (F.size(F.array_distinct(t)).cast("double") / F.size(t)).alias(
            "distinct_ratio"
        ),
        F.md5(F.array_join(F.slice(t, 1, 8), " ")).alias("fingerprint"),
        text.dup_segment_fraction("text").alias("dup_seg_frac"),
    )
    rep = text.top_ngram_stats_df(docs, "text", "doc_id", n=2)
    return stats.join(rep, "doc_id", "left").select(
        "doc_id", "n_tokens", "n_chars", "distinct_ratio", "fingerprint",
        "dup_seg_frac",
        F.coalesce("top_ngram_count", F.lit(0)).alias("top_ngram_count"),
        F.coalesce("top_ngram_frac", F.lit(0.0)).alias("top_ngram_frac"),
    )


@register(
    "x4b_corpus_stats",
    """
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang, source
    """,
)
def x4b_corpus_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("total_tokens"),
    )


@register(
    "x4c_langid",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, str_split(lower(text), ' ') AS t FROM documents),
    hits AS (
      SELECT doc_id, lang,
        len(list_filter(t, w -> list_contains({text.STOPWORDS['de']!r}, w))) AS h_de,
        len(list_filter(t, w -> list_contains({text.STOPWORDS['en']!r}, w))) AS h_en,
        len(list_filter(t, w -> list_contains({text.STOPWORDS['es']!r}, w))) AS h_es,
        len(list_filter(t, w -> list_contains({text.STOPWORDS['fr']!r}, w))) AS h_fr
      FROM toks)
    SELECT doc_id, lang,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de THEN 'en'
                WHEN h_es >= h_fr AND h_es >= h_de THEN 'es'
                WHEN h_fr >= h_de THEN 'fr'
                ELSE 'de' END AS pred_lang
    FROM hits
    """,
)
def x4c_langid(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # priority on ties: en > es > fr > de (matches the oracle's CASE order)
    prio = {"en": 4, "es": 3, "fr": 2, "de": 1}
    scored = F.array(
        *[
            F.struct(
                text.stopword_hits("text", lang).alias("hits"),
                F.lit(prio[lang]).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for lang in text.STOPWORDS
        ]
    )
    best = F.sort_array(scored, asc=False)[0]
    return docs.select(
        "doc_id",
        "lang",
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias("pred_lang"),
    )


# ---------------------------------------------------------------------------
# X5+X7+A9 — one-pass exact event profile per event_type: semi-structured
# JSON access on events.props, exact distinct users, and exact percentiles
# (merged registration, round 3 — one shuffle serves all three surfaces)
# ---------------------------------------------------------------------------
@register(
    "x5_event_profile",
    """
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95,
           MIN(value) AS lo, MAX(value) AS hi
    FROM events GROUP BY event_type
    """,
)
def x5_event_profile(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return events.event_profile(ev)


# ---------------------------------------------------------------------------
# X6 — multimodal/binary column plumbing: metadata over opaque bytes plus
# the Arrow-batched feature-extraction UDF (x6e absorbed here in round 3;
# the feature vector rides as array<double> internally and is serialized to
# fixed-precision CSV because the driver's canonicalizer hashes scalar
# cells only)
# ---------------------------------------------------------------------------
@register(
    "x6_multimodal_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS digest,
           'text/plain' AS mime,
           list_aggregate(
             list_transform(range(1, 9),
               i -> printf('%.6f',
                    round(CAST(('0x' || substr(md5(text), (i-1)*2+1, 2)) AS INTEGER)
                          / 255.0, 6))),
             'string_agg', ',') AS features
    FROM documents
    """,
)
def x6_multimodal_meta(spark, sf_dir):
    # single fused Arrow pass (featurize_with_meta): metadata and feature
    # vector from ONE decode, no re-pairing join — the unfused
    # projection-⋈-featurize shape paid a shuffle exchange on doc_id
    docs = _t(spark, sf_dir, "documents")
    blobs = docs.select(
        F.col("doc_id").alias("id"), F.encode("text", "utf-8").alias("content")
    )
    return multimodal.featurize_with_meta(blobs, dim=8).select(
        F.col("id").alias("doc_id"),
        "byte_len",
        "digest",
        F.lit("text/plain").alias("mime"),
        F.array_join(
            F.transform("features", lambda x: F.format_string("%.6f", x)), ","
        ).alias("features"),
    )


# ---------------------------------------------------------------------------
# X7 — approximate sketches. Oracle-checked since round 4 via the PORTABLE
# sketch pair (KMV k-minimum-values distinct estimation + deterministic-
# hash-sample quantiles — real mergeable approximation algorithms whose
# outputs are integer/float-exact across engines). The engine-native
# HLL++/KLL twin (events.approx_profile) stays a library op pinned by a
# tolerance-vs-exact test; the exact-distinct twin is under oracle inside
# x5_event_profile.
# ---------------------------------------------------------------------------
@register(
    "x7_approx_profile",
    f"""
    WITH kmv AS (
      SELECT event_type,
             COUNT(*) AS n_kept,
             MAX(CASE WHEN rn = 64 THEN h END) AS kth
      FROM (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM (
          SELECT DISTINCT event_type,
                 CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                      AS BIGINT) AS h
          FROM events))
      WHERE rn <= 64 GROUP BY event_type),
    est AS (
      SELECT event_type,
             CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
                  ELSE {float(63 * (1 << 60))!r} / kth END AS est_users
      FROM kmv),
    quants AS (
      SELECT event_type,
             COUNT(*) AS n_sampled,
             quantile_cont(value, 0.5) AS p50,
             quantile_cont(value, 0.95) AS p95,
             quantile_cont(value, 0.99) AS p99
      FROM events
      WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 10 = 0
      GROUP BY event_type)
    SELECT e.event_type, e.est_users, q.n_sampled, q.p50, q.p95, q.p99
    FROM est e JOIN quants q ON e.event_type = q.event_type
    """,
)
def x7_approx_profile(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return events.approx_profile_portable(ev, k=64, sample_mod=10)


# ---------------------------------------------------------------------------
# T — event-time windows, tumbling (1h) + sliding (1h size / 30m hop, every
# event in exactly 2 epoch-aligned windows) as a tagged union (merged
# registration, round 3); gap sessionization below
# ---------------------------------------------------------------------------
@register(
    "t_windows",
    """
    WITH expanded AS (
      SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
                            - k * 1800000000) AS window_start,
             event_type, value
      FROM events CROSS JOIN (VALUES (0), (1)) AS probe(k))
    SELECT 'tumbling' AS kind, date_trunc('hour', ts) AS window_start,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'sliding' AS kind, window_start, event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM expanded GROUP BY 1, 2, 3
    """,
)
def t_windows(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    tw = events.tumbling_counts(ev, "1 hour").select(
        F.lit("tumbling").alias("kind"),
        "window_start", "event_type", "n_events", "sum_value",
    )
    sw = events.sliding_counts(ev, size="1 hour", slide="30 minutes").select(
        F.lit("sliding").alias("kind"),
        "window_start", "event_type", "n_events", "sum_value",
    )
    return tw.unionByName(sw)


@register(
    "t_sessionize",
    """
    WITH gapped AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    numbered AS (
      SELECT *, CAST(SUM(is_new) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS session_no
      FROM gapped)
    SELECT user_id, session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM numbered GROUP BY user_id, session_no
    """,
)
def t_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return events.sessionize(ev, gap_minutes=30)


# ---------------------------------------------------------------------------
# S2/S3 — %%-report codec round-trip through the engine (stringly degradation
# is the documented reference semantic, bin/main.py:63-119)
# ---------------------------------------------------------------------------
@register(
    "s2_report_roundtrip",
    """
    SELECT CAST(o_custkey AS VARCHAR) AS o_custkey,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           CAST(o_orderkey AS VARCHAR) AS o_orderkey,
           o_orderpriority,
           o_orderstatus,
           CAST(o_totalprice AS VARCHAR) AS o_totalprice
    FROM orders
    """,
)
def s2_report_roundtrip(spark, sf_dir):
    import tempfile

    from pulfa_sausage_factory_spark.sources import report_codec

    orders = _t(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="pulfa_report_")
    report_codec.serialize_report(orders, path)
    return report_codec.slurp_report(spark, path)


# ---------------------------------------------------------------------------
# F5+A2+A3 — regex URL-shape predicate (bin/makepdf.rb:45-49) gating word
# count + dictionary miss count (orient_image.sh:55-74); merged
# registration, round 3 — filter feeds counts, one scan
# ---------------------------------------------------------------------------
_A3_DICT = sorted(
    {w for ws in text.STOPWORDS.values() for w in ws}
    | {"scan", "sort", "merge", "join", "order", "batch", "stream", "spark",
       "window", "table", "hash", "key", "part", "small", "fast", "dup", "the"}
)


@register(
    "a23_text_metrics",
    f"""
    SELECT doc_id, source,
           len(str_split(text, ' ')) AS wc,
           len(list_filter(str_split(lower(text), ' '),
                           w -> NOT list_contains({_A3_DICT!r}, w))) AS misspelled
    FROM documents
    WHERE regexp_matches(text, 'window (scan|merge)')
    """,
)
def a23_text_metrics(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").rlike("window (scan|merge)")
    )
    dict_arr = F.array(*[F.lit(w) for w in _A3_DICT])
    toks = F.split(F.lower(F.col("text")), " ")
    return docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("wc"),
        F.size(F.filter(toks, lambda w: ~F.array_contains(dict_arr, w))).alias(
            "misspelled"
        ),
    )


# ---------------------------------------------------------------------------
# Scan-dominant filter+agg — TPC-H Q6 shape (all predicates pushed to parquet)
# ---------------------------------------------------------------------------
@register(
    "q6_revenue_change",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                  * CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_change(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * F.col("l_discount").cast("decimal(18,4)")
                ),
                4,
            )
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Returned-item customer ranking — TPC-H Q10 shape (join + group + top-k)
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    """
    WITH rev AS (
      SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment,
             CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2, 3, 4)
    SELECT c_custkey, c_name, revenue, c_acctbal, c_mktsegment FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rk
      FROM rev) WHERE rk <= 20
    """,
)
def q10_returned_items(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    disc_price = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .agg(F.round(F.sum(disc_price), 4).cast("double").alias("revenue"))
    )
    # TakeOrderedAndProject instead of a single-partition window sort — see
    # q3_top_revenue; same total order via the c_custkey tiebreak.
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# X2 (embedding variants, merged registration round 4) — tagged union of
#  part='pair': cosine near-dup pairs inside label blocks, and
#  part='sem':  SemDeDup verdicts (operators/similarity.semdedup — first-16
#               centroids, argmax cell assignment, within-cell priority by
#               ascending centroid-sim, upper-triangular removal at the
#               cosine threshold), the whole chain replayed in SQL.
# Columns: id_a = vec_id, id_b = other id / cell id, val = cos / cent_sim,
# flag = -1 sentinel / removed(0|1).
# ---------------------------------------------------------------------------
@register(
    "x2d_embedding_neardup",
    """
    WITH vecs AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
               / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
      FROM vecs a JOIN vecs b ON a.label = b.label AND a.vec_id < b.vec_id),
    cents AS (
      SELECT vec_id AS cell_id, v AS cent FROM vecs ORDER BY vec_id LIMIT 16),
    scored AS (
      SELECT vecs.vec_id, vecs.v, cents.cell_id,
             list_sum(list_transform(range(1, 65), i -> vecs.v[i] * cents.cent[i]))
               / (sqrt(list_sum(list_transform(vecs.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(cents.cent, x -> x * x)))) AS cell_cos
      FROM vecs CROSS JOIN cents),
    ranked AS (
      SELECT vec_id, v, cell_id, cell_cos AS cent_sim,
             ROW_NUMBER() OVER (PARTITION BY cell_id
                                ORDER BY cell_cos ASC, vec_id) AS prio
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cell_cos DESC, cell_id) AS crk
        FROM scored) WHERE crk = 1),
    removed AS (
      SELECT DISTINCT b.vec_id AS id
      FROM ranked a JOIN ranked b
        ON a.cell_id = b.cell_id AND a.prio < b.prio
      WHERE list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
              / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                 * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= 0.3)
    SELECT 'pair' AS part, id_a, id_b, ROUND(cos, 6) AS val, -1 AS flag
    FROM pairs WHERE cos >= 0.25
    UNION ALL
    SELECT 'sem' AS part, r.vec_id AS id_a, r.cell_id AS id_b,
           ROUND(r.cent_sim, 6) AS val,
           CASE WHEN rm.id IS NULL THEN 0 ELSE 1 END AS flag
    FROM ranked r LEFT JOIN removed rm ON r.vec_id = rm.id
    """,
)
def x2d_embedding_neardup(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_neardup(emb, threshold=0.25, block_col="label")
    sem = similarity.semdedup(emb, n_cells=16, threshold=0.3)
    return pairs.select(
        F.lit("pair").alias("part"),
        "id_a",
        "id_b",
        F.col("cos").alias("val"),
        F.lit(-1).alias("flag"),
    ).unionByName(
        sem.select(
            F.lit("sem").alias("part"),
            F.col("id").alias("id_a"),
            F.col("cell_id").cast("long").alias("id_b"),
            F.col("cent_sim").alias("val"),
            F.col("removed").cast("int").alias("flag"),
        )
    )


# ---------------------------------------------------------------------------
# X3 (IVF variant) — inverted-file ANN, deterministic coarse centroids
# ---------------------------------------------------------------------------
@register(
    "x3c_knn_ivf",
    """
    WITH vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    cents AS (
      SELECT vec_id AS cell_id, v AS cent FROM vecs ORDER BY vec_id LIMIT 16),
    scored AS (
      SELECT vecs.vec_id, vecs.v, cents.cell_id,
             list_sum(list_transform(range(1, 65), i -> vecs.v[i] * cents.cent[i]))
               / (sqrt(list_sum(list_transform(vecs.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(cents.cent, x -> x * x)))) AS cell_cos
      FROM vecs CROSS JOIN cents),
    asg_c AS (
      SELECT vec_id AS neighbor_id, v AS cv, cell_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cell_cos DESC, cell_id) AS crk
        FROM scored) WHERE crk <= 1),
    asg_q AS (
      SELECT vec_id AS query_id, v AS qv, cell_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cell_cos DESC, cell_id) AS crk
        FROM scored WHERE vec_id < 5) WHERE crk <= 2),
    cand AS (
      SELECT q.query_id, c.neighbor_id,
             list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.cv[i]))
               / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) AS cos
      FROM asg_c c JOIN asg_q q USING (cell_id)
      WHERE c.neighbor_id <> q.query_id)
    SELECT query_id, neighbor_id, rk, ROUND(cos, 6) AS cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rk
      FROM cand) WHERE rk <= 10
    """,
)
def x3c_knn_ivf(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.knn_ivf(emb, queries, k=10, n_cells=16, n_probe=2)


# ---------------------------------------------------------------------------
# X4d+X4g — document fingerprinting: winnowing fingerprints exploded to the
# inverted-index shape, each row carrying the full-document rolling
# polynomial hash (merged registration, round 3). Round 10 widens the union
# with the overlap LEDGER's operating point (k=16, w=8, fp % 16 == 0 —
# curation_pipeline.CurationConfig.overlap_* defaults), so the exact
# sampled-fingerprint stream the cross-run substring-overlap dedup persists
# and equi-joins is hash-checked against DuckDB like every other pure
# operator (VERDICT r9 item 6). doc_fp = -1 sentinel on the ledger rows
# (nullable ints degrade to float64 in the driver's pandas hash).
# ---------------------------------------------------------------------------
@register(
    "x4d_fingerprints",
    """
    WITH codes AS (
      SELECT doc_id,
             list_transform(str_split(text, ''),
                            c -> CAST(ord(c) AS BIGINT)) AS cs
      FROM documents),
    kg AS (
      SELECT doc_id,
             [list_reduce(list_prepend(CAST(0 AS BIGINT), cs[i:i+4]),
                          (a, b) -> (a * 31 + b) % 2147483648)
              FOR i IN range(1, len(cs) - 4 + 1)] AS hs
      FROM codes WHERE len(cs) >= 8),
    wins AS (
      SELECT doc_id,
             [list_min(hs[j:j+3]) FOR j IN range(1, len(hs) - 3 + 1)] AS mins
      FROM kg),
    fps AS (SELECT doc_id, UNNEST(list_distinct(mins)) AS fp FROM wins),
    docfp AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
                         (a, b) -> (a * 31 + b) % 2147483648) AS doc_fp
      FROM codes),
    kg16 AS (
      SELECT doc_id,
             [list_reduce(list_prepend(CAST(0 AS BIGINT), cs[i:i+15]),
                          (a, b) -> (a * 31 + b) % 2147483648)
              FOR i IN range(1, len(cs) - 15 + 1)] AS hs
      FROM codes WHERE len(cs) >= 23),
    wins16 AS (
      SELECT doc_id,
             [list_min(hs[j:j+7]) FOR j IN range(1, len(hs) - 7 + 1)] AS mins
      FROM kg16),
    fps16 AS (
      SELECT doc_id, UNNEST(list_distinct(mins)) AS fp FROM wins16)
    SELECT fps.doc_id, fps.fp, docfp.doc_fp, 'k5w4' AS src
    FROM fps JOIN docfp ON fps.doc_id = docfp.doc_id
    UNION ALL
    SELECT doc_id, fp, CAST(-1 AS BIGINT) AS doc_fp, 'ledger' AS src
    FROM fps16 WHERE fp % 16 = 0
    """,
)
def x4d_fingerprints(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    fps = text.winnow_fingerprints_df(docs, "text", "doc_id", k=5, w=4)
    docfp = docs.select("doc_id", text.rolling_hash("text").alias("doc_fp"))
    part1 = fps.join(docfp, "doc_id").select(
        "doc_id", "fp", "doc_fp", F.lit("k5w4").alias("src")
    )
    # the overlap ledger's persisted stream: same call + sample filter as
    # curation_pipeline's overlap branch at the default operating point
    part2 = text.winnow_fingerprints_df(
        docs, "text", "doc_id", k=16, w=8
    ).filter(F.col("fp") % 16 == 0).select(
        "doc_id", "fp",
        F.lit(-1).cast("long").alias("doc_fp"),
        F.lit("ledger").alias("src"),
    )
    return part1.unionByName(part2)


# ---------------------------------------------------------------------------
# X6 — multimodal binary-column plumbing: a structurally-valid PNG is built
# per document JVM-side (magic + IHDR with width=n_chars, height=doc_id%240+1),
# then decoded back by the REAL pure-python header parser in mapInPandas.
# The oracle recomputes the expected metadata relationally.
# ---------------------------------------------------------------------------
def _png_content(width_col, height_col):
    import struct as _s

    be4 = lambda c: F.unhex(F.lpad(F.hex(c.cast("long")), 8, "0"))  # noqa: E731
    return F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR"),
        be4(width_col),
        be4(height_col),
        F.lit(bytes([8, 2, 0, 0, 0])),
    )


@register(
    "x6b_image_ops",
    """
    WITH dims AS (
      SELECT doc_id, n_chars AS w0, doc_id % 240 + 1 AS h0 FROM documents)
    SELECT doc_id, 'image/png' AS mime, w0 AS width, h0 AS height,
           29 AS byte_len,
           GREATEST(1, CAST(FLOOR(w0 * (256.0 / GREATEST(w0, h0)) + 0.5) AS INT))
             AS rs_width,
           GREATEST(1, CAST(FLOOR(h0 * (256.0 / GREATEST(w0, h0)) + 0.5) AS INT))
             AS rs_height
    FROM dims
    """,
)
def x6b_image_ops(spark, sf_dir):
    # decode + resize over the same binary column (x6f absorbed here in
    # round 3) via the FUSED image_ops operator: the real header parser and
    # resizer run in one Arrow pass, replacing the former
    # decode_image_meta ⋈ resize_image double decode + shuffle join
    docs = _t(spark, sf_dir, "documents")
    imgs = docs.select(
        F.col("doc_id").alias("id"),
        _png_content(F.col("n_chars"), F.col("doc_id") % 240 + 1).alias("content"),
    )
    return multimodal.image_ops(imgs, target=256).select(
        F.col("id").alias("doc_id"),
        "mime",
        "width",
        F.col("height").cast("long").alias("height"),
        F.col("byte_len").cast("int").alias("byte_len"),
        "rs_width",
        "rs_height",
    )


# X6 — media segmentation UDTFs as a tagged union (merged registration,
# round 3): video frame sampling (one row -> ceil(n/2) frame rows) and
# audio segmentation (one row -> ceil(duration/1s) segment rows). The
# deterministic fake decodes are md5-over-hex + byte-length arithmetic, so
# the oracle re-derives frame counts, rates, durations, and digests
# relationally. Frame rows carry -1 sentinels for the audio-only columns
# (NULL ints would degrade to float64 in the driver's pandas hash).
@register(
    "x6c_media_segments",
    """
    WITH base AS (
      SELECT doc_id, lower(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS blen
      FROM documents),
    vf AS (
      SELECT doc_id, hx,
             CAST(('0x' || substr(md5(hx), 1, 2)) AS INTEGER) % 8 + 1 AS n_frames
      FROM base),
    frames AS (
      SELECT doc_id, hx, unnest(range(0, n_frames, 2)) AS frame_no FROM vf),
    au AS (
      SELECT doc_id, hx,
             CASE CAST(('0x' || substr(md5(hx), 1, 2)) AS INTEGER) % 4
               WHEN 0 THEN 8000 WHEN 1 THEN 16000
               WHEN 2 THEN 22050 ELSE 44100 END AS sample_rate,
             (blen * 7) % 5000 + 1000 AS duration_ms
      FROM base),
    segs AS (
      SELECT doc_id, hx, sample_rate, duration_ms,
             unnest(range(0, (duration_ms + 999) // 1000)) AS seg_no
      FROM au)
    SELECT 'frame' AS kind, doc_id, CAST(frame_no AS INTEGER) AS seg_no,
           -1 AS start_ms, -1 AS end_ms, -1 AS sample_rate,
           md5(hx || ':' || frame_no) AS seg_digest
    FROM frames
    UNION ALL
    SELECT 'audio' AS kind, doc_id, CAST(seg_no AS INTEGER) AS seg_no,
           CAST(seg_no * 1000 AS INTEGER) AS start_ms,
           CAST(least(seg_no * 1000 + 1000, duration_ms) AS INTEGER) AS end_ms,
           sample_rate,
           md5(hx || ':a' || seg_no) AS seg_digest
    FROM segs
    """,
)
def x6c_media_segments(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"), F.encode("text", "utf-8").alias("content")
    )
    frames = multimodal.sample_frames(media, every_n=2).select(
        F.lit("frame").alias("kind"),
        F.col("id").alias("doc_id"),
        F.col("frame_no").alias("seg_no"),
        F.lit(-1).alias("start_ms"),
        F.lit(-1).alias("end_ms"),
        F.lit(-1).alias("sample_rate"),
        F.col("frame_digest").alias("seg_digest"),
    )
    segs = multimodal.segment_audio(media, window_ms=1000).select(
        F.lit("audio").alias("kind"),
        F.col("id").alias("doc_id"),
        "seg_no", "start_ms", "end_ms", "sample_rate",
        "seg_digest",
    )
    return frames.unionByName(segs)


# ---------------------------------------------------------------------------
# X4 — BPE-ish token counting (the LLM-pipeline budgeting basis), a composite
# quality score, and a hashed-linear-classifier logit (X4m: fastText-style
# model gate in md5 oracle mode); all bit-identical in DuckDB
# ---------------------------------------------------------------------------
#: fixed audit model for the x4e driver check: every one of the 64 hash
#: buckets carries a deterministic one-decimal weight, so the logit is an
#: exact-decimal sum both engines reproduce bit-for-bit
_CLF_DIM = 64
_CLF_WEIGHTS = {i: ((i * 37) % 21 - 10) / 10.0 for i in range(_CLF_DIM)}
_CLF_VALUES_SQL = ", ".join(
    f"({i}, {w:.1f})" for i, w in _CLF_WEIGHTS.items()
)


@register(
    "x4e_bpe_quality",
    rf"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
             length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
               AS n_punct
      FROM documents),
    wt(feature_id, w) AS (VALUES {_CLF_VALUES_SQL}),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {_CLF_DIM}
               AS feature_id
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                     AS tok
            FROM documents)
      WHERE length(tok) > 0),
    clf AS (
      SELECT t.doc_id,
             CAST(COALESCE(SUM(CAST(wt.w AS DECIMAL(18,9))), 0) AS DOUBLE)
               AS clf_logit
      FROM tok t LEFT JOIN wt ON t.feature_id = wt.feature_id
      GROUP BY t.doc_id)
    SELECT d.doc_id,
           len(regexp_extract_all(lower(d.text), ' ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+'))
             AS n_bpe_tokens,
           len(list_distinct(
             regexp_extract_all(lower(d.text), ' ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+')))
             AS n_distinct_bpe,
           ROUND((LEAST(m.n_chars / 500.0, 1.0)
                  + (1.0 - LEAST(CAST(m.n_punct AS DOUBLE)
                                 / CAST(GREATEST(m.n_words, 1) AS DOUBLE), 1.0))
                  + CASE WHEN CAST(m.n_chars AS DOUBLE)
                              / CAST(GREATEST(m.n_words, 1) AS DOUBLE)
                              BETWEEN 3.0 AND 12.0
                         THEN 1.0 ELSE 0.5 END) / 3.0, 6) AS quality,
           COALESCE(c.clf_logit, 0.0) AS clf_logit
    FROM documents d
    JOIN m ON d.doc_id = m.doc_id
    LEFT JOIN clf c ON d.doc_id = c.doc_id
    """,
)
def x4e_bpe_quality(spark, sf_dir):
    # BPE-ish token counting + composite quality score in one projection
    # (x4f absorbed in round 3), plus the X4m hashed-linear-classifier
    # logit in md5 oracle mode (round 4) — decimal-exact sums make the
    # logit bit-identical across engines and partitionings
    docs = _t(spark, sf_dir, "documents")
    toks = text.bpe_tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe"),
        text.quality_score("text").alias("quality"),
        # expression-mode classifier: the 64-bucket model is inlined, so
        # this stays a pure map-only projection (zero Exchanges — audited)
        lm.hashed_linear_logit_expr(_CLF_WEIGHTS, _CLF_DIM, "text").alias(
            "clf_logit"
        ),
    )


# ---------------------------------------------------------------------------
# As-of join — event enrichment with the customer's latest order as of the
# event time; oracle = DuckDB's native ASOF JOIN over the same deduped side
# ---------------------------------------------------------------------------
@register(
    "j7_asof_enrich",
    """
    WITH r AS (
      SELECT * FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1)
    SELECT e.event_id, e.user_id, e.event_type,
           r.o_orderkey, r.o_totalprice
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
)
def j7_asof_enrich(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    orders = _t(spark, sf_dir, "orders")
    out = asof.asof_join(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return out.select("event_id", "user_id", "event_type", "o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# Hierarchical aggregation — ROLLUP over lineitem + CUBE over orders as a
# tagged union (merged registration, round 3; absent from the reference,
# §2.d cites the absence). Catalyst expands each into one Expand + single
# aggregation — no per-level rescans.
# ---------------------------------------------------------------------------
@register(
    "a6_rollup_cube",
    """
    SELECT 'rollup' AS src, l_returnflag AS g1, l_linestatus AS g2,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_val,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS lvl
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS src, o_orderstatus AS g1, o_orderpriority AS g2,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_val,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS lvl
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a6_rollup_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    r = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_val"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("lvl"),
        )
        .select(
            F.lit("rollup").alias("src"),
            F.col("l_returnflag").alias("g1"),
            F.col("l_linestatus").alias("g2"),
            "n", "sum_val", "lvl",
        )
    )
    c = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("sum_val"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).alias("lvl"),
        )
        .select(
            F.lit("cube").alias("src"),
            F.col("o_orderstatus").alias("g1"),
            F.col("o_orderpriority").alias("g2"),
            "n", "sum_val", "lvl",
        )
    )
    return r.unionByName(c)


# ---------------------------------------------------------------------------
# J8 — binned range join: lineitem ship dates falling inside 30-day windows
# after each of the first 20 orders; equi-join on bin ids, never a cartesian
# ---------------------------------------------------------------------------
@register(
    "j8_range_join",
    """
    WITH iv AS (
      SELECT o_orderkey, o_orderdate AS s,
             o_orderdate + INTERVAL 30 DAY AS e
      FROM orders WHERE o_orderkey < 20)
    SELECT iv.o_orderkey, l.l_orderkey, l.l_linenumber, l.l_partkey,
           l.l_suppkey, l.l_shipdate
    FROM iv JOIN lineitem l
      ON l.l_shipdate >= iv.s AND l.l_shipdate < iv.e
    """,
)
def j8_range_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    iv = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 20)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("s"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("e"),
        )
    )
    bin_seconds = 30 * 86400
    assert rangejoin.interval_width_ok(iv, "s", "e", bin_seconds)
    out = rangejoin.point_in_interval_join(li, iv, "l_shipdate", "s", "e", bin_seconds)
    return out.select(
        "o_orderkey", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_shipdate"
    )


# ---------------------------------------------------------------------------
# X1b — near-dup connected components: every doc in a component maps to the
# minimum id (the canonical survivor). Spark: distributed min-label
# propagation; oracle: recursive-CTE transitive closure over the SAME pair
# set the x2 oracle defines.
# ---------------------------------------------------------------------------
def _x1b_oracle() -> str:
    pair_sql = QUERIES["x2_ngram_jaccard"][1]
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT id_a, id_b FROM ({pair_sql})
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, MIN(dst) AS canonical_id FROM reach GROUP BY src
    """


@register("x1b_dedup_clusters", _x1b_oracle())
def x1b_dedup_clusters(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2)
    return dedup.dedup_clusters(pairs)



# ---------------------------------------------------------------------------
# Analytic extension surface: pivot, ordered string agg, window analytics,
# exact percentiles (all absent from the reference — engine completeness)
# ---------------------------------------------------------------------------
@register(
    "a7_pivot_roundtrip",
    """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS n_f,
             CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS n_o,
             COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'F'
                           THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE),
                      0.0) AS qty_f,
             COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'O'
                           THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE),
                      0.0) AS qty_o
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, measure, value
    FROM wide UNPIVOT (value FOR measure IN (n_f, n_o, qty_f, qty_o))
    """,
)
def a7_pivot_roundtrip(spark, sf_dir):
    # pivot → unpivot round-trip: the wide form (a7) feeds the melt (a7b) —
    # merged registration, round 3. Cells are coalesced to 0.0 so the
    # null-dropping conventions of the two engines' UNPIVOTs never differ.
    li = _t(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"),
        )
        .select(
            "l_returnflag",
            F.coalesce(F.col("F_n").cast("double"), F.lit(0.0)).alias("n_f"),
            F.coalesce(F.col("O_n").cast("double"), F.lit(0.0)).alias("n_o"),
            F.coalesce(F.col("F_qty"), F.lit(0.0)).alias("qty_f"),
            F.coalesce(F.col("O_qty"), F.lit(0.0)).alias("qty_o"),
        )
    )
    return wide.unpivot(
        ["l_returnflag"], ["n_f", "n_o", "qty_f", "qty_o"], "measure", "value"
    )


@register(
    "a8_string_agg",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def a8_string_agg(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "w6_analytics",
    """
    WITH base AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
             l_extendedprice
      FROM lineitem WHERE l_orderkey < 100)
    SELECT l_orderkey, l_linenumber, l_partkey,
           LAG(l_partkey) OVER w AS prev_part,
           LEAD(l_partkey) OVER w AS next_part,
           RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity) AS qty_rank,
           DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity)
             AS qty_dense_rank,
           NTILE(4) OVER w AS quartile
    FROM base
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
                          l_extendedprice)
    """,
)
def w6_analytics(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    wq = Window.partitionBy("l_orderkey").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.lag("l_partkey").over(w).alias("prev_part"),
        F.lead("l_partkey").over(w).alias("next_part"),
        F.rank().over(wq).alias("qty_rank"),
        F.dense_rank().over(wq).alias("qty_dense_rank"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# X8 — deterministic sampling suite as a tagged union (merged registration,
# round 3): train/val/test hash split, flat 10% sample, and per-language
# stratified rebalancing — all reproducible on any engine (bucket = first
# 8 md5 hex digits mod 10000), all narrow projections, no shuffle, no RNG
# ---------------------------------------------------------------------------
@register(
    "x8_sampling",
    """
    WITH b AS (
      SELECT doc_id, lang, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 10000 AS bucket
      FROM documents)
    SELECT 'split' AS method, doc_id,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS detail
    FROM b
    UNION ALL
    SELECT 'sample10' AS method, doc_id, source AS detail
    FROM b WHERE bucket < 1000
    UNION ALL
    SELECT 'stratified' AS method, doc_id, lang AS detail
    FROM b
    WHERE bucket < CASE lang WHEN 'en' THEN 1000 WHEN 'de' THEN 5000
                             WHEN 'und' THEN 0 ELSE 2500 END
    """,
)
def x8_sampling(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    split = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select(F.lit("split").alias("method"), "doc_id", F.col("split").alias("detail"))
    samp = sampling.deterministic_sample(docs, "doc_id", 0.10).select(
        F.lit("sample10").alias("method"), "doc_id", F.col("source").alias("detail")
    )
    strat = sampling.stratified_sample(
        docs, "doc_id", "lang",
        {"en": 0.10, "de": 0.50, "und": 0.0},
        default_fraction=0.25,
    ).select(F.lit("stratified").alias("method"), "doc_id", F.col("lang").alias("detail"))
    return split.unionByName(samp).unionByName(strat)


# ---------------------------------------------------------------------------
# X4h+X9 — corpus cleaning: PII scrubbing + URL canonicalization in one
# projection (merged registration, round 3). Driver documents carry no
# natural PII/URLs, so both dirty inputs are derived deterministically per
# doc (both engines synthesize the same text/URL from doc fields) — the
# scrub and canonicalization logic is what's under oracle, not the
# synthesis. RE2-safe shared regexes, no UDF.
# ---------------------------------------------------------------------------
@register(
    "x4h_clean",
    f"""
    WITH dirty AS (
      SELECT doc_id,
             text || ' Contact user' || doc_id || '@Example.COM or call '
                  || '+1 (555) ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
               AS t,
             CASE WHEN doc_id % 2 = 0
                  THEN 'HTTPS://Example.COM:443/' ELSE 'https://example.com/' END
               || source || '/item/' || doc_id
               || CASE WHEN doc_id % 3 = 0
                       THEN '?utm_source=feed&b=2&a=1' ELSE '?b=2&a=1' END
               || '#frag' AS url
      FROM documents),
    scrub AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '{text.EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(t, '{text.PHONE_RE}')) AS n_phones,
             md5(regexp_replace(regexp_replace(t, '{text.EMAIL_RE}', '<EMAIL>', 'g'),
                                '{text.PHONE_RE}', '<PHONE>', 'g'))
               AS clean_md5,
             url
      FROM dirty),
    parts AS (
      SELECT doc_id, n_emails, n_phones, clean_md5,
             regexp_replace(url, '#.*$', '', 'g') AS u FROM scrub),
    split AS (
      SELECT doc_id, n_emails, n_phones, clean_md5,
        CASE
          WHEN lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
               LIKE 'http://%:80'
            THEN regexp_replace(lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)), ':80$', '')
          WHEN lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
               LIKE 'https://%:443'
            THEN regexp_replace(lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)), ':443$', '')
          ELSE lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
        END AS head,
        regexp_extract(regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '^([^?]*)', 1) AS path,
        regexp_extract(regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '\\?(.*)$', 1) AS qs
      FROM parts),
    canon AS (
      SELECT doc_id, n_emails, n_phones, clean_md5, head, path,
        array_to_string(
          list_sort(list_filter(str_split(qs, '&'),
                                p -> p <> '' AND NOT starts_with(p, 'utm_'))),
          '&') AS cqs
      FROM split)
    SELECT doc_id, n_emails, n_phones, clean_md5,
           regexp_replace(
             head || path || CASE WHEN cqs = '' THEN '' ELSE '?' || cqs END,
             '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)/$', '\\1') AS url_norm
    FROM canon
    """,
)
def x4h_clean(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"), F.col("doc_id"), F.lit("@Example.COM or call "),
            F.lit("+1 (555) "),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        ).alias("t"),
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://Example.COM:443/"))
             .otherwise(F.lit("https://example.com/")),
            F.col("source"), F.lit("/item/"), F.col("doc_id"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
             .otherwise(F.lit("?b=2&a=1")),
            F.lit("#frag"),
        ).alias("url"),
    )
    return dirty.select(
        "doc_id",
        text.count_matches("t", text.EMAIL_RE).alias("n_emails"),
        text.count_matches("t", text.PHONE_RE).alias("n_phones"),
        F.md5(text.redact_pii("t")).alias("clean_md5"),
        text.normalize_url("url").alias("url_norm"),
    )


# ---------------------------------------------------------------------------
# A10 — hot-key-safe aggregation under oracle: the salted two-phase agg
# must be value-identical to the plain GROUP BY (the salt only re-routes
# the reduce work; decimal sums keep the fold order-insensitive).
# ---------------------------------------------------------------------------
@register(
    "a10_skew_agg",
    """
    SELECT user_id, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def a10_skew_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("value").cast("decimal(18,4)").alias("value")
    )
    out = skew.two_phase_agg(ev, "user_id", "value", salt=16)
    return out.select(
        "user_id", "n", F.col("sum_value").cast("double").alias("sum_value")
    )


# ---------------------------------------------------------------------------
# X2e — benchmark contamination: train docs sharing >= k distinct shingles
# with a (small, broadcast) benchmark set — the eval-leakage gate.
# ---------------------------------------------------------------------------
@register(
    "x2e_contamination",
    """
    WITH toks AS (
      SELECT doc_id AS id, str_split(lower(text), ' ') AS t FROM documents),
    sh AS (
      SELECT id, UNNEST(list_distinct(
        [array_to_string(t[i:i+2], ' ')
         FOR i IN range(1, greatest(len(t) - 2, 0) + 1)])) AS shingle
      FROM toks),
    tr AS (SELECT id, shingle FROM sh WHERE id % 97 <> 0),
    be AS (SELECT id AS bench_id, shingle FROM sh WHERE id % 97 = 0)
    SELECT tr.id AS train_id, be.bench_id, COUNT(*) AS shared
    FROM tr JOIN be USING (shingle)
    GROUP BY 1, 2 HAVING COUNT(*) >= 5
    """,
)
def x2e_contamination(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return dedup.contamination_pairs(train, bench, min_shared=5)


# ---------------------------------------------------------------------------
# X4i — sequence packing: assign docs to token-budget packs per source
# shard (one window pass; a global cumsum would serialize the corpus).
# ---------------------------------------------------------------------------
@register(
    "x4i_token_packing",
    """
    WITH d AS (
      SELECT doc_id, source, len(str_split(text, ' ')) AS n_tokens
      FROM documents)
    SELECT doc_id, source, n_tokens,
           CAST(floor((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                / 512.0) AS BIGINT) AS pack_id
    FROM d
    """,
)
def x4i_token_packing(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return sampling.pack_greedy(
        d, "n_tokens", budget=512, part_col="source", order_col="doc_id"
    )




def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def all_oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
