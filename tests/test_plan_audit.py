"""§4 — the physical plans the engine ships are the plans 100 TB needs:
pushdown, pruning, broadcast dims, no accidental cartesians."""

from __future__ import annotations

import pytest

from pulfa_sausage_factory_spark import plans
from pulfa_sausage_factory_spark.queries import QUERIES

#: query → (pushed-filter needles, max scan width)
PUSHDOWN_CASES = {
    "q6_revenue_change": (("l_shipdate", "l_discount", "l_quantity"), 4),
    "q3_top_revenue": (("c_mktsegment",), 11),
    "a23_text_metrics": ((), 3),
}


@pytest.mark.parametrize("name", sorted(PUSHDOWN_CASES))
def test_filters_pushed_and_columns_pruned(spark, sf_dir, name):
    needles, max_cols = PUSHDOWN_CASES[name]
    df = QUERIES[name][0](spark, sf_dir)
    if needles:
        plans.assert_pushed_filter(df, *needles)
    plans.assert_read_schema_pruned(df, max_cols)


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    # q5: region/nation/supplier are far below the broadcast threshold —
    # the fact table must never shuffle for them
    df = QUERIES["q5_local_supplier_volume"][0](spark, sf_dir)
    plans.assert_broadcast_join(df, at_least=2)


def test_knn_broadcasts_query_side(spark, sf_dir):
    # brute-force knn is corpus-stream × broadcast(queries): the corpus
    # side must not shuffle
    df = QUERIES["x3_knn_bruteforce"][0](spark, sf_dir)
    plans.assert_broadcast_join(df, at_least=1)


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q5_local_supplier_volume", "x2_ngram_jaccard",
     "x2b_hash_neardup", "t_sessionize"],
)
def test_no_accidental_cartesian(spark, sf_dir, name):
    plans.assert_no_cartesian(QUERIES[name][0](spark, sf_dir))


@pytest.mark.parametrize("name", ["q3_top_revenue", "q10_returned_items"])
def test_global_topk_is_take_ordered(spark, sf_dir, name):
    # orderBy().limit(k) → TakeOrderedAndProject; a row_number() window
    # without partitionBy would funnel the aggregate set through one task
    plans.assert_take_ordered(QUERIES[name][0](spark, sf_dir))


@pytest.mark.parametrize(
    "name",
    ["x8_sampling", "x4h_clean", "x4e_bpe_quality",
     "x6_multimodal_meta", "x6b_image_ops"],
)
def test_projection_queries_never_shuffle(spark, sf_dir, name):
    # the sampling suite, the cleaning/scoring projections, and the FUSED
    # multimodal passes (image_ops / featurize_with_meta) are narrow
    # per-row transforms — any Exchange here is a scale bug (at 100 TB
    # these run as pure map stages over the corpus)
    plans.assert_no_exchange(QUERIES[name][0](spark, sf_dir))


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    # the bench shingle index is small by construction — the train corpus
    # must stream through a map-side hash join, never shuffle its shingles
    plans.assert_broadcast_join(QUERIES["x2e_contamination"][0](spark, sf_dir))


def test_no_query_plans_pathological_exchange_counts(spark, sf_dir):
    # the census that caught x1b's lineage blowup (600+ Exchanges from an
    # uncheckpointed iterative loop): every registered query's executed
    # plan must stay within a sane shuffle budget. Ceiling chosen well
    # above the legitimate maximum (x2/x3c at 3) but far below any
    # lineage-accumulation pathology.
    from pulfa_sausage_factory_spark.queries import QUERIES

    offenders = {}
    for name, (fn, _sql) in QUERIES.items():
        n = plans.count_exchanges(fn(spark, sf_dir))
        if n > 8:
            offenders[name] = n
    assert not offenders, offenders


def test_no_pre_join_aggregate_walker_both_directions(spark, tmp_path):
    # round 14 (VERDICT item 3): the walker that pins "the fallback has
    # no full-state groupBy" must PASS the restrict-then-window shape
    # and FAIL the old aggregate-the-whole-state-before-joining shape.
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    path = str(tmp_path / "walker_state")
    spark.range(2_000).select(
        (F.col("id") % 50).alias("fp"),
        F.concat(F.lit("o"), F.col("id").cast("string")).alias("old_id"),
    ).write.mode("overwrite").parquet(path)
    state = spark.read.parquet(path)
    batch = spark.range(40).select((F.col("id") % 20).alias("fp"))

    good = (
        state.join(batch.distinct(), "fp")
        .select("fp", "old_id")
        .repartition("fp")
        .dropDuplicates(["fp", "old_id"])
        .withColumn("_df", F.count("old_id").over(Window.partitionBy("fp")))
        .filter(F.col("_df") <= 10)
    )
    plans.assert_no_pre_join_aggregate(good, "walker_state")

    bad = state.join(
        state.groupBy("fp")
        .agg(F.countDistinct("old_id").alias("_df"))
        .filter(F.col("_df") <= 10)
        .select("fp"),
        "fp", "left_semi",
    ).join(batch.distinct(), "fp")
    with pytest.raises(AssertionError, match="aggregates the full state"):
        plans.assert_no_pre_join_aggregate(bad, "walker_state")
