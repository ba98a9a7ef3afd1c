"""Bucketed co-located joins + skew salting: the shuffle-minimization
tools a 100 TB deployment leans on, verified against plans and plain-join
results at test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark import plans
from pulfa_sausage_factory_spark.functions import skew
from pulfa_sausage_factory_spark.io import load_table
from pulfa_sausage_factory_spark.sinks import bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    try:
        bucketed.write_bucketed(orders, "b_orders", "o_orderkey", 8, "o_orderkey")
        bucketed.write_bucketed(li, "b_lineitem", "l_orderkey", 8, "l_orderkey")
        joined = bucketed.colocated_join(
            spark,
            "b_lineitem",
            "b_orders",
            F.col("l_orderkey") == F.col("o_orderkey"),
            force_merge=True,
        )
        # same bucket count + bucket key = join key → zipped per-bucket
        # sort-merge, zero Exchange in the plan
        plans.assert_no_exchange(joined)
        # and it's still the right answer
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark):
    # hot key: 90% of the big side is key 1
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (20, "cold"), (30, "cold")], "k bigint, tag string"
    )
    got = skew.salted_join(big, small, on="k", salt=8)
    want = big.join(small, "k")
    assert got.count() == want.count()
    assert sorted(r.payload for r in got.filter(F.col("tag") == "cold").collect()) == \
           sorted(r.payload for r in want.filter(F.col("tag") == "cold").collect())


def test_two_phase_agg_matches_groupby(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: (r.n, round(r.sum_value, 4))
        for r in skew.two_phase_agg(ev, "event_type", "value").collect()
    }
    want = {
        r.event_type: (r.n, round(r.s, 4))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_bucketed_fact_twins_match_plain_and_never_shuffle_facts(spark, sf_dir, tmp_path):
    # round-5: the bucketing machinery meets the actual expensive queries —
    # q3/q5/q10 run over orderkey-bucketed fact tables, results pinned
    # identical to the plain registrations, and the orders⨝lineitem join
    # provably never shuffles (the "plans at 100x" evidence: the fact-fact
    # shuffle is paid once at ingest, not per query)
    from pulfa_sausage_factory_spark import bucketed_queries as bq
    from pulfa_sausage_factory_spark.queries import QUERIES

    try:
        assert bq.ensure_bucketed_facts(spark, sf_dir) is True
        # idempotent: same (sf_dir, n_buckets) → no rewrite
        assert bq.ensure_bucketed_facts(spark, sf_dir) is False

        pairs = [
            (bq.q3_bucketed, "q3_top_revenue"),
            (bq.q5_bucketed, "q5_local_supplier_volume"),
            (bq.q10_bucketed, "q10_returned_items"),
        ]
        for fn, plain_name in pairs:
            twin = fn(spark, sf_dir)
            got = sorted(map(tuple, twin.collect()))
            want = sorted(map(tuple, QUERIES[plain_name][0](spark, sf_dir).collect()))
            assert got == want and len(got) > 0, plain_name

            # AQE's toString repeats the plan (Final + Initial sections);
            # assert on the final section only
            plan = (
                twin._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0]
            )
            # the fact-fact join is a bucket-co-located sort-merge:
            # both bucketed scans present, no shuffle on either orderkey
            assert "SortMergeJoin [l_orderkey" in plan, plain_name
            assert plan.count("Bucketed: true") == 2, plain_name
            assert "Exchange hashpartitioning(l_orderkey" not in plan, plain_name
            assert "Exchange hashpartitioning(o_orderkey" not in plan, plain_name
            # q3 groups by the bucket key and tops-k via TakeOrdered — the
            # ENTIRE plan is shuffle-free; q5/q10 re-key once (final agg)
            budget = 0 if plain_name == "q3_top_revenue" else 1
            import re

            n_shuffles = len(re.findall(
                r"Exchange (hash|range)partitioning|Exchange SinglePartition",
                plan,
            ))
            assert n_shuffles <= budget, (plain_name, n_shuffles, plan)
    finally:
        bq.drop_bucketed_facts(spark)


def test_fact_workload_bodies_match_registered_queries(spark, sf_dir):
    # round-6 refactor guard: stress.py compares plain vs bucketed through
    # the SHARED q3_over/q5_over/q10_over bodies — those bodies, run over
    # plain (un-bucketed) frames, must stay result-identical to the
    # oracle-checked registrations or the stress comparison silently
    # measures a different workload
    from pulfa_sausage_factory_spark import bucketed_queries as bq
    from pulfa_sausage_factory_spark.queries import QUERIES

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    for body, plain_name in (
        (lambda: bq.q3_over(orders, li, c), "q3_top_revenue"),
        (lambda: bq.q5_over(orders, li, c, s, n, r), "q5_local_supplier_volume"),
        (lambda: bq.q10_over(orders, li, c), "q10_returned_items"),
    ):
        got = sorted(map(tuple, body().collect()))
        want = sorted(map(tuple, QUERIES[plain_name][0](spark, sf_dir).collect()))
        assert got == want and len(got) > 0, plain_name


def test_bucketed_facts_ignore_temp_view_shadows(spark, sf_dir):
    # round-6 ADVICE fix: listTables() also returns TEMPORARY views — a
    # user temp view named bq_orders must neither mask orphan-dir cleanup
    # (it is not a managed table) nor shadow the twins' table reads
    from pulfa_sausage_factory_spark import bucketed_queries as bq

    decoy = spark.range(3).withColumnRenamed("id", "decoy_col")
    decoy.createOrReplaceTempView(bq.ORDERS_TABLE)
    try:
        assert bq.ensure_bucketed_facts(spark, sf_dir) is True
        orders, li = bq._facts(spark)
        # the qualified read reaches the bucketed managed table, not the
        # 3-row decoy view
        assert "o_orderkey" in orders.columns
        assert orders.count() > 3
        # the decoy view itself is untouched by drop/cleanup
        bq.drop_bucketed_facts(spark)
        assert spark.table(bq.ORDERS_TABLE).columns == ["decoy_col"]
    finally:
        spark.catalog.dropTempView(bq.ORDERS_TABLE)
        bq.drop_bucketed_facts(spark)


def test_scan_state_joins_never_shuffle_the_state(spark, tmp_path):
    # round 12: the ingest's cross-run dedup legs decide a micro-batch
    # against ledger-sized state — relational.anti_join_scan_state /
    # inner_join_scan_state flip those joins so the state table is
    # SCANNED under BroadcastHashJoins (batch-derived side broadcasts),
    # never shuffled. Pin BOTH properties: semantics identical to the
    # naive joins, and zero shuffle Exchange in the flipped plans.
    from pulfa_sausage_factory_spark.operators import relational
    from pulfa_sausage_factory_spark.plans import audit

    state_path = str(tmp_path / "state")
    spark.range(50_000).select(
        F.md5(F.col("id").cast("string")).alias("digest")
    ).write.mode("overwrite").parquet(state_path)
    state = spark.read.parquet(state_path)
    # batch: half collides with state, half is new
    batch = spark.range(400).select(
        F.when(F.col("id") % 2 == 0,
               F.md5(F.col("id").cast("string")))
        .otherwise(F.md5(F.concat(F.lit("new-"),
                                  F.col("id").cast("string"))))
        .alias("_digest")
    )

    flipped = relational.anti_join_scan_state(
        batch, state, "_digest", "digest"
    )
    naive = batch.join(
        state.withColumnRenamed("digest", "_digest"), "_digest",
        "left_anti",
    )
    assert sorted(r[0] for r in flipped.collect()) == sorted(
        r[0] for r in naive.collect()
    )
    assert len(flipped.collect()) == 200
    assert audit.count_exchanges(flipped) == 0, (
        "the flipped anti-join must not shuffle anything — the state "
        "side streams under a BroadcastHashJoin"
    )
    plan = audit.explain_formatted(flipped)
    assert plan.count("BroadcastHashJoin") >= 2, plan

    probe = spark.range(300).select(
        F.md5((F.col("id") * 3).cast("string")).alias("digest"),
        F.col("id").alias("batch_key"),
    )
    inner = relational.inner_join_scan_state(state, probe, "digest")
    want = state.join(probe, "digest")
    assert inner.count() == want.count()
    assert audit.count_exchanges(inner) == 0, (
        "inner_join_scan_state must stream the state side"
    )


def test_overlap_and_semantic_legs_never_shuffle_the_state(spark, tmp_path):
    # round 13: the LAST two per-micro-batch state shuffles (VERDICT r12
    # item 1) — the overlap-fps and semantic-ledger cross-run legs — now
    # route through the scan-state flip. Pin BOTH properties on the exact
    # production shapes: (a) results identical to the naive full-state
    # paths, (b) the state parquet scan streams DIRECTLY into a
    # BroadcastHashJoin with zero Exchange in between (machine-walked
    # from the formatted plan tree, not a whole-plan exchange count —
    # the flip legitimately shuffles the collision-bounded remnant).
    from pyspark.sql.window import Window

    from pulfa_sausage_factory_spark.operators import relational
    from pulfa_sausage_factory_spark.plans import audit

    # ---- overlap-fps leg: df-cap + cross-run equi-join over fps state
    fps_path = str(tmp_path / "fps_state")
    # 60k state rows; fp space overlaps the batch's; one viral fp (7)
    # present in many docs so the df-cap has something to exclude
    spark.range(60_000).select(
        (F.col("id") % 500).alias("fp"),
        F.concat(F.lit("old-"), (F.col("id") % 3000).cast("string"))
        .alias("old_id"),
    ).union(
        spark.range(200).select(
            F.lit(7).cast("long").alias("fp"),
            F.concat(F.lit("viral-"), F.col("id").cast("string"))
            .alias("old_id"),
        )
    ).write.mode("overwrite").parquet(fps_path)
    old_fps = spark.read.parquet(fps_path)
    cap = 130
    bshared = spark.range(300).select(
        F.concat(F.lit("doc-"), (F.col("id") % 40).cast("string"))
        .alias("doc_id"),
        (F.col("id") % 25).alias("fp"),
    )

    def capped_shared(old_ok):
        return (
            bshared.join(old_ok, "fp")
            .groupBy("doc_id", "old_id")
            .agg(F.countDistinct("fp").alias("_sh"))
        )

    hit = (
        relational.inner_join_scan_state(
            old_fps, bshared.select("fp").distinct(), "fp"
        )
        .select("fp", "old_id")
        # the production remnant shape (round 14): repartition by fp
        # FIRST so the dedup aggregate AND the window share ONE exchange
        .repartition("fp")
        .dropDuplicates(["fp", "old_id"])
    )
    flipped_ok = (
        hit.withColumn("_df", F.count("old_id").over(Window.partitionBy("fp")))
        .filter(F.col("_df") <= cap)
        .drop("_df")
    )
    naive_ok = old_fps.join(
        old_fps.groupBy("fp")
        .agg(F.countDistinct("old_id").alias("_df"))
        .filter(F.col("_df") <= cap)
        .select("fp"),
        "fp",
        "left_semi",
    )
    flipped = capped_shared(flipped_ok)
    naive = capped_shared(naive_ok)
    assert sorted(map(tuple, flipped.collect())) == sorted(
        map(tuple, naive.collect())
    )
    # the viral fp must actually have been capped out on both paths
    assert flipped_ok.filter(F.col("fp") == 7).count() == 0
    audit.assert_scan_streams_into_broadcast_join(flipped, "fps_state")

    # ---- round 14 (VERDICT item 3): the bulk-backfill FALLBACK shares
    # the same restrict-then-window body with a plain shuffled join — it
    # must (a) decide identically, (b) plan NO full-state aggregate (the
    # old fallback's df-cap groupBy over the entire fps state is gone;
    # the only aggregate-feeding read of state is post-join, collision-
    # bounded). The shuffled join itself is legitimate here.
    fb_hit = (
        old_fps.join(bshared.select("fp").distinct(), "fp")
        .select("fp", "old_id")
        .repartition("fp")
        .dropDuplicates(["fp", "old_id"])
    )
    fallback_ok = (
        fb_hit.withColumn(
            "_df", F.count("old_id").over(Window.partitionBy("fp"))
        )
        .filter(F.col("_df") <= cap)
        .drop("_df")
    )
    fallback = capped_shared(fallback_ok)
    assert sorted(map(tuple, fallback.collect())) == sorted(
        map(tuple, naive.collect())
    )
    assert fallback_ok.filter(F.col("fp") == 7).count() == 0
    audit.assert_no_pre_join_aggregate(fallback, "fps_state")
    # the fp-repartition actually collapses the remnant to ONE exchange:
    # dedup agg and window both ride HashPartitioning(fp) — a bare
    # .distinct() shape pays a second (fp, old_id) exchange
    two_shape = (
        old_fps.join(bshared.select("fp").distinct(), "fp")
        .select("fp", "old_id").distinct()
        .withColumn("_df", F.count("old_id").over(Window.partitionBy("fp")))
        .filter(F.col("_df") <= cap).drop("_df")
    )
    assert (audit.count_exchanges(fallback_ok)
            == audit.count_exchanges(two_shape) - 1)

    # ---- semantic leg: batch cells/vectors vs admitted-vector state
    sem_path = str(tmp_path / "semvecs_state")
    spark.range(20_000).select(
        (F.col("id") % 64).alias("cell_id"),
        F.concat(F.lit("old-"), F.col("id").cast("string")).alias("old_id"),
        F.array(
            (F.col("id") % 7).cast("float"), (F.col("id") % 11).cast("float")
        ).alias("old_vec"),
    ).write.mode("overwrite").parquet(sem_path)
    old_vecs = spark.read.parquet(sem_path)
    cur = spark.range(150).select(
        F.concat(F.lit("v-"), F.col("id").cast("string")).alias("vec_id"),
        (F.col("id") % 16).alias("cell_id"),
        F.array(
            (F.col("id") % 7).cast("float"), (F.col("id") % 11).cast("float")
        ).alias("v"),
    )
    flipped_sem = relational.inner_join_scan_state(old_vecs, cur, "cell_id")
    naive_sem = cur.join(old_vecs, "cell_id")
    assert flipped_sem.count() == naive_sem.count()
    assert audit.count_exchanges(flipped_sem) == 0
    audit.assert_scan_streams_into_broadcast_join(flipped_sem, "semvecs_state")


def test_scan_state_audit_checks_every_scan_of_the_path(spark, tmp_path):
    # round-13 self-review: assert_scan_streams_into_broadcast_join must
    # verify EVERY scan of the state path — a regression reintroducing a
    # second, shuffled read (the old two-read cap-groupBy shape) must not
    # hide behind one compliant scan that happens to come first.
    import pytest

    from pulfa_sausage_factory_spark.operators import relational
    from pulfa_sausage_factory_spark.plans import audit

    state_path = str(tmp_path / "dual_state")
    spark.range(30_000).select(
        (F.col("id") % 700).alias("k"),
        F.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(state_path)
    state = spark.read.parquet(state_path)
    small = spark.range(40).select((F.col("id") * 3).alias("k"))
    big = spark.range(200_000).select(
        (F.col("id") % 900).alias("k"), F.col("id").alias("other")
    )

    good = relational.inner_join_scan_state(
        state.select("k", "payload"), small, "k"
    )
    # compliant alone: passes
    audit.assert_scan_streams_into_broadcast_join(good, "dual_state")

    # a second read of the SAME path feeding a shuffled SortMergeJoin
    # (broadcast disabled via a no-autobroadcast-sized big side + merge
    # hint) — the union plan holds one compliant scan and one violator
    shuffled = state.select("k", "payload").join(
        big.hint("merge"), "k"
    ).select("k", "payload")
    both = good.select("k", "payload").unionByName(shuffled)
    with pytest.raises(AssertionError):
        audit.assert_scan_streams_into_broadcast_join(both, "dual_state")
