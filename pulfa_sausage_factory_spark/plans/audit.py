"""Physical-plan audit helpers (SURVEY.md §4).

The reference hand-rolled its physical tricks (predicate-in-the-scan,
skip-guards, stage checkpoints); here Catalyst supplies them — these
helpers make that VERIFIABLE instead of assumed. Tests assert that the
plans the engine ships are the plans a 100 TB deployment needs: filters
reaching the parquet scan, dimension joins broadcast, projections pruned
to the columns actually read, and no accidental cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The string form of ``df.explain("formatted")``."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def assert_pushed_filter(df: DataFrame, *needles: str) -> None:
    """Every ``needle`` (usually a column name) must appear inside a
    ``PushedFilters: [...]`` entry of some scan in the plan."""
    plan = explain_formatted(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    blob = " ".join(pushed)
    for needle in needles:
        assert needle in blob, (
            f"filter on {needle!r} not pushed to scan; PushedFilters={blob}"
        )


def assert_read_schema_pruned(
    df: DataFrame, max_cols: int, table_hint: str | None = None
) -> None:
    """The widest parquet ``ReadSchema`` in the plan must read at most
    ``max_cols`` columns — column pruning reached the scan."""
    plan = explain_formatted(df)
    schemas = [
        ln.split("ReadSchema:", 1)[1]
        for ln in plan.splitlines()
        if "ReadSchema" in ln and (table_hint is None or table_hint in ln)
    ]
    assert schemas, f"no ReadSchema in plan:\n{plan}"
    widths = [s.count(":") for s in schemas]
    assert max(widths) <= max_cols, (
        f"scan reads {max(widths)} cols (> {max_cols}): {schemas}"
    )


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    """Plan must contain >= ``at_least`` broadcast joins (dimension sides
    shipped to executors instead of shuffling the fact table)."""
    plan = explain_formatted(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= at_least, f"expected >= {at_least} broadcast joins, found {n}:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    """No CartesianProduct in the physical plan (broadcast nested-loop of a
    deliberately-broadcast tiny side is allowed; a shuffled cartesian of two
    big sides is the scale killer this guards against)."""
    plan = explain_formatted(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def assert_partition_pruned(df: DataFrame, *needles: str) -> None:
    """Every ``needle`` (a hive-partition column) must appear in a scan's
    ``PartitionFilters`` — the predicate prunes whole directories, it never
    reaches row decoding."""
    plan = explain_formatted(df)
    pruned = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pruned, f"no PartitionFilters in plan:\n{plan}"
    blob = " ".join(pruned)
    for needle in needles:
        assert needle in blob, (
            f"partition filter on {needle!r} not pruned; PartitionFilters={blob}"
        )


def assert_take_ordered(df: DataFrame) -> None:
    """Global top-k must plan as ``TakeOrderedAndProject`` (per-partition
    partial top-k, tiny driver merge), never as a single-partition global
    ``Sort`` — THE scale-killer pattern for top-k at 100 TB."""
    plan = explain_formatted(df)
    assert "TakeOrderedAndProject" in plan, (
        f"global top-k did not plan as TakeOrderedAndProject:\n{plan}"
    )


def assert_no_exchange(df: DataFrame) -> None:
    """No Exchange (shuffle) anywhere in the physical plan — the co-located
    bucketed-join property: the shuffle was paid at write time, not now."""
    plan = explain_formatted(df)
    assert "Exchange" not in plan, f"plan shuffles:\n{plan}"


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan — the
    single plan-string regex all shuffle-budget asserts share (a Spark
    plan-format change is fixed here, not in every test)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(
        re.findall(r"Exchange (hash|range)partitioning|Exchange SinglePartition", plan)
    )


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    """Shuffle-budget pin: the plan must not exceed ``n`` Exchanges —
    catches the lineage-accumulation class of bug (an uncheckpointed
    iterative loop once planned 600+)."""
    got = count_exchanges(df)
    assert got <= n, f"plan has {got} Exchanges, budget {n}"


def _parse_plan_tree(plan: str) -> dict[int, tuple[str, int | None]]:
    """Parse the numbered tree at the top of a formatted plan into
    ``{node_id: (label, parent_id)}``. Depth is the length of the
    drawing prefix (``: ``/``+-``/``:-``/``*``/spaces); a node's parent
    is the nearest preceding node at a smaller depth. Parsing stops at
    the per-node detail section (headers like ``(1) Scan parquet`` at
    column 0)."""
    import re

    pat = re.compile(r"^([:\s+\-*]*)(\S.*?)\s*\((\d+)\)\s*$")
    nodes: dict[int, tuple[str, int | None]] = {}
    stack: list[tuple[int, int]] = []  # (depth, node_id)
    for ln in plan.splitlines():
        if ln.startswith("(") and nodes:
            break  # detail section reached
        m = pat.match(ln)
        if not m or ln.startswith("=="):
            continue
        depth, label, nid = len(m.group(1)), m.group(2), int(m.group(3))
        while stack and stack[-1][0] >= depth:
            stack.pop()
        nodes[nid] = (label, stack[-1][1] if stack else None)
        stack.append((depth, nid))
    return nodes


def assert_scan_streams_into_broadcast_join(
    df: DataFrame, path_needle: str
) -> None:
    """The machine check for scan-state joins: the parquet scan whose
    ``Location`` contains ``path_needle`` must reach its nearest Join
    ancestor with NO Exchange in between, and that join must be a
    BroadcastHashJoin — i.e. the (ledger-sized) state table is read in
    place on the STREAMED side while the batch-derived side broadcasts.
    A plan that shuffles the state before joining (SortMergeJoin, or an
    Exchange under the join) fails loudly with the plan attached.

    EVERY scan of the path is checked, not just the first: a regression
    that reintroduces a SECOND read of the state table (e.g. the old
    two-read cap-groupBy alongside the flip) must not hide behind one
    compliant scan."""
    import re

    plan = explain_formatted(df)
    nodes = _parse_plan_tree(plan)
    # find every detail-section scan node whose Location mentions the path
    scan_ids: list[int] = []
    cur_id, cur_label = None, ""
    for ln in plan.splitlines():
        m = re.match(r"^\((\d+)\)\s+(\S.*)$", ln)
        if m:
            cur_id, cur_label = int(m.group(1)), m.group(2)
        elif (
            cur_id is not None
            and "Location" in ln
            and path_needle in ln
            and "Scan" in cur_label
            and cur_id not in scan_ids
        ):
            scan_ids.append(cur_id)
    assert scan_ids, f"no parquet scan of {path_needle!r} in plan:\n{plan}"
    for scan_id in scan_ids:
        nid = nodes.get(scan_id, (None, None))[1]
        between: list[str] = []
        while nid is not None:
            label, parent = nodes[nid]
            if "Join" in label:
                assert "BroadcastHashJoin" in label, (
                    f"state scan {scan_id} of {path_needle!r} reaches "
                    f"{label!r}, not a BroadcastHashJoin — the state side "
                    f"is being shuffled:\n{plan}"
                )
                break
            assert "Exchange" not in label, (
                f"Exchange {label!r} between state scan {scan_id} of "
                f"{path_needle!r} and its join — the state is shuffled "
                f"before joining (path so far: {between}):\n{plan}"
            )
            between.append(label)
            nid = parent
        else:
            raise AssertionError(
                f"state scan {scan_id} of {path_needle!r} has no Join "
                f"ancestor (walked {between}):\n{plan}"
            )


def assert_no_pre_join_aggregate(df: DataFrame, path_needle: str) -> None:
    """Round 14 (VERDICT item 3): the bulk-backfill fallback must not
    aggregate the ENTIRE state table before joining it with the batch —
    every parquet scan whose ``Location`` contains ``path_needle`` must
    reach its nearest Join ancestor with NO Aggregate node in between
    (Exchanges are allowed: the fallback's shuffled join is the point).
    The compliant shape computes per-key stats AFTER the join restricts
    state to batch-colliding keys (window over the collision remnant),
    so the full-state groupBy disappears from the plan entirely."""
    import re

    plan = explain_formatted(df)
    nodes = _parse_plan_tree(plan)
    scan_ids: list[int] = []
    cur_id, cur_label = None, ""
    for ln in plan.splitlines():
        m = re.match(r"^\((\d+)\)\s+(\S.*)$", ln)
        if m:
            cur_id, cur_label = int(m.group(1)), m.group(2)
        elif (
            cur_id is not None
            and "Location" in ln
            and path_needle in ln
            and "Scan" in cur_label
            and cur_id not in scan_ids
        ):
            scan_ids.append(cur_id)
    assert scan_ids, f"no parquet scan of {path_needle!r} in plan:\n{plan}"
    for scan_id in scan_ids:
        nid = nodes.get(scan_id, (None, None))[1]
        between: list[str] = []
        while nid is not None:
            label, parent = nodes[nid]
            if "Join" in label:
                break
            assert "Aggregate" not in label, (
                f"{label!r} aggregates the full state scan {scan_id} of "
                f"{path_needle!r} before any join (path so far: "
                f"{between}):\n{plan}"
            )
            between.append(label)
            nid = parent
