"""bench.py stdout-line capture contract (round-9, VERDICT r8 item 1).

The round driver stores only the LAST 2,000 chars of bench.py's stdout;
round 8's line grew to 3,440 chars (query_stats rode on it) and
BENCH_r08.json recorded ``parsed: null`` — a full round's canonical
headline evidence was lost even though bench ran rc=0. These tests pin
the repaired contract: the stdout line carries only the bounded
STDOUT_FIELDS and its WORST-CASE serialization stays under the budget,
so adding a field or an extra key that regresses the capture fails CI
instead of silently voiding a future round's artifact.

No SparkSession needed — this is pure payload-shape arithmetic.
"""

import json

import bench


def _worst_case_full() -> dict:
    """A full result dict with every field at maximum realistic width.

    Widths are deliberately pessimistic: 5-digit seconds with 3 decimals
    (99999.999 — 1,000× anything ever measured), every query AND every
    extra failed (so ``failed`` lists the entire vocabulary), and all the
    unbounded diagnostics fields populated, which the projection must
    drop.
    """
    wide = 99999.999
    queries = {name: wide for name in bench.BENCH_QUERIES}
    extras = {name: wide for name in bench.EXTRA_KEYS}
    stats = {
        name: {"min": wide, "median": wide, "max": wide}
        for name in [*bench.BENCH_QUERIES, *bench.EXTRA_KEYS]
    }
    errors = {
        name: "X" * 500 for name in [*bench.BENCH_QUERIES, *bench.EXTRA_KEYS]
    }
    return {
        "metric": "headline_query_set_wall_time",
        "value": wide * len(queries),
        # round-13 calibration-adjusted twin (VERDICT r12 item 5)
        "value_calib_adj": wide * len(queries),
        "calib_ref_ms": 99.99,
        "unit": "sec",
        "estimator": "min_of_99_reps",
        "queries": queries,
        "query_stats": stats,
        "cold_queries": {name: wide for name in bench.BENCH_QUERIES},
        "cache_build_queries": {name: wide for name in bench.BENCH_QUERIES},
        "extra_queries": extras,
        # round-12 env context: bounded scalar vocabulary, worst-case
        # widths (the projection passes it through to the line)
        "env": {
            "load1_start": wide,
            "load1_end": wide,
            "calib_ms_start": wide,
            "calib_ms_end": wide,
            "wall_sec": wide,
            "host_busy_pct": 100.0,
            "steal_pct": 100.0,
            # round-15 scaling caveat (VERDICT r14 item 7) — fixed string,
            # worst case IS the real value
            "sched_floor_note": (
                "sf0.1 is scheduler-bound; "
                "core scaling in stress 100x"
            ),
        },
        "sf": 0.1,
        "stats_file": "BENCH_STATS.json",
        "cold_note": "n" * 200,
        "variance_note": "n" * 200,
        "errors": errors,
    }


def test_worst_case_stdout_line_fits_driver_capture():
    line = json.dumps(bench.build_stdout_payload(_worst_case_full()))
    assert len(line) < bench.STDOUT_LINE_BUDGET, (
        f"stdout line is {len(line)} chars at worst-case field widths — "
        f"over the {bench.STDOUT_LINE_BUDGET} budget (driver captures "
        "2,000); move the new field to BENCH_STATS.json instead"
    )


def test_stdout_payload_drops_unbounded_fields():
    out = bench.build_stdout_payload(_worst_case_full())
    assert set(out) <= set(bench.STDOUT_FIELDS)
    for banned in (
        "query_stats",
        "cold_queries",
        "cache_build_queries",
        "cold_note",
        "variance_note",
        "errors",
    ):
        assert banned not in out
    # error DETAIL is stats-file-only; the line keeps names only
    assert out["failed"] == sorted(
        [*bench.BENCH_QUERIES, *bench.EXTRA_KEYS]
    )


def test_stdout_payload_keeps_headline_fields():
    full = _worst_case_full()
    out = bench.build_stdout_payload(full)
    for key in ("metric", "value", "value_calib_adj", "unit", "estimator",
                "queries", "extra_queries", "env", "sf"):
        assert out[key] == full[key]
    # calib_ref_ms is stats-file-only (a fixed constant in bench.py —
    # it earns no stdout-line bytes)
    assert "calib_ref_ms" not in out
    # no-failures runs omit `failed` entirely (keys stay stable otherwise)
    clean = dict(full)
    clean.pop("errors")
    assert "failed" not in bench.build_stdout_payload(clean)


def test_headline_vocabulary_is_pinned():
    # the budget math above is only valid while the vocabularies match
    # what main() measures; EXTRA_KEYS is asserted against _extra_specs at
    # runtime inside main(), and this pins both lists' sizes so silent
    # growth shows up here first
    assert len(bench.BENCH_QUERIES) == 14
    # 14th extra added round 10 (overlap_fps_ingest — VERDICT r9 item 2)
    assert len(bench.EXTRA_KEYS) == 14
    assert len(set(bench.BENCH_QUERIES) & set(bench.EXTRA_KEYS)) == 0


def test_env_probes_are_shared_with_stress():
    # round 14 (VERDICT item 1): ONE env-probe implementation for both
    # harnesses — bench.py's established names must BE envprobe's
    # functions (aliases, not copies), the calib anchor must be the one
    # constant, and the probe outputs must stay bounded scalars (they
    # ride serialized stdout lines whose keys are contract).
    from pulfa_sausage_factory_spark import envprobe

    assert bench._load1 is envprobe.load1
    assert bench._proc_stat_cpu is envprobe.proc_stat_cpu
    assert bench._calibrate_ms is envprobe.calibrate_ms
    assert bench._env_context is envprobe.env_context
    assert bench.CALIB_REF_MS == envprobe.CALIB_REF_MS

    start = envprobe.env_start()
    assert {"t0", "load1", "calib_ms", "cpu"} <= set(start)
    ctx = envprobe.env_context(start)
    for key in ("load1_start", "load1_end", "calib_ms_start",
                "calib_ms_end", "wall_sec"):
        assert key in ctx
    assert all(
        v is None or isinstance(v, (int, float)) for v in ctx.values()
    )
    probe = envprobe.op_probe()
    assert set(probe) == {"load1", "calib_ms"}
    assert all(
        v is None or isinstance(v, (int, float)) for v in probe.values()
    )
