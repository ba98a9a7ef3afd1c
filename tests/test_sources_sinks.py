"""M2 — sources/sinks: %%-report codec, directory listing, SQLite queue,
idempotent file sinks (SURVEY.md S2/S3/S6/S7/S12/T1/T4)."""

from __future__ import annotations

import os
import sqlite3
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pulfa_sausage_factory_spark.io import load_table
from pulfa_sausage_factory_spark.sinks import idempotent
from pulfa_sausage_factory_spark.sources import listing, report_codec, sqlite_queue


def test_report_roundtrip(spark, sf_dir, tmp_path):
    """S2/S3: write orders as a %%-report, slurp it back; every value
    round-trips stringly (the documented reference degradation)."""
    orders = load_table(spark, sf_dir, "orders").limit(200)
    path = str(tmp_path / "report")
    header = report_codec.serialize_report(orders, path)
    assert header == sorted(orders.columns)

    back = report_codec.slurp_report(spark, path)
    assert back.columns == sorted(orders.columns)
    assert back.count() == orders.count()

    # values: compare against the same stringification done in-engine
    want = sorted(
        "|".join(str(v) for v in row)
        for row in orders.select(
            *[F.col(c).cast("string") for c in sorted(orders.columns)]
        ).collect()
    )
    got = sorted("|".join(str(v) for v in row) for row in back.collect())
    assert want == got

    # recast restores the typed schema
    schema = T.StructType(
        [T.StructField("o_orderkey", T.LongType()), T.StructField("o_totalprice", T.DoubleType())]
    )
    typed = report_codec.recast(back, schema)
    assert dict(typed.dtypes) == {"o_orderkey": "bigint", "o_totalprice": "double"}


def test_listing_glob_hidden_sort(spark, tmp_path):
    """S6: glob filter, hidden-file exclusion, path ordering."""
    root = tmp_path / "pages"
    root.mkdir()
    for name in ["00000002.tif", "00000001.tif", ".hidden.tif", "notes.txt"]:
        (root / name).write_bytes(b"x" * 10)
    df = listing.list_files(spark, str(root), glob="*.tif")
    paths = [os.path.basename(r.path) for r in df.collect()]
    assert paths == ["00000001.tif", "00000002.tif"]  # sorted, no hidden, no .txt


def test_listing_modified_after(spark, tmp_path):
    """T1: mtime watermark pruning (find -newer .last_run)."""
    root = tmp_path / "eads"
    root.mkdir()
    (root / "old.xml").write_text("<a/>")
    old_mtime = time.time() - 3600
    os.utime(root / "old.xml", (old_mtime, old_mtime))
    (root / "new.xml").write_text("<b/>")
    cutoff = time.strftime("%Y-%m-%dT%H:%M:%S", time.localtime(time.time() - 600))
    df = listing.list_files(spark, str(root), glob="*.xml", modified_after=cutoff)
    assert [os.path.basename(r.path) for r in df.collect()] == ["new.xml"]


def test_sqlite_queue(spark, tmp_path):
    """S7: ImageDirs work-queue scan with the Note=' ' pending filter."""
    db = str(tmp_path / "q.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE ImageDirs (dir TEXT, url TEXT, Note TEXT)")
    con.executemany(
        "INSERT INTO ImageDirs VALUES (?,?,?)",
        [
            ("/in/a", "http://findingaids.princeton.edu/collections/AC044/c0001", " "),
            ("/in/b", "http://findingaids.princeton.edu/collections/AC044/c0002", "done"),
            ("/in/c", "http://other.example.com/x", " "),
        ],
    )
    con.commit()
    con.close()
    pend = sqlite_queue.pending_work(spark, db)
    assert pend.count() == 2
    # F5 — URL-shape predicate on top of the queue (bin/makepdf.rb:45-49)
    matched = pend.filter(
        F.col("url").rlike(r"^http://findingaids\.princeton\.edu/collections/.*")
    )
    assert matched.count() == 1


def test_idempotent_write_and_rerun(spark, tmp_path):
    """S12/T4: writing twice produces identical state; existing outputs are
    never clobbered (the metamorphic rerun-is-a-noop property)."""
    dest = tmp_path / "out"
    dest.mkdir()
    rows = [(str(dest / f"f{i}.txt"), f"payload-{i}") for i in range(5)]
    df = spark.createDataFrame(rows, ["out_path", "payload"])
    idempotent.write_files(df)
    first = {p.name: p.read_text() for p in dest.glob("*.txt")}
    assert len(first) == 5

    # mutate one output; rerun must NOT overwrite it
    (dest / "f0.txt").write_text("externally-changed")
    idempotent.write_files(df)
    assert (dest / "f0.txt").read_text() == "externally-changed"

    # skip_existing prunes all rows already produced
    remaining = idempotent.skip_existing(df, str(dest))
    assert remaining.count() == 0


def test_finalize_move(spark, tmp_path):
    """S12 finalize: copy-then-delete, never overwrite (bin/main.py:543-588)."""
    src = tmp_path / "stage"
    dst = tmp_path / "final"
    src.mkdir()
    dst.mkdir()
    (src / "a.tif").write_bytes(b"A")
    (src / "b.tif").write_bytes(b"B")
    (dst / "b.tif").write_bytes(b"KEEP")  # pre-existing final: must survive
    df = spark.createDataFrame(
        [(str(src / n), str(dst / n)) for n in ("a.tif", "b.tif")],
        ["src_path", "dest_path"],
    )
    idempotent.finalize_move(df)
    assert (dst / "a.tif").read_bytes() == b"A"
    assert not (src / "a.tif").exists()  # moved
    assert (dst / "b.tif").read_bytes() == b"KEEP"  # never overwritten
    assert (src / "b.tif").exists()  # source kept when dest existed


def test_sqlite_pushdown_filters_inside_sqlite(spark, tmp_path):
    """S7: the pending predicate runs inside SQLite (observed via the
    connection trace), not as a post-hoc DataFrame filter."""
    db = str(tmp_path / "p.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE ImageDirs (dir TEXT, Note TEXT)")
    con.executemany(
        "INSERT INTO ImageDirs VALUES (?,?)",
        [("/a", " "), ("/b", "done"), ("/c", " ")],
    )
    con.commit()
    con.close()

    assert (
        sqlite_queue.build_select("ImageDirs", where="Note = ?")
        == "SELECT * FROM ImageDirs WHERE Note = ?"
    )
    pend = sqlite_queue.pending_work(spark, db)
    assert sorted(r.dir for r in pend.collect()) == ["/a", "/c"]
    # projection pushdown too
    slim = sqlite_queue.read_table(
        spark, db, "ImageDirs", where="Note = ?", params=(" ",), columns=["dir"]
    )
    assert slim.columns == ["dir"]


def test_sqlite_jdbc_path(spark, tmp_path):
    """S7 JDBC: real jdbc:sqlite scan when the xerial driver is present;
    a clear actionable error when it is not (never a silent fallback)."""
    import pytest

    db = str(tmp_path / "j.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE ImageDirs (dir TEXT, Note TEXT)")
    con.execute("INSERT INTO ImageDirs VALUES ('/a', ' ')")
    con.commit()
    con.close()
    try:
        spark._jvm.java.lang.Class.forName("org.sqlite.JDBC")
        has_driver = True
    except Exception:
        has_driver = False
    if not has_driver:
        with pytest.raises(RuntimeError, match="xerial"):
            sqlite_queue.read_table_jdbc(spark, db, "ImageDirs")
        pytest.skip("no sqlite JDBC driver on classpath; error path verified")
    df = sqlite_queue.read_table_jdbc(spark, db, "ImageDirs", where="Note = ' '")
    assert df.count() == 1


def test_jdbc_queue_scan_derby_pushdown(spark, tmp_path):
    """S7 JDBC executed for real: Spark bundles embedded Derby (metastore
    dependency), so the generic read_jdbc path runs end-to-end without the
    xerial jar — and the physical plan must show the queue predicate pushed
    into the database scan (PushedFilters), the property that keeps a
    cluster-sized work queue from streaming every row to the executors."""
    jvm = spark._jvm
    jvm.java.lang.System.setProperty("derby.system.home", str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/queue;create=true"
    con = jvm.java.sql.DriverManager.getConnection(url)
    st = con.createStatement()
    st.executeUpdate(
        "CREATE TABLE ImageDirs (dir VARCHAR(200), Note VARCHAR(10))"
    )
    for d, n in [("/a", " "), ("/b", "done"), ("/c", " ")]:
        st.executeUpdate(f"INSERT INTO ImageDirs VALUES ('{d}', '{n}')")
    st.close()
    con.close()

    df = sqlite_queue.read_jdbc(
        spark, f"jdbc:derby:{tmp_path}/queue", "ImageDirs", where="Note = ' '"
    )
    assert sorted(r["DIR"] for r in df.collect()) == ["/a", "/c"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "NOTE" in plan.upper()


def test_load_table_restores_session_conf(spark, sf_dir):
    # load_table normalizes events.ts (µs-without-tz parquet → TIMESTAMP_NTZ
    # on Spark 4) to TIMESTAMP without touching session conf; the legacy
    # nanosAsLong retry path must likewise never leave a conf change behind.
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    df = load_table(spark, sf_dir, "events")
    assert spark.conf.get(key, None) == before
    # the returned frame executes with ts normalized to instant TIMESTAMP
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    assert df.count() > 0


def test_load_table_ntz_normalization_preserves_wall_clock(spark, sf_dir):
    # The NTZ→TIMESTAMP cast must be wall-clock-preserving (UTC session tz):
    # raw NTZ read and normalized read agree on every value, so the DuckDB
    # oracle (which reads the same file as naive µs timestamps) stays in
    # lock-step. Guards the cast against a non-UTC session tz sneaking in.
    raw = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "ts")
    norm = load_table(spark, sf_dir, "events").select("event_id", "ts")
    if raw.schema["ts"].dataType.simpleString() != "timestamp_ntz":
        import pytest

        pytest.skip("fixture no longer NTZ — nothing to compare")
    a = {r.event_id: r.ts for r in raw.filter("event_id % 97 = 0").collect()}
    b = {
        r.event_id: r.ts.replace(tzinfo=None)
        for r in norm.filter("event_id % 97 = 0").collect()
    }
    assert len(a) > 0 and a == b


def test_nanos_timestamp_truncation_matches_duckdb(spark, tmp_path):
    # events.parquet stores TIMESTAMP(NANOS); load_table converts the nanos
    # long to µs via integer division while DuckDB casts ns parquet into its
    # µs timestamps. Pin the boundary behavior (sub-µs precision truncates,
    # never rounds) so a future fixture with ns precision can't silently
    # split the oracle.
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns_values = [
        1_500_000_000_000_000_999,  # .000000999 — truncates down
        1_500_000_000_000_001_001,  # .000001001 — lands on 1 µs
        1_500_000_000_123_456_789,
        999,                        # epoch + 999 ns → epoch
    ]
    table = pa.table(
        {
            "event_id": pa.array(range(len(ns_values)), pa.int64()),
            "ts": pa.array(ns_values, pa.timestamp("ns")),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got_spark = {
        r.event_id: r.ts
        for r in load_table(spark, str(tmp_path), "events").collect()
    }
    con = duckdb.connect()
    got_duck = dict(
        con.execute(
            f"SELECT event_id, ts FROM read_parquet('{tmp_path}/events.parquet')"
        ).fetchall()
    )
    assert len(got_spark) == len(ns_values)
    for k in got_duck:
        assert got_spark[k].replace(tzinfo=None) == got_duck[k].replace(
            tzinfo=None
        ), (k, got_spark[k], got_duck[k])
    # and the truncation is exact: 999 ns of sub-µs precision drops
    assert got_spark[0].microsecond == 0
    assert got_spark[1].microsecond == 1
