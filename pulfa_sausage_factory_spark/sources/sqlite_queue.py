"""S7 — the SQLite ``ImageDirs`` work-queue source
(reference: bin/pulfarize.rb:99-107, bin/makepdf.rb:39-54).

Two paths, one semantics:

- :func:`read_table` — stdlib ``sqlite3`` on the driver with the predicate
  and projection pushed into the SQLite query itself (the reference's
  ``select * from ImageDirs where Note=" "``), rows parallelized to a
  DataFrame. Correct for work queues, which are small by construction
  (they enumerate directories, not files).
- :func:`read_table_jdbc` — a real ``jdbc:sqlite:`` scan for clusters where
  the queue outgrows the driver (xerial driver on the classpath); Spark
  pushes filters down via the JDBC source. Raises a clear error when the
  driver jar is absent so callers can fall back explicitly.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the reference's "pending" marker: ``where Note=" "`` (bin/pulfarize.rb:101)
PENDING = " "


def build_select(
    table: str, where: str | None = None, columns: list[str] | None = None
) -> str:
    """The SQL actually sent to SQLite — predicate/projection pushdown is
    string assembly here, what the JDBC source does via Catalyst."""
    cols = ", ".join(columns) if columns else "*"
    sql = f"SELECT {cols} FROM {table}"  # noqa: S608 — table from config
    if where:
        sql += f" WHERE {where}"
    return sql


def read_table(
    spark: SparkSession,
    db_path: str,
    table: str,
    where: str | None = None,
    params: tuple = (),
    columns: list[str] | None = None,
) -> DataFrame:
    """Read one SQLite table into a DataFrame (driver-side fetch; module
    docstring has the JDBC-at-scale story). ``where``/``params`` run inside
    SQLite — the queue filter never materializes non-matching rows."""
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(build_select(table, where, columns), params)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    return spark.createDataFrame(rows, schema=cols)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    where: str | None = None,
    driver: str | None = None,
) -> DataFrame:
    """Generic JDBC queue scan — the engine-agnostic core of S7 at scale.

    Catalyst pushes the ``where`` predicate down to the database as a scan
    filter (``PushedFilters`` in the physical plan), so only matching queue
    rows ever cross the wire. Tested against embedded Derby (bundled with
    Spark), the same code path the sqlite/postgres/mysql URLs take."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    df = reader.load()
    return df.filter(where) if where else df


def read_table_jdbc(
    spark: SparkSession, db_path: str, table: str, where: str | None = None
) -> DataFrame:
    """S7 at scale: ``spark.read.jdbc`` against ``jdbc:sqlite:<path>`` with
    the xerial driver; Spark pushes ``where`` down as a scan predicate."""
    try:
        spark._jvm.java.lang.Class.forName("org.sqlite.JDBC")
    except Exception as e:  # driver jar not on the classpath
        raise RuntimeError(
            "sqlite JDBC driver (org.sqlite.JDBC / xerial) not on the Spark "
            "classpath; use read_table() or add the jar via spark.jars"
        ) from e
    return read_jdbc(
        spark, f"jdbc:sqlite:{db_path}", table, where=where, driver="org.sqlite.JDBC"
    )


def pending_work(spark: SparkSession, db_path: str, table: str = "ImageDirs",
                 note_col: str = "Note") -> DataFrame:
    """The reference's queue scan: rows still marked pending — the
    ``Note=" "`` predicate runs inside SQLite, as in bin/pulfarize.rb:101."""
    return read_table(
        spark, db_path, table, where=f"{note_col} = ?", params=(PENDING,)
    )
