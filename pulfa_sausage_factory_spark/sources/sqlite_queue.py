"""S7 — the SQLite ``ImageDirs`` work-queue source
(reference: bin/pulfarize.rb:99-107, bin/makepdf.rb:39-54).

On a real cluster this is a JDBC scan (``jdbc:sqlite:`` with the xerial
driver, filter pushed down). That driver jar isn't bundled here, so the
loader reads via the stdlib ``sqlite3`` on the driver and parallelizes the
rows — correct for work queues, which are small by construction (they
enumerate directories, not files). The filter/claim semantics are
DataFrame ops either way.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the reference's "pending" marker: ``where Note=" "`` (bin/pulfarize.rb:101)
PENDING = " "


def read_table(spark: SparkSession, db_path: str, table: str) -> DataFrame:
    """Read one SQLite table into a DataFrame (driver-side fetch; see module
    docstring for the JDBC-at-scale story)."""
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f"SELECT * FROM {table}")  # noqa: S608 — table from config
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    return spark.createDataFrame(rows, schema=cols)


def pending_work(spark: SparkSession, db_path: str, table: str = "ImageDirs",
                 note_col: str = "Note") -> DataFrame:
    """The reference's queue scan: rows still marked pending."""
    return read_table(spark, db_path, table).filter(F.col(note_col) == PENDING)
