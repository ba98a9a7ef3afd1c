"""Scalar expression surface — the reference's "expression language"
re-expressed as pure Spark Column helpers (SURVEY.md §2.b P1–P12, §2.h).

Every helper is a composition of built-in ``pyspark.sql.functions`` — they
stay inside whole-stage codegen; zero Python UDFs. Reference citations are
to /root/reference/.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_whitespace(col: Column | str) -> Column:
    """P1 — trim + collapse runs of whitespace to a single space
    (reference: bin/main.py:40-43, used at :157)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def escape_quotes(col: Column | str) -> Column:
    """P2 — ``"`` → ``&quot;``, ``'`` → ``&apos;`` (bin/main.py:156)."""
    return F.regexp_replace(F.regexp_replace(col, '"', "&quot;"), "'", "&apos;")


def strip_double_quotes(col: Column | str) -> Column:
    """P2 variant — remove double quotes entirely (bin/publish.rb:81)."""
    return F.regexp_replace(col, '"', "")


def title_concat(title: Column | str, date: Column | str) -> Column:
    """P3 — ``concat(unittitle, ', ', unitdate)`` (bin/main.py:149-151).

    ``concat_ws`` skips nulls, matching the reference's behavior of only
    appending the date when present.
    """
    return F.concat_ws(", ", title, date)


def id_to_path(host_c_id: Column | str) -> Column:
    """P4 — component id → path: ``host_c_id.replace('_','/')``
    (bin/main.py:179,218,257,...)."""
    return F.replace(F.col(host_c_id) if isinstance(host_c_id, str) else host_c_id,
                     F.lit("_"), F.lit("/"))


def path_to_id(path: Column | str) -> Column:
    """P4 inverse — ``gsub('/','_')`` (bin/publish.rb:126)."""
    return F.replace(F.col(path) if isinstance(path, str) else path,
                     F.lit("/"), F.lit("_"))


def idx_suffix(base: Column | str, idx: Column | str) -> Column:
    """P4 — append ``_<idx>`` only when ``pdf_idx > 0``
    (bin/main.py:180,219-220,258-259)."""
    idx_c = F.col(idx) if isinstance(idx, str) else idx
    return F.concat(
        base if isinstance(base, Column) else F.col(base),
        F.when(idx_c > 0, F.concat(F.lit("_"), idx_c.cast("string"))).otherwise(F.lit("")),
    )


def zero_pad8(n: Column | str) -> Column:
    """P5 — ``%08d`` page numbering (bin/main.py:281; bin/pulfarize.rb:73;
    bin/dirtopdf.sh:98)."""
    return F.format_string("%08d", F.col(n) if isinstance(n, str) else n)


def ext_to_bits(ext: Column | str) -> Column:
    """P6 — extension → bit depth: ``.pbm→1, .pgm→8, else 24``
    (bin/main.py:273-279)."""
    e = F.col(ext) if isinstance(ext, str) else ext
    return (
        F.when(e == ".pbm", F.lit(1)).when(e == ".pgm", F.lit(8)).otherwise(F.lit(24))
    )


def floor_to_100(x: Column | str) -> Column:
    """P7 — round long side down to a multiple of 100; the reference's
    ``round(x,-2)`` + correct-if-rounded-up loop is exactly
    ``floor(x/100)*100`` (bin/main.py:302-305)."""
    c = F.col(x) if isinstance(x, str) else x
    return (F.floor(c / 100) * 100).cast("int")


def jp2_levels(size: Column | str) -> Column:
    """P8 — JP2 resolution level count: halvings of the long side while
    ``>= 96`` ≡ ``floor(log2(size/96)) + 1`` for size >= 96, else 0
    (bin/main.py:377-383)."""
    c = F.col(size) if isinstance(size, str) else size
    return F.when(c < 96, F.lit(0)).otherwise(
        (F.floor(F.log2(c.cast("double") / F.lit(96.0))) + 1).cast("int")
    )


def use_from_path(path: Column | str) -> Column:
    """P9 — ``use = endswith('.tif') ? 'master' : 'deliverable'``
    (bin/dao.py:77-80)."""
    c = F.col(path) if isinstance(path, str) else path
    return F.when(c.endswith(".tif"), F.lit("master")).otherwise(F.lit("deliverable"))


def urn_for(use: Column, cannonical: Column) -> Column:
    """P9 — ``'urn:pudl:images:' + use + ':' + cannonical`` (bin/dao.py:83)."""
    return F.concat(F.lit("urn:pudl:images:"), use, F.lit(":"), cannonical)


def label_or_default(title: Column | str) -> Column:
    """P11 — METS LABEL: title else ``[No title]`` (lib/folder2mets.xsl:97)."""
    c = F.col(title) if isinstance(title, str) else title
    return F.coalesce(F.nullif(c, F.lit("")), F.lit("[No title]"))


def utc_stamp() -> Column:
    """P12 — UTC ISO-8601 ``created`` stamp (bin/dao.py:19-20,186).
    Session timezone is pinned to UTC in session.py."""
    return F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'")
