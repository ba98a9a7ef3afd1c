"""M3 — the subprocess / C-library UDF boundary (SURVEY.md §2.i).

Every reference shell-out (pdfimages U1, convert U2, kdu_compress U3, ocrad
U4, aspell U5, pyexiv2 U9) becomes an Arrow-batched ``mapInPandas`` stage:
bytes in → subprocess → rows out. The external tools aren't in this
container, so each operator ships a deterministic pure-Python fallback —
the Spark-side plumbing (schemas, batching, explode shape, partition
sizing) is the real, tested artifact; the tool invocation is a parameter.

U1 is the UDTF exemplar: one (doc, pdf_bytes) row in → N page rows out.
"""

from __future__ import annotations

import hashlib
import subprocess
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def run_tool(argv: list[str], stdin_bytes: bytes, timeout: float = 60.0) -> bytes:
    """One guarded subprocess call: bytes→bytes with timeout and stderr
    capture (the engine's version of main.py's check_output wrappers)."""
    proc = subprocess.run(
        argv,
        input=stdin_bytes,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        timeout=timeout,
        check=False,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{argv[0]} failed rc={proc.returncode}: {proc.stderr[:500].decode(errors='replace')}"
        )
    return proc.stdout


PAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_key", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("page_bytes", T.BinaryType()),
        T.StructField("page_sha1", T.StringType()),
    ]
)


def _fake_pdfimages(blob: bytes, max_pages: int = 8) -> list[bytes]:
    """Deterministic stand-in for ``pdfimages`` (bin/main.py:237-249):
    page count derives from the content hash; each "page bitmap" is a
    content-derived chunk. Replace with the real tool via ``extractor=``."""
    h = hashlib.sha1(blob).digest()
    n_pages = (h[0] % max_pages) + 1
    return [hashlib.sha1(blob + bytes([i])).digest() * 4 for i in range(n_pages)]


def explode_pdf_pages(
    docs: DataFrame,
    key_col: str = "doc_key",
    content_col: str = "content",
    extractor: Callable[[bytes], list[bytes]] = _fake_pdfimages,
) -> DataFrame:
    """U1/S13 — the UDTF shape: explode each document into page rows
    (reference: one ``pdfimages`` subprocess per Pdf record,
    bin/main.py:211-251). Page numbering is W1-dense and 0-based within a
    doc. At scale: repartition upstream so each task holds a bounded number
    of documents; page bytes never pass through the driver."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for _, row in pdf.iterrows():
                blob = bytes(row[content_col])
                for i, page in enumerate(extractor(blob)):
                    out.append(
                        {
                            "doc_key": row[key_col],
                            "page_no": i,
                            "page_bytes": page,
                            "page_sha1": hashlib.sha1(page).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in PAGE_SCHEMA.fields])

    return docs.select(
        F.col(key_col).alias("doc_key"), F.col(content_col)
    ).mapInPandas(gen, PAGE_SCHEMA)


META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _sniff_mime(blob: bytes) -> str:
    if blob[:4] == b"%PDF":
        return "application/pdf"
    if blob[:2] == b"\xff\xd8":
        return "image/jpeg"
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        return "image/tiff"
    return "application/octet-stream"


def extract_binary_meta(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """U9/S8/X6 — per-file technical metadata (bin/dao.py:86-100): byte
    size, SHA-1, MIME sniff, pixel dims. Dims need an image decoder
    (pyexiv2 in the reference, Pillow at scale) — not bundled here, so they
    are None from the fallback; everything else is exact. Output appends a
    ``meta`` struct column."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob in pdf[content_col]:
                b = bytes(blob)
                metas.append(
                    {
                        "byte_len": len(b),
                        "sha1": hashlib.sha1(b).hexdigest(),
                        "mime": _sniff_mime(b),
                        # real decode is an optional dependency (STUB):
                        "width": None,
                        "height": None,
                    }
                )
            out = pdf.copy()
            out["meta"] = metas
            yield out

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("meta", META_SCHEMA)]
    )
    return df.mapInPandas(gen, out_schema)
