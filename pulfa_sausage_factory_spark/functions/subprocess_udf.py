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


# ---------------------------------------------------------------------------
# Real-tool argv adapters (U2/U3/U4/U5) — the exact command lines the
# reference shells out, as data. Each high-level adapter uses the real binary
# when present on PATH and the deterministic fake otherwise, so the same
# pipeline code runs hermetically in CI and against the real tools in prod.
# ---------------------------------------------------------------------------


def kdu_compress_argv(
    tiff_path: str, jp2_path: str, levels: int, bits: int = 8
) -> list[str]:
    """U3 — ``kdu_compress`` flags carried verbatim from bin/main.py:388-405
    (rate ladder, 8 quality layers, RPCL order, 256×256 precincts/tiles)."""
    argv = [
        "kdu_compress",
        "-i", tiff_path,
        "-o", jp2_path,
        "-rate",
        "1.2,0.7416334477,0.4583546103,0.2832827752,0.1750776907,"
        "0.1082041271,0.0668737897,0.0413302129",
        "Clayers=8",
        f"Clevels={levels}",
        "Cuse_precincts=yes", "Cprecincts={256,256}", "Cblk={64,64}",
        "Cuse_sop=yes", "Cuse_eph=yes", "Corder=RPCL",
        "ORGgen_plt=yes", "ORGtparts=R", "Stiles={256,256}",
    ]
    if bits == 24:
        argv += ["-jp2_space", "sRGB"]
    argv += ["-double_buffering", "10", "-num_threads", "4", "-no_weights"]
    return argv


def ocrad_argv(img_path: str, out_txt: str) -> list[str]:
    """U4 — ``ocrad -f -F utf8 <img> -o <txt>`` (bin/orient_image.sh:51-54)."""
    return ["ocrad", "-f", "-F", "utf8", img_path, "-o", out_txt]


def aspell_list_argv(lang: str = "en") -> list[str]:
    """U5 — ``aspell -l en list`` over stdin (bin/orient_image.sh:72)."""
    return ["aspell", "-l", lang, "list"]


def convert_rotate_argv(angle: int, src: str, dst: str) -> list[str]:
    """U2 — ``convert -rotate <angle> <src> <dst>`` (bin/orient_image.sh:40-42)."""
    return ["convert", "-rotate", str(angle), src, dst]


def _which(tool: str) -> str | None:
    import shutil

    return shutil.which(tool)


def encode_jp2(
    tiff_bytes: bytes, levels: int, bits: int = 8, runner: Callable = run_tool
) -> bytes:
    """U3 adapter: real ``kdu_compress`` when installed, identity-encode
    fake otherwise. File-based because kdu has no stdio mode."""
    import tempfile

    if _which("kdu_compress") is None:
        return tiff_bytes  # deterministic fake: bytes pass through
    with tempfile.TemporaryDirectory() as d:
        tif, jp2 = f"{d}/in.tif", f"{d}/out.jp2"
        with open(tif, "wb") as f:
            f.write(tiff_bytes)
        runner(kdu_compress_argv(tif, jp2, levels, bits), b"")
        with open(jp2, "rb") as f:
            return f.read()


def ocr_image(img_bytes: bytes, runner: Callable = run_tool) -> str:
    """U4 adapter: real ``ocrad`` when installed; fake = content-hash words
    (stable input for the downstream word-count / spellcheck vote)."""
    import tempfile

    if _which("ocrad") is None:
        h = hashlib.sha1(img_bytes).hexdigest()
        return " ".join(h[i : i + 4] for i in range(0, 16, 4))
    with tempfile.TemporaryDirectory() as d:
        img, txt = f"{d}/in.pbm", f"{d}/out.txt"
        with open(img, "wb") as f:
            f.write(img_bytes)
        runner(ocrad_argv(img, txt), b"")
        with open(txt, "r", errors="replace") as f:
            return f.read()


def misspelled_words(text: str, runner: Callable = run_tool) -> int:
    """U5 adapter: ``aspell list`` word count when installed; fake = count
    of vowel-less tokens, a deterministic stand-in (the a3 query models the
    dictionary-filter variant relationally)."""
    if _which("aspell") is None:
        toks = [t for t in text.lower().split() if t]
        return sum(1 for t in toks if not any(v in t for v in "aeiou"))
    out = runner(aspell_list_argv(), text.encode())
    return len(out.split())


PAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_key", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("page_bytes", T.BinaryType()),
        T.StructField("page_sha1", T.StringType()),
    ]
)


def convert_page_pdf_argv(src: str, dst: str, resize: int | None = None) -> list[str]:
    """U2/dirtopdf page encode — ``convert -density 200x200 [-resize NxN]
    -compress JPEG -quality 60 <in> <out>`` (bin/dirtopdf.sh:99-106)."""
    argv = ["convert", "-density", "200x200"]
    if resize:
        argv += ["-resize", f"{resize}x{resize}"]
    return argv + ["-compress", "JPEG", "-quality", "60", src, dst]


def pdftk_cat_argv(inputs: list[str], output: str) -> list[str]:
    """S14 — ``pdftk <p1> <p2> ... cat output <out>`` (bin/dirtopdf.sh:117-121;
    inputs pre-sorted, the reference's ``find | sort`` contract)."""
    return ["pdftk", *inputs, "cat", "output", output]


def concat_pdfs(page_blobs: list[bytes], runner: Callable = run_tool) -> bytes:
    """S14 adapter: real ``pdftk ... cat`` when installed; fake = header +
    length-prefixed page join (order-sensitive and invertible, so tests can
    assert page order survived the fold)."""
    import struct
    import tempfile

    if _which("pdftk") is None:
        out = [b"%PDF-CAT"]
        for p in page_blobs:
            out.append(struct.pack(">I", len(p)))
            out.append(p)
        return b"".join(out)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i, p in enumerate(page_blobs):
            path = f"{d}/{i:08d}.pdf"
            with open(path, "wb") as f:
                f.write(p)
            paths.append(path)
        dst = f"{d}/out.pdf"
        runner(pdftk_cat_argv(paths, dst), b"")
        with open(dst, "rb") as f:
            return f.read()


def assemble_pdfs(
    pages: DataFrame,
    key_col: str = "doc_key",
    order_col: str = "page_no",
    content_col: str = "page_bytes",
) -> DataFrame:
    """S14 — the ordered PDF concat sink as an operator: page rows in,
    one (key, pdf_bytes) row per document out.

    Ordering is data, not task order: pages collect per key and sort by
    ``order_col`` inside the aggregate (array_sort on (order, bytes)
    structs — JVM-side), then one fold per document through
    :func:`concat_pdfs`. Per-document page counts are bounded, so the
    collect_list is safe at any corpus size; the shuffle is one hash
    partition on the document key."""
    grouped = pages.groupBy(F.col(key_col).alias("doc_key")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(content_col).alias("b")))
        ).alias("ordered")
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_key", T.StringType()),
            T.StructField("pdf_bytes", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blobs = [bytes(m["b"]) for m in r["ordered"]]
                rows.append({"doc_key": r["doc_key"], "pdf_bytes": concat_pdfs(blobs)})
            yield pd.DataFrame(rows, columns=["doc_key", "pdf_bytes"])

    return grouped.mapInPandas(gen, out_schema)


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
    size, SHA-1, MIME sniff, pixel dims. Dims come from real container-
    header parsing (PNG/JPEG/GIF); formats needing a full decoder (the
    reference used pyexiv2) stay None. Output appends a ``meta`` struct
    column."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pulfa_sausage_factory_spark.operators.multimodal import (
            sniff_image_meta,
        )

        for pdf in batches:
            metas = []
            for blob in pdf[content_col]:
                b = bytes(blob)
                # container-header dims (PNG IHDR / JPEG SOFn / GIF LSD) —
                # real parsing, no decoder lib; unparseable containers
                # (pdf, tiff, opaque) keep None
                _, w, h = sniff_image_meta(b)
                metas.append(
                    {
                        "byte_len": len(b),
                        "sha1": hashlib.sha1(b).hexdigest(),
                        "mime": _sniff_mime(b),
                        "width": w,
                        "height": h,
                    }
                )
            out = pdf.copy()
            out["meta"] = metas
            yield out

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("meta", META_SCHEMA)]
    )
    return df.mapInPandas(gen, out_schema)


# ---------------------------------------------------------------------------
# U2+U4+U5 composed — the orient_image.sh vote as one operator
# (bin/orient_image.sh:31-79). The o23 query models the same vote
# relationally (oracle-checked); this is the subprocess-boundary form that
# runs the real convert/ocrad/aspell when installed.
# ---------------------------------------------------------------------------

ORIENT_ANGLES = (0, 90, 180, 270)  # north, east, south, west

#: variant-file suffix per angle — the reference works on files named
#: ``$TMP/$name-{north,east,south,west}`` (orient_image.sh:32-35) and its
#: ``sort -n`` tie-break is the whole-LINE lexicographic fallback, which
#: on equal counts compares these suffixes: east < north < south < west
ORIENT_SUFFIX = {0: "north", 90: "east", 180: "south", 270: "west"}


def _fake_rotate(blob: bytes, angle: int) -> bytes:
    """Deterministic stand-in for ``convert -rotate``: tags the bytes so
    tests can read back which rotation won."""
    return b"ROT%03d:" % angle + blob


def orient_image(
    img_bytes: bytes, runner: Callable = run_tool
) -> tuple[int, bytes]:
    """One image → (winning_angle, rotated_bytes), the orient_image.sh
    decision procedure verbatim:

    1. rotate to the four cardinal orientations (U2)
    2. OCR each (U4); word-count each text (least junk = most words is
       WRONG way up — sideways scans OCR to whitespace noise, so the
       *bottom two* word counts are the upright/upside-down pair)
    3. aspell-count misspellings on the bottom two (U5); fewest wins
    4. ties: ``sort -n`` falls back to whole-line lexicographic comparison,
       and the lines end in the variant file names (``<name>-east`` <
       ``-north`` < ``-south`` < ``-west``) — reproduced here bit-exactly,
       including the second sort's lexicographic (not numeric) comparison
       of the embedded word count on misspelling ties
    """
    import tempfile

    have_tools = all(_which(t) for t in ("convert", "ocrad", "aspell"))
    variants: list[tuple[int, bytes, str]] = []  # (angle, rotated, ocr_text)
    if have_tools:
        with tempfile.TemporaryDirectory() as d:
            src = f"{d}/in.img"
            with open(src, "wb") as f:
                f.write(img_bytes)
            for angle in ORIENT_ANGLES:
                dst = f"{d}/rot{angle}.img"
                if angle == 0:
                    dst = src  # cp $file $north_file
                else:
                    runner(convert_rotate_argv(angle, src, dst), b"")
                with open(dst, "rb") as f:
                    rotated = f.read()
                variants.append((angle, rotated, ocr_image(rotated, runner)))
    else:
        for angle in ORIENT_ANGLES:
            rotated = _fake_rotate(img_bytes, angle)
            variants.append((angle, rotated, ocr_image(rotated, runner)))

    # bottom two by OCR word count: `sort -n $wc_table | head -2` over lines
    # "<wc> <path>" — numeric on wc, whole-line lexicographic on ties, and
    # the paths differ only in their -<direction> suffix
    by_wc = sorted(
        variants,
        key=lambda v: (len(v[2].split()), ORIENT_SUFFIX[v[0]]),
    )
    bottom_two = by_wc[:2]
    # fewest misspelled wins: `sort -n | head -1` over lines
    # "<missp> <wc> <path>" — on missp ties the fallback compares the REST
    # OF THE LINE lexicographically, i.e. the word count as a string (so
    # wc 10 sorts before wc 9), then the direction suffix
    winner = min(
        bottom_two,
        key=lambda v: (
            misspelled_words(v[2], runner),
            f"{len(v[2].split())} {ORIENT_SUFFIX[v[0]]}",
        ),
    )
    return winner[0], winner[1]


ORIENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("oriented", T.BinaryType()),
    ]
)


def orient_images(
    df: DataFrame, content_col: str = "content", id_col: str = "id"
) -> DataFrame:
    """The per-image vote as an Arrow-batched stage: bounded work per row
    (4 rotations + 4 OCRs + 2 spellchecks), embarrassingly parallel, no
    shuffle — the mapInPandas twin of the reference's per-file shell loop
    (bin/main.py:253-266 invoking orient_image.sh)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                angle, oriented = orient_image(bytes(blob))
                rows.append({"id": int(i), "orientation": angle, "oriented": oriented})
            yield pd.DataFrame(rows, columns=["id", "orientation", "oriented"])

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        gen, ORIENT_SCHEMA
    )
