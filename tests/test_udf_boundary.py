"""M3 — the subprocess/UDTF boundary (U1 explode exemplar, U9 metadata) and
multimodal plumbing (X6)."""

from __future__ import annotations

import hashlib

from pulfa_sausage_factory_spark.functions import subprocess_udf


def test_explode_pdf_pages_udtf_shape(spark):
    """U1: one doc row in → N page rows out; page numbering dense 0-based;
    deterministic across runs (retry-safety for side-effecting stages)."""
    docs = spark.createDataFrame(
        [("d1", bytearray(b"%PDF-fake-one")), ("d2", bytearray(b"%PDF-fake-two"))],
        ["doc_key", "content"],
    )
    pages = subprocess_udf.explode_pdf_pages(docs).cache()
    rows = pages.collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_key, []).append(r)
    assert set(by_doc) == {"d1", "d2"}
    for doc_rows in by_doc.values():
        nums = sorted(r.page_no for r in doc_rows)
        assert nums == list(range(len(nums)))  # W1-dense, 0-based
        for r in doc_rows:
            assert r.page_sha1 == hashlib.sha1(bytes(r.page_bytes)).hexdigest()
    rows2 = subprocess_udf.explode_pdf_pages(docs).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_run_tool_subprocess():
    """The real subprocess path (used when the external tool exists)."""
    out = subprocess_udf.run_tool(["cat"], b"hello")
    assert out == b"hello"
    try:
        subprocess_udf.run_tool(["false"], b"")
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "failed rc=1" in str(e)


def test_extract_binary_meta(spark):
    """U9/S8/X6: sha1/size/MIME over opaque binary columns; decoder-needing
    fields are stubbed (None) but schema/batch shape is real."""
    blobs = [
        ("pdf", b"%PDF-1.4 fake"),
        ("jpg", b"\xff\xd8\xff\xe0 fake"),
        ("png", b"\x89PNG\r\n\x1a\n fake"),
        ("tif", b"II*\x00 fake"),
        ("other", b"plain"),
    ]
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs], ["kind", "content"]
    )
    out = {r.kind: r.meta for r in subprocess_udf.extract_binary_meta(df).collect()}
    assert out["pdf"].mime == "application/pdf"
    assert out["jpg"].mime == "image/jpeg"
    assert out["png"].mime == "image/png"
    assert out["tif"].mime == "image/tiff"
    assert out["other"].mime == "application/octet-stream"
    for kind, blob in blobs:
        assert out[kind].byte_len == len(blob)
        assert out[kind].sha1 == hashlib.sha1(blob).hexdigest()
        assert out[kind].width is None  # stubbed decode, documented
