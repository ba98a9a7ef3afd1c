"""EP2 — publish.rb as a DataFrame pipeline: component scan, web-service
title join, METS render, J3 dao insert, S14 ordered PDF build, and the
variant semantics (anti vs semi join, remove+insert)."""

from __future__ import annotations

import os
import struct

import pytest

from pulfa_sausage_factory_spark.functions import subprocess_udf
from pulfa_sausage_factory_spark.pipelines import publish_pipeline
from pulfa_sausage_factory_spark.sources import http_transport

CALLNO = "MC001"
EAD_XML = """<ead xmlns="urn:isbn:1-931666-22-9" xmlns:xlink="http://www.w3.org/1999/xlink">
<eadid>MC001</eadid><archdesc><dsc>
<c id="MC001_c001"><did><unittitle>One</unittitle>
<dao xlink:href="http://old/webspace/x.pdf" xlink:type="simple"/></did></c>
<c id="MC001_c002"><did><unittitle>Two</unittitle></did></c>
</dsc></archdesc></ead>"""


@pytest.fixture()
def tree(tmp_path):
    jp2 = tmp_path / "jp2" / CALLNO
    tiff = tmp_path / "tiff" / CALLNO
    for comp in ("c001", "c002"):
        (jp2 / comp).mkdir(parents=True)
        (tiff / comp).mkdir(parents=True)
        for page in ("00000001", "00000002"):
            (jp2 / comp / f"{page}.jp2").write_bytes(b"JP2:" + comp.encode() + page.encode())
            (tiff / comp / f"{page}.tif").write_bytes(b"TIF:" + comp.encode() + page.encode())
    eads = tmp_path / "eads"
    eads.mkdir()
    (eads / f"{CALLNO}.EAD.xml").write_text(EAD_XML)
    ws = tmp_path / "ws"  # web service tree for file_transport
    for comp in ("c001", "c002"):
        p = ws / CALLNO / f"{comp}.xml"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(
            f'<c><did><unittitle>"T {comp}"</unittitle>'
            f"<unitdate>1900</unitdate></did></c>"
        )
    return tmp_path


def _cfg(tree, variant="full"):
    return publish_pipeline.PublishConfig(
        work_dir=str(tree / "work"),
        jp2_root=str(tree / "jp2"),
        tiff_root=str(tree / "tiff"),
        eads_root=str(tree / "eads"),
        base_url="http://svc/",
        transport=http_transport.file_transport(str(tree / "ws")),
        variant=variant,
    )


def test_full_publish_end_to_end(spark, tree):
    counts = publish_pipeline.run_publish(spark, CALLNO, _cfg(tree))
    assert counts == {"components": 2, "mets": 2, "eads": 1, "pdfs": 2}

    # METS written with web-service titles (quotes stripped — publish.rb:81)
    mets = (tree / "work" / "mets" / "MC001_c001.mets").read_text()
    assert "T c001: 1900" in mets and '"' not in "T c001: 1900"
    # both stores contributed reps
    assert "thumbnail" in mets or "deliverable" in mets or "master" in mets

    # J3 — dao inserted under the matching c/did with the METS href
    ead = (tree / "work" / "eads_updated" / f"{CALLNO}.EAD.xml").read_text()
    assert "http://svc/MC001/c001.mets" in ead
    assert "http://svc/MC001/c002.mets" in ead
    assert "http://old/webspace/x.pdf" in ead  # full variant inserts, keeps old

    # S14 — PDF pages folded in path order (fake concat is invertible)
    pdf = (tree / "jp2" / CALLNO / "c001.pdf").read_bytes()
    assert pdf.startswith(b"%PDF-CAT")
    body, pages = pdf[8:], []
    while body:
        (n,) = struct.unpack(">I", body[:4])
        pages.append(body[4 : 4 + n])
        body = body[4 + n :]
    assert pages == [b"TIF:c00100000001", b"TIF:c00100000002"]


def test_existing_pdf_anti_join_skips(spark, tree):
    (tree / "jp2" / CALLNO / "c001.pdf").write_bytes(b"%PDF-EXISTING")
    counts = publish_pipeline.run_publish(spark, CALLNO, _cfg(tree))
    assert counts["components"] == 1  # c001 skipped (publish.rb:72)
    assert (tree / "jp2" / CALLNO / "c001.pdf").read_bytes() == b"%PDF-EXISTING"


def test_mets_only_semi_join(spark, tree):
    (tree / "jp2" / CALLNO / "c001.pdf").write_bytes(b"%PDF-EXISTING")
    counts = publish_pipeline.run_publish(spark, CALLNO, _cfg(tree, "mets_only"))
    # publish-mets-only.rb:65 — only components WITH a pdf, and no pdf build
    assert counts == {"components": 1, "mets": 1, "eads": 1}


def test_dao_links_only_removes_then_inserts(spark, tree):
    counts = publish_pipeline.run_publish(
        spark, CALLNO, _cfg(tree, "dao_links_only")
    )
    assert "mets" not in counts and "pdfs" not in counts
    ead = (tree / "work" / "eads_updated" / f"{CALLNO}.EAD.xml").read_text()
    assert "http://old/webspace/x.pdf" not in ead  # removed (links-only:117-120)
    assert "http://svc/MC001/c001.mets" in ead


def test_dao_links_only_ignores_existing_pdfs(spark, tree):
    # dao-links-only exists to rewrite links for ALREADY-published
    # components (which have PDFs) — the reference walks every non-dotted
    # component with no PDF check (publish_dao-links-only.rb:55-58), so an
    # existing .pdf must NOT exclude its component
    (tree / "jp2" / CALLNO / "c001.pdf").write_bytes(b"%PDF-EXISTING")
    counts = publish_pipeline.run_publish(
        spark, CALLNO, _cfg(tree, "dao_links_only")
    )
    assert counts["components"] == 2
    ead = (tree / "work" / "eads_updated" / f"{CALLNO}.EAD.xml").read_text()
    assert "http://svc/MC001/c001.mets" in ead
    assert "http://svc/MC001/c002.mets" in ead


def test_assemble_pdfs_orders_by_page_no(spark):
    rows = [("d", 2, b"C"), ("d", 0, b"A"), ("d", 1, b"B"), ("e", 0, b"Z")]
    pages = spark.createDataFrame(rows, "doc_key string, page_no int, page_bytes binary")
    got = {
        r.doc_key: bytes(r.pdf_bytes)
        for r in subprocess_udf.assemble_pdfs(pages).collect()
    }
    def unfold(b):
        body, out = b[8:], []
        while body:
            (n,) = struct.unpack(">I", body[:4])
            out.append(body[4 : 4 + n]); body = body[4 + n :]
        return out
    assert unfold(got["d"]) == [b"A", b"B", b"C"]
    assert unfold(got["e"]) == [b"Z"]


def test_pdftk_argv_shape():
    argv = subprocess_udf.pdftk_cat_argv(["/t/1.pdf", "/t/2.pdf"], "/t/out.pdf")
    assert argv == ["pdftk", "/t/1.pdf", "/t/2.pdf", "cat", "output", "/t/out.pdf"]
    cvt = subprocess_udf.convert_page_pdf_argv("/t/i.tif", "/t/o.pdf", resize=3200)
    assert cvt[:3] == ["convert", "-density", "200x200"]
    assert "-resize" in cvt and "3200x3200" in cvt
