"""S1/S9/S10/S11 — XML parse, candidate selection, METS render, EAD update
(golden-style fixtures per SURVEY.md §5; nondeterminism pinned via the
``created`` parameter)."""

from __future__ import annotations

from xml.etree import ElementTree as ET

import pytest

from pulfa_sausage_factory_spark.sources import xml_codec

EAD_FIXTURE = """<?xml version="1.0" encoding="UTF-8"?>
<ead xmlns="urn:isbn:1-931666-22-9" xmlns:xlink="http://www.w3.org/1999/xlink">
  <eadheader><eadid>AC044</eadid></eadheader>
  <archdesc><dsc>
    <c id="AC044_c0001"><did>
      <unittitle>First   folder "quoted"<unitdate>1921-1930</unitdate></unittitle>
      <dao xlink:href="http://host/a.pdf"/>
      <dao xlink:href="http://host/b.pdf" xlink:show="none"/>
    </did></c>
    <c id="AC044_c0002"><did>
      <unittitle>Second folder</unittitle>
      <dao xlink:href="http://host/c.pdf"/>
      <dao xlink:href="http://host/c.mets" xlink:role="http://www.loc.gov/METS/"/>
      <dao xlink:href="http://host/Accessions/d.pdf"/>
    </did></c>
    <c id="AC044_c0003"><did>
      <unittitle>Third</unittitle>
      <dao xlink:href="http://host/e.pdf"/>
      <dao xlink:href="http://host/f.pdf"/>
    </did></c>
  </dsc></archdesc>
</ead>"""


@pytest.fixture(scope="module")
def daos(spark):
    files = spark.createDataFrame([("mem://ead", bytearray(EAD_FIXTURE.encode()))],
                                  ["path", "content"])
    return xml_codec.parse_ead_daos(files).cache()


def test_parse_ead_daos(daos):
    rows = {(r.c_id, r.sibling_pos): r for r in daos.collect()}
    assert len(rows) == 7
    assert rows[("AC044_c0001", 0)].href == "http://host/a.pdf"
    assert rows[("AC044_c0001", 1)].show == "none"
    assert rows[("AC044_c0002", 1)].role == "http://www.loc.gov/METS/"
    assert rows[("AC044_c0001", 0)].ead_id == "AC044"
    # nested unitdate text captured
    assert rows[("AC044_c0001", 0)].unitdate == "1921-1930"


def test_candidate_selection(daos):
    """F1 semantics on the golden EAD (bin/main.py:133-165):
    - a.pdf: candidate (pdf_idx 0)
    - b.pdf: excluded (show=none)
    - c.pdf: excluded (followed by a METS dao — W5)
    - Accessions/d.pdf: excluded (path filter)
    - e.pdf, f.pdf: candidates (idx 0 and 1)
    """
    cands = xml_codec.candidate_daos(daos)
    got = {(r.c_id, r.href): r for r in cands.collect()}
    assert set(got) == {
        ("AC044_c0001", "http://host/a.pdf"),
        ("AC044_c0003", "http://host/e.pdf"),
        ("AC044_c0003", "http://host/f.pdf"),
    }
    assert got[("AC044_c0003", "http://host/f.pdf")].pdf_idx == 1
    # P1/P2/P3: whitespace collapsed, quotes escaped, date appended
    assert (
        got[("AC044_c0001", "http://host/a.pdf")].pdf_title
        == "First folder &quot;quoted&quot;, 1921-1930"
    )


MEMBERS = [
    {
        "abs_name": "AC044/c0001/00000001",
        "wholepart": "part",
        "reps": [
            {"use": "master", "cannonical": "AC044/c0001/00000001.tif",
             "urn": "urn:pudl:images:master:AC044/c0001/00000001",
             "checksum": "aa11", "size": "100", "mimetype": "image/tiff",
             "width": "2000", "height": "3000"},
            {"use": "deliverable", "cannonical": "AC044/c0001/00000001.jp2",
             "urn": "urn:pudl:images:deliverable:AC044/c0001/00000001",
             "checksum": "bb22", "size": "50", "mimetype": "image/jp2",
             "width": "2000", "height": "3000"},
        ],
    },
    {
        "abs_name": "AC044/c0001/00000002",
        "wholepart": "part",
        "reps": [
            {"use": "master", "cannonical": "AC044/c0001/00000002.tif",
             "urn": "urn:pudl:images:master:AC044/c0001/00000002",
             "checksum": "cc33", "size": "120", "mimetype": "image/tiff",
             "width": "2000", "height": "3000"},
        ],
    },
]

CREATED = "2012-01-01T00:00:00Z"


def test_folder_render_golden():
    xml = xml_codec.render_folder_xml("AC044/c0001", CREATED, MEMBERS)
    root = ET.fromstring(xml)
    assert root.get("objid") == "AC044/c0001"
    assert root.get("created") == CREATED
    members = root.findall("member")
    assert [m.get("abs_name") for m in members] == [
        "AC044/c0001/00000001",
        "AC044/c0001/00000002",
    ]
    assert len(members[0].findall("representation")) == 2
    # byte-stable: same inputs → same output
    assert xml == xml_codec.render_folder_xml("AC044/c0001", CREATED, MEMBERS)


def test_mets_render_golden():
    ns = {"m": xml_codec.METS_NS}
    xml = xml_codec.folder_to_mets("AC044/c0001", CREATED, None, MEMBERS)
    root = ET.fromstring(xml)
    assert root.get("LABEL") == "[No title]"  # P11 default (folder2mets.xsl:97)
    grps = root.findall(".//m:fileGrp", ns)
    assert [g.get("USE") for g in grps] == ["deliverable", "master"]
    divs = root.findall(".//m:structMap/m:div/m:div", ns)
    assert [(d.get("ORDER"), d.get("LABEL")) for d in divs] == [("1", "[1]"), ("2", "[2]")]
    # W4: ORDER is the 1-based member position; fptr links to per-use file ids
    fptrs = divs[0].findall("m:fptr", ns)
    assert {f.get("FILEID") for f in fptrs} == {"fm00000001", "fd00000001"}
    labeled = xml_codec.folder_to_mets("X", CREATED, "A title", MEMBERS)
    assert ET.fromstring(labeled).get("LABEL") == "A title"


def test_update_ead_statuses(spark):
    """S11/P10/F4: 200+intact → role/href rewritten; 401/404 → show=none;
    500 → untouched; unmatched href → untouched; rest of doc preserved."""
    report = [
        {"src_url": "http://host/a.pdf", "pdf_resp_status": 200,
         "mets_uri": "http://mets/AC044_c0001.mets", "intact": True},
        {"src_url": "http://host/e.pdf", "pdf_resp_status": 404,
         "mets_uri": None, "intact": False},
        {"src_url": "http://host/f.pdf", "pdf_resp_status": 500,
         "mets_uri": None, "intact": False},
    ]
    out = xml_codec.update_ead_xml(EAD_FIXTURE, report)
    root = ET.fromstring(out)
    ns = {"e": xml_codec.EAD_NS, "x": xml_codec.XLINK_NS}
    daos = {d.get(f"{{{xml_codec.XLINK_NS}}}href"): d for d in root.iter(f"{{{xml_codec.EAD_NS}}}dao")}
    # 200: href replaced by mets uri, role set
    assert "http://mets/AC044_c0001.mets" in daos
    assert daos["http://mets/AC044_c0001.mets"].get(f"{{{xml_codec.XLINK_NS}}}role") == xml_codec.METS_NS
    # 404: show=none
    assert daos["http://host/e.pdf"].get(f"{{{xml_codec.XLINK_NS}}}show") == "none"
    # 500: untouched
    assert daos["http://host/f.pdf"].get(f"{{{xml_codec.XLINK_NS}}}show") is None
    # untouched content: unittitles survive
    titles = [
        "".join(t.itertext())
        for t in root.iter(f"{{{xml_codec.EAD_NS}}}unittitle")
    ]
    assert any("First" in t for t in titles)


def test_update_eads_distributed(spark):
    eads = spark.createDataFrame([("AC044", EAD_FIXTURE)], ["ead_id", "xml"])
    report = spark.createDataFrame(
        [("AC044", "http://host/a.pdf", 200, "http://mets/AC044_c0001.mets", True)],
        ["ead_id", "src_url", "pdf_resp_status", "mets_uri", "intact"],
    )
    out = xml_codec.update_eads(eads, report).collect()
    assert len(out) == 1
    assert "http://mets/AC044_c0001.mets" in out[0].xml


def test_insert_dao_remove_existing_nested_and_repeated():
    # remove_existing must (a) detach daos that are NOT direct children of
    # did via their real parent (did.remove on a nested dao raises
    # ValueError) and (b) run once per did BEFORE inserting, so two inserts
    # targeting the same c_id don't delete each other's fresh dao
    xml = """<ead xmlns="urn:isbn:1-931666-22-9"
      xmlns:xlink="http://www.w3.org/1999/xlink"><archdesc><dsc>
      <c id="MC9_c1"><did>
        <unittitle>T</unittitle>
        <dao xlink:href="http://old/direct.pdf"/>
        <daogrp><dao xlink:href="http://old/nested.pdf"/></daogrp>
      </did></c>
    </dsc></archdesc></ead>"""
    out = xml_codec.insert_dao_xml(
        xml,
        [
            {"c_id": "MC9/c1", "mets_href": "http://svc/MC9/c1.mets"},
            {"c_id": "MC9/c1", "mets_href": "http://svc/MC9/c1.extra.mets"},
        ],
        remove_existing=True,
    )
    assert "http://old/direct.pdf" not in out
    assert "http://old/nested.pdf" not in out
    assert "http://svc/MC9/c1.mets" in out
    assert "http://svc/MC9/c1.extra.mets" in out
