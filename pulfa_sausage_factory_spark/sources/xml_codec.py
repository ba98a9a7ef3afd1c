"""S1/S9/S10/S11 — XML source/sink codec for EAD / folder / METS documents.

The reference parses EADs with libxml2 XPath (bin/main.py:121-168), emits an
intermediate "folder" document per object (bin/dao.py:182-204), transforms it
to METS via Saxon XSLT (lib/folder2mets.xsl), and rewrites dao attributes in
the source EAD in place (bin/main.py:480-541).

Engine shape (SURVEY.md §7 hard part 1): documents flatten to DataFrames for
relational work — sibling order becomes an explicit ``sibling_pos`` column —
and document rewriting happens document-at-a-time inside ``mapInPandas``
(one EAD is one row; Arrow batches many EADs per task). XSLT is replaced by
direct string assembly from nested structs: folder2mets.xsl is ~4 templates
of attribute plumbing (P11/W4), no XSLT engine needed.

Everything here is stdlib ``xml.etree.ElementTree`` — hermetic, no lxml.
"""

from __future__ import annotations

from collections.abc import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EAD_NS = "urn:isbn:1-931666-22-9"
XLINK_NS = "http://www.w3.org/1999/xlink"
METS_NS = "http://www.loc.gov/METS/"

DAO_SCHEMA = T.StructType(
    [
        T.StructField("ead_id", T.StringType()),
        T.StructField("c_id", T.StringType()),
        T.StructField("sibling_pos", T.IntegerType()),
        T.StructField("href", T.StringType()),
        T.StructField("role", T.StringType()),
        T.StructField("show", T.StringType()),
        T.StructField("unittitle", T.StringType()),
        T.StructField("unitdate", T.StringType()),
    ]
)


def _q(ns: str, tag: str) -> str:
    return f"{{{ns}}}{tag}"


def _text_excluding(el: ET.Element, skip_tag: str) -> str:
    """Text content of ``el`` excluding subtrees with ``skip_tag`` (the
    reference reads unittitle and unitdate as separate XPath strings even
    though unitdate usually nests inside unittitle, bin/main.py:149-151)."""
    parts = [el.text or ""]
    for child in el:
        if child.tag != skip_tag:
            parts.append("".join(child.itertext()))
        parts.append(child.tail or "")
    return "".join(parts)


def _parse_one_ead(xml_text: str) -> list[dict]:
    """Flatten one EAD: one row per dao with its component id, sibling
    position among the did's daos, xlink attrs, and unittitle/unitdate
    (reference XPath: bin/main.py:123-168)."""
    root = ET.fromstring(xml_text)
    eadid_el = root.find(f".//{_q(EAD_NS, 'eadid')}")
    ead_id = (eadid_el.text or "").strip() if eadid_el is not None else ""
    rows: list[dict] = []
    for c in root.iter():
        if not c.tag.startswith(f"{{{EAD_NS}}}c"):
            continue
        c_id = c.get("id")
        if c_id is None:
            continue
        did = c.find(_q(EAD_NS, "did"))
        if did is None:
            continue
        unittitle_el = did.find(_q(EAD_NS, "unittitle"))
        unitdate_el = did.find(f"{_q(EAD_NS, 'unittitle')}/{_q(EAD_NS, 'unitdate')}")
        if unitdate_el is None:
            unitdate_el = did.find(_q(EAD_NS, "unitdate"))
        unittitle = (
            _text_excluding(unittitle_el, _q(EAD_NS, "unitdate"))
            if unittitle_el is not None
            else None
        )
        unitdate = "".join(unitdate_el.itertext()) if unitdate_el is not None else None
        for pos, dao in enumerate(did.findall(_q(EAD_NS, "dao"))):
            rows.append(
                {
                    "ead_id": ead_id,
                    "c_id": c_id,
                    "sibling_pos": pos,
                    "href": dao.get(_q(XLINK_NS, "href")),
                    "role": dao.get(_q(XLINK_NS, "role")),
                    "show": dao.get(_q(XLINK_NS, "show")),
                    "unittitle": unittitle,
                    "unitdate": unitdate,
                }
            )
    return rows


def parse_ead_daos(
    files: DataFrame, content_col: str = "content", path_col: str | None = None
) -> DataFrame:
    """S1 — EAD files (e.g. from ``listing.list_files(with_content=True)``)
    → flat dao DataFrame. One EAD per input row; Arrow-batched.

    With ``path_col``, each dao row also carries its source file path, so
    downstream stages can re-key files by equi-join on path instead of
    re-matching ead_id against raw XML (the reference keys by filesystem
    layout throughout; bin/publish.rb:30-45).
    """
    schema = DAO_SCHEMA
    if path_col is not None:
        schema = T.StructType(
            [T.StructField(path_col, T.StringType())] + list(DAO_SCHEMA.fields)
        )
    cols = [f.name for f in schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            paths = pdf[path_col] if path_col is not None else [None] * len(pdf)
            for blob, path in zip(pdf[content_col], paths):
                text = bytes(blob).decode("utf-8") if not isinstance(blob, str) else blob
                rows = _parse_one_ead(text)
                if path_col is not None:
                    for r in rows:
                        r[path_col] = path
                out.extend(rows)
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(gen, schema)


def candidate_daos(daos: DataFrame) -> DataFrame:
    """F1/W2/W5/P1-P3 — the reference's dao selection over a flat dao table
    (bin/main.py:133-165): href contains .pdf, not in /Accessions/, show
    ≠ none, no following METS dao; plus normalized title and pdf_idx."""
    from pyspark.sql import Window

    from pulfa_sausage_factory_spark.functions import scalars

    w = Window.partitionBy("ead_id", "c_id").orderBy("sibling_pos")
    is_pdf = F.col("href").contains(".pdf")
    cands = (
        daos.withColumn(
            "has_following_mets",
            F.coalesce(
                F.max(F.when(F.col("role") == METS_NS, 1).otherwise(0)).over(
                    w.rowsBetween(1, Window.unboundedFollowing)
                ),
                F.lit(0),
            )
            == 1,
        )
        .filter(
            is_pdf
            & ~F.col("href").contains("/Accessions/")
            & (F.col("show").isNull() | (F.col("show") != "none"))
            & ~F.col("has_following_mets")
        )
        .drop("has_following_mets")
    )
    w_pdf = Window.partitionBy("ead_id", "c_id").orderBy("sibling_pos")
    title = scalars.escape_quotes(
        scalars.normalize_whitespace(
            F.concat_ws(", ", F.col("unittitle"), F.col("unitdate"))
        )
    )
    return cands.withColumn("pdf_idx", F.row_number().over(w_pdf) - 1).withColumn(
        "pdf_title", title
    )


# ---------------------------------------------------------------------------
# S9/S10 — folder + METS rendering (replaces dao.py XML emit + Saxon XSLT)
# ---------------------------------------------------------------------------

REP_FIELDS = ("use", "cannonical", "urn", "checksum", "size", "mimetype", "width", "height")


def render_folder_xml(objid: str, created: str, members: list[dict]) -> str:
    """S9 — the intermediate folder document (bin/dao.py:182-204): one
    ``member`` per page / whole-object file, each holding representation
    elements. ``members``: dicts with abs_name, wholepart and a ``reps``
    list of dicts over REP_FIELDS. Deterministic: caller pins ``created``
    (nondeterminism sources are parameters, SURVEY.md §5)."""
    folder = ET.Element("folder", {"objid": objid, "created": created})
    for m in sorted(members, key=lambda m: m["abs_name"]):
        member = ET.SubElement(
            folder, "member", {"abs_name": m["abs_name"], "wholepart": m["wholepart"]}
        )
        for rep in m["reps"]:
            attrs = {k: str(rep[k]) for k in REP_FIELDS if rep.get(k) is not None}
            ET.SubElement(member, "representation", attrs)
    return ET.tostring(folder, encoding="unicode")


def folder_to_mets(
    objid: str,
    created: str,
    label: str | None,
    members: list[dict],
) -> str:
    """S10/P11/W4 — folder → METS without XSLT (lib/folder2mets.xsl:13-106):
    mets root with OBJID/LABEL/TYPE, metsHdr CREATEDATE, fileSec with one
    fileGrp per use, structMap with ORDER = 1-based member position
    (count(preceding-sibling::member)+1, folder2mets.xsl:86-90)."""
    mets = ET.Element(
        _q(METS_NS, "mets"),
        {
            "OBJID": objid,
            "LABEL": label if label else "[No title]",  # folder2mets.xsl:97
            "TYPE": "CompiledDigitalObject",
        },
    )
    hdr = ET.SubElement(mets, _q(METS_NS, "metsHdr"), {"CREATEDATE": created})
    agent = ET.SubElement(hdr, _q(METS_NS, "agent"), {"ROLE": "CREATOR", "TYPE": "OTHER"})
    ET.SubElement(agent, _q(METS_NS, "name")).text = "pulfa_sausage_factory_spark"

    ordered = sorted(members, key=lambda m: m["abs_name"])
    file_sec = ET.SubElement(mets, _q(METS_NS, "fileSec"))
    by_use: dict[str, list[tuple[int, dict]]] = {}
    for order, m in enumerate(ordered, start=1):
        for rep in m["reps"]:
            by_use.setdefault(rep["use"], []).append((order, rep))
    for use in sorted(by_use):
        grp = ET.SubElement(file_sec, _q(METS_NS, "fileGrp"), {"USE": use})
        for order, rep in by_use[use]:
            attrs = {
                "ID": f"f{use[0]}{order:08d}",
                "CHECKSUMTYPE": "SHA-1",
                "CHECKSUM": str(rep["checksum"]),
                "SIZE": str(rep["size"]),
                "MIMETYPE": str(rep["mimetype"]),
            }
            f_el = ET.SubElement(grp, _q(METS_NS, "file"), attrs)
            ET.SubElement(
                f_el,
                _q(METS_NS, "FLocat"),
                {"LOCTYPE": "URN", _q(XLINK_NS, "href"): str(rep["urn"])},
            )

    struct = ET.SubElement(mets, _q(METS_NS, "structMap"))
    top = ET.SubElement(
        struct, _q(METS_NS, "div"), {"TYPE": "CompiledDigitalObject"}
    )
    for order, m in enumerate(ordered, start=1):
        div = ET.SubElement(
            top,
            _q(METS_NS, "div"),
            {"ORDER": str(order), "LABEL": f"[{order}]", "TYPE": m["wholepart"]},
        )
        for rep in m["reps"]:
            ET.SubElement(div, _q(METS_NS, "fptr"), {"FILEID": f"f{rep['use'][0]}{order:08d}"})
    return ET.tostring(mets, encoding="unicode")


MEMBER_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("abs_name", T.StringType()),
            T.StructField("wholepart", T.StringType()),
            T.StructField(
                "reps",
                T.ArrayType(
                    T.StructType(
                        [T.StructField(f, T.StringType()) for f in REP_FIELDS]
                    )
                ),
            ),
        ]
    )
)


def render_mets_column(grouped: DataFrame, created: str) -> DataFrame:
    """Distributed S10: DataFrame(objid, label, members: MEMBER_STRUCT) →
    (objid, mets_xml). Document-at-a-time inside mapInPandas."""
    out_schema = T.StructType(
        [T.StructField("objid", T.StringType()), T.StructField("mets_xml", T.StringType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                members = [
                    {
                        "abs_name": m["abs_name"],
                        "wholepart": m["wholepart"],
                        "reps": [dict(rep) for rep in m["reps"]],
                    }
                    for m in r["members"]
                ]
                rows.append(
                    {
                        "objid": r["objid"],
                        "mets_xml": folder_to_mets(r["objid"], created, r.get("label"), members),
                    }
                )
            yield pd.DataFrame(rows, columns=["objid", "mets_xml"])

    return grouped.mapInPandas(gen, out_schema)


# ---------------------------------------------------------------------------
# S11/P10/F4 — in-place EAD dao rewrite
# ---------------------------------------------------------------------------

def update_ead_xml(xml_text: str, updates: list[dict]) -> str:
    """Apply the reference's post-pipeline dao rewrite to one EAD document
    (bin/main.py:480-541): for each update (src_url, pdf_resp_status,
    mets_uri, intact):

    - status 401/404 → set ``xlink:show="none"`` on the matching dao
      (main.py:495-507)
    - status 200 + intact → first dao whose href == src_url gets
      ``xlink:role=METS_NS`` and ``xlink:href=mets_uri`` (main.py:508-532)
    - anything else → leave untouched (logged + skipped in the reference)

    Untouched document content is preserved (the whole tree round-trips;
    only matched dao attributes change).
    """
    ET.register_namespace("ead", EAD_NS)
    ET.register_namespace("xlink", XLINK_NS)
    root = ET.fromstring(xml_text)
    by_href: dict[str, list[ET.Element]] = {}
    for dao in root.iter(_q(EAD_NS, "dao")):
        href = dao.get(_q(XLINK_NS, "href"))
        if href is not None:
            by_href.setdefault(href, []).append(dao)
    for u in updates:
        matches = by_href.get(u["src_url"], [])
        if not matches:
            continue
        dao = matches[0]  # XPath [1] semantics (main.py:491-493)
        status = u.get("pdf_resp_status")
        if status in (401, 404):
            dao.set(_q(XLINK_NS, "show"), "none")
        elif status == 200 and u.get("intact", True):
            dao.set(_q(XLINK_NS, "role"), METS_NS)
            dao.set(_q(XLINK_NS, "href"), u["mets_uri"])
    return ET.tostring(root, encoding="unicode")


def update_eads(eads: DataFrame, report: DataFrame) -> DataFrame:
    """Distributed S11: (ead_id, xml) ⨝ report(ead_id, src_url,
    pdf_resp_status, mets_uri, intact) → (ead_id, xml) with rewritten daos.
    One document per group — ``applyInPandas`` keyed on ead_id, so one EAD
    never splits across tasks (ordering/fidelity contract)."""
    joined = eads.join(
        report.groupBy("ead_id").agg(
            F.collect_list(
                F.struct("src_url", "pdf_resp_status", "mets_uri", "intact")
            ).alias("updates")
        ),
        "ead_id",
        "left",
    )
    out_schema = T.StructType(
        [T.StructField("ead_id", T.StringType()), T.StructField("xml", T.StringType())]
    )

    def apply_one(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            updates = (
                [u.asDict() if hasattr(u, "asDict") else dict(u) for u in r["updates"]]
                if r["updates"] is not None
                else []
            )
            rows.append(
                {"ead_id": r["ead_id"], "xml": update_ead_xml(r["xml"], updates)}
            )
        return pd.DataFrame(rows, columns=["ead_id", "xml"])

    return joined.groupBy("ead_id").applyInPandas(
        lambda pdf: apply_one(pdf), out_schema
    )


# ---------------------------------------------------------------------------
# J3/S11 — EAD dao INSERT (the publish.rb family's EAD update)
# ---------------------------------------------------------------------------

def insert_dao_xml(
    xml_text: str, inserts: list[dict], remove_existing: bool = False
) -> str:
    """Insert a METS dao under ``//ead:c[@id]/ead:did`` for each
    (c_id, mets_href) — bin/publish.rb:120-141. ``remove_existing`` first
    strips the did's current daos (the dao-links-only variant's
    remove-webspace step, bin/publish_dao-links-only.rb:117-120). New dao:
    ``xlink:type="simple" xlink:role=METS xlink:href=<mets_href>``."""
    ET.register_namespace("ead", EAD_NS)
    ET.register_namespace("xlink", XLINK_NS)
    root = ET.fromstring(xml_text)
    dids_by_cid = {
        c.get("id"): c.find(_q(EAD_NS, "did"))
        for c in root.iter(_q(EAD_NS, "c"))
        if c.get("id") is not None
    }
    if remove_existing:
        # strip once per targeted did BEFORE any insert: removal inside the
        # per-insert loop would delete daos freshly inserted for the same
        # c_id, and did.remove() only detaches direct children — a dao
        # nested deeper needs its actual parent, found via a walk
        targeted = {
            id(did): did
            for ins in inserts
            if (did := dids_by_cid.get(str(ins["c_id"]).replace("/", "_")))
            is not None
        }
        for did in targeted.values():
            for parent in did.iter():  # iter() yields did itself first
                for dao in [
                    ch for ch in list(parent) if ch.tag == _q(EAD_NS, "dao")
                ]:
                    parent.remove(dao)
    for ins in inserts:
        # publish.rb:126 — the EAD @id uses '_' where the path uses '/'
        did = dids_by_cid.get(str(ins["c_id"]).replace("/", "_"))
        if did is None:
            continue
        dao = ET.SubElement(did, _q(EAD_NS, "dao"))
        dao.set(_q(XLINK_NS, "type"), "simple")
        dao.set(_q(XLINK_NS, "role"), METS_NS)
        dao.set(_q(XLINK_NS, "href"), ins["mets_href"])
    return ET.tostring(root, encoding="unicode")


def insert_daos(
    eads: DataFrame, components: DataFrame, remove_existing: bool = False
) -> DataFrame:
    """Distributed J3: (ead_id, xml) ⨝ components(ead_id, c_id, mets_href)
    → (ead_id, xml) with inserted daos; one EAD per task group."""
    joined = eads.join(
        components.groupBy("ead_id").agg(
            F.collect_list(F.struct("c_id", "mets_href")).alias("inserts")
        ),
        "ead_id",
        "left",
    )
    out_schema = T.StructType(
        [T.StructField("ead_id", T.StringType()), T.StructField("xml", T.StringType())]
    )

    def apply_one(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            inserts = (
                [dict(i) if isinstance(i, dict) else i.asDict() for i in r["inserts"]]
                if r["inserts"] is not None
                else []
            )
            rows.append(
                {
                    "ead_id": r["ead_id"],
                    "xml": insert_dao_xml(r["xml"], inserts, remove_existing),
                }
            )
        return pd.DataFrame(rows, columns=["ead_id", "xml"])

    return joined.groupBy("ead_id").applyInPandas(
        lambda pdf: apply_one(pdf), out_schema
    )
