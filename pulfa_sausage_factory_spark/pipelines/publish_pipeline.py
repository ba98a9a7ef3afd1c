"""EP2 — ``ruby publish.rb <callno>`` (bin/publish.rb:35-154) as a
checkpoint-free DataFrame pipeline (EP2 is single-pass; the restartability
contract is the idempotent sinks, not stage checkpoints).

Reference stage → engine stage (SURVEY.md §3 EP2):

1. scan ``jp2_store/<callno>/*`` component dirs (S6) + skip dotted
   names (F2)                                      publish.rb:63-69
2. anti-join components with an existing pdf (J5/F3; the mets-only
   variant flips to a semi-join)                   publish.rb:72 / -mets-only:65
3. per component: curl title XML (S5/J2) → ``title: date`` with quotes
   stripped (P2/P3)                                publish.rb:77-81
4. reps from jp2+tiff stores (S6/S8) → group by abs_name (A1) → METS
   render (S9/S10), idempotent write               publish.rb:92-109
5. insert METS dao under ``//ead:c[@id]/ead:did`` (J3/S11); the
   dao-links-only variant removes existing daos first
                                                   publish.rb:120-141
6. tiffs → page PDFs (U2) → ordered pdftk concat (S14), idempotent
   write                                           publish.rb:144-146 → dirtopdf.sh

Variants (one config knob each, like the four publish*.rb scripts):
``mets_only`` (semi-join, no PDF), ``pdfs_only`` (no EAD update),
``dao_links_only`` (EAD rewrite only, remove+insert).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.functions import scalars, subprocess_udf
from pulfa_sausage_factory_spark.sinks import idempotent
from pulfa_sausage_factory_spark.sources import (
    http_transport,
    listing,
    xml_codec,
)


@dataclass
class PublishConfig:
    """publish.rb's conf block (publish.rb:37-56) as parameters."""

    work_dir: str  # outputs: mets/, pdfs/, eads_updated/
    jp2_root: str
    tiff_root: str
    eads_root: str
    base_url: str = "http://findingaids.example.edu/folders/"
    transport: object = field(default=http_transport.fake_transport)
    created: str = "2012-01-01T00:00:00Z"
    variant: str = "full"  # full | mets_only | pdfs_only | dao_links_only

    def out_dir(self, name: str) -> str:
        return os.path.join(self.work_dir, name)


def scan_components(spark: SparkSession, cfg: PublishConfig, callno: str) -> DataFrame:
    """Stages 1+2 — component ids under ``jp2_root/<callno>`` with the
    existing-pdf guard. Components are directories; the listing source
    enumerates files, so component ids are the distinct first-level dir
    names of jp2 files (F2's no-dot rule holds by construction: a name
    with '.' is a file, and files at the callno level are skipped)."""
    jp2s = listing.list_files(
        spark, os.path.join(cfg.jp2_root, callno), glob="*.jp2", recursive=True
    )
    comp = F.regexp_extract(
        "path", f"/{callno}/([^/]+)/", 1
    )
    comps = (
        jp2s.select(comp.alias("component"))
        .filter(F.col("component") != "")
        .distinct()
        .withColumn("component_id", F.concat(F.lit(callno + "/"), "component"))
    )
    # dao-links-only rewrites dao links for ALREADY-published components —
    # the reference (publish_dao-links-only.rb:55-58) walks every non-dotted
    # component with no PDF-existence check, so an existing-PDF anti-join
    # here would skip exactly the components it should process
    if cfg.variant == "dao_links_only":
        return comps
    # J5/F3 — the reference's File.exists?(jp2_store + component_id + '.pdf')
    pdfs = listing.list_files(
        spark, os.path.join(cfg.jp2_root, callno), glob="*.pdf", recursive=False
    ).select(
        F.regexp_replace(
            listing.file_name(), r"\.pdf$", ""
        ).alias("component")
    )
    how = "left_semi" if cfg.variant == "mets_only" else "left_anti"
    return comps.join(pdfs, "component", how)


def fetch_titles(comps: DataFrame, cfg: PublishConfig) -> DataFrame:
    """Stage 3 — S5/J2: web-service title per component (P2/P3 inside
    ``webservice_titles``: ``title: date``, quotes stripped)."""
    titles = http_transport.webservice_titles(
        comps, cfg.base_url, cfg.transport
    )
    return comps.join(titles, "component_id", "left")


def build_mets(
    spark: SparkSession, comps: DataFrame, cfg: PublishConfig, callno: str
) -> DataFrame:
    """Stage 4 — reps from both stores (S6/S8), A1 group-collect, S10
    render, idempotent METS write. Same member shape as EP1 stage 5."""
    jp2s = listing.list_files(
        spark, os.path.join(cfg.jp2_root, callno), glob="*.jp2",
        recursive=True, with_content=True,
    )
    tiffs = listing.list_files(
        spark, os.path.join(cfg.tiff_root, callno), glob="*.tif",
        recursive=True, with_content=True,
    )
    reps = tiffs.unionByName(jp2s)
    meta = subprocess_udf.extract_binary_meta(reps)

    rel = F.concat(
        F.lit(callno + "/"),
        F.regexp_extract("path", f"/{callno}/(.+)$", 1),
    )
    abs_name = F.regexp_replace(rel, F.lit(r"\.[a-z0-9]+$"), F.lit(""))
    use = scalars.use_from_path(F.col("path"))
    derived = meta.select(
        abs_name.alias("abs_name"),
        rel.alias("cannonical"),
        use.alias("use"),
        scalars.urn_for(use, rel).alias("urn"),
        F.col("meta.sha1").alias("checksum"),
        F.col("meta.byte_len").cast("string").alias("size"),
        F.col("meta.mime").alias("mimetype"),
        F.col("meta.width").cast("string").alias("width"),
        F.col("meta.height").cast("string").alias("height"),
        F.lit("part").alias("wholepart"),
        F.substring_index(abs_name, "/", 2).alias("objid"),
    )
    members = (
        derived.join(
            F.broadcast(comps.select(F.col("component_id").alias("objid"))),
            "objid",
            "left_semi",
        )
        .groupBy("objid", "abs_name", "wholepart")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "use", "cannonical", "urn", "checksum", "size",
                        "mimetype", "width", "height",
                    )
                )
            ).alias("reps")
        )
        .groupBy("objid")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("abs_name", "wholepart", "reps"))
            ).alias("members")
        )
    )
    titled = members.join(
        comps.select(F.col("component_id").alias("objid"), F.col("unit_title")),
        "objid",
        "left",
    ).withColumn("label", F.col("unit_title")).drop("unit_title")
    mets = xml_codec.render_mets_column(titled, cfg.created)
    mets_path = F.concat(
        F.lit(cfg.out_dir("mets") + "/"),
        F.replace("objid", F.lit("/"), F.lit("_")),
        F.lit(".mets"),
    )
    out = mets.select("objid", mets_path.alias("mets_path"), "mets_xml")
    idempotent.write_files(
        out.select(F.col("mets_path").alias("out_path"), F.col("mets_xml").alias("payload"))
    )
    return out.drop("mets_xml")


def update_eads(
    spark: SparkSession, comps: DataFrame, cfg: PublishConfig, callno: str
) -> DataFrame:
    """Stage 5 — J3/S11: insert the METS dao per component into its EAD
    (``<eads_root>/<callno>.EAD.xml``); dao-links-only removes first."""
    eads = listing.list_files(
        spark, cfg.eads_root, glob=f"{callno}.EAD.xml", with_content=True
    ).select(
        F.lit(callno).alias("ead_id"),
        F.col("content").cast("string").alias("xml"),
    )
    inserts = comps.select(
        F.lit(callno).alias("ead_id"),
        F.col("component_id").alias("c_id"),
        F.concat(F.lit(cfg.base_url), "component_id", F.lit(".mets")).alias(
            "mets_href"
        ),
    )
    updated = xml_codec.insert_daos(
        eads, inserts, remove_existing=(cfg.variant == "dao_links_only")
    )
    out_path = F.concat(
        F.lit(cfg.out_dir("eads_updated") + "/"), F.col("ead_id"), F.lit(".EAD.xml")
    )
    result = updated.select("ead_id", out_path.alias("out_path"), "xml")
    idempotent.write_files(
        result.select("out_path", F.col("xml").alias("payload")), overwrite=True
    )
    return result.drop("xml")


def build_pdfs(
    spark: SparkSession, comps: DataFrame, cfg: PublishConfig, callno: str
) -> DataFrame:
    """Stage 6 — dirtopdf: per-component tiffs sorted by path (the
    ``find | sort`` contract), page-encoded (U2 adapter; fake keeps bytes),
    folded via the S14 ordered concat, written idempotently."""
    tiffs = listing.list_files(
        spark, os.path.join(cfg.tiff_root, callno), glob="*.tif",
        recursive=True, with_content=True,
    )
    comp = F.regexp_extract("path", f"/{callno}/([^/]+)/", 1)
    pages = (
        tiffs.withColumn("component", comp)
        .join(F.broadcast(comps.select("component")), "component", "left_semi")
        .withColumn(
            "page_no",
            F.row_number().over(Window.partitionBy("component").orderBy("path")) - 1,
        )
        .select(
            F.concat(F.lit(callno + "/"), "component").alias("doc_key"),
            "page_no",
            F.col("content").alias("page_bytes"),
        )
    )
    pdfs = subprocess_udf.assemble_pdfs(pages)
    pdf_path = F.concat(
        F.lit(cfg.jp2_root.rstrip("/") + "/"),
        F.col("doc_key"),
        F.lit(".pdf"),
    )
    out = pdfs.select("doc_key", pdf_path.alias("out_path"), "pdf_bytes")
    idempotent.write_files(
        out.select("out_path", F.col("pdf_bytes").alias("payload"))
    )
    return out.drop("pdf_bytes")


def run_publish(spark: SparkSession, callno: str, cfg: PublishConfig) -> dict:
    """EP2 end-to-end for one call number; returns per-stage counts (the
    run-report shape, as in EP1)."""
    comps = fetch_titles(scan_components(spark, cfg, callno), cfg)
    counts = {"components": comps.count()}
    if cfg.variant != "dao_links_only":
        counts["mets"] = build_mets(spark, comps, cfg, callno).count()
    if cfg.variant in ("full", "mets_only", "dao_links_only"):
        counts["eads"] = update_eads(spark, comps, cfg, callno).count()
    if cfg.variant in ("full", "pdfs_only"):
        counts["pdfs"] = build_pdfs(spark, comps, cfg, callno).count()
    return counts
