"""S4/S5 — the injectable HTTP transport seam: the same fetch operator runs
against a real transport (file_transport is the integration-shaped double),
fetches each distinct URL exactly once, and composes with the idempotent
sink's skip semantics (F3/J5) end-to-end."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.sinks import idempotent
from pulfa_sausage_factory_spark.sources import http_transport


def _serve_tree(root, files: dict[str, bytes]) -> None:
    for rel, body in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(body)


def test_fetch_urls_transport_seam_and_idempotent_skip(spark, tmp_path):
    serve = tmp_path / "serve"
    out = tmp_path / "out"
    log1, log2 = str(tmp_path / "log1"), str(tmp_path / "log2")
    _serve_tree(str(serve), {"a/1.pdf": b"%PDF-one", "a/2.pdf": b"%PDF-two"})

    # 3 dao rows referencing 2 distinct URLs + 1 dead link
    refs = spark.createDataFrame(
        [
            ("http://x/a/1.pdf",),
            ("http://x/a/1.pdf",),
            ("http://x/a/2.pdf",),
            ("http://x/a/missing.pdf",),
        ],
        ["href"],
    )
    transport = http_transport.recording(
        http_transport.file_transport(str(serve)), log1
    )
    fetched = http_transport.fetch_urls(refs, transport, url_col="href")
    rows = {r.url: (r.status, bytes(r.content) if r.content else b"") for r in fetched.collect()}
    assert rows == {
        "http://x/a/1.pdf": (200, b"%PDF-one"),
        "http://x/a/2.pdf": (200, b"%PDF-two"),
        "http://x/a/missing.pdf": (404, b""),
    }
    # distinct-URL contract: one fetch per URL despite the duplicate ref
    assert len(os.listdir(log1)) == 3
    for marker in os.listdir(log1):
        with open(os.path.join(log1, marker)) as f:
            assert len(f.readlines()) == 1

    # downstream idempotent persist: first run writes the 200s ...
    ok = fetched.filter(F.col("status") == 200).select(
        F.concat(
            F.lit(str(out) + "/"), F.element_at(F.split("url", "/"), -1)
        ).alias("out_path"),
        F.col("content").alias("payload"),
    )
    idempotent.write_files(ok)
    first = {
        p: os.path.getmtime(os.path.join(str(out), p)) for p in os.listdir(out)
    }
    assert sorted(first) == ["1.pdf", "2.pdf"]

    # ... rerun fetches again (separate log) but rewrites nothing: the
    # skip_existing anti-join empties the work set before any file IO
    transport2 = http_transport.recording(
        http_transport.file_transport(str(serve)), log2
    )
    fetched2 = http_transport.fetch_urls(refs, transport2, url_col="href")
    ok2 = fetched2.filter(F.col("status") == 200).select(
        F.concat(
            F.lit(str(out) + "/"), F.element_at(F.split("url", "/"), -1)
        ).alias("out_path"),
        F.col("content").alias("payload"),
    )
    remaining = idempotent.skip_existing(ok2, str(out))
    assert remaining.count() == 0
    idempotent.write_files(remaining)
    second = {
        p: os.path.getmtime(os.path.join(str(out), p)) for p in os.listdir(out)
    }
    assert second == first  # byte-identical reruns: no file touched


def test_webservice_titles_parses_and_strips_quotes(spark, tmp_path):
    serve = tmp_path / "ws"
    _serve_tree(
        str(serve),
        {
            "C0001/c001.xml": (
                b"<c><did><unittitle>Letters, \"personal\"</unittitle>"
                b"<unitdate>1901-1910</unitdate></did></c>"
            ),
            "C0001/c002.xml": b"<c><did><unittitle>Maps</unittitle></did></c>",
        },
    )
    comps = spark.createDataFrame(
        [("C0001/c001",), ("C0001/c002",), ("C0001/c404",)], ["component_id"]
    )
    got = {
        r.component_id: (r.status, r.unit_title)
        for r in http_transport.webservice_titles(
            comps, "http://svc/", http_transport.file_transport(str(serve))
        ).collect()
    }
    # publish.rb:77-81 — title ': ' date, double quotes stripped
    assert got["C0001/c001"] == (200, "Letters, personal: 1901-1910")
    assert got["C0001/c002"] == (200, "Maps: ")
    assert got["C0001/c404"] == (404, None)


def test_ead_pipeline_accepts_file_transport(spark, tmp_path):
    """The pipeline config takes any transport — the seam the reference's
    requests.get sat behind (bin/main.py:172-196)."""
    from pulfa_sausage_factory_spark.pipelines import ead_pipeline

    cfg = ead_pipeline.EadPipelineConfig(
        work_dir=str(tmp_path / "work"),
        fetcher=http_transport.file_transport(str(tmp_path / "none")),
    )
    assert cfg.fetcher("http://x/y.pdf") == (404, b"")
