"""S4/S5 — HTTP source with an injectable transport.

The reference fetches PDFs with ``requests.get`` (bin/main.py:172-196) and
curls per-component title XML from the finding-aids web service
(bin/publish.rb:77-81). Here the network call is a *transport*: any callable
``url -> (status_code, body_bytes)``. Production wires
:func:`urllib_transport`; tests wire :func:`file_transport` (serves a local
tree through the same seam) or the deterministic :func:`fake_transport`.

Scale shape: fetches run as an Arrow-batched ``mapInPandas`` over the
*distinct* URL set — each URL is requested exactly once per run regardless
of how many daos reference it, matching the reference's exists-check skip
(bin/main.py:184-196), and the per-partition fan-out bounds concurrent
connections by the partition count, not the row count.
"""

from __future__ import annotations

import hashlib
import os
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: url -> (status_code, body)
Transport = Callable[[str], "tuple[int, bytes]"]


def fake_transport(url: str) -> tuple[int, bytes]:
    """Deterministic hermetic default: status and body derive from the URL
    hash (same distribution the round-1 pipeline stub used)."""
    h = hashlib.sha1(url.encode()).digest()
    status = [200, 200, 200, 401, 404][h[0] % 5]
    return status, (b"%PDF-" + h * 8 if status == 200 else b"")


def urllib_transport(timeout: float = 30.0) -> Transport:
    """The real thing (stdlib only): HTTP GET, returns (status, body).

    HTTP-level failures (404/500) come back as their status code with the
    error body, like ``requests.get`` — the pipeline's status-dispatch (F4)
    is the policy layer. Connection-level failures raise: at scale a task
    retry is the correct response to a dead link-local network, whereas a
    403 is data.
    """

    def get(url: str) -> tuple[int, bytes]:
        req = urllib.request.Request(url, headers={"User-Agent": "pulfa-spark/2"})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:  # response arrived; status is data
            return e.code, e.read()

    return get


def file_transport(root: str) -> Transport:
    """Serve ``<root>/<url-path>`` through the transport seam — the
    integration-shaped test double: same fetch operator, same status
    semantics (missing file → 404), zero network."""

    def get(url: str) -> tuple[int, bytes]:
        path = url.split("://", 1)[-1].split("/", 1)
        local = os.path.join(root, path[1] if len(path) == 2 else "")
        if not os.path.isfile(local):
            return 404, b""
        with open(local, "rb") as f:
            return 200, f.read()

    return get


def recording(transport: Transport, log_dir: str) -> Transport:
    """Wrap a transport with a worker-process-safe call log: one marker file
    per fetch. (An in-memory counter would stay behind in the Python worker
    processes; the filesystem is the only channel tests can observe.)"""

    def get(url: str) -> tuple[int, bytes]:
        os.makedirs(log_dir, exist_ok=True)
        marker = hashlib.sha1(url.encode()).hexdigest()
        with open(os.path.join(log_dir, marker), "a") as f:
            f.write(url + "\n")
        return transport(url)

    return get


FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def fetch_urls(
    urls: DataFrame, transport: Transport, url_col: str = "url"
) -> DataFrame:
    """S4 — the HTTP source operator: distinct URLs in, (url, status,
    content) out. One request per distinct URL per run."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url in pdf["url"]:
                status, body = transport(url)
                rows.append({"url": url, "status": status, "content": body})
            yield pd.DataFrame(rows, columns=["url", "status", "content"])

    return (
        urls.select(F.col(url_col).alias("url")).distinct().mapInPandas(gen, FETCH_SCHEMA)
    )


TITLE_SCHEMA = T.StructType(
    [
        T.StructField("component_id", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("unit_title", T.StringType()),
    ]
)


def webservice_titles(
    components: DataFrame,
    base_url: str,
    transport: Transport,
    id_col: str = "component_id",
) -> DataFrame:
    """S5 — the publish.rb web-service join (bin/publish.rb:77-81): GET
    ``<base_url><component_id>.xml``, read ``//c/did/unittitle`` and
    ``//c/did/unitdate``, emit ``title: date`` with double quotes stripped
    (the reference's ``gsub(/"/, '')``). Join the result back on
    ``component_id`` for the METS label."""

    def parse_title(body: bytes) -> str:
        try:
            root = ET.fromstring(body)
        except ET.ParseError:
            return ""
        t = root.findtext(".//did/unittitle") or ""
        d = root.findtext(".//did/unitdate") or ""
        return (t + ": " + d).replace('"', "")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid in pdf[id_col]:
                status, body = transport(base_url + cid + ".xml")
                rows.append(
                    {
                        "component_id": cid,
                        "status": status,
                        "unit_title": parse_title(body) if status == 200 else None,
                    }
                )
            yield pd.DataFrame(rows, columns=["component_id", "status", "unit_title"])

    return (
        components.select(F.col(id_col).alias("component_id"))
        .distinct()
        .mapInPandas(gen, TITLE_SCHEMA)
    )
