"""Persisted ANN index artifacts — build once, serve many (SURVEY.md
§2.l X3; the serving-side completion of ``operators.similarity``).

At 100 TB the index build (coarse k-means + residual codebook training +
corpus encoding) is an offline job measured in cluster-hours; query
sessions must LOAD the artifacts, not retrain per session. This module
persists the three tables an IVFADC index is made of —

- ``centroids``  (cell_id, cent)                 — n_cells rows
- ``codebooks``  (sub, code, cent, residual, cent_sig) — m × n_codes rows
- ``codes``      (id, cell_id, codes) / (id, codes)    — one row per
  corpus vector, m small ints: ~1-2 % of raw embedding bytes, the ONLY
  corpus-sized artifact

— as parquet subdirectories plus a one-row ``meta`` manifest, and
validates on load that the pieces belong together BEFORE any query runs
(the config-carrying artifact pattern: ``lm.NBModel`` carries hasher/dim,
codebooks carry a centroid fingerprint; the manifest carries everything).
A mismatched or hand-edited index refuses to serve instead of silently
scoring garbage.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.operators.similarity import (
    _centroid_signature,
    _codebook_config,
    knn_pq_rerank,
    pq_encode,
    train_ivf_centroids,
    train_pq_codebooks,
)

#: manifest format version — bump on layout changes so an old serving
#: binary fails loudly on a newer index instead of misreading it
_FORMAT = 1


@dataclass
class PQIndex:
    """The loaded/built index: three DataFrames + the config manifest."""

    codebooks: DataFrame
    codes: DataFrame
    centroids: DataFrame | None
    meta: dict = field(default_factory=dict)

    @property
    def residual(self) -> bool:
        return bool(self.meta.get("residual"))


def build_pq_index(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    n_cells: int | None = 16,
    iters: int = 2,
    ivf_iters: int = 3,
    sample_fraction: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> PQIndex:
    """Train + encode in one offline pass. ``n_cells`` set → the full
    IVFADC index (trained coarse centroids, RESIDUAL codebooks, coded
    corpus carrying cell ids); ``n_cells=None`` → flat PQ (raw codebooks,
    full-scan ADC shortlists). Everything downstream of the deterministic
    hash sample is reproducible bit-for-bit, so rebuilding from the same
    corpus yields the same artifacts.

    ``ivf_iters`` defaults higher than ``iters`` deliberately: coarse-
    centroid convergence is the measured quality lever for the residual
    family (RECALL.md — iters 2→3 moved composed IVFADC from below
    full-scan ADC to above it), while extra CODEBOOK iterations did not
    help on the measured corpora."""
    centroids = None
    if n_cells is not None:
        centroids = train_ivf_centroids(
            corpus, n_cells=n_cells, iters=ivf_iters,
            sample_fraction=sample_fraction, id_col=id_col, vec_col=vec_col,
        ).localCheckpoint()
    codebooks = train_pq_codebooks(
        corpus, m=m, n_codes=n_codes, iters=iters,
        sample_fraction=sample_fraction, id_col=id_col, vec_col=vec_col,
        dim=dim, centroids=centroids,
    ).localCheckpoint()
    codes = pq_encode(
        corpus, codebooks, id_col=id_col, vec_col=vec_col, centroids=centroids
    )
    meta = {
        "format": _FORMAT,
        "m": m,
        "n_codes": n_codes,
        "n_cells": n_cells,
        "dim": dim,
        "sublen": dim // m,
        "residual": centroids is not None,
        "cent_sig": _codebook_config(codebooks)[1],
        "id_col": id_col,
        "vec_col": vec_col,
    }
    return PQIndex(codebooks, codes, centroids, meta)


def save_pq_index(index: PQIndex, path: str) -> None:
    """Persist the index under ``path``: parquet subdirs ``codebooks/``,
    ``codes/``, ``centroids/`` (residual only) + the ``meta/`` manifest.
    Spark-side writes throughout, so the path can live on any filesystem
    the session reaches (hdfs://, s3a://, local). Overwrites atomically
    per subdirectory; the ``meta`` manifest is DELETED first and written
    LAST, so a save killed at any point — including an overwrite of an
    existing index, where a stale manifest would otherwise validate
    half-rewritten artifacts (the codes table is corpus-sized and none of
    load's checks count its rows) — leaves a manifest-less (→ unloadable)
    dir, never a manifest over partial artifacts."""
    from pulfa_sausage_factory_spark import fsutil

    spark = index.codebooks.sparkSession
    base = path.rstrip("/")
    # refuse saving an index back onto the path it is LAZILY READING from
    # (idx = load_pq_index(p); save_pq_index(idx, p)): Spark throws
    # 'cannot overwrite a path being read from' on the first data write,
    # but by then the manifest below would already be deleted — a healthy
    # index destroyed by a no-op save. inputFiles() is a listing, cheap.
    frames = [index.codebooks, index.codes] + (
        [index.centroids] if index.centroids is not None else []
    )
    marker = "/" + base.lstrip("/").rstrip("/") + "/"
    for df in frames:
        try:
            files = df.inputFiles()
        except Exception:  # non-file-based plan (freshly built index)
            continue
        if any(marker in f for f in files):
            raise ValueError(
                f"save_pq_index: index reads from the target path {base} "
                "— save to a different path, or materialize the frames "
                "(localCheckpoint) before overwriting in place"
            )
    # missing path is a no-op; a FAILED delete raises — proceeding with a
    # stale manifest in place would defeat the crash-ordering guarantee
    fsutil.delete(spark, f"{base}/meta")
    index.codebooks.write.mode("overwrite").parquet(f"{base}/codebooks")
    # the codes table is the corpus-sized artifact; everything else is KBs
    index.codes.write.mode("overwrite").parquet(f"{base}/codes")
    if index.centroids is not None:
        index.centroids.write.mode("overwrite").parquet(f"{base}/centroids")
    spark.createDataFrame(
        [(json.dumps(index.meta),)], "meta_json string"
    ).write.mode("overwrite").parquet(f"{base}/meta")


def load_pq_index(spark: SparkSession, path: str) -> PQIndex:
    """Load + cross-validate a saved index. Refuses to return one whose
    pieces disagree — manifest vs actual codebook grid, manifest vs the
    codebook's carried residual/fingerprint config, fingerprint vs the
    centroids actually on disk — because every one of those mismatches
    (a partial overwrite, a by-hand swap of one subdir) would otherwise
    serve wrong neighbors with no error anywhere."""
    base = path.rstrip("/")
    from pulfa_sausage_factory_spark.io import read_parquet_state

    meta_df = read_parquet_state(spark, f"{base}/meta")
    if meta_df is None:
        raise ValueError(
            f"load_pq_index: no index manifest at {base}/meta — not an "
            "index dir, or a save was killed before the manifest write"
        )
    meta = json.loads(meta_df.limit(1).collect()[0].meta_json)
    if meta.get("format") != _FORMAT:
        raise ValueError(
            f"load_pq_index: manifest format {meta.get('format')!r} != "
            f"supported {_FORMAT} — rebuild the index with this version"
        )
    codebooks = spark.read.parquet(f"{base}/codebooks")
    codes = spark.read.parquet(f"{base}/codes")

    # grid + carried-config validation from ONE collect — the codebook
    # table is m × n_codes rows (KBs) and serve-session load latency is
    # what this module exists to minimize
    cb_rows = codebooks.select("sub", "code", "residual", "cent_sig").collect()
    grid_m = 1 + max((r.sub for r in cb_rows), default=-1)
    grid_nc = 1 + max((r.code for r in cb_rows), default=-1)
    if not (grid_m == meta["m"] and grid_nc == meta["n_codes"]
            and len(cb_rows) == meta["m"] * meta["n_codes"]):
        raise ValueError(
            f"load_pq_index: codebook grid ({grid_m}×{grid_nc}, "
            f"{len(cb_rows)} rows) does not match the manifest "
            f"(m={meta['m']}, n_codes={meta['n_codes']}) — mixed artifacts"
        )
    is_res = bool(cb_rows[0].residual) if cb_rows else False
    sig = cb_rows[0].cent_sig if cb_rows else None
    if is_res != bool(meta["residual"]) or sig != meta["cent_sig"]:
        raise ValueError(
            "load_pq_index: codebook's carried residual/fingerprint config "
            f"(residual={is_res}, sig={sig}) disagrees with the manifest "
            f"(residual={meta['residual']}, sig={meta['cent_sig']})"
        )
    centroids = None
    if meta["residual"]:
        centroids = spark.read.parquet(f"{base}/centroids")
        got = _centroid_signature(centroids)
        if got != meta["cent_sig"]:
            raise ValueError(
                f"load_pq_index: centroids on disk (sig {got}) are not the "
                f"ones the codebooks were trained on (sig "
                f"{meta['cent_sig']}) — residual codes are meaningless "
                "against other centroids"
            )
        if "cell_id" not in codes.columns:
            raise ValueError(
                "load_pq_index: residual index but the codes table has no "
                "cell_id column — re-encode with pq_encode(centroids=...)"
            )
    return PQIndex(codebooks, codes, centroids, meta)


def knn_from_index(
    index: PQIndex,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 200,
    n_probe: int = 4,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> DataFrame:
    """Serve top-k from a built/loaded index through the recommended
    two-stage path (RECALL.md): quantized shortlist (IVFADC when the index
    is residual, full-scan ADC otherwise) → exact cosine rerank. ``corpus``
    supplies raw vectors ONLY for the output-sensitive rerank fetch
    (queries × shortlist rows) — the corpus-wide pass reads the index's
    m-byte codes, which is the point of persisting them.

    Column names default to what the index was BUILT with (carried in the
    manifest) — pass overrides only when the serving corpus is a renamed
    view of the build corpus."""
    id_col = id_col or index.meta.get("id_col", "vec_id")
    vec_col = vec_col or index.meta.get("vec_col", "embedding")
    return knn_pq_rerank(
        corpus, queries, index.codebooks, k=k, shortlist=shortlist,
        id_col=id_col, vec_col=vec_col, codes_df=index.codes,
        centroids=index.centroids, n_probe=n_probe,
    )
