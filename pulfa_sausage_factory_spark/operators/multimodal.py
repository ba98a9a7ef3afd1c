"""Multimodal binary-column operators (SURVEY.md §2.l X6).

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs — the reference's per-file metadata surface (bin/dao.py:86-100,
pyexiv2 dims + MIME + SHA-1) generalized to Arrow-batched operators.

What is REAL here and what is STUBBED:

- Header parsing (``sniff_image_meta``) is real: PNG/JPEG/GIF dimensions
  and MIME are decoded from the container bytes in pure Python — the same
  metadata pyexiv2 provided in the reference (bin/dao.py:93-98).
- Full pixel decode and resampling need an image library that is not in
  this container. ``resize_image`` uses Pillow when importable and
  otherwise a clearly-marked deterministic fake (output metadata is exact,
  pixel bytes are a content hash). ``sample_frames`` and ``featurize``
  likewise produce deterministic content-derived stand-ins.
- The Spark-side plumbing — schemas, ``mapInPandas`` batch iteration,
  UDTF-shaped explode (one video row → N frame rows), partition sizing —
  is real and is the part that carries to a 100 TB cluster: each stage is
  a narrow Arrow-batched pass with no shuffle; parallelism follows source
  partitioning (binaryFile / parquet splits).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha1", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_sha1", T.StringType()),
        T.StructField("real_decode", T.BooleanType()),
    ]
)


def png_bytes(width: int, height: int) -> bytes:
    """Minimal structurally-valid PNG prefix (magic + IHDR) for the given
    dimensions — enough container to exercise the real header parser in
    tests and oracle queries without an encoder library."""
    ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
    return b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr


def sniff_image_meta(blob: bytes) -> tuple[str, int | None, int | None]:
    """REAL pure-Python container parsing: (mime, width, height) from PNG
    IHDR, JPEG SOFn segment scan, or GIF logical screen descriptor; unknown
    containers → ('application/octet-stream', None, None)."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n" and len(blob) >= 24:
        w, h = struct.unpack(">II", blob[16:24])
        return "image/png", w, h
    if blob[:3] == b"GIF" and len(blob) >= 10:
        w, h = struct.unpack("<HH", blob[6:10])
        return "image/gif", w, h
    if blob[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(blob):
            if blob[i] != 0xFF:
                break
            marker = blob[i + 1]
            seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
            # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                return "image/jpeg", w, h
            i += 2 + seg_len
        return "image/jpeg", None, None
    return "application/octet-stream", None, None


def decode_image_meta(
    df: DataFrame, content_col: str = "content", id_col: str = "id"
) -> DataFrame:
    """Binary column → typed image metadata via ``mapInPandas``. One narrow
    Arrow pass, no shuffle; the per-blob work is the real header parse."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob)
                mime, w, h = sniff_image_meta(b)
                rows.append(
                    (int(i), mime, w, h, len(b), hashlib.sha1(b).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["id", "mime", "width", "height", "byte_len", "sha1"]
            )

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        batches, IMAGE_META_SCHEMA
    )


def resize_image(
    df: DataFrame,
    target: int = 256,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """U2-shaped resize (ImageMagick ``convert -resize``, bin/main.py:309-322).

    With Pillow importable the decode+resample is real; otherwise a
    DETERMINISTIC FAKE: output dims follow the reference's aspect-preserving
    rule exactly (long side → ``target``), pixel bytes are replaced by a
    content hash, and ``real_decode=false`` marks the rows."""
    try:  # pragma: no cover - Pillow absent in this container
        from PIL import Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        def fake_row(i: int, b: bytes):
            # the deterministic-fake contract: dims from the header sniff,
            # digest from content + target dims — never from PIL state, so
            # real_decode=false rows are always oracle-reproducible
            _, w0, h0 = sniff_image_meta(b)
            if w0 is None:
                return (int(i), None, None, None, False)
            scale = target / max(w0, h0)
            # half-up (not Python banker's round): floor(x+0.5) is
            # reproducible in ANSI SQL for the oracle
            w1 = max(1, int(w0 * scale + 0.5))
            h1 = max(1, int(h0 * scale + 0.5))
            digest = hashlib.sha1(b + struct.pack(">II", w1, h1)).hexdigest()
            return (int(i), w1, h1, digest, False)

        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob)
                row = None
                if has_pil:  # pragma: no cover
                    from PIL import Image

                    # the WHOLE real-decode path is one try: Image.open is
                    # lazy (header-only), so load() forces the pixel decode
                    # here, and resize()/save() failures (exotic modes,
                    # encode-only formats) also drop to the complete fake
                    # path — one corrupt blob must never kill the task,
                    # and fallback rows must never mix PIL-derived dims
                    # with the fake digest rule
                    try:
                        im = Image.open(io.BytesIO(b))
                        im.load()
                        w0, h0 = im.size
                        scale = target / max(w0, h0)
                        w1 = max(1, int(w0 * scale + 0.5))
                        h1 = max(1, int(h0 * scale + 0.5))
                        out = io.BytesIO()
                        im.resize((w1, h1)).save(out, format=im.format or "PNG")
                        digest = hashlib.sha1(out.getvalue()).hexdigest()
                        row = (int(i), w1, h1, digest, True)
                    except Exception:
                        row = None
                if row is None:
                    row = fake_row(i, b)
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "resized_sha1", "real_decode"]
            )

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        batches, RESIZE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    max_frames: int = 8,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """UDTF-shaped frame sampling: one video row → ceil(n_frames/every_n)
    frame rows (U1's explode pattern, bin/main.py:237-249, applied to
    video). Real ffmpeg/pyav decode is STUBBED with a deterministic fake:
    frame count and frame digests derive from md5 over the content's hex
    form (ASCII-safe → an ANSI-SQL oracle reproduces them), so results are
    stable across retries — the property Spark task re-execution requires
    of any side-effect-free UDTF."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                hx = bytes(blob).hex()
                seed = hashlib.md5(hx.encode("ascii")).hexdigest()
                n_frames = (int(seed[:2], 16) % max_frames) + 1
                for fno in range(0, n_frames, every_n):
                    digest = hashlib.md5(f"{hx}:{fno}".encode("ascii")).hexdigest()
                    rows.append((int(i), fno, digest, bytes.fromhex(digest) * 2))
            yield pd.DataFrame(
                rows, columns=["id", "frame_no", "frame_digest", "frame_bytes"]
            )

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        batches, FRAME_SCHEMA
    )


def featurize(
    df: DataFrame, dim: int = 8, content_col: str = "content", id_col: str = "id"
) -> DataFrame:
    """Batch "model inference" shape: binary column → ``array<float>``
    feature vector via ``mapInPandas``. The model is a DETERMINISTIC FAKE
    (md5-digest bytes scaled to [0,1]) but the batch contract — Arrow in,
    fixed-width float vectors out, no shuffle — is exactly what a real
    encoder (CLIP-style) needs; swap the body for a model call."""

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, feats = [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                digest = hashlib.md5(bytes(blob)).digest()
                ids.append(int(i))
                feats.append([round(b / 255.0, 6) for b in digest[:dim]])
            yield pd.DataFrame({"id": ids, "features": feats})

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        batches, schema
    )


AUDIO_SEG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("seg_no", T.IntegerType()),
        T.StructField("start_ms", T.IntegerType()),
        T.StructField("end_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("seg_digest", T.StringType()),
    ]
)

#: fake-decode sample-rate table (indexed by a hash byte)
_AUDIO_RATES = (8000, 16000, 22050, 44100)


def segment_audio(
    df: DataFrame,
    window_ms: int = 1000,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """Audio leg of the multimodal surface: one audio row → fixed-width
    segment rows (the ASR/embedding pre-chunking shape). Real decode
    (ffmpeg/soundfile — not in this container) is STUBBED with a
    deterministic fake: sample rate and duration derive from the content's
    hex-md5 and byte length, so an ANSI-SQL oracle reproduces every row.
    The Spark plumbing — UDTF explode, Arrow batching, integer segment
    arithmetic, no shuffle — is the real artifact."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob)
                hx = b.hex()
                seed = hashlib.md5(hx.encode("ascii")).hexdigest()
                rate = _AUDIO_RATES[int(seed[:2], 16) % len(_AUDIO_RATES)]
                duration_ms = (len(b) * 7) % 5000 + 1000
                n_segs = (duration_ms + window_ms - 1) // window_ms
                for s in range(n_segs):
                    start = s * window_ms
                    end = min(start + window_ms, duration_ms)
                    digest = hashlib.md5(f"{hx}:a{s}".encode("ascii")).hexdigest()
                    rows.append((int(i), s, start, end, rate, digest))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "seg_no", "start_ms", "end_ms", "sample_rate", "seg_digest",
                ],
            )

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        batches, AUDIO_SEG_SCHEMA
    )

IMAGE_OPS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("rs_width", T.IntegerType()),
        T.StructField("rs_height", T.IntegerType()),
        T.StructField("resized_sha1", T.StringType()),
        T.StructField("real_decode", T.BooleanType()),
    ]
)


def image_ops(
    df: DataFrame,
    target: int = 256,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """Fused decode + resize: ONE Arrow pass emits container metadata AND
    aspect-preserving resize output together.

    ``decode_image_meta(df) ⋈ resize_image(df)`` decodes every blob twice
    and pays a shuffle exchange on ``id`` to re-pair the halves; at 100 TB
    that join alone moves the whole corpus's key set. Operator fusion keeps
    the plan a single narrow ``mapInPandas`` stage — same parallelism as
    the source scan, zero Exchange. The standalone ops stay exported for
    pipelines that genuinely need only one half."""
    try:  # pragma: no cover - Pillow absent in this container
        from PIL import Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        def fake_row(i: int, b: bytes, mime: str, sha1: str):
            # complete sniff-derived row: dims, digest rule, and the
            # real_decode=false marker all follow the documented fake
            # contract — never mixed with PIL-derived state
            _, w0, h0 = sniff_image_meta(b)
            if w0 is None:
                return (
                    int(i), mime, None, None, len(b), sha1,
                    None, None, None, False,
                )
            scale = target / max(w0, h0)
            # half-up rounding (floor(x+0.5)) — reproducible in ANSI SQL
            w1 = max(1, int(w0 * scale + 0.5))
            h1 = max(1, int(h0 * scale + 0.5))
            digest = hashlib.sha1(b + struct.pack(">II", w1, h1)).hexdigest()
            return (int(i), mime, w0, h0, len(b), sha1, w1, h1, digest, False)

        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob)
                mime = sniff_image_meta(b)[0]
                sha1 = hashlib.sha1(b).hexdigest()
                row = None
                if has_pil:  # pragma: no cover
                    from PIL import Image

                    # whole real path in one try (open+load+resize+save):
                    # a corrupt blob, truncated body, or unencodable mode
                    # drops to the complete fake path instead of killing
                    # the task or emitting mixed-provenance rows
                    try:
                        im = Image.open(io.BytesIO(b))
                        im.load()
                        w0, h0 = im.size
                        scale = target / max(w0, h0)
                        w1 = max(1, int(w0 * scale + 0.5))
                        h1 = max(1, int(h0 * scale + 0.5))
                        out = io.BytesIO()
                        im.resize((w1, h1)).save(out, format=im.format or "PNG")
                        digest = hashlib.sha1(out.getvalue()).hexdigest()
                        row = (
                            int(i), mime, w0, h0, len(b), sha1,
                            w1, h1, digest, True,
                        )
                    except Exception:
                        row = None
                if row is None:
                    row = fake_row(i, b, mime, sha1)
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_OPS_SCHEMA])

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        batches, IMAGE_OPS_SCHEMA
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("real_decode", T.BooleanType()),
    ]
)


def _dhash_from_grid(grid) -> int:
    """Difference hash over a 9×8 luminance grid: bit (r,c) = 1 iff
    ``grid[r][c+1] > grid[r][c]`` — 64 bits, returned as signed int64
    (two's complement) so it lands in a Spark ``long``."""
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | (1 if grid[r][c + 1] > grid[r][c] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def fake_luminance_grid(blob: bytes) -> list[list[int]]:
    """Deterministic fake 'decode' for the dHash path: resample the blob's
    bytes onto the 9×8 grid by even stride indexing. NOT a real decode —
    but it preserves the property a perceptual hash needs from one: a
    small change to the content perturbs only the few grid cells that map
    onto the changed bytes, so near-identical blobs get near-identical
    hashes (hamming distance small). That makes the downstream banding
    operator genuinely exercisable without an image library."""
    n = len(blob)
    if n == 0:
        return [[0] * 9 for _ in range(8)]
    return [
        [blob[((r * 9 + c) * n) // 72] for c in range(9)] for r in range(8)
    ]


def image_dhash(
    df: DataFrame, content_col: str = "content", id_col: str = "id"
) -> DataFrame:
    """X6/X2 bridge — perceptual image hash (dHash): image → 64-bit
    gradient fingerprint; visually-near-identical images (re-encodes,
    small crops, watermarks) land within a few bit flips, so image-level
    near-dup runs through the SAME pigeonhole hamming banding as text
    SimHash (``operators.dedup.hamming_neardup_pairs``) — one narrow
    Arrow pass here, then equi-joins only.

    Real decode path (Pillow): grayscale → 9×8 resample → dHash — the
    standard algorithm. Without an image library the luminance grid is a
    DETERMINISTIC FAKE (byte resampling, see ``fake_luminance_grid``)
    marked ``real_decode=false``; the hash RULE and all Spark plumbing are
    identical in both paths."""
    try:  # pragma: no cover - Pillow absent in this container
        from PIL import Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob)
                row = None
                if has_pil:  # pragma: no cover
                    from PIL import Image

                    try:
                        im = Image.open(io.BytesIO(b)).convert("L").resize((9, 8))
                        px = list(im.getdata())
                        grid = [px[r * 9 : (r + 1) * 9] for r in range(8)]
                        row = (int(i), _dhash_from_grid(grid), True)
                    except Exception:
                        row = None
                if row is None:
                    row = (int(i), _dhash_from_grid(fake_luminance_grid(b)), False)
                rows.append(row)
            yield pd.DataFrame(rows, columns=["id", "dhash", "real_decode"])

    from .dedup import spread_for_arrow

    # re-spread under-partitioned inputs before the decode pass (size-
    # floored — tiny fixtures stay single-batch; unsplittable single-file
    # blob sources otherwise decode on one core)
    return spread_for_arrow(df.select(F.col(id_col).alias(id_col), content_col)).mapInPandas(
        batches, DHASH_SCHEMA
    )


def image_neardup_pairs(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-dup pairs within ``max_hamming`` dHash bit flips —
    ``image_dhash`` composed with the shared pigeonhole banding. Candidate
    generation is equi-join only (no cross join); recall within the budget
    is exact by the pigeonhole argument."""
    from .dedup import hamming_neardup_pairs

    return hamming_neardup_pairs(
        image_dhash(df, content_col, id_col),
        hash_col="dhash",
        id_col="id",
        max_hamming=max_hamming,
    )


FEATURIZE_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def featurize_with_meta(
    df: DataFrame, dim: int = 8, content_col: str = "content", id_col: str = "id"
) -> DataFrame:
    """Fused metadata + feature extraction: byte length, md5 digest, and the
    feature vector from ONE decode of each blob.

    The unfused shape (a metadata projection joined to ``featurize`` on the
    doc id) re-pairs rows through a shuffle exchange; since the "model"
    digest already hashes every byte, the metadata is free in the same
    pass. Single narrow stage, zero Exchange — the batch contract a real
    encoder (CLIP-style) needs is unchanged: swap the digest for a model
    call and the extra columns still ride along."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, lens, digests, feats = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob)
                digest = hashlib.md5(b)
                ids.append(int(i))
                lens.append(len(b))
                digests.append(digest.hexdigest())
                feats.append([round(x / 255.0, 6) for x in digest.digest()[:dim]])
            yield pd.DataFrame(
                {"id": ids, "byte_len": lens, "digest": digests, "features": feats}
            )

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        batches, FEATURIZE_META_SCHEMA
    )
