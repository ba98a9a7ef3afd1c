"""Vector math over ``array<float>`` embedding columns (SURVEY.md §2.l X3).

Pure Spark higher-order functions (``zip_with`` + ``aggregate``) — JVM-side,
no UDF, no shuffle. Accumulation is sequential left-to-right in doubles so a
DuckDB oracle using ``list_sum(list_transform(...))`` produces bit-identical
results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hashed_text_embedding(
    col: Column | str, dim: int = 64, n_buckets: int = 4096, seed: int = 42
) -> Column:
    """Deterministic text → ``array<double>`` embedding via hashed
    bag-of-words + signed random projection (random indexing / SRP — the
    classical no-model embedding): tokens hash into ``n_buckets`` (md5
    chain), each bucket owns a fixed pseudo-random ±1 row of an
    ``n_buckets × dim`` projection matrix (LCG-seeded — Knuth MMIX
    constants 6364136223846793005 / 1442695040888963407, sign = top bit;
    no RNG state), a document's vector is the count-weighted sum of its
    buckets' rows, L2-normalized.

    Texts sharing vocabulary land near each other in cosine — enough to
    drive ``semdedup`` / ANN end-to-end from raw text when no learned
    embedding exists. One Arrow-batched numpy pass; the projection matrix
    rides the closure (n_buckets × dim doubles — ~2 MB at the defaults).
    Not a semantic model: synonyms don't collide; swap in learned vectors
    when available — every consumer takes an ``embedding`` column either
    way.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    # deterministic ±1 matrix: LCG stream, one sign per (bucket, dim) cell
    state = np.uint64(seed or 1)
    cells = n_buckets * dim
    vals = np.empty(cells, dtype=np.float64)
    s = int(state)
    mask = (1 << 64) - 1
    for i in range(cells):
        s = (s * 6364136223846793005 + 1442695040888963407) & mask
        vals[i] = 1.0 if (s >> 63) else -1.0
    R = vals.reshape(n_buckets, dim)
    md5 = hashlib.md5

    def embed(texts):
        out = []
        cache: dict[str, int] = {}
        for t in texts:
            toks = [w for w in (t or "").lower().split() if w]
            if not toks:
                out.append([0.0] * dim)
                continue
            counts: dict[int, int] = {}
            for w in toks:
                b = cache.get(w)
                if b is None:
                    b = int.from_bytes(md5(w.encode("utf-8")).digest()[:4], "big") % n_buckets
                    cache[w] = b
                counts[b] = counts.get(b, 0) + 1
            idx = np.fromiter(counts.keys(), dtype=np.int64)
            c = np.fromiter(counts.values(), dtype=np.float64)
            v = c @ R[idx]
            n = np.linalg.norm(v)
            out.append((v / n if n else v).tolist())
        return pd.Series(out)

    embed.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    c = F.col(col) if isinstance(col, str) else col
    return F.pandas_udf(embed, "array<double>")(c)
