"""Bloom-filter primitives over md5 hex digests (extension surface —
the "decide a micro-batch against accumulated state WITHOUT reading the
state" building block for the incremental ingest's exact-dedup ledger).

Why this exists at 100 TB: even with the scan-state join flip
(``relational.anti_join_scan_state``) the cross-run exact-dedup leg
still SCANS the full digest ledger once per micro-batch — at 10^9
admitted docs that is ~16 GB of parquet read per trigger to answer a
question whose answer is almost always "none of these digests were ever
seen". A Bloom filter maintained alongside the ledger answers the
common case from a bitmap that is ~10 bits per admitted doc (1.25 GB at
10^9 docs, 12.5 MB at 10^7): docs the filter rejects are PROVABLY new
(no false negatives — the dedup guarantee is untouched), and only the
fpp-sized remainder pays the ledger confirm-join. The sidecar lifecycle
(crash ordering, catch-up, epoch swaps) lives with the ledger in
``pipelines/curation_pipeline``; this module is the pure math plus the
two execution forms.

Hash design — no salts, no extra hashing: an md5 digest IS 128 uniform
bits, so the k probe positions come straight from the digest via
Kirsch-Mitzenmacher double hashing::

    h1 = int(digest[0:15], 16)          # 60 bits — fits a signed long
    h2 = (int(digest[15:30], 16) % m) | 1   # odd stride (m is 2^j)
    pos_i = (h1 + i * h2) % m,  i = 0..k-1

Both execution forms compute EXACTLY this arithmetic and are pinned
identical by tests (the repo's expr≡arrow twin convention):

- ``digest_positions`` — pure Spark expressions (``conv``/``pmod``),
  used to BUILD the per-batch position sets JVM-side (the bits to set
  are collected, the bitmap itself never ships to executors for
  building);
- ``might_contain_udf`` — an Arrow-batched pandas UDF over a
  broadcast ``numpy`` bitmap, used to PROBE a batch's digests (a py4j
  handle to Spark's own sketch.BloomFilter cannot be used inside a
  UDF, and row-at-a-time python would be the slow path).

All arithmetic stays strictly below 2^63 (ANSI mode throws on long
overflow): h1 < 2^60, ``i * h2 < k * m <= 6 * 2^40``.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: hard ceiling on the bitmap size — 2^33 bits = 1 GiB of bitmap, the
#: point past which a driver/executor-broadcast bitmap stops being the
#: right tool (callers should shard state or drop to the scan path)
MAX_BITS = 1 << 33

#: probe-count ceiling: k slots of 60-bit double hashing; >6 buys
#: almost no fpp at 10 bits/item and grows the probe cost linearly
MAX_K = 6


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic sizing: ``m = -n ln p / (ln 2)^2`` rounded UP to a power
    of two (the double-hash stride assumes it), ``k = (m/n) ln 2``
    clamped to [1, MAX_K]. Raises when the bitmap would exceed
    :data:`MAX_BITS` — at that scale the honest answer is "this corpus
    needs a sharded filter or the scan path", not a silent OOM."""
    if expected_items <= 0:
        raise ValueError(f"expected_items must be positive: {expected_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1): {fpp}")
    m_exact = -expected_items * math.log(fpp) / (math.log(2) ** 2)
    m = 1 << max(10, math.ceil(math.log2(max(m_exact, 2))))
    if m > MAX_BITS:
        raise ValueError(
            f"bloom_params: {expected_items} items at fpp={fpp} needs "
            f"{m_exact / 8 / 2**20:.0f} MiB of bitmap (> the "
            f"{MAX_BITS / 8 / 2**30:.0f} GiB ceiling) — shard the state "
            "or stay on the ledger-scan path"
        )
    k = max(1, min(MAX_K, round(m / expected_items * math.log(2))))
    return m, k


def _h1_h2(digest: Column, m: int) -> tuple[Column, Column]:
    h1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 16, 15), 16, 10).cast("long")
    return h1, F.pmod(h2, F.lit(m)).bitwiseOR(F.lit(1))


def digest_positions(digest: Column, m: int, k: int) -> Column:
    """``array<long>`` of the k probe positions for an md5 hex digest —
    pure JVM expressions, used on the BUILD side (per-batch admitted
    digests → positions → collected bit sets)."""
    h1, h2 = _h1_h2(digest, m)
    return F.array(*[
        F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)
    ])


def positions_of(digest: str, m: int, k: int) -> list[int]:
    """Driver-side twin of :func:`digest_positions` — same arithmetic,
    pinned identical by tests; used for small sets and as the UDF's
    reference implementation."""
    h1 = int(digest[0:15], 16)
    h2 = (int(digest[15:30], 16) % m) | 1
    return [(h1 + i * h2) % m for i in range(k)]


def new_bits(m: int) -> np.ndarray:
    """Empty bitmap: ``m/8`` bytes of zeros (uint8)."""
    if m % 8:
        raise ValueError(f"m must be a multiple of 8: {m}")
    return np.zeros(m // 8, dtype=np.uint8)


def set_positions(bits: np.ndarray, positions) -> np.ndarray:
    """Set bits in place (idempotent — re-merging a replayed batch's
    positions is a no-op by construction) and return the array."""
    pos = np.asarray(list(positions), dtype=np.int64)
    if pos.size:
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def _probe_matrix(digests, m: int, k: int) -> np.ndarray:
    """(n, k) int64 position matrix for a sequence of hex digests —
    the vectorizable core shared by the pandas UDF and tests."""
    h1 = np.array([int(s[0:15], 16) for s in digests], dtype=np.int64)
    h2 = np.array([int(s[15:30], 16) for s in digests], dtype=np.int64)
    h2 = (h2 % m) | 1
    i = np.arange(k, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % m


def bits_contain(bits: np.ndarray, digests, m: int, k: int) -> np.ndarray:
    """Boolean membership vector for a sequence of digests against a
    bitmap — True = MAYBE present (confirm against the ledger), False =
    provably never admitted. A null/None digest probes MAYBE (the safe
    confirm-join direction): this is a public primitive, and an opaque
    whole-stage ``int(None[0:15])`` TypeError deep inside the pandas UDF
    is strictly worse than one redundant confirm row."""
    n = len(digests)
    if n == 0:
        return np.zeros(0, dtype=bool)
    out = np.ones(n, dtype=bool)
    valid = [i for i, s in enumerate(digests) if isinstance(s, str)]
    if not valid:
        return out
    pos = _probe_matrix([digests[i] for i in valid], m, k)
    got = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    out[np.asarray(valid, dtype=np.int64)] = got.all(axis=1)
    return out


def might_contain_udf(spark, bits: np.ndarray, m: int, k: int,
                      return_broadcast: bool = False):
    """Arrow-batched probe: returns a pandas UDF ``digest -> boolean``
    with the bitmap shipped once per executor via ``sc.broadcast`` —
    never per task, never through a py4j handle.

    ``return_broadcast=True`` hands back ``(udf, broadcast)`` so the
    caller can ``destroy()`` the bitmap once its last consuming action
    ran: broadcasts release at PYTHON GC otherwise (py4j-deferred), and
    a long ingest run creating one per micro-batch accumulates live
    m/8-byte blocks in the JVM block manager until it heap-OOMs — the
    round-13 120M trend run died exactly this way at 512 MiB bitmaps."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(bits.tobytes())

    def _probe(s: "pd.Series") -> "pd.Series":
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        return pd.Series(bits_contain(arr, s.tolist(), m, k), index=s.index)

    _probe.__annotations__ = {"s": pd.Series, "return": pd.Series}
    fn = pandas_udf("boolean")(_probe)
    if return_broadcast:
        return fn, bc
    return fn


def saturation(bits: np.ndarray) -> float:
    """Fraction of set bits — ``saturation ** k`` is the implied
    false-positive rate, the retrain/resize signal the report row
    surfaces (mirrors the PQ index's ``appended_staleness`` convention:
    measure decay, state the threshold, let the operator decide)."""
    if bits.size == 0:
        return 0.0
    return float(np.unpackbits(bits).mean())
