"""Bloom-filter primitives (functions/bloom.py): expression ≡ driver
twin position arithmetic, the no-false-negative guarantee, measured fpp
near nominal, sizing/refusal arithmetic, and probe-UDF agreement."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.functions import bloom


def _digests(n, tag=""):
    return [hashlib.md5(f"{tag}doc-{i}".encode()).hexdigest()
            for i in range(n)]


def test_bloom_params_sizing_and_refusal():
    m, k = bloom.bloom_params(1_000_000, 0.01)
    # classic arithmetic: ~9.6 bits/item rounded up to a power of two
    assert m & (m - 1) == 0 and m >= 9_585_058
    assert 1 <= k <= bloom.MAX_K
    # tiny corpora floor at 2^10 bits
    assert bloom.bloom_params(10, 0.01)[0] == 1 << 10
    with pytest.raises(ValueError, match="shard the state"):
        bloom.bloom_params(2_000_000_000_000, 0.001)
    with pytest.raises(ValueError, match="fpp"):
        bloom.bloom_params(100, 1.5)


def test_positions_expr_equals_driver_twin(spark):
    # the expr≡twin pin: digest_positions (conv/pmod expressions) and
    # positions_of (python ints) must agree bit-for-bit — a drift in
    # either silently zeroes the no-false-negative guarantee
    m, k = 1 << 20, 5
    ds = _digests(300)
    got = dict(
        spark.createDataFrame([(d,) for d in ds], "digest string")
        .select("digest", bloom.digest_positions(
            F.col("digest"), m, k).alias("pos"))
        .collect()
    )
    for d in ds:
        assert list(got[d]) == bloom.positions_of(d, m, k), d
    # ...and the vectorized probe matrix is the same arithmetic again
    mat = bloom._probe_matrix(ds, m, k)
    for i, d in enumerate(ds):
        assert mat[i].tolist() == bloom.positions_of(d, m, k)


def test_no_false_negatives_and_measured_fpp():
    m, k = bloom.bloom_params(5_000, 0.01)
    bits = bloom.new_bits(m)
    inserted = _digests(5_000, "in-")
    for d in inserted:
        bloom.set_positions(bits, bloom.positions_of(d, m, k))
    # every inserted digest answers MAYBE — zero false negatives, the
    # property the dedup guarantee rides on
    assert bool(bloom.bits_contain(bits, inserted, m, k).all())
    # a disjoint probe set false-positives near the nominal rate
    probes = _digests(20_000, "out-")
    fpp = float(bloom.bits_contain(bits, probes, m, k).mean())
    assert fpp < 0.03, f"measured fpp {fpp} far above nominal 0.01"
    # saturation implies the same order of magnitude
    assert bloom.saturation(bits) ** k < 0.03


def test_set_positions_is_idempotent():
    m, k = 1 << 15, 4
    bits = bloom.new_bits(m)
    ds = _digests(100)
    for d in ds:
        bloom.set_positions(bits, bloom.positions_of(d, m, k))
    snap = bits.copy()
    for d in ds:  # replayed batch re-merges the same positions
        bloom.set_positions(bits, bloom.positions_of(d, m, k))
    assert np.array_equal(bits, snap)


def test_might_contain_udf_agrees_with_driver(spark):
    m, k = bloom.bloom_params(1_000, 0.01)
    bits = bloom.new_bits(m)
    inserted = _digests(1_000, "in-")
    for d in inserted:
        bloom.set_positions(bits, bloom.positions_of(d, m, k))
    probes = inserted[:200] + _digests(800, "out-")
    udf = bloom.might_contain_udf(spark, bits, m, k)
    df = spark.createDataFrame([(d,) for d in probes], "digest string")
    got = {
        r.digest: r.maybe
        for r in df.select("digest", udf("digest").alias("maybe"))
        # consume the UDF column through an action that cannot prune it
        .collect()
    }
    want = bloom.bits_contain(bits, probes, m, k)
    for d, w in zip(probes, want):
        assert got[d] == bool(w), d
