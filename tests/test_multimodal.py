"""X6 multimodal plumbing: real header parsing, mapInPandas schemas/batch
shapes, UDTF explode determinism (SURVEY.md §2.l X6; reference metadata
surface bin/dao.py:86-100)."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.operators import multimodal as mm


def _jpeg_bytes(width: int, height: int) -> bytes:
    # SOI + minimal SOF0 segment carrying the dimensions
    sof = struct.pack(">HBHHB", 8 + 3, 8, height, width, 1) + bytes([1, 0x11, 0])
    return b"\xff\xd8" + b"\xff\xc0" + sof


def _gif_bytes(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height)


def test_sniff_parses_real_containers():
    assert mm.sniff_image_meta(mm.png_bytes(640, 480)) == ("image/png", 640, 480)
    assert mm.sniff_image_meta(_jpeg_bytes(123, 77)) == ("image/jpeg", 123, 77)
    assert mm.sniff_image_meta(_gif_bytes(31, 17)) == ("image/gif", 31, 17)
    assert mm.sniff_image_meta(b"not an image at all") == (
        "application/octet-stream",
        None,
        None,
    )


def test_decode_image_meta_schema_and_values(spark):
    rows = [(1, mm.png_bytes(100, 50)), (2, _gif_bytes(8, 9)), (3, b"junk")]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = mm.decode_image_meta(df).orderBy("id").collect()
    assert [f.name for f in mm.IMAGE_META_SCHEMA.fields] == [
        "id", "mime", "width", "height", "byte_len", "sha1",
    ]
    assert (out[0].mime, out[0].width, out[0].height) == ("image/png", 100, 50)
    assert (out[1].mime, out[1].width, out[1].height) == ("image/gif", 8, 9)
    assert out[2].mime == "application/octet-stream" and out[2].width is None
    assert out[0].byte_len == len(mm.png_bytes(100, 50))
    assert len(out[0].sha1) == 40


def test_resize_aspect_rule(spark):
    # long side → 256, half-up rounding (the reference's convert -resize
    # aspect-preserving shape, bin/main.py:302-312)
    df = spark.createDataFrame(
        [(1, mm.png_bytes(512, 128)), (2, mm.png_bytes(100, 400)), (3, b"junk")],
        "id long, content binary",
    )
    out = {r.id: r for r in mm.resize_image(df, target=256).collect()}
    assert (out[1].width, out[1].height) == (256, 64)
    assert (out[2].width, out[2].height) == (64, 256)
    assert out[3].width is None  # unparseable → null dims, not a crash
    assert out[1].real_decode is False  # Pillow absent here: fake documented


def test_sample_frames_udtf_shape(spark):
    df = spark.createDataFrame([(7, b"video-bytes")], "id long, content binary")
    a = mm.sample_frames(df, every_n=1).collect()
    b = mm.sample_frames(df, every_n=1).collect()
    assert a == b  # deterministic across re-execution (task-retry safe)
    assert len(a) >= 1 and a[0].frame_no == 0
    assert [r.frame_no for r in a] == list(range(len(a)))
    # every_n=2 samples every other frame of the same decoded sequence
    half = mm.sample_frames(df, every_n=2).collect()
    assert [r.frame_no for r in half] == [r.frame_no for r in a][::2]


def test_featurize_batch_shape(spark):
    df = spark.createDataFrame(
        [(i, b"blob-%d" % i) for i in range(10)], "id long, content binary"
    )
    out = mm.featurize(df, dim=8)
    assert out.schema["features"].dataType.simpleString() == "array<double>"
    rows = out.collect()
    assert len(rows) == 10
    assert all(len(r.features) == 8 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r.features)


def test_png_builder_matches_spark_expression(spark, sf_dir):
    # the JVM-built PNG (queries.py _png_content) and the python builder
    # produce identical bytes — the decode query's premise
    from pulfa_sausage_factory_spark.queries import _png_content

    df = spark.createDataFrame([(300, 41)], "w int, h int").select(
        _png_content(F.col("w"), F.col("h")).alias("content")
    )
    assert bytes(df.first().content) == mm.png_bytes(300, 41)


def test_audio_segments_cover_duration_exactly(spark):
    """Segments tile [0, duration) with no gap/overlap; the tail segment is
    clipped to the fake-decoded duration."""
    from pulfa_sausage_factory_spark.operators.multimodal import segment_audio

    clips = spark.createDataFrame(
        [(1, b"x" * 100), (2, b"y" * 999), (3, b"")], "id long, content binary"
    )
    rows = segment_audio(clips, window_ms=1000).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    for i, segs in by_id.items():
        segs.sort(key=lambda r: r.seg_no)
        assert [s.seg_no for s in segs] == list(range(len(segs)))
        assert segs[0].start_ms == 0
        for a, b in zip(segs, segs[1:]):
            assert a.end_ms == b.start_ms == a.start_ms + 1000
        dur = segs[-1].end_ms
        assert 1000 <= dur <= 6000 and len(segs) == (dur + 999) // 1000
        assert len({s.sample_rate for s in segs}) == 1
        assert all(s.sample_rate in (8000, 16000, 22050, 44100) for s in segs)


def test_image_ops_fusion_matches_unfused(spark):
    # the fused single-pass operator must agree column-for-column with
    # decode_image_meta ⋈ resize_image (the shape it replaces)
    rows = [(1, mm.png_bytes(100, 50)), (2, _gif_bytes(8, 9)), (3, b"junk")]
    df = spark.createDataFrame(rows, "id long, content binary")
    fused = {
        r.id: r.asDict() for r in mm.image_ops(df, target=256).collect()
    }
    meta = {r.id: r.asDict() for r in mm.decode_image_meta(df).collect()}
    rs = {r.id: r.asDict() for r in mm.resize_image(df, target=256).collect()}
    assert set(fused) == {1, 2, 3}
    for i in fused:
        for col in ("mime", "width", "height", "byte_len", "sha1"):
            assert fused[i][col] == meta[i][col], (i, col)
        assert fused[i]["rs_width"] == rs[i]["width"], i
        assert fused[i]["rs_height"] == rs[i]["height"], i
        assert fused[i]["resized_sha1"] == rs[i]["resized_sha1"], i


def test_featurize_with_meta_matches_unfused(spark):
    import hashlib

    rows = [(1, b"hello world"), (2, b""), (3, b"\x00\xff" * 40)]
    df = spark.createDataFrame(rows, "id long, content binary")
    fused = {
        r.id: r.asDict() for r in mm.featurize_with_meta(df, dim=8).collect()
    }
    plain = {r.id: r.features for r in mm.featurize(df, dim=8).collect()}
    for i, blob in rows:
        assert fused[i]["features"] == plain[i], i
        assert fused[i]["byte_len"] == len(blob), i
        assert fused[i]["digest"] == hashlib.md5(blob).hexdigest(), i


# ---- perceptual dHash + image near-dup (X6/X2 bridge) ----------------------


def test_dhash_deterministic_and_sensitive(spark):
    # n=720 → fake grid cell c samples byte 10*c exactly; tweaking ONE
    # sampled byte must flip the adjacent comparison bits and nothing else
    base = bytes(720)
    tweaked = bytearray(base)
    tweaked[10] = 255  # grid cell (0,1)
    rows = [(1, base), (2, bytes(base)), (3, bytes(tweaked))]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r.id: r for r in mm.image_dhash(df).collect()}
    # identical content → identical hash; fake path marked
    assert out[1].dhash == out[2].dhash
    assert out[1].real_decode is out[2].real_decode
    # all-zero grid has no ascending pair; 255 at (0,1) turns exactly the
    # (0,0)<(0,1) comparison on — near-identical, NOT identical
    ham = bin((out[1].dhash ^ out[3].dhash) & ((1 << 64) - 1)).count("1")
    assert ham == 1


def test_dhash_matches_grid_reference():
    grid = [[(r * 13 + c * 7) % 256 for c in range(9)] for r in range(8)]
    expect = 0
    for r in range(8):
        for c in range(8):
            expect = (expect << 1) | (1 if grid[r][c + 1] > grid[r][c] else 0)
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert mm._dhash_from_grid(grid) == expect


def test_image_neardup_banding_equals_bruteforce(spark):
    import random

    rng = random.Random(5)
    blobs = []
    for i in range(20):
        blobs.append((i, bytes(rng.randrange(256) for _ in range(400))))
    # plant near-dups: single-byte tweaks of blob 0 and 7
    for j, src in [(20, 0), (21, 0), (22, 7)]:
        b = bytearray(blobs[src][1])
        b[100 + j] ^= 1
        blobs.append((j, bytes(b)))
    df = spark.createDataFrame(blobs, "id long, content binary")
    hashes = {r.id: r.dhash for r in mm.image_dhash(df).collect()}
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.image_neardup_pairs(df, max_hamming=6).collect()
    }
    expect = {}
    ids = sorted(hashes)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            h = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if h <= 6:
                expect[(a, b)] = h
    assert got == expect
    assert any((a, b) in got for a, b in [(0, 20), (0, 21), (7, 22)])


def test_image_neardup_plan_no_cartesian(spark):
    from pulfa_sausage_factory_spark.plans.audit import assert_no_cartesian

    df = spark.createDataFrame(
        [(i, bytes([i] * 64)) for i in range(4)], "id long, content binary"
    )
    assert_no_cartesian(mm.image_neardup_pairs(df))
