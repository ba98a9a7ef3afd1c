"""M3 — the subprocess/UDTF boundary (U1 explode exemplar, U9 metadata) and
multimodal plumbing (X6)."""

from __future__ import annotations

import hashlib

from pulfa_sausage_factory_spark.functions import subprocess_udf


def test_explode_pdf_pages_udtf_shape(spark):
    """U1: one doc row in → N page rows out; page numbering dense 0-based;
    deterministic across runs (retry-safety for side-effecting stages)."""
    docs = spark.createDataFrame(
        [("d1", bytearray(b"%PDF-fake-one")), ("d2", bytearray(b"%PDF-fake-two"))],
        ["doc_key", "content"],
    )
    pages = subprocess_udf.explode_pdf_pages(docs).cache()
    rows = pages.collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_key, []).append(r)
    assert set(by_doc) == {"d1", "d2"}
    for doc_rows in by_doc.values():
        nums = sorted(r.page_no for r in doc_rows)
        assert nums == list(range(len(nums)))  # W1-dense, 0-based
        for r in doc_rows:
            assert r.page_sha1 == hashlib.sha1(bytes(r.page_bytes)).hexdigest()
    rows2 = subprocess_udf.explode_pdf_pages(docs).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_run_tool_subprocess():
    """The real subprocess path (used when the external tool exists)."""
    out = subprocess_udf.run_tool(["cat"], b"hello")
    assert out == b"hello"
    try:
        subprocess_udf.run_tool(["false"], b"")
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "failed rc=1" in str(e)


def test_extract_binary_meta(spark):
    """U9/S8/X6: sha1/size/MIME over opaque binary columns; decoder-needing
    fields are stubbed (None) but schema/batch shape is real."""
    blobs = [
        ("pdf", b"%PDF-1.4 fake"),
        ("jpg", b"\xff\xd8\xff\xe0 fake"),
        ("png", b"\x89PNG\r\n\x1a\n fake"),
        ("tif", b"II*\x00 fake"),
        ("other", b"plain"),
    ]
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs], ["kind", "content"]
    )
    out = {r.kind: r.meta for r in subprocess_udf.extract_binary_meta(df).collect()}
    assert out["pdf"].mime == "application/pdf"
    assert out["jpg"].mime == "image/jpeg"
    assert out["png"].mime == "image/png"
    assert out["tif"].mime == "image/tiff"
    assert out["other"].mime == "application/octet-stream"
    for kind, blob in blobs:
        assert out[kind].byte_len == len(blob)
        assert out[kind].sha1 == hashlib.sha1(blob).hexdigest()
        assert out[kind].width is None  # stubbed decode, documented


# ---------------------------------------------------------------------------
# U2/U3/U4/U5 — real-tool argv adapters: exact command lines, fallback
# behavior, and file plumbing (runner mocked; no tool needed)
# ---------------------------------------------------------------------------


def test_kdu_argv_matches_reference_flags():
    from pulfa_sausage_factory_spark.functions import subprocess_udf as S

    argv = S.kdu_compress_argv("/t/in.tif", "/t/out.jp2", levels=5, bits=24)
    # bin/main.py:388-405 verbatim: rate ladder, layers, precincts, RPCL
    assert argv[:5] == ["kdu_compress", "-i", "/t/in.tif", "-o", "/t/out.jp2"]
    assert "Clayers=8" in argv and "Clevels=5" in argv
    assert "Cprecincts={256,256}" in argv and "Corder=RPCL" in argv
    i = argv.index("-rate")
    assert argv[i + 1].startswith("1.2,0.7416334477,")
    assert "-jp2_space" in argv and argv[argv.index("-jp2_space") + 1] == "sRGB"
    # 8-bit drops the colorspace flag
    assert "-jp2_space" not in S.kdu_compress_argv("a", "b", 3, bits=8)


def test_tool_adapters_fall_back_without_binaries(monkeypatch):
    from pulfa_sausage_factory_spark.functions import subprocess_udf as S

    monkeypatch.setattr(S, "_which", lambda tool: None)
    assert S.encode_jp2(b"TIFFBYTES", levels=3) == b"TIFFBYTES"
    words = S.ocr_image(b"IMG").split()
    assert len(words) == 4 and S.ocr_image(b"IMG") == S.ocr_image(b"IMG")
    assert S.misspelled_words("the zzz qqq cat") == 2


def test_tool_adapters_wire_real_argv(monkeypatch):
    from pulfa_sausage_factory_spark.functions import subprocess_udf as S

    monkeypatch.setattr(S, "_which", lambda tool: f"/usr/bin/{tool}")
    calls = []

    def fake_runner(argv, stdin_bytes, timeout=60.0):
        calls.append(argv)
        if argv[0] == "kdu_compress":
            out = argv[argv.index("-o") + 1]
            with open(out, "wb") as f:
                f.write(b"JP2!" + open(argv[argv.index("-i") + 1], "rb").read())
            return b""
        if argv[0] == "ocrad":
            with open(argv[argv.index("-o") + 1], "w") as f:
                f.write("ocr text here")
            return b""
        if argv[0] == "aspell":
            assert stdin_bytes == b"sum text"
            return b"zzyx\nqwrt\n"
        raise AssertionError(argv)

    assert S.encode_jp2(b"T", levels=4, runner=fake_runner) == b"JP2!T"
    assert S.ocr_image(b"I", runner=fake_runner) == "ocr text here"
    assert S.misspelled_words("sum text", runner=fake_runner) == 2
    assert [c[0] for c in calls] == ["kdu_compress", "ocrad", "aspell"]
    assert calls[1][1:4] == ["-f", "-F", "utf8"]
    assert calls[2] == ["aspell", "-l", "en", "list"]


def test_orient_image_vote_sequence(monkeypatch):
    """The orient_image.sh decision procedure with mocked tools: 3 convert
    rotations, 4 OCRs, aspell on exactly the bottom-two word counts, winner
    = fewest misspellings (bin/orient_image.sh:31-79)."""
    from pulfa_sausage_factory_spark.functions import subprocess_udf as S

    monkeypatch.setattr(S, "_which", lambda tool: f"/usr/bin/{tool}")
    ocr_texts = {
        b"IMG": "w w w w w",       # north: 5 words
        b"R90": "a b c d e f",     # east: 6
        b"R180": "x y",            # south: 2  <- bottom two
        b"R270": "p q r",          # west: 3   <- bottom two
    }
    misspells = {"x y": b"bad\n", "p q r": b"bad\nworse\n"}
    calls = []

    def runner(argv, stdin_bytes, timeout=60.0):
        calls.append(argv[0])
        if argv[0] == "convert":
            angle, dst = argv[2], argv[4]
            with open(dst, "wb") as f:
                f.write(b"R" + angle.encode())
            return b""
        if argv[0] == "ocrad":
            img = argv[4]
            with open(img, "rb") as f:
                content = f.read()
            with open(argv[6], "w") as f:
                f.write(ocr_texts[content])
            return b""
        if argv[0] == "aspell":
            return misspells[stdin_bytes.decode()]
        raise AssertionError(argv)

    angle, rotated = S.orient_image(b"IMG", runner=runner)
    assert (angle, rotated) == (180, b"R180")
    assert calls.count("convert") == 3
    assert calls.count("ocrad") == 4
    assert calls.count("aspell") == 2  # bottom two only


def test_orient_image_tiebreak_is_line_lexicographic(monkeypatch):
    """orient_image.sh's `sort -n` resolves ties by whole-LINE lexicographic
    fallback, and the lines end in the variant file suffixes — so an
    all-ways tie picks EAST (-east < -north < -south < -west), not north."""
    from pulfa_sausage_factory_spark.functions import subprocess_udf as S

    monkeypatch.setattr(S, "_which", lambda tool: f"/usr/bin/{tool}")

    def runner(argv, stdin_bytes, timeout=60.0):
        if argv[0] == "convert":
            with open(argv[4], "wb") as f:
                f.write(b"R" + argv[2].encode())
            return b""
        if argv[0] == "ocrad":
            with open(argv[6], "w") as f:
                f.write("same same")  # every variant: 2 words
            return b""
        if argv[0] == "aspell":
            return b""  # every variant: 0 misspellings
        raise AssertionError(argv)

    angle, rotated = S.orient_image(b"IMG", runner=runner)
    assert angle == 90  # east wins the full tie
    assert rotated == b"R90"


def test_orient_images_operator_fake_path(spark):
    """Hermetic path: deterministic vote, one row per image, no shuffle."""
    from pulfa_sausage_factory_spark.functions.subprocess_udf import (
        ORIENT_ANGLES,
        orient_images,
    )

    imgs = spark.createDataFrame(
        [(i, bytes([i]) * 20) for i in range(6)], "id long, content binary"
    )
    a = {(r.id, r.orientation, bytes(r.oriented)) for r in orient_images(imgs).collect()}
    b = {(r.id, r.orientation, bytes(r.oriented)) for r in orient_images(imgs).collect()}
    assert a == b and len(a) == 6
    for _id, angle, oriented in a:
        assert angle in ORIENT_ANGLES
        assert oriented.startswith(b"ROT%03d:" % angle)


def test_extract_binary_meta_parses_container_dims(spark):
    from pulfa_sausage_factory_spark.functions.subprocess_udf import (
        extract_binary_meta,
    )
    from pulfa_sausage_factory_spark.operators.multimodal import png_bytes

    df = spark.createDataFrame(
        [(1, png_bytes(640, 480)), (2, b"%PDF-1.4 x"), (3, b"opaque")],
        "id long, content binary",
    )
    got = {r.id: r.meta for r in extract_binary_meta(df).collect()}
    assert (got[1].mime, got[1].width, got[1].height) == ("image/png", 640, 480)
    assert (got[2].mime, got[2].width) == ("application/pdf", None)
    assert got[3].width is None
