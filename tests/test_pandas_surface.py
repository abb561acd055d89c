"""UDF-surface and multimodal-plumbing tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_coded_wordcount_spark.functions import pandas_surface as pu
from hadoop_coded_wordcount_spark.operators import multimodal as mm
from hadoop_coded_wordcount_spark.operators import wordcount as wc
from hadoop_coded_wordcount_spark.sources.catalog import load_table

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "  The  Quick   FOX ", "en", "srcA", 19),
        (1, "fox fox the", "en", "srcA", 11),
        (2, "über straße", "de", "srcB", 11),  # multi-byte utf-8
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def test_scalar_udf_normalizes(docs):
    out = {r.doc_id: r.normalized for r in pu.normalize_text(docs).collect()}
    assert out[0] == "the quick fox"
    assert out[2] == "über straße"


def test_grouped_map_matches_builtin_wordcount(spark):
    """The pandas combiner must agree exactly with the JVM-side
    wordcount_by_source on the real table — same semantics, two engines."""
    documents = load_table(spark, SF001, "documents")
    udf_rows = {
        (r.source, r.word): r.cnt
        for r in pu.wordcount_combiner_pandas(documents).collect()
    }
    builtin_rows = {
        (r.source, r.word): r.cnt
        for r in wc.wordcount_by_source(documents).collect()
    }
    assert udf_rows == builtin_rows


def test_grouped_agg_k_stats(spark):
    events = load_table(spark, SF001, "events")
    out = pu.grouped_k_stats(events).collect()
    assert len(out) == 5  # event types
    for r in out:
        assert r.k_sum > 0 and r.n > 0
        assert r.k_mean == pytest.approx(r.k_sum / r.n, abs=1e-6)


def test_multimodal_schema_and_features(docs):
    feats = mm.media_features(mm.to_multimodal(docs))
    assert feats.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,n_bytes:int,"
        "header:string,byte_checksum:bigint,kind:string,width:int,"
        "height:int,maxval:int,channels:int,sample_rate:int,bit_depth:int,"
        "n_frames:bigint,duration_ms:bigint>"
    )
    rows = {r.doc_id: r for r in feats.collect()}
    # multi-byte text: n_bytes > n_chars
    assert rows[2].n_bytes == len("über straße".encode("utf-8"))
    assert rows[0].header == "20205468"  # '  Th' in hex
    assert rows[0].media_type == "text/plain;src=srcA"
    # text payloads are not a decodable media format → routed as opaque
    assert rows[0].kind == "opaque" and rows[0].width is None


def test_multimodal_streams_batches(spark, docs):
    """mapInPandas must handle multiple Arrow batches — force 1-row
    batches and check nothing is dropped or duplicated."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        out = mm.media_features(mm.to_multimodal(docs)).collect()
        assert sorted(r.doc_id for r in out) == [0, 1, 2]
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def _wav_bytes(rate=8000, channels=1, sampwidth=2, n_frames=4000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(bytes(n_frames * channels * sampwidth))
    return buf.getvalue()


def test_decode_media_wav():
    d = mm.decode_media(_wav_bytes(rate=16000, channels=2, n_frames=8000))
    assert d == {
        "kind": "audio/wav",
        "channels": 2,
        "sample_rate": 16000,
        "bit_depth": 16,
        "n_frames": 8000,
        "duration_ms": 500,
    }


def test_decode_media_netpbm():
    ppm = b"P6\n# a comment\n640 480\n255\n" + bytes(10)
    assert mm.decode_media(ppm) == {
        "kind": "image/ppm",
        "width": 640,
        "height": 480,
        "maxval": 255,
        "channels": 3,
        "bit_depth": 8,
    }
    pgm16 = b"P5 32\t16 65535 "
    d = mm.decode_media(pgm16)
    assert (d["kind"], d["width"], d["height"], d["bit_depth"]) == (
        "image/pgm",
        32,
        16,
        16,
    )
    # ASCII variant + comment between tokens
    assert mm.decode_media(b"P2\n#c\n3 2 15\n0 1 2 3 4 5")["maxval"] == 15


def _png_bytes(width=320, height=200, bit_depth=8, color_type=6,
               compression=0, filter_method=0, interlace=0) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       compression, filter_method, interlace)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk + b"\x00" * 8


def _jpeg_bytes(width=640, height=480, channels=3, precision=8,
                sof_marker=0xC0, exif_orientation=None,
                exif_endian="II") -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    app1 = b""
    if exif_orientation is not None:
        e = "<" if exif_endian == "II" else ">"
        bom = b"II*\x00" if exif_endian == "II" else b"MM\x00*"
        # TIFF: BOM+magic, IFD0 at offset 8, one entry (Orientation,
        # SHORT, count 1, value inline), next-IFD pointer 0
        tiff = (bom + struct.pack(e + "I", 8) + struct.pack(e + "H", 1)
                + struct.pack(e + "HHI", 0x0112, 3, 1)
                + struct.pack(e + "H", exif_orientation) + b"\x00\x00"
                + struct.pack(e + "I", 0))
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    sof = bytes([0xFF, sof_marker]) + struct.pack(
        ">HBHHB", 8 + 3 * channels, precision, height, width, channels
    ) + bytes(3 * channels)
    return b"\xff\xd8" + app0 + app1 + sof + b"\xff\xd9"


def test_decode_media_png_header():
    d = mm.decode_media(_png_bytes(width=320, height=200, color_type=6))
    assert d == {
        "kind": "image/png",
        "width": 320,
        "height": 200,
        "channels": 4,
        "bit_depth": 8,
        "interlace": 0,
    }
    # grayscale 16-bit
    d = mm.decode_media(_png_bytes(width=7, height=9, bit_depth=16,
                                   color_type=0))
    assert (d["channels"], d["bit_depth"]) == (1, 16)
    # bad color type routes to opaque
    assert mm.decode_media(_png_bytes(color_type=5)) == {"kind": "opaque"}


def test_decode_media_png_interlace_and_method_fields():
    """VERDICT r8 item 6: the IHDR interlace flag must be parsed (Adam7
    = 1) and out-of-spec compression/filter/interlace values must route
    to opaque instead of classifying as clean PNGs."""
    adam7 = mm.decode_media(_png_bytes(width=12, height=8, interlace=1))
    assert adam7["kind"] == "image/png" and adam7["interlace"] == 1
    assert (adam7["width"], adam7["height"]) == (12, 8)  # dims unchanged
    # invalid interlace method (spec allows only 0/1)
    assert mm.decode_media(_png_bytes(interlace=7)) == {"kind": "opaque"}
    # nonzero compression / filter methods are corrupt headers
    assert mm.decode_media(_png_bytes(compression=1)) == {"kind": "opaque"}
    assert mm.decode_media(_png_bytes(filter_method=2)) == {"kind": "opaque"}


def test_decode_media_jpeg_header():
    d = mm.decode_media(_jpeg_bytes(width=640, height=480, channels=3))
    assert d == {
        "kind": "image/jpeg",
        "width": 640,
        "height": 480,
        "channels": 3,
        "bit_depth": 8,
        "progressive": False,
        "orientation": 1,
    }
    # grayscale, 12-bit precision, SOF behind an extra APPn segment
    d = mm.decode_media(_jpeg_bytes(width=31, height=17, channels=1,
                                    precision=12))
    assert (d["width"], d["height"], d["channels"], d["bit_depth"]) == (
        31, 17, 1, 12,
    )
    # SOS before any SOF (no dimensions recoverable) routes to opaque
    trunc = b"\xff\xd8\xff\xda\x00\x04\x00\x00"
    assert mm.decode_media(trunc) == {"kind": "opaque"}


def test_decode_media_jpeg_progressive_sof2():
    """VERDICT r8 item 6: progressive-DCT frames (SOF2 family) carry
    dimensions at the same offsets — they must decode, flagged
    progressive, not fall through to opaque."""
    d = mm.decode_media(_jpeg_bytes(width=800, height=600, sof_marker=0xC2))
    assert d["kind"] == "image/jpeg" and d["progressive"] is True
    assert (d["width"], d["height"]) == (800, 600)
    # SOF10: progressive arithmetic-coded variant
    d = mm.decode_media(_jpeg_bytes(width=4, height=2, sof_marker=0xCA))
    assert d["progressive"] is True and (d["width"], d["height"]) == (4, 2)
    # baseline stays non-progressive
    assert mm.decode_media(_jpeg_bytes())["progressive"] is False


def test_decode_media_jpeg_exif_rotation():
    """VERDICT r8 item 6: EXIF Orientation 5-8 transposes the display
    frame — the reported dimensions must be the display ones, both TIFF
    byte orders; 1-4 leave dimensions untouched."""
    d = mm.decode_media(
        _jpeg_bytes(width=640, height=480, exif_orientation=6)
    )
    assert (d["width"], d["height"], d["orientation"]) == (480, 640, 6)
    # big-endian (MM) EXIF body parses identically
    d = mm.decode_media(
        _jpeg_bytes(width=640, height=480, exif_orientation=8,
                    exif_endian="MM")
    )
    assert (d["width"], d["height"], d["orientation"]) == (480, 640, 8)
    # orientations 1-4: no transpose (3 = 180-degree rotation)
    d = mm.decode_media(
        _jpeg_bytes(width=640, height=480, exif_orientation=3)
    )
    assert (d["width"], d["height"], d["orientation"]) == (640, 480, 3)
    # malformed EXIF (bad BOM) is ignored, not fatal
    bad = _jpeg_bytes(width=64, height=32, exif_orientation=6)
    bad = bad.replace(b"II*\x00", b"XX*\x00")
    d = mm.decode_media(bad)
    assert (d["width"], d["height"], d["orientation"]) == (64, 32, 1)


def test_decode_media_unknown_is_opaque():
    # a bare PNG signature with no IHDR is undecodable -> opaque
    assert mm.decode_media(b"\x89PNG\r\n\x1a\n", "image/png") == {
        "kind": "opaque"
    }
    assert mm.decode_media(b"RIFFxxxxWAVEbroken") == {"kind": "opaque"}
    assert mm.decode_media(b"P6 notanint") == {"kind": "opaque"}
    assert mm.decode_media(b"") == {"kind": "opaque"}


def test_media_features_decodes_planted_media(spark):
    """End-to-end: planted WAV + PPM payloads come back with REAL decoded
    fields through the same mapInPandas path the documents table uses."""
    rows = [
        (100, bytearray(_wav_bytes(rate=8000, n_frames=2000)), "audio/wav"),
        (101, bytearray(b"P6 2 2 255 " + bytes(12)), "image/ppm"),
        (102, bytearray(b"not media at all"), "application/octet-stream"),
        (103, bytearray(_png_bytes(width=64, height=32)), "image/png"),
        (104, bytearray(_jpeg_bytes(width=40, height=30)), "image/jpeg"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, media_type string"
    )
    out = {r.doc_id: r for r in mm.media_features(df).collect()}
    wav = out[100]
    assert wav.kind == "audio/wav" and wav.sample_rate == 8000
    assert wav.duration_ms == 250 and wav.bit_depth == 16
    img = out[101]
    assert img.kind == "image/ppm" and (img.width, img.height) == (2, 2)
    assert img.sample_rate is None
    assert out[102].kind == "opaque" and out[102].n_bytes == 16
    png = out[103]
    assert png.kind == "image/png" and (png.width, png.height) == (64, 32)
    jpg = out[104]
    assert jpg.kind == "image/jpeg" and (jpg.width, jpg.height) == (40, 30)
    assert jpg.channels == 3 and jpg.sample_rate is None


def test_row_udf_surface_matches_builtin(spark):
    """The row-at-a-time F.udf surface (SURVEY §2.3's UDF row) exists and
    agrees with the builtin twin. It stays OUT of every hot path by
    policy: per-row Python crossing is ~10-100× slower than the
    Arrow-batched pandas_udf, which is itself the fallback after
    builtins — this test is the API demonstration, not a pattern."""
    from pyspark.sql.types import IntegerType

    @F.udf(IntegerType())
    def ws_tokens(text: str) -> int:
        return len([t for t in (text or "").split() if t])

    docs = load_table(spark, SF001, "documents").limit(100)
    got = docs.select("doc_id", ws_tokens("text").alias("n")).collect()
    want = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("n"),
        ).collect()
    }
    assert {r.doc_id: r.n for r in got} == want


def test_chunk_documents_overlap_windows(spark):
    """overlap > 0 produces sliding windows: consecutive chunks share
    exactly `overlap` tokens and every token is covered."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], ["doc_id", "text"]
    )
    rows = sorted(
        pu.chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    chunks = [r.chunk.split() for r in rows]
    assert chunks[0] == ["t0", "t1", "t2", "t3"]
    assert chunks[1] == ["t2", "t3", "t4", "t5"]  # 2-token overlap
    assert chunks[-1][-1] == "t9"  # full coverage
    for a, b in zip(chunks, chunks[1:]):
        assert a[-2:] == b[:2]


def test_chunk_documents_rejects_bad_overlap(spark):
    """overlap >= chunk_tokens means stride <= 0 — must fail fast at the
    driver with a clear message, not inside the UDTF worker."""
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    for bad in (4, 5, -1):
        with pytest.raises(ValueError, match="overlap"):
            pu.chunk_documents(docs, chunk_tokens=4, overlap=bad)


def test_decode_media_gif_header():
    import struct as _s

    b = b"GIF89a" + _s.pack("<HH", 640, 480) + bytes([0b10100111, 0, 0])
    d = mm.decode_media(b)
    assert d == {
        "kind": "image/gif",
        "width": 640,
        "height": 480,
        "channels": 1,
        "bit_depth": 3,  # color-resolution bits 0b010 + 1
    }
    assert mm.decode_media(b"GIF00a" + b"\x00" * 10) == {"kind": "opaque"}


def test_decode_media_bmp_header():
    import struct as _s

    def bmp(width, height, bpp, hdr=40):
        return (
            b"BM"
            + _s.pack("<IHHI", 0, 0, 0, 54)
            + _s.pack("<Iii", hdr, width, height)
            + _s.pack("<HH", 1, bpp)
            + b"\x00" * 4
        )

    d = mm.decode_media(bmp(800, 600, 24))
    assert (d["kind"], d["width"], d["height"], d["channels"],
            d["bit_depth"]) == ("image/bmp", 800, 600, 3, 8)
    # top-down BMP: negative height folds positive
    assert mm.decode_media(bmp(10, -20, 8))["height"] == 20
    assert mm.decode_media(bmp(10, -20, 8))["channels"] == 1
    # 32-bpp BGRA: 4 channels of 8 bits (NOT bpp//3 == 10)
    d = mm.decode_media(bmp(64, 64, 32))
    assert (d["channels"], d["bit_depth"]) == (4, 8)
    # 16-bpp packed RGB: 3 channels of 5 bits (NOT palette-indexed)
    d = mm.decode_media(bmp(64, 64, 16))
    assert (d["channels"], d["bit_depth"]) == (3, 5)
    # BITMAPCOREHEADER (size 12) rejected -> opaque
    assert mm.decode_media(bmp(10, 20, 8, hdr=12)) == {"kind": "opaque"}


def test_bmp_pixel_roundtrip_padded_widths_and_flip():
    """_bmp_encode → _bmp_gray is exact for widths that DO pad the row
    stride (15, 17, 5) and for the trivial 1×1; the expected grays are
    hand-computed integer lumas in TOP-DOWN row-major order, so a
    decoder that forgot to flip the bottom-up pixel array fails on the
    asymmetric images."""
    import random

    rng = random.Random(7)
    for w, h in [(15, 16), (17, 3), (1, 1), (5, 7), (16, 16)]:
        rows = [
            bytearray(rng.randrange(256) for _ in range(3 * w))
            for _ in range(h)
        ]
        got = mm._bmp_gray(mm._bmp_encode(rows, w, h))
        exp = [
            (299 * rows[r][3 * c + 2] + 587 * rows[r][3 * c + 1]
             + 114 * rows[r][3 * c]) // 1000
            for r in range(h)
            for c in range(w)
        ]
        assert got == exp, (w, h)


def test_bmp_gray_top_down_negative_height():
    """A negative biHeight means rows are stored top-down — the decoder
    must NOT flip. Build the variant by patching the height field and
    reordering rows, and require pixel-identical output."""
    import struct as _s

    rows = [bytearray([r, r, r] * 4) for r in range(3)]  # 4×3 gradient
    up = mm._bmp_encode(rows, 4, 3)
    expected = mm._bmp_gray(up)
    stride = (4 * 3 + 3) // 4 * 4
    body = b"".join(
        bytes(rows[r]) + b"\x00" * (stride - 12) for r in range(3)
    )
    down = up[:22] + _s.pack("<i", -3) + up[26:54] + body
    assert mm._bmp_gray(down) == expected
    assert expected == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2]


def test_bmp_gray_total_on_fuzz_and_rejects():
    """Route-don't-drop: arbitrary byte soups (half seeded with 'BM')
    NEVER raise — they return None; so do truncated pixel arrays,
    non-24-bpp depths, and compressed BMPs."""
    import random
    import struct as _s

    rng = random.Random(13)
    for _ in range(3000):
        n = rng.randrange(0, 120)
        b = bytes(rng.randrange(256) for _ in range(n))
        if rng.random() < 0.5:
            b = b"BM" + b
        assert mm._bmp_gray(b) is None or isinstance(
            mm._bmp_gray(b), list
        )
    good = mm._bmp_encode([bytearray(48)] * 16, 16, 16)
    assert mm._bmp_gray(good) is not None
    assert mm._bmp_gray(good[:100]) is None  # truncated pixel array
    eight = good[:28] + _s.pack("<H", 8) + good[30:]
    assert mm._bmp_gray(eight) is None  # palette depth routed, not decoded
    rle = good[:30] + _s.pack("<I", 1) + good[34:]
    assert mm._bmp_gray(rle) is None  # BI_RLE8 compression rejected
    # bfOffBits pointing INTO the headers must route to NULL, not
    # decode header bytes as pixels
    bad_off = good[:10] + _s.pack("<I", 0) + good[14:]
    assert mm._bmp_gray(bad_off) is None


def test_ppm_pixels_roundtrip_luma_and_rejects(spark):
    """P6 decode: hand-built interleaved-RGB payloads come back as the
    hand-computed integer lumas (with a header comment in the walk);
    ASCII P3, 16-bit maxval, and truncated rasters all route to NULL
    instead of raising."""
    rgb = bytes(
        [10, 20, 30, 200, 100, 50, 0, 0, 255, 255, 255, 255]
    )  # 2×2
    good = b"P6\n# c\n2 2\n255\n" + rgb
    p3 = b"P3\n2 2\n255\n" + b"10 20 30 " * 4
    deep = b"P6\n2 2\n65535\n" + rgb * 2
    short = b"P6\n2 2\n255\n" + rgb[:7]
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(p3)),
         (2, bytearray(deep)), (3, bytearray(short)),
         (4, bytearray(b"not an image"))],
        "doc_id bigint, payload binary",
    )
    out = {r.doc_id: r.pixels for r in mm.ppm_pixels(df).collect()}
    exp = [
        (299 * rgb[o] + 587 * rgb[o + 1] + 114 * rgb[o + 2]) // 1000
        for o in range(0, 12, 3)
    ]
    assert out[0] == exp
    assert out[1] is None and out[2] is None
    assert out[3] is None and out[4] is None


def test_ppm_ahash_finds_planted_pairs(spark):
    """The P6-fed aHash path recovers the planted per-decade pairs —
    the full binary color round-trip through the shared hash
    pipeline."""
    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id bigint"
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in mm.image_ahash_neardup(docs, codec="ppm").collect()
    }
    assert {(0, 1), (10, 11), (20, 21), (30, 31)} <= pairs
    assert len(pairs) <= 8


def test_bmp_ahash_finds_planted_pairs(spark):
    """The BMP-fed aHash path (codec='bmp') recovers exactly the
    planted per-decade near-dup pairs on a 40-doc frame — proving the
    full binary BMP round-trip feeds the same hash pipeline; an unknown
    codec raises."""
    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id bigint"
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in mm.image_ahash_neardup(docs, codec="bmp").collect()
    }
    assert {(0, 1), (10, 11), (20, 21), (30, 31)} <= pairs
    # md5 grays are ~uniform: non-planted collisions must stay rare
    assert len(pairs) <= 8
    with pytest.raises(ValueError):
        mm.image_ahash_neardup(docs, codec="gif")


def test_decode_media_tiff_header():
    import struct as _s

    def tiff(endian, width, height, channels=3, bits=8):
        e = "<" if endian == "II" else ">"
        sig = b"II*\x00" if endian == "II" else b"MM\x00*"
        entries = [
            (256, 3, 1, width),  # ImageWidth SHORT
            (257, 4, 1, height),  # ImageLength LONG
            (258, 3, 1, bits),
            (277, 3, 1, channels),
        ]
        ifd = _s.pack(e + "H", len(entries))
        for tag, typ, cnt, v in entries:
            if typ == 3:
                val = _s.pack(e + "H", v) + b"\x00\x00"
            else:
                val = _s.pack(e + "I", v)
            ifd += _s.pack(e + "HHI", tag, typ, cnt) + val
        ifd += b"\x00" * 4  # next-IFD pointer
        return sig + _s.pack(e + "I", 8) + ifd

    for endian in ("II", "MM"):
        d = mm.decode_media(tiff(endian, 1024, 768))
        assert (d["kind"], d["width"], d["height"], d["channels"],
                d["bit_depth"]) == ("image/tiff", 1024, 768, 3, 8)
    # per-channel BitsPerSample list (cnt>=3) read through its u32
    # offset — on BOTH byte orders (the MM case regressed when the
    # offset was misread as a 2-byte SHORT, yielding the high half)
    for endian in ("II", "MM"):
        e = "<" if endian == "II" else ">"
        sig = b"II*\x00" if endian == "II" else b"MM\x00*"
        entries = (
            _s.pack(e + "HHI", 256, 3, 1) + _s.pack(e + "H", 64) + b"\x00\x00"
        )
        entries += (
            _s.pack(e + "HHI", 257, 3, 1) + _s.pack(e + "H", 32) + b"\x00\x00"
        )
        off = 8 + 2 + 3 * 12 + 4  # right after the IFD block
        entries += _s.pack(e + "HHI", 258, 3, 3) + _s.pack(e + "I", off)
        body = (sig + _s.pack(e + "I", 8) + _s.pack(e + "H", 3)
                + entries + b"\x00" * 4 + _s.pack(e + "HHH", 16, 16, 16))
        d = mm.decode_media(body)
        assert d["kind"] == "image/tiff" and d["bit_depth"] == 16, endian
    # cnt==2 SHORT pair stored INLINE in the value field (not an offset):
    # first sample's bits come straight from val[:2]
    for endian in ("II", "MM"):
        e = "<" if endian == "II" else ">"
        sig = b"II*\x00" if endian == "II" else b"MM\x00*"
        entries = (
            _s.pack(e + "HHI", 256, 3, 1) + _s.pack(e + "H", 64) + b"\x00\x00"
        )
        entries += (
            _s.pack(e + "HHI", 257, 3, 1) + _s.pack(e + "H", 32) + b"\x00\x00"
        )
        entries += _s.pack(e + "HHI", 258, 3, 2) + _s.pack(e + "HH", 12, 12)
        body = (sig + _s.pack(e + "I", 8) + _s.pack(e + "H", 3)
                + entries + b"\x00" * 4)
        d = mm.decode_media(body)
        assert d["kind"] == "image/tiff" and d["bit_depth"] == 12, endian
    # truncated IFD -> opaque
    assert mm.decode_media(b"II*\x00" + _s.pack("<I", 9999)) == {
        "kind": "opaque"
    }


def test_decode_media_jpeg_exif_corrupt_variants_default_to_1():
    """Corrupt-but-walkable EXIF bodies must degrade to orientation 1
    (no transpose), never crash or flip dimensions: out-of-range
    orientation value, IFD offset past the segment, zero-entry IFD,
    and a non-SHORT orientation entry type."""
    import struct

    # orientation value 9 is outside the EXIF 1-8 domain
    d = mm.decode_media(_jpeg_bytes(width=64, height=32, exif_orientation=9))
    assert (d["width"], d["height"], d["orientation"]) == (64, 32, 1)

    base = _jpeg_bytes(width=64, height=32, exif_orientation=6)
    i = base.find(b"II*\x00")
    assert i > 0

    # IFD0 offset pointing past the APP1 payload
    past = base[: i + 4] + struct.pack("<I", 0xF0) + base[i + 8 :]
    d = mm.decode_media(past)
    assert (d["width"], d["height"], d["orientation"]) == (64, 32, 1)

    # zero-entry IFD: the walk finds no orientation tag
    empty = base[: i + 8] + struct.pack("<H", 0) + base[i + 10 :]
    d = mm.decode_media(empty)
    assert (d["width"], d["height"], d["orientation"]) == (64, 32, 1)

    # orientation entry typed LONG (4) instead of SHORT (3) is skipped
    wrong_type = base.replace(
        struct.pack("<HH", 0x0112, 3), struct.pack("<HH", 0x0112, 4)
    )
    d = mm.decode_media(wrong_type)
    assert (d["width"], d["height"], d["orientation"]) == (64, 32, 1)
