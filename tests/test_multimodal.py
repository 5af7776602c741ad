"""Exact semantics of the multimodal operators (the driver gate checks
frame sampling via md5 oracle; features are rows-only there, so their
exactness lives here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solace_apache_beam_spark.llm.multimodal import (
    FEATURE_BINS,
    attach_binary_payload,
    decode_image,
    extract_features,
    frame_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_attach_binary_payload_metadata(spark):
    out = attach_binary_payload(_docs(spark, [(1, "abc")])).collect()[0]
    assert out.modality == "text"
    assert out.n_bytes == 3
    assert bytes(out.payload) == b"abc"
    import hashlib

    assert out.checksum == hashlib.md5(b"abc").hexdigest()


def test_extract_features_exact_histogram(spark):
    # payload "abc" = bytes 97,98,99 -> bins 1,2,3 (mod 16), each 1/3
    feats = (
        extract_features(attach_binary_payload(_docs(spark, [(1, "abc")])))
        .collect()[0]
        .features
    )
    assert len(feats) == FEATURE_BINS
    expected = [0.0] * FEATURE_BINS
    for b in b"abc":
        expected[b % FEATURE_BINS] += 1 / 3
    assert feats == pytest.approx(expected)
    assert sum(feats) == pytest.approx(1.0)


def test_frame_sample_exact_slices(spark):
    # 300 bytes -> 4 full 64-byte frames (0..3); stride 4 keeps frame 0
    text = "x" * 300
    rows = frame_sample(
        attach_binary_payload(_docs(spark, [(1, text)]))
    ).collect()
    assert [(r.doc_id, r.frame_idx) for r in rows] == [(1, 0)]
    assert bytes(rows[0].frame) == b"x" * 64
    # stride 1: every full frame, in order, exact bytes
    all_rows = frame_sample(
        attach_binary_payload(_docs(spark, [(1, text)])), stride=1
    ).collect()
    assert sorted(r.frame_idx for r in all_rows) == [0, 1, 2, 3]
    assert all(bytes(r.frame) == b"x" * 64 for r in all_rows)
    # payload shorter than one frame -> no rows
    assert (
        frame_sample(attach_binary_payload(_docs(spark, [(2, "short")]))).count()
        == 0
    )


def test_decode_image_rejects_unsupported_formats():
    # JPEG (and anything else without a pure-python decoder) stays the
    # explicit extension point
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


def test_decode_bmp_byte_level_vector():
    """Hand-built 2x2 24-bit BMP, bytes spelled out per the format spec
    (bottom-up rows, BGR samples, rows padded to 4 bytes: 2 px * 3 = 6
    bytes + 2 pad). Pins header offsets, row flip, channel swap, and
    padding handling at the byte level — independent of encode_bmp."""
    import struct

    import numpy as np

    # target image (top-down RGB):
    #   row 0: red   (255,0,0), green (0,255,0)
    #   row 1: blue  (0,0,255), white (255,255,255)
    data = (
        # file row 0 = IMAGE row 1 (bottom-up), BGR + 2 pad bytes
        bytes([255, 0, 0,  255, 255, 255,  0, 0])
        # file row 1 = IMAGE row 0
        + bytes([0, 0, 255,  0, 255, 0,  0, 0])
    )
    payload = (
        struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data), 0, 0, 0, 0)
        + data
    )
    got = decode_image(payload)
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    assert got.shape == (2, 2, 3)
    assert (got == want).all()


def test_encode_bmp_roundtrips_exactly():
    """encode_bmp and the BMP decoder are exact inverses for arbitrary
    pixel arrays, including widths that need row padding."""
    import numpy as np

    from solace_apache_beam_spark.llm.multimodal import encode_bmp

    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (2, 2), (3, 5), (4, 4), (7, 3), (1, 6)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = decode_image(encode_bmp(px))
        assert back.shape == px.shape
        assert (back == px).all()


def _encode_png(px, color_type, filters):
    """Spec-level PNG encoder (test-side reference): applies the given
    filter type per scanline with the spec 7.3 formulas, written
    independently of the decoder's unfiltering loop."""
    import struct
    import zlib

    import numpy as np

    h, w = px.shape[:2]
    c = 1 if px.ndim == 2 else px.shape[2]
    flat = px.reshape(h, w * c).astype(np.int64)
    raw = bytearray()
    prior = np.zeros(w * c, dtype=np.int64)
    for r in range(h):
        line = flat[r]
        ftype = filters[r % len(filters)]
        raw.append(ftype)
        for i in range(w * c):
            x = int(line[i])
            a = int(line[i - c]) if i >= c else 0
            b = int(prior[i])
            cc = int(prior[i - c]) if i >= c else 0
            if ftype == 0:
                enc = x
            elif ftype == 1:
                enc = x - a
            elif ftype == 2:
                enc = x - b
            elif ftype == 3:
                enc = x - (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc = x - pred
            raw.append(enc & 0xFF)
        prior = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_all_filters_and_color_types():
    import numpy as np

    rng = np.random.RandomState(11)
    # every filter type exercised, gray / RGB / RGBA
    for c in (1, 3, 4):
        shape = (7, 5) if c == 1 else (7, 5, c)
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            got = decode_image(_encode_png(px, None, filters))
            assert got.shape == (7, 5, c)
            assert (got == px.reshape(7, 5, c)).all(), f"c={c} filters={filters}"


def test_decode_png_paeth_byte_vector():
    """Fixed byte-level Paeth check: a 2x2 grayscale PNG whose second
    scanline uses filter 4, with the filtered bytes hand-derived from
    the spec predictor (a=left, b=up, c=upper-left; nearest of a,b,c
    to a+b-c, ties a then b)."""
    import struct
    import zlib

    import numpy as np

    # image rows: [10, 200], [60, 190]
    # scanline 0: filter 0 -> raw 10, 200
    # scanline 1: filter 4:
    #   x=60:  a=0,  b=10,  c=0  -> p=10, pred=b=10 (pa=10,pb=0)... spec:
    #          pa=|p-a|=10, pb=|p-b|=0, pc=|p-c|=10 -> pred=b=10, enc=50
    #   x=190: a=60, b=200, c=10 -> p=250, pa=190, pb=50, pc=240
    #          pred=b=200, enc=190-200 = -10 -> 246
    raw = bytes([0, 10, 200, 4, 50, 246])

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = decode_image(payload)
    assert (got == np.array([[[10], [200]], [[60], [190]]], dtype=np.uint8)).all()


def test_decode_features_matches_wrapped_byte_histogram(spark):
    """The decode path end-to-end in Spark: attach_bmp_payload wraps
    text bytes, decode_features REAL-decodes and histograms — values
    must equal the direct byte histogram over the wrapped range, and
    short docs (< one pixel row) must vanish (absent-media rule)."""
    from solace_apache_beam_spark.llm.multimodal import (
        attach_bmp_payload,
        decode_features,
    )

    rows = [
        (1, "abcdefghijkl"),          # exactly one 12-byte row
        (2, "abcdefghijklmnop"),      # 16 bytes -> one row used (12)
        (3, "short"),                 # < 12 bytes -> no record
        (4, None),                    # NULL -> no record
    ]
    out = {
        r.doc_id: r.features
        for r in decode_features(
            attach_bmp_payload(_docs(spark, rows))
        ).collect()
    }
    assert set(out) == {1, 2}

    def hist(raw):
        counts = [0] * FEATURE_BINS
        for byte in raw:
            counts[byte % FEATURE_BINS] += 1
        return [c / len(raw) for c in counts]

    assert out[1] == pytest.approx(hist(b"abcdefghijkl"), abs=0)
    assert out[2] == pytest.approx(hist(b"abcdefghijkl"), abs=0)


def test_pack_sequences_respects_budget_and_covers_all(spark):
    from solace_apache_beam_spark.llm.text_analysis import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([5, 5, 5, 12, 3, 9, 2])],
        "doc_id long, text string",
    ).coalesce(1)
    rows = pack_sequences(docs, token_budget=10).collect()
    assert {r.doc_id for r in rows} == set(range(7))  # every doc packed once
    by_bin: dict[str, int] = {}
    for r in rows:
        by_bin[r.bin_id] = by_bin.get(r.bin_id, 0) + r.n_tokens
    for bin_id, total in by_bin.items():
        single = [r for r in rows if r.bin_id == bin_id]
        # bins respect the budget unless a single doc exceeds it alone
        assert total <= 10 or (len(single) == 1 and single[0].n_tokens > 10)
    # greedy first-fit on one partition: 5+5 | 5 (12 won't fit) -> 12 | 3 -> ...
    first_bin = [r.doc_id for r in rows if r.bin_id == rows[0].bin_id]
    assert first_bin == [0, 1]
