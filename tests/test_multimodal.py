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


def test_decode_image_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


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
