"""Randomized differential for duplicate_spans (llm/dedup.py) against a
scalar reference: word n-grams with positions, dup iff the identical
gram text occurs in another (non-NULL-id) doc, match_doc = smallest
other doc sharing any dup span. Small vocab makes cross-doc collisions,
boundary sizes (len == n), identical docs, NULL ids and NULL texts all
common."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._fuzz import n_examples

from solace_apache_beam_spark.llm.dedup import duplicate_spans

SETTINGS = dict(
    max_examples=n_examples(8, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_N = 3
_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_text = st.one_of(
    st.none(),
    st.lists(_word, min_size=0, max_size=10).map(" ".join),
)


def _reference(docs: dict[int | None, str | None], n: int):
    grams: dict[int, list[str]] = {}
    for i, t in docs.items():
        if i is None or t is None:
            continue  # NULL id: no identity; NULL text: no words
        words = [w for w in re.split(r"[^a-zA-Z]+", t) if w]
        if len(words) < n:
            continue
        grams[i] = [
            " ".join(words[p : p + n]) for p in range(len(words) - n + 1)
        ]
    docs_of: dict[str, set[int]] = {}
    for i, gs in grams.items():
        for g in gs:
            docs_of.setdefault(g, set()).add(i)
    out = {}
    for i, gs in grams.items():
        dup = [g for g in gs if len(docs_of[g]) >= 2]
        match = min(
            (min(d for d in docs_of[g] if d != i) for g in dup),
            default=None,
        )
        ratio = len(dup) / len(gs)
        out[i] = (len(gs), len(dup), ratio, match)
    return out


@settings(**SETTINGS)
@given(
    texts=st.lists(_text, min_size=1, max_size=8),
    with_null_id=st.booleans(),
)
def test_duplicate_spans_matches_reference(spark, texts, with_null_id):
    rows = [(i, t) for i, t in enumerate(texts)]
    if with_null_id and texts:
        rows.append((None, texts[0]))  # NULL id shares text: must be ignored
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(df, n=_N)
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_ratio, r.match_doc)
        for r in out.collect()
    }
    assert got == _reference(dict(rows), _N)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_gram_hash_kernel_matches_string_kernel_h64(spark):
    """The round-15 positioned-gram HASH kernel's value contract:
    position i holds exactly the 60-bit md5 prefix of the gram string
    the reference string kernel emits there (the convention the span
    oracles replay with ('0x' || substr(md5(g),1,15))::BIGINT) — the
    string kernel stays in the module as this test's reference
    implementation. Covers empty/short/NULL docs (both kernels emit
    [])."""
    import hashlib

    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.dedup import (
        _gram_hashes_udf,
        _gram_strings_udf,
    )

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # == n
            (2, "too short"),
            (3, None),
            (4, "alpha beta gamma delta epsilon zeta eta theta alpha beta"),
        ],
        "doc_id long, text string",
    )
    words = F.filter(
        F.split(F.col("text"), r"[^\p{L}]+"), lambda x: x != F.lit("")
    )
    both = df.select(
        "doc_id",
        _gram_strings_udf(8)(words).alias("gs"),
        _gram_hashes_udf(8)(words).alias("gh"),
    ).collect()
    for r in both:
        expect = [
            int.from_bytes(
                hashlib.md5(g.encode("utf-8")).digest()[:8], "big"
            )
            >> 4
            for g in (r.gs or [])
        ]
        assert list(r.gh or []) == expect, r.doc_id
    # the short/NULL rows really exercised the empty path
    by_id = {r.doc_id: r for r in both}
    assert list(by_id[2].gs) == [] and list(by_id[3].gs) == []
    assert len(by_id[0].gs) == 2 and len(by_id[4].gs) == 3
