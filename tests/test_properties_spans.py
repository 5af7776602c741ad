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
