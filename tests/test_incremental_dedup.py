"""incremental_dedup: batch-vs-corpus statuses on crafted docs (the
registered query's oracle covers the real-table path; this pins each
status branch explicitly, including exact_dup which real data may not
contain)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def result(spark):
    from solace_apache_beam_spark.llm.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven eight"),
            (3, "totally unrelated corpus content here now"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # byte-identical to corpus doc 1 -> exact_dup
            (10, "alpha beta gamma delta epsilon zeta"),
            # punctuation-only difference from corpus doc 2: different
            # bytes (not exact) but identical token stream -> identical
            # shingles and signature, so candidacy is GUARANTEED (a
            # jaccard-0.7 doc would only collide probabilistically)
            (11, "one, two three four five six seven eight!"),
            # nothing in common -> unique
            (12, "completely novel text with fresh words only"),
            # too short to shingle (< 3 words) -> unique
            (13, "hi"),
        ],
        "doc_id long, text string",
    )
    return {
        r.doc_id: r for r in incremental_dedup(new, corpus).collect()
    }


def test_statuses(result):
    assert len(result) == 4
    assert result[10].status == "exact_dup" and result[10].match_id == 1
    assert result[10].jaccard is None
    assert result[11].status == "near_dup" and result[11].match_id == 2
    assert result[11].jaccard == 1.0  # same token stream, different bytes
    assert result[12].status == "unique" and result[12].match_id is None
    assert result[13].status == "unique"
