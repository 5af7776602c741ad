"""Property-based CROSS-ENGINE parity tests for the Spark/DuckDB twin
fragments in functions/hashing.py — the contract every text-family
oracle stands on (wordcount, minhash shingles, bm25, vocab, ngram
jaccard all tokenize/hash through these pairs):

    words_expr     <->  WORDS_SQL
    shingles_expr  <->  shingles_sql
    h64 / h32      <->  h64_sql / h32_sql

The driver gate validates these pairs only on the fixed testdata
corpus; these tests run them side by side on randomized text drawn
from an adversarial alphabet (CJK, accented letters, combining marks,
emoji, digits, punctuation, whitespace runs) so a divergence between
Java's regex classes and DuckDB's RE2 on `[^\\p{L}]+`, or between the
two engines' md5/hex/varint conversions, surfaces as a test failure
instead of a silent future-gate break."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._fuzz import n_examples

from pyspark.sql import functions as F

from solace_apache_beam_spark.functions.hashing import (
    WORDS_SQL,
    h32,
    h32_sql,
    h64,
    h64_sql,
    shingles_expr,
    shingles_sql,
    words_expr,
)

SETTINGS = dict(
    max_examples=n_examples(8, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# adversarial alphabet: every class the tokenizer must agree on across
# regex engines — Latin, accented, CJK, Cyrillic, Greek, digits,
# punctuation, whitespace variants, combining marks, emoji
_ALPHABET = (
    "abcXYZ äöüßéñç 漢字かなカナ 中文 кирил ελλην "
    "0123456789 .,;:!?-_()[]'\"/\\|@#$%^&*+=~` \t\n"
    "́̈"  # combining acute / diaeresis
    "\U0001f600\U0001f680"  # emoji
)

_text = st.text(alphabet=_ALPHABET, min_size=0, max_size=60)


def _duck_rows(texts, select_expr):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, txt VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    return dict(
        con.execute(f"SELECT id, {select_expr} FROM t ORDER BY id").fetchall()
    )


@settings(**SETTINGS)
@given(texts=st.lists(st.one_of(st.none(), _text), min_size=1, max_size=15))
def test_words_expr_matches_words_sql(spark, texts):
    """Tokenization must be IDENTICAL across engines for any input —
    token content, order, and count (empty tokens filtered on both
    sides, NULL text staying NULL)."""
    df = spark.createDataFrame(list(enumerate(texts)), "id long, txt string")
    got = {
        r.id: r.words
        for r in df.select("id", words_expr("txt").alias("words")).collect()
    }
    want = _duck_rows(texts, WORDS_SQL.format(text="txt") + " AS words")
    assert got == want


@settings(**SETTINGS)
@given(
    texts=st.lists(_text, min_size=1, max_size=12),
    n=st.sampled_from([2, 3]),
)
def test_shingles_expr_matches_shingles_sql(spark, texts, n):
    """Word n-gram shingle SETS must match across engines including the
    size < n guard (empty array on both, never NULL, never a backwards
    sequence). Compared as sorted lists: every consumer explodes the
    shingles into set-semantics joins/aggregations, and list_distinct /
    array_distinct only guarantee the element set, not an order."""
    df = spark.createDataFrame(list(enumerate(texts)), "id long, txt string")
    got = {
        r.id: sorted(r.sh)
        for r in df.select(
            "id", shingles_expr(words_expr("txt"), n).alias("sh")
        ).collect()
    }
    inner = WORDS_SQL.format(text="txt")
    want = {
        i: sorted(v)
        for i, v in _duck_rows(texts, shingles_sql(inner, n) + " AS sh").items()
    }
    assert got == want


@settings(**SETTINGS)
@given(texts=st.lists(_text, min_size=1, max_size=15))
def test_h64_h32_match_sql_twins(spark, texts):
    """The portable md5-prefix hashes must be bit-identical across
    engines on arbitrary unicode (both hash the UTF-8 bytes; the 15/8
    hex-char prefix -> BIGINT conversion must agree including the
    sign-safety headroom)."""
    df = spark.createDataFrame(list(enumerate(texts)), "id long, txt string")
    got = {
        r.id: (r.h64, r.h32)
        for r in df.select(
            "id", h64("txt").alias("h64"), h32("txt").alias("h32")
        ).collect()
    }
    want64 = _duck_rows(texts, h64_sql("txt") + " AS h")
    want32 = _duck_rows(texts, h32_sql("txt") + " AS h")
    assert got == {i: (want64[i], want32[i]) for i in want64}
    # 60-bit ceiling: every value non-negative and under 2^60 (the
    # cross-engine arithmetic safety contract)
    for v64, v32 in got.values():
        assert 0 <= v64 < (1 << 60) and 0 <= v32 < (1 << 32)


# ----------------------------------------------- normalize / PII twins

# the regex surfaces the normalize/redact oracles replay in RE2 — an
# alphabet dense in the classes those patterns pivot on (@, dots,
# dashes, %, +, digits, short TLD-ish runs, unicode letters/digits)
_PII_ALPHABET = (
    "abcdefgXYZ 0123456789 @._%+- äñ漢७ ,;()\n\t"
)
_pii_text = st.text(alphabet=_PII_ALPHABET, min_size=0, max_size=80)


def _oracle_on_documents(texts, oracle_sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(texts)))
    res = con.execute(oracle_sql)
    cols = [d[0] for d in res.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in idx) for r in res.fetchall())


@settings(**SETTINGS)
@given(texts=st.lists(_pii_text, min_size=1, max_size=15))
def test_normalize_and_pii_oracles_match_on_random_text(spark, texts):
    """Query-level cross-engine differential for text_normalize and
    text_pii_redact: the REGISTRY's own oracle SQL runs against an
    in-memory DuckDB `documents` table of randomized text while the
    operators run on the same rows — Java regex vs RE2 on the
    \\p{L}\\p{N} class, the {2,} TLD quantifier, char-class ranges, and
    regexp_extract_all counting must agree on every input, not just the
    gate corpus."""
    from solace_apache_beam_spark.llm.text_analysis import (
        normalize_text,
        redact_pii,
    )
    from solace_apache_beam_spark.registry import all_oracles

    oracles = all_oracles()
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    for op, name in ((normalize_text, "text_normalize"), (redact_pii, "text_pii_redact")):
        sdf = op(df)
        got = sorted(
            tuple(str(x) for x in r)
            for r in sdf.select(*sorted(sdf.columns)).collect()
        )
        assert got == _oracle_on_documents(texts, oracles[name]), name


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
