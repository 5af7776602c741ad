"""Text operators: tokenize, word count, format (the flagship chain).

Mirrors the reference sample pipeline ``WindowedWordCountSolace``
(WindowedWordCountSolace.java:114-168) and its building blocks:

- ``ExtractWordsFn``: split on ``[^\\p{L}]+``, drop empties
  (common/CountWords.java:32-54; pattern common/ExampleUtils.java:77)
- ``Count.perElement()``: word -> count hash agg (common/CountWords.java:57-66)
- ``WordCountToTextFn``: "word: count" formatting
  (common/WordCountToTextFn.java:13-18)

All built-in expressions — the whole chain stays inside whole-stage
codegen; the groupBy count compiles to HashAggregate with partial/final
split (map-side combine), so at 100 TB the shuffle carries only
(word, partial_count) pairs, not raw tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ONE canonical tokenizer for the whole engine: the word-count chain
# and the shingle/minhash/bm25 chain (functions/hashing.words_expr +
# its DuckDB WORDS_SQL twin) must never tokenize differently, or the
# documented engine-parity guarantees silently break when one constant
# is tuned — so this is an alias of the hashing module's pattern, not
# a second definition.
from solace_apache_beam_spark.functions.partitioning import (  # noqa: E402
    TOKENIZE_SPREAD_MIN_BYTES,
    spread_scan,
)
from solace_apache_beam_spark.functions.hashing import (  # noqa: E402
    TOKEN_PATTERN as TOKENIZER_PATTERN,
)


def extract_words(df: DataFrame, line_col: str = "line", keep: list[str] | None = None) -> DataFrame:
    """flatMap line -> words; drops empty tokens (ExtractWordsFn,
    common/CountWords.java:45-52). ``keep`` = passthrough columns
    (e.g. event_time for windowing)."""
    keep = keep or []
    # spread_scan: the tokenize+explode over a single-split scan is the
    # serial floor of every wordcount query (round 14); no-op on
    # streaming frames, already-parallel scans, and post-shuffle frames
    base = spread_scan(
        df.select(*keep, F.col(line_col)), min_bytes=TOKENIZE_SPREAD_MIN_BYTES
    )
    exploded = base.select(
        *keep, F.explode(F.split(F.col(line_col), TOKENIZER_PATTERN)).alias("word")
    )
    return exploded.filter(F.col("word") != "")


def count_per_element(df: DataFrame, element_col: str = "word") -> DataFrame:
    """``Count.perElement()`` — grouped occurrence count
    (common/CountWords.java:63)."""
    return df.groupBy(element_col).agg(F.count(F.lit(1)).alias("cnt"))


def count_words(df: DataFrame, line_col: str = "line") -> DataFrame:
    """The composite ``CountWords`` PTransform (common/CountWords.java:25-67):
    tokenize + per-element count."""
    return count_per_element(extract_words(df, line_col))


def windowed_count_words(
    df: DataFrame,
    line_col: str = "line",
    time_col: str = "event_time",
    window_duration: str = "10 seconds",
) -> DataFrame:
    """CountWords under fixed (tumbling) event-time windows — the
    flagship query shape (WindowedWordCountSolace.java:143-150; 10 s
    windows at :144). Output: window_start, window_end, word, cnt."""
    words = extract_words(df, line_col, keep=[time_col])
    return (
        words.groupBy(F.window(F.col(time_col), window_duration).alias("w"), "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "word",
            "cnt",
        )
    )


def format_word_count(
    df: DataFrame, word_col: str = "word", count_col: str = "cnt"
) -> DataFrame:
    """``WordCountToTextFn``: KV<word,count> -> "word: count"
    (common/WordCountToTextFn.java:13-18)."""
    return df.withColumn(
        "formatted", F.format_string("%s: %d", F.col(word_col), F.col(count_col))
    )


def decode_payload(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """``StringMessageMapper`` (common/StringMessageMapper.java:16-30):
    message -> String payload. Binary payloads are UTF-8 decoded; string
    payloads pass through."""
    col = F.col(payload_col)
    dtype = dict(df.dtypes)[payload_col]
    line = F.decode(col, "UTF-8") if dtype == "binary" else col.cast("string")
    return df.withColumn("line", line)
