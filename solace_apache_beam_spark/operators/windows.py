"""Event-time windowing operators (SURVEY.md §2.5).

The reference exercises tumbling windows (W1,
WindowedWordCountSolace.java:143-144) and a processing-time trigger over
the global window (W2, SolaceIOLifecycleDataflowIT.java:457-467). Sliding
and session windows (W7) are absent there but ship free in Spark; they are
first-class here.

All of these compile to HashAggregate over the window expression — at
scale the shuffle key is (window, group keys), and the state-store
versions (streaming/) use the same expressions with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_count(
    df: DataFrame, time_col: str, duration: str, *group_cols: str
) -> DataFrame:
    """Fixed-window grouped count (W1). Output: window_start, window_end,
    group cols, cnt."""
    return (
        df.groupBy(F.window(time_col, duration).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "cnt",
        )
    )


def sliding_count(
    df: DataFrame, time_col: str, duration: str, slide: str, *group_cols: str
) -> DataFrame:
    """Sliding-window grouped count (W7): each row lands in
    duration/slide windows; Spark expands them with a generator — no
    self-join needed."""
    return (
        df.groupBy(F.window(time_col, duration, slide).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "cnt",
        )
    )


def session_count(
    df: DataFrame, time_col: str, gap: str, *group_cols: str
) -> DataFrame:
    """Session windows (W7): merge rows per key while consecutive gaps
    are AT MOST ``gap`` — an event exactly ``gap`` after the previous
    one still merges (inclusive touch, measured; the registered query's
    oracle and stateful.sessionize encode the same strict-> split);
    window end = last event + gap. Single shuffle on the session
    keys."""
    return (
        df.groupBy(F.session_window(time_col, gap).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *group_cols,
            "cnt",
        )
    )
