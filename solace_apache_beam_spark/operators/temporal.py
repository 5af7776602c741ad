"""Temporal operators Spark lacks natively: as-of join, interval range
join, hypertable (multi-resolution) rollup.

These are the custom time-series operators a reference user would reach
for beyond the connector surface (SURVEY.md §2.8 lists the categories
absent from the reference); each is a composition of existing DataFrame
ops — no UDFs, no driver collects — chosen for its shuffle profile at
100 TB:

- **as-of join**: the union-tag trick — tag both inputs, union, one
  window per key ordered by (time, tag), carry the right side's values
  forward with last(ignorenulls). ONE shuffle of (left+right) keyed by
  the join key; contrast with a naive windowed self-join which shuffles
  both sides and explodes candidate pairs.
- **interval range join**: bucketize time — intervals explode to the
  fixed-width buckets they cover, points map to exactly one bucket, the
  join becomes an equi-join on bucket id + residual containment filter.
  Each (interval, point) pair meets in exactly one bucket (the point's),
  so no dedup pass is needed. Shuffle volume is O(points +
  intervals * avg_span/bucket_width) — tunable.
- **hypertable rollup**: hierarchical continuous aggregate — the finest
  resolution aggregates the raw table once; every coarser resolution
  re-aggregates the previous level (not the raw data). Sums go through
  DECIMAL so hierarchical re-aggregation is bit-identical to a direct
  aggregate (float re-association would not be).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solace_apache_beam_spark.functions.caching import attach_plan_caches


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, the right row with the
    greatest ``on`` <= left.``on`` within the same ``by`` key (inclusive,
    like DuckDB's ASOF JOIN). ``right_cols`` maps right column ->
    output alias. Left rows with no prior right row keep nulls.

    Right rows should be unique per (by, on) — pre-aggregate if not.

    All right columns travel as ONE struct carried by a single
    last(ignorenulls): every output column comes from the same matched
    right row, so a NULL inside a right row stays NULL in the output
    (per-column carries would silently mix values from different right
    rows whenever a newer row holds a NULL).

    NULL handling matches SQL ASOF semantics (``l.on >= r.on AND l.by =
    r.by`` is never true through a NULL): right rows with a NULL ``on``
    or ``by`` are dropped up front — without the filter Spark's
    NULLS-FIRST window order would sort a NULL-timestamp right row
    before everything and carry its payload into every left row. Left
    rows with a NULL ``on`` or ``by`` are kept (left join) and match
    nothing: they sort before all surviving right rows / partition with
    no right rows, so the carry window is empty for them."""
    right_cols = right_cols or {"value": "asof_value"}
    payload = F.struct(*[F.col(c).alias(a) for c, a in right_cols.items()])
    r_tagged = right.filter(F.col(on).isNotNull() & F.col(by).isNotNull()).select(
        F.col(by), F.col(on), F.lit(0).alias("_is_l"), payload.alias("_r")
    )
    l_tagged = left.select(
        "*",
        F.lit(1).alias("_is_l"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
    )
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(l_tagged.dtypes)[c]))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    # right rows (tag 0) sort before left rows at the same timestamp ->
    # a right row with on == left.on is visible to that left row
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in left.columns],
        "_is_l",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return filled.filter(F.col("_is_l") == 1).select(
        *left.columns,
        *[F.col(f"_r.{a}").alias(a) for a in right_cols.values()],
    )


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    point_col: str = "ts",
    bucket_seconds: int = 300,
) -> DataFrame:
    """Range join: every (interval, point) pair with start <= point <
    end, as an equi-join on fixed-width time buckets. Intervals explode
    to the buckets they cover; a point lives in exactly one bucket, so
    each qualifying pair meets exactly once (no dedup needed)."""
    # epoch-seconds floor; the intermediate cast("timestamp") makes the
    # expression type-robust — TIMESTAMP_NTZ (what Spark 4 infers for
    # tz-less parquet) rejects a direct cast to BIGINT, and under a UTC
    # session TZ the NTZ->TZ cast is value-preserving
    sec = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    ib = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                (sec(start_col) / bucket_seconds).cast("long"),
                (sec(end_col) / bucket_seconds).cast("long"),
            )
        ),
    )
    pb = points.withColumn("_b", (sec(point_col) / bucket_seconds).cast("long"))
    return (
        ib.join(pb, "_b")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_b")
    )


def hypertable_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    fine: str = "1 hour",
    coarse: str = "1 day",
) -> DataFrame:
    """Two-level continuous aggregate: (resolution, bucket_start, n,
    total). The coarse level re-aggregates the fine level — at scale the
    raw table is read once and the day rollup touches only 1/3600th of
    the rows. DECIMAL sums make the hierarchy exact (re-association
    safe), cast to double only at the output edge."""
    hourly = (
        df.groupBy(F.window(ts_col, fine).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("dec_total"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n", "dec_total")
    )
    daily = (
        hourly.groupBy(F.window("bucket_start", coarse).alias("w"))
        .agg(F.sum("n").alias("n"), F.sum("dec_total").alias("dec_total"))
        .select(F.col("w.start").alias("bucket_start"), "n", "dec_total")
    )
    out_cols = lambda res, d: d.select(  # noqa: E731
        F.lit(res).alias("resolution"),
        "bucket_start",
        "n",
        F.col("dec_total").cast("double").alias("total"),
    )
    return out_cols(fine, hourly).unionByName(out_cols(coarse, daily))


def funnel_counts(
    df,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
):
    """Ordered-funnel analysis: how many users performed stage 1, then
    stage 2 strictly after it, then stage 3 after that, ... (the
    view->click->purchase product-analytics staple; DuckDB/sequence
    engines express it as window funnels / MATCH_RECOGNIZE).

    Greedy earliest-match per stage is exact for existence: taking the
    EARLIEST qualifying event at each stage leaves maximal room for the
    rest of the sequence. "Strictly after" compares (ts, event_id) so
    same-timestamp events have a deterministic order and a single event
    can never satisfy two stages.

    Scale: the events table crosses ONE user-keyed exchange; every
    stage is a conditional whole-partition MIN window over that same
    partitioning (no per-stage scan, join, or persist — see the
    round-14 note in the body), followed by one per-user aggregate
    that reuses the partitioning and one global count row. No driver
    collects. Timestamps and counts only — no float anywhere, so the
    oracle matches bit-for-bit.

    Output: (stage_idx, stage, n_users) — one row per stage.

    Null event times are excluded up front (ADVICE r6): min(struct(ts,
    id)) sorts a NULL ts field FIRST, so without the filter a user
    whose only qualifying event had a null timestamp would enter the
    frontier — where the pre-round-6 min(ts)+equality-join form (and
    any SQL oracle, whose MIN ignores NULLs) silently excluded them.
    NULL user ids are excluded for the same SQL-alignment reason:
    groupBy keeps a NULL-user group where the oracle's stage-to-stage
    frontier equi-join drops it (stage-1 overcount). NULL EVENT ids are
    NOT excluded — an event with a null id still qualifies by
    timestamp in SQL (the oracle's q0 keeps the row; only MIN over the
    tie-break column ignores the NULL) — so the frontier's struct-min
    orders the id field nulls-LAST via an is-null flag: at equal ts a
    non-null id wins the tie-break, exactly like the oracle's
    min(event_id), and the frontier id is NULL only when every
    earliest-ts event has a null id (where the strictly-after
    disjunct (ts = t AND id > i) is NULL in both engines). The filters
    make the nullable-input behavior explicit instead of relying on
    sources guaranteeing non-null columns."""
    from pyspark.sql.window import Window

    ev = df.select(user_col, type_col, ts_col, id_col).filter(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    )
    # Round 14: every stage frontier is a CONDITIONAL whole-partition
    # MIN window over ONE user-keyed exchange — the former shape ran,
    # per stage, a filtered scan of the events table, a pinned
    # sort-merge join against the previous (persisted) frontier, and a
    # keyed aggregation: 3 scans, 2 join exchanges, 3 persists for the
    # default funnel. Equivalence, stage by stage: min(when(qual,
    # struct)) ignores rows failing the qualifier (when -> NULL, min
    # skips NULLs) exactly as the former filtered aggregation did; a
    # user absent from stage k-1's frontier has a NULL _f{k-1}, which
    # NULL-poisons the strictly-after comparison so no stage-k event
    # qualifies — precisely the former INNER join's row elimination.
    # The struct carries the same nulls-last flag (z) for the
    # tie-break id: struct ordering sorts a NULL field FIRST, but the
    # oracle's min(event_id) ignores NULLs — the flag makes any
    # non-null id beat a null one. Each window is unordered
    # (whole-partition frame, no sort) and WindowExec buffers one
    # user's events at a time — the same spill class as the former
    # per-stage external aggregation.
    w = Window.partitionBy(user_col)

    def _mstruct(cond):
        return F.min(
            F.when(
                cond,
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(id_col).isNull().alias("z"),
                    F.col(id_col).alias("i"),
                ),
            )
        ).over(w)

    d = ev
    prev = None
    for idx, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            pt = F.col(prev)["t"]
            pi = F.col(prev)["i"]
            cond = cond & (
                (F.col(ts_col) > pt)
                | ((F.col(ts_col) == pt) & (F.col(id_col) > pi))
            )
        d = d.withColumn(f"_f{idx}", _mstruct(cond))
        prev = f"_f{idx}"
    # one row per user (the flags are constant within a user, and the
    # groupBy reuses the window's hashpartitioning — no new exchange),
    # then one global row of per-stage survivor counts
    per_user = d.groupBy(user_col).agg(
        *[
            F.max(F.col(f"_f{i}").isNotNull()).alias(f"s{i}")
            for i in range(len(stages))
        ]
    )
    counts = per_user.agg(
        *[
            F.coalesce(F.sum(F.col(f"s{i}").cast("long")), F.lit(0)).alias(
                f"n{i}"
            )
            for i in range(len(stages))
        ]
    )
    out = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("stage_idx"),
                        F.lit(stage).alias("stage"),
                        F.col(f"n{i}").alias("n_users"),
                    )
                    for i, stage in enumerate(stages)
                ]
            )
        ).alias("r")
    ).select("r.stage_idx", "r.stage", "r.n_users")
    return attach_plan_caches(out, ())
