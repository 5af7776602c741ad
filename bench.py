"""Per-round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "regressions": {name: ratio}}.

Methodology:

- Each query executes its full physical plan into the noop sink (no
  driver-side collect — measuring engine work, not row transfer).
- Each query runs TWICE and the min is reported: the first run pays
  one-time codegen / Python-worker-pool / shuffle-service warmup that
  is irrelevant at cluster scale (amortized over hours of work), and
  on this shared VM it is also the noisiest sample — min-of-2 is the
  steady-state engine cost. (BASELINE.md documents the anchor.)
- Regression gate: per-query times are diffed against the committed
  anchor in BENCH_ANCHOR.json; any query slower than
  REGRESSION_FACTOR x its anchor is reported under "regressions".
  With SPARK_GRAFT_BENCH_STRICT=1 the process also exits non-zero —
  the CI/test mode; the default exit stays 0 so the driver's bench
  recording never breaks.
- Provisional regressions get CONFIRM_RUNS extra isolated samples
  before being reported: on a shared VM a contention spike can push
  both initial samples of an untouched query past the gate (observed:
  a 0.4 s from_json map query measuring 1.7 s twice in a loaded
  minute, then 0.41 s isolated). Only queries that stay slow across
  the confirmation runs are real regressions.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ANCHOR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_ANCHOR.json")
REGRESSION_FACTOR = 2.0
N_RUNS = 2
CONFIRM_RUNS = 2


def compute_regressions(
    timings: dict[str, float],
    anchor: dict[str, float],
    factor: float = REGRESSION_FACTOR,
    min_delta: float = 1.0,
) -> dict[str, float]:
    """Queries slower than factor x their anchor time -> ratio.
    ``min_delta`` is an absolute-slack floor: sub-second queries jitter
    2-3x on a shared VM without any plan change (observed repeatedly on
    untouched queries whose isolated warm time matched the anchor), so
    a flag additionally requires the absolute slowdown to exceed
    min_delta seconds — sub-second drift shows up in the total instead,
    while a genuine 2x regression on any material query still trips."""
    out = {}
    for name, t in timings.items():
        base = anchor.get(name)
        if base and t > factor * base and (t - base) > min_delta:
            out[name] = round(t / base, 2)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from solace_apache_beam_spark.registry import all_queries
    from solace_apache_beam_spark.session import get_spark

    spark = get_spark("bench")
    queries = all_queries()

    # warm up the JVM (codegen, shuffle service, Python worker pool)
    # outside the timed region — standard practice so query timings
    # measure steady-state engine work, not one-time process startup
    from solace_apache_beam_spark.session import load_table

    load_table(spark, sf_dir, "lineitem").limit(1000).groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()

    def _warm_arrow(it):
        yield from it

    spark.range(8).mapInPandas(_warm_arrow, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    def run_once(name: str) -> float:
        # drop persisted frames from the previous run/query: the
        # CacheManager substitutes any identical cached subtree, so
        # without this a repeat run of a persist()-using query reads
        # run 1's materialized cache and times nothing — hiding
        # regressions inside exactly the expensive pipelines the
        # gate exists to watch
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in sorted(queries):
        timings[name] = round(min(run_once(name) for _ in range(N_RUNS)), 3)

    anchor: dict[str, float] = {}
    if os.path.exists(ANCHOR_PATH):
        anchor = json.load(open(ANCHOR_PATH)).get("queries", {})
    # contention-spike filter: re-measure provisional regressions in
    # isolation; keep the flag only if the query stays slow
    for name in compute_regressions(timings, anchor):
        best = min(run_once(name) for _ in range(CONFIRM_RUNS))
        timings[name] = round(min(timings[name], best), 3)
    regressions = compute_regressions(timings, anchor)

    total = round(sum(timings.values()), 3)
    # the driver parses this single JSON line from stdout: flush stderr
    # first and lead with a newline so any \r-terminated progress output
    # can't share the line, then make the JSON the final stdout content
    sys.stderr.flush()
    sys.stdout.write(
        "\n"
        + json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "regressions": regressions,
            }
        )
        + "\n"
    )
    sys.stdout.flush()
    if regressions and os.environ.get("SPARK_GRAFT_BENCH_STRICT") == "1":
        sys.exit(1)


if __name__ == "__main__":
    main()
