"""Isolated per-query timing for optimization work: bench.py's exact
methodology (noop sink, warm pool, clearCache between runs) over an
explicit query subset, min-of-N plus all samples printed.

Usage: python scripts/bench_some.py [-n RUNS] query [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from solace_apache_beam_spark.registry import all_queries
    from solace_apache_beam_spark.session import get_spark, load_table

    spark = get_spark("bench-some")
    queries = all_queries()

    load_table(spark, sf_dir, "lineitem").limit(1000).groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()

    def _warm_arrow(it):
        yield from it

    spark.range(0, 32, 1, 32).mapInPandas(_warm_arrow, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    for name in args:
        samples = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_some: {name}")
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(samples):.3f} "
            f"samples={[round(s, 3) for s in samples]} load1={os.getloadavg()[0]:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
