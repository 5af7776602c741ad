"""Per-round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes its full physical plan into the noop sink (no
driver-side collect — measuring engine work, not row transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

    timings: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
