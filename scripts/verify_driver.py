"""Driver-surface verification (the /verify recipe, runnable directly):
imports __spark_entry__ with a deliberately bare SparkSession (no custom
confs — catches confs we wrongly assume the driver sets) and compares
every queries() entry against its oracle_sql() in DuckDB at sf0.01.

Usage: python scripts/verify_driver.py [name-substring ...]
(no args = all oracle-gated queries)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    df = e.entry(spark)
    print("entry rows:", df.count(), df.schema.simpleString())

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    wanted = sys.argv[1:]
    names = sorted(
        n for n in osql if not wanted or any(w in n for w in wanted)
    )
    bad = 0
    for name in names:
        sdf = qs[name](spark, SF_DIR)
        s = sorted(
            tuple(str(x) for x in r)
            for r in sdf.select(*sorted(sdf.columns)).collect()
        )
        res = con.execute(osql[name])
        cols = [d[0] for d in res.description]
        idx = sorted(range(len(cols)), key=lambda i: cols[i])
        d = sorted(tuple(str(r[i]) for i in idx) for r in res.fetchall())
        # the driver also gates on schema: column NAMES must agree
        names_ok = sorted(sdf.columns) == sorted(cols)
        ok = s == d and names_ok
        bad += not ok
        print(
            name,
            "OK" if ok else ("SCHEMA-MISMATCH" if not names_ok else "MISMATCH"),
            len(s),
            len(d),
        )
    print(f"MISMATCHES: {bad} of {len(names)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
