"""Measure the materialized corpus index for incremental_dedup at a
stress point (VERDICT r6 Next #6: pin the 'gap widens further' claim at
1000x): split the documents table into a reference corpus and a 1%
ingestion batch, then time

- the RECOMPUTE path (corpus shingled/signatured every run),
- the one-time index build + parquet write,
- the INDEX path (reading the three artifacts back),

verifying the two outputs match exactly and that the read-back band
index still joins sort-merge (the boundedness contract: corpus-derived
frames must never build a broadcast).

    python scripts/measure_index.py /tmp/stress1000x_llm [modulus]

Batch = doc_id % modulus == 0 (default 100 -> 1% batch). Prints one
JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    modulus = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.dedup import (
        build_corpus_index,
        incremental_dedup,
    )
    from solace_apache_beam_spark.session import get_spark, load_table

    spark = get_spark("index")
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % modulus == 0)
    corpus = docs.filter(F.col("doc_id") % modulus != 0)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def checksum(df):
        # order-independent content fingerprint: cheap at 5M rows,
        # catches any value divergence the status counts would miss
        return df.agg(
            F.sum(F.hash("doc_id", "status", "match_id", "jaccard"))
        ).collect()[0][0]

    t0 = time.perf_counter()
    recomputed = incremental_dedup(new, corpus).persist()
    n_re = recomputed.count()
    by_status_re = sorted(
        (r.status, r["count"])
        for r in recomputed.groupBy("status").count().collect()
    )
    emit(
        config="recompute-per-run",
        rows=n_re,
        by_status=by_status_re,
        s=round(time.perf_counter() - t0, 1),
    )
    sum_re = checksum(recomputed)
    recomputed.unpersist()

    out_dir = tempfile.mkdtemp(prefix="corpus_index_")
    try:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        idx = build_corpus_index(corpus)
        paths = {}
        for name, df in idx.items():
            paths[name] = os.path.join(out_dir, f"{name}.parquet")
            df.write.mode("overwrite").parquet(paths[name])
        idx.unpersist()
        emit(config="one-time-build+write", s=round(time.perf_counter() - t0, 1))

        spark.catalog.clearCache()
        stored = {n: spark.read.parquet(p) for n, p in paths.items()}
        t0 = time.perf_counter()
        indexed = incremental_dedup(new, corpus_index=stored).persist()
        n_ix = indexed.count()
        by_status_ix = sorted(
            (r.status, r["count"])
            for r in indexed.groupBy("status").count().collect()
        )
        t_ix = round(time.perf_counter() - t0, 1)

        # boundedness contract on the READ-BACK index: corpus-derived
        # joins stay pinned sort-merge, never broadcast
        analyzed = (
            incremental_dedup(new, corpus_index=stored)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        emit(
            config="index-per-run",
            rows=n_ix,
            by_status=by_status_ix,
            s=t_ix,
            matches_recompute=(
                n_ix == n_re
                and by_status_ix == by_status_re
                and checksum(indexed) == sum_re
            ),
            merge_pinned="strategy=merge" in analyzed,
            broadcast_free="broadcast" not in analyzed.lower(),
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
