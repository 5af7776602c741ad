"""Measure ANN recall@k against exact brute-force truth — the
similarity-family twin of measure_recall.py (MinHash). For a sampled
query set (every 100th vec_id), compute the exact top-k by
brute_force_topk, then each ANN configuration's self-search top-k, and
report the fraction of exact (query, neighbor) pairs the ANN run
recovers. Both paths rank the identical quantized cosine, so
differences are bucketing recall, not scoring noise (boundary ties can
contribute <1% jitter either way).

    python scripts/measure_ann_recall.py /tmp/stress100x_llm

Prints one JSON line per configuration.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 5
QUERY_STRIDE = 100  # every 100th vector is a query


def main() -> None:
    sf_dir = sys.argv[1]

    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.similarity import (
        ann_lsh_topk,
        brute_force_topk,
        ivf_topk,
    )
    from solace_apache_beam_spark.session import get_spark, load_table

    spark = get_spark("ann_recall")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)

    t0 = time.perf_counter()
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=K).collect()
    }
    t_truth = round(time.perf_counter() - t0, 1)
    n_q = len({q for q, _ in truth})
    print(
        json.dumps(
            {"config": "exact-brute", "queries": n_q, "pairs": len(truth), "s": t_truth}
        ),
        flush=True,
    )

    def run(label, fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.neighbor_id)
            for r in fn()
            .filter(F.col("query_id") % QUERY_STRIDE == 0)
            .collect()
        }
        el = round(time.perf_counter() - t0, 1)
        # degenerate embeddings table -> empty truth set: report null
        # recall (mirrors measure_recall.py) instead of dividing by 0
        recall = round(len(got & truth) / len(truth), 4) if truth else None
        print(
            json.dumps({"config": label, "recall_at_k": recall, "s": el}),
            flush=True,
        )

    for n_tables in (1, 2, 4):
        run(
            f"lsh/derived-planes/{n_tables}tables",
            lambda nt=n_tables: ann_lsh_topk(emb, k=K, n_tables=nt),
        )
    run("ivf/derived-cells", lambda: ivf_topk(emb, k=K))


if __name__ == "__main__":
    main()
