"""Measure MinHash-LSH recall against exact-Jaccard truth (VERDICT r5
Next #1b): on a given documents table, count the TRUE pairs with
full-shingle-set Jaccard >= t (via the prefix-filtered exact join,
which is candidate-complete), then count the pairs each MinHash-LSH
parameterization recovers. Both operators verify with the identical
exact Jaccard over the identical shingle sets, so the LSH output is a
strict subset of truth and recall = |lsh| / |truth|.

    python scripts/measure_recall.py /tmp/stress100x_llm 16:4 64:16

Prints one JSON line per configuration with recall, pair counts and
wall-clock, plus the truth baseline.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    configs = [tuple(map(int, a.split(":"))) for a in sys.argv[2:]] or [
        (16, 4),
        (64, 16),
    ]

    from solace_apache_beam_spark.llm.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from solace_apache_beam_spark.session import get_spark, load_table

    spark = get_spark("recall")
    docs = load_table(spark, sf_dir, "documents")

    t0 = time.perf_counter()
    truth = ngram_jaccard_pairs(docs, threshold=0.5).count()
    t_truth = round(time.perf_counter() - t0, 1)
    print(
        json.dumps({"config": "exact-truth", "pairs": truth, "s": t_truth}),
        flush=True,
    )

    for n_perm, n_bands in configs:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        got = minhash_lsh_pairs(
            docs, n_perm=n_perm, n_bands=n_bands, threshold=0.5
        ).count()
        el = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "config": f"{n_perm}perm/{n_bands}bands",
                    "pairs": got,
                    "recall": round(got / truth, 4) if truth else None,
                    "s": el,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
