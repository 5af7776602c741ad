"""Measure the screen-then-rescue MinHash composition (VERDICT r6 Next
#2) against exact-Jaccard truth on a stress corpus: recall on the
partition of interest and corpus-wide, at what fraction of the
full-corpus HIGH_RECALL premium.

    python scripts/measure_rescue.py /tmp/stress100x_llm [modulus]

The partition of interest is doc_id % modulus == 0 (default 4 -> 25 %
of the corpus — a realistic "slice we actually train on"). Both the
screen and the rescue verify with the identical exact Jaccard, so
every emitted pair is a true pair and recalls are plain count ratios:

- partition recall  = rescue-output pairs with both endpoints in the
  partition / truth pairs with both endpoints in the partition
  (HIGH_RECALL's ~95.6 % is the target);
- corpus recall     = all rescue-output pairs / all truth pairs
  (bounded by the screen's 76.7 % outside the partition);
- cost              = composed wall-clock vs the DEFAULT screen alone
  and vs full-corpus HIGH_RECALL (the premium being avoided).

Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    modulus = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.dedup import (
        MINHASH_HIGH_RECALL,
        minhash_lsh_pairs,
        minhash_lsh_pairs_rescue,
        ngram_jaccard_pairs,
    )
    from solace_apache_beam_spark.session import get_spark, load_table

    spark = get_spark("rescue")
    docs = load_table(spark, sf_dir, "documents")
    part = F.col("doc_id") % modulus == 0
    in_part = (F.col("doc_a") % modulus == 0) & (F.col("doc_b") % modulus == 0)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    t0 = time.perf_counter()
    truth = ngram_jaccard_pairs(docs, threshold=0.5).persist()
    n_truth = truth.count()
    n_truth_part = truth.filter(in_part).count()
    emit(
        config="exact-truth",
        pairs=n_truth,
        pairs_in_partition=n_truth_part,
        s=round(time.perf_counter() - t0, 1),
    )
    truth.unpersist()

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n_screen = minhash_lsh_pairs(docs).count()
    t_screen = round(time.perf_counter() - t0, 1)
    emit(
        config="screen-only/DEFAULT",
        pairs=n_screen,
        recall=round(n_screen / n_truth, 4) if n_truth else None,
        s=t_screen,
    )

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    out = minhash_lsh_pairs_rescue(docs, part).persist()
    n_out = out.count()
    n_out_part = out.filter(in_part).count()
    t_composed = round(time.perf_counter() - t0, 1)
    emit(
        config=f"composed/rescue-mod{modulus}",
        pairs=n_out,
        recall=round(n_out / n_truth, 4) if n_truth else None,
        partition_recall=(
            round(n_out_part / n_truth_part, 4) if n_truth_part else None
        ),
        s=t_composed,
        premium_vs_screen=round(t_composed / t_screen, 2) if t_screen else None,
    )
    out.unpersist()

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n_high = minhash_lsh_pairs(docs, **MINHASH_HIGH_RECALL).count()
    t_high = round(time.perf_counter() - t0, 1)
    emit(
        config="full-corpus/HIGH_RECALL",
        pairs=n_high,
        recall=round(n_high / n_truth, 4) if n_truth else None,
        s=t_high,
        premium_vs_screen=round(t_high / t_screen, 2) if t_screen else None,
    )


if __name__ == "__main__":
    main()
