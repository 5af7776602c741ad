"""Measure the sparse-id auto-routing fix at stress scale (ADVICE r9
medium: the route counted rows, not the exact kernel's id-range block
population, so a sparse-id corpus at <= 262k rows kept the quadratic
exact plan past its horizon).

    python scripts/measure_sparse_routing.py [embeddings.parquet]

The demonstration corpus is the 100x stress embedding table (200k
vectors, dense ids 0..199999 — the exact bite point: the OLD row-based
routing says ceil(200k/4096) = 49 blocks <= 64 -> "exact") with ids
scaled by 4096, one per default block range. The fixed router counts
200,000 real blocks and dispatches to LSH. The avoided plan is
computed, not run: B*(B+1)/2 block pairs at B = 200,000 is 2.0e10
matmul tasks — six orders of magnitude past the 2,080-task budget the
exact plan is bounded by.

Evidence emitted (one JSON line for PLANS.md):
- route decisions + block counts for the dense and sparse variants
  (same vectors, same order);
- wall time of route="auto" on the sparse corpus vs route="lsh" on the
  dense one — the auto overhead is one countDistinct aggregate;
- EXACT pair-set equivalence: LSH bucketing hashes vectors (ids only
  order the sub-blocks, and scaling preserves order), so the sparse
  result must equal the dense result under id/4096 — both directions
  checked with exceptAll.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from solace_apache_beam_spark.session import get_spark  # noqa: E402
from solace_apache_beam_spark.llm.similarity import (  # noqa: E402
    NEARDUP_MAX_EXACT_BLOCKS,
    neardup_auto_route,
    neardup_corpus_stats,
    neardup_pairs,
)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress100x_llm/embeddings.parquet"
    spark = get_spark("sparse_routing")
    dense = spark.read.parquet(src).select("vec_id", "embedding")
    sparse = dense.select(
        (F.col("vec_id") * 4096).alias("vec_id"), "embedding"
    )

    stats = {}
    for name, df in (("dense", dense), ("sparse", sparse)):
        n, blocks = neardup_corpus_stats(df)
        stats[name] = {
            "n_vectors": n,
            "n_blocks": blocks,
            "route": neardup_auto_route(blocks),
            # what the pre-fix row-based rule would have said
            "old_row_rule": (
                "exact"
                if -(-n // 4096) <= NEARDUP_MAX_EXACT_BLOCKS
                else "lsh"
            ),
        }
    avoided_block_pairs = (
        stats["sparse"]["n_blocks"] * (stats["sparse"]["n_blocks"] + 1) // 2
    )

    t0 = time.monotonic()
    dense_lsh = neardup_pairs(dense, route="lsh")
    n_dense = dense_lsh.count()
    t_dense = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    sparse_auto = neardup_pairs(sparse, route="auto")
    n_sparse = sparse_auto.count()
    t_sparse = round(time.monotonic() - t0, 1)

    # exact equivalence under the id scaling, both directions
    unscaled = sparse_auto.select(
        (F.col("id_a") / 4096).cast("long").alias("id_a"),
        (F.col("id_b") / 4096).cast("long").alias("id_b"),
        "cos_sim",
    )
    base = dense_lsh.select("id_a", "id_b", "cos_sim")
    missing = base.exceptAll(unscaled).count()
    extra = unscaled.exceptAll(base).count()

    print(
        json.dumps(
            {
                "corpus": src,
                "stats": stats,
                "avoided_exact_block_pairs": avoided_block_pairs,
                "pairs_dense_lsh": n_dense,
                "pairs_sparse_auto": n_sparse,
                "equivalent_under_id_scaling": missing == 0 and extra == 0,
                "missing": missing,
                "extra": extra,
                "wall_s_dense_lsh": t_dense,
                "wall_s_sparse_auto": t_sparse,
            }
        )
    )
    for h in (dense_lsh, sparse_auto):
        h.plan_caches.unpersist()


if __name__ == "__main__":
    main()
