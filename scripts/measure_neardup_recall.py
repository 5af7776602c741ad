"""Measure the neardup_pairs LSH route's recall/cost against the exact
route (VERDICT r8 Next #1: the auto-route escape needs a MEASURED
recall contract at stress scale, like MinHash-LSH got).

    python scripts/measure_neardup_recall.py <corpus_dir> [--sample M]

Exact truth: the exact block-nested-loop route (full all-pairs) when
the corpus allows; with --sample M, truth is restricted to pairs with
at least one endpoint in the deterministic sample (vec_id % M == 0) —
an unbiased recall estimator that stays computable at corpora where
full exact is quadratic-infeasible (the same evidence style as the
MinHash 1000x spot-check).

Recall is reported overall and stratified by cosine band — hyperplane
LSH is ANGULAR, so high-similarity pairs (the ones dedup acts on) are
found with much higher probability than boundary-threshold pairs; the
bands make that profile explicit instead of hiding it in one number.
Precision is 1.0 by construction (every candidate is exact-verified
with the same integer arithmetic), asserted here anyway.

Emits one JSON line per preset for PLANS.md.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from solace_apache_beam_spark.session import get_spark, load_table  # noqa: E402

THRESHOLD = 0.4
BANDS = ((0.4, 0.6), (0.6, 0.8), (0.8, 1.01))

# (name, n_tables) — n_planes stays derived (mean bucket ~ target)
PRESETS = (("DEFAULT", 2), ("HIGH_RECALL", 4))


def _pairs_set(df):
    return {(r.id_a, r.id_b): r.cos_sim for r in df.collect()}


def _exact_sampled(df, m: int):
    """Exact pairs with >=1 endpoint in the sample (vec_id % m == 0):
    sample blocks x all corpus blocks, canonicalized, deduped."""
    import numpy as np
    import pandas as pd

    from solace_apache_beam_spark.llm.similarity import (
        _block_scores,
        _emit_sliced,
        _pack_blocks,
        _unpack,
    )

    sample = _pack_blocks(
        df.filter(F.col("vec_id") % m == 0), "embedding", "vec_id", 4096
    ).select(
        F.col("ids").alias("aids"), F.col("mat").alias("amat")
    )
    corpus = _pack_blocks(df, "embedding", "vec_id", 4096).select(
        F.col("ids").alias("bids"), F.col("mat").alias("bmat")
    )

    def score(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ia = np.asarray(r.aids, dtype=np.int64)
                ib = np.asarray(r.bids, dtype=np.int64)
                cos = _block_scores(_unpack(r.amat), _unpack(r.bmat))
                mask = (
                    np.isfinite(cos)
                    & (cos >= THRESHOLD - 1e-6)
                    & (ia[:, None] != ib[None, :])
                )
                ii, jj = np.nonzero(mask)
                a, b = ia[ii], ib[jj]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                yield from _emit_sliced(
                    pd.DataFrame({"id_a": lo, "id_b": hi, "cos_raw": cos[ii, jj]})
                )

    return (
        sample.join(corpus)
        .mapInPandas(score, "id_a long, id_b long, cos_raw double")
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= THRESHOLD)
        .distinct()  # sample-sample pairs score twice (once per side)
    )


def main() -> None:
    from solace_apache_beam_spark.llm.similarity import (
        neardup_pairs,
        neardup_pairs_lsh,
    )

    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress100x_llm"
    m = int(sys.argv[sys.argv.index("--sample") + 1]) if "--sample" in sys.argv else 0
    spark = get_spark("neardup-recall", cpus=32)
    df = load_table(spark, corpus_dir, "embeddings")
    n = df.count()

    t0 = time.time()
    if m:
        exact_df = _exact_sampled(df, m)
        exact = _pairs_set(exact_df)
    else:
        exact_df = neardup_pairs(df, threshold=THRESHOLD)
        exact = _pairs_set(exact_df)
        exact_df.plan_caches.unpersist()
    t_exact = time.time() - t0

    def in_scope(p):
        return not m or p[0] % m == 0 or p[1] % m == 0

    by_band = {
        b: {p for p, c in exact.items() if b[0] <= c < b[1]} for b in BANDS
    }
    for name, n_tables in PRESETS:
        t0 = time.time()
        lsh_df = neardup_pairs_lsh(df, threshold=THRESHOLD, n_tables=n_tables)
        lsh = _pairs_set(lsh_df)
        lsh_df.plan_caches.unpersist()
        t_lsh = time.time() - t0
        found = {p: c for p, c in lsh.items() if in_scope(p)}
        # precision 1.0: every in-scope LSH pair must be an exact pair
        # with a bit-identical cosine
        bad = [p for p, c in found.items() if exact.get(p) != c]
        assert not bad, f"precision violation: {bad[:5]}"
        rec = {
            f"recall_{lo}_{hi if hi <= 1 else 1.0}": (
                round(len(by_band[(lo, hi)] & set(found)) / len(by_band[(lo, hi)]), 4)
                if by_band[(lo, hi)]
                else None
            )
            for lo, hi in BANDS
        }
        print(
            json.dumps(
                {
                    "preset": name,
                    "n_vectors": n,
                    "sample_mod": m or None,
                    "n_tables": n_tables,
                    "exact_pairs": len(exact),
                    "lsh_pairs_in_scope": len(found),
                    "recall_overall": round(len(found) / len(exact), 4)
                    if exact
                    else None,
                    **rec,
                    "t_exact_s": round(t_exact, 1),
                    "t_lsh_s": round(t_lsh, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
