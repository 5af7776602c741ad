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

# (name, n_tables) — n_planes stays derived (mean bucket ~ target)
PRESETS = (("DEFAULT", 2), ("HIGH_RECALL", 4))


def _band_counts(df):
    """Distributed per-band pair counts — only scalars reach the driver
    (the 2M sampled-exact set is ~20M pairs; collecting it OOMed)."""
    rows = (
        df.withColumn(
            "band",
            F.when(F.col("cos_sim") < 0.6, F.lit("0.4_0.6"))
            .when(F.col("cos_sim") < 0.8, F.lit("0.6_0.8"))
            .otherwise(F.lit("0.8_1.0")),
        )
        .groupBy("band")
        .count()
        .collect()
    )
    return {r.band: r["count"] for r in rows}


def _exact_sampled(df, m: int):
    """Exact pairs with >=1 endpoint in the sample (vec_id % m == 0):
    the (small) sample rides the TASK CLOSURE as a quantized numpy
    matrix — no join, so no 2-MB packed-matrix rows ever cross Arrow
    (a join-shaped first cut OOMed the 2M run twice: joined rows carry
    amat+bmat and one Arrow batch of them is gigabytes). Each corpus
    block is scored against sample sub-chunks, bounding the per-matmul
    cosine matrix."""
    import numpy as np
    import pandas as pd

    from solace_apache_beam_spark.llm.similarity import (
        _block_scores,
        _emit_sliced,
        _pack_blocks,
        _quantize,
        _to_matrix,
        _unpack,
    )

    srows = (
        df.filter((F.col("vec_id") % m == 0) & F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
        .collect()
    )
    ids_s = np.array([r.vec_id for r in srows], dtype=np.int64)
    mat_s = _quantize(_to_matrix(pd.Series([r.embedding for r in srows])))
    chunk = 1024

    corpus = _pack_blocks(df, "embedding", "vec_id", 4096)

    def score(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ib = np.asarray(r.ids, dtype=np.int64)
                bm = _unpack(r.mat)
                for s in range(0, len(ids_s), chunk):
                    ia = ids_s[s : s + chunk]
                    cos = _block_scores(mat_s[s : s + chunk], bm)
                    mask = (
                        np.isfinite(cos)
                        & (cos >= THRESHOLD - 1e-6)
                        & (ia[:, None] != ib[None, :])
                    )
                    ii, jj = np.nonzero(mask)
                    a, b = ia[ii], ib[jj]
                    lo, hi = np.minimum(a, b), np.maximum(a, b)
                    yield from _emit_sliced(
                        pd.DataFrame(
                            {"id_a": lo, "id_b": hi, "cos_raw": cos[ii, jj]}
                        )
                    )

    return (
        corpus.mapInPandas(score, "id_a long, id_b long, cos_raw double")
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

    from pyspark.storagelevel import StorageLevel

    t0 = time.time()
    if m:
        exact_df = _exact_sampled(df, m)
        caches = None
    else:
        exact_df = neardup_pairs(df, threshold=THRESHOLD)
        caches = exact_df.plan_caches
    exact_df = exact_df.persist(StorageLevel.DISK_ONLY)
    exact_bands = _band_counts(exact_df)
    exact_total = sum(exact_bands.values())
    t_exact = time.time() - t0
    if caches is not None:
        caches.unpersist()

    for name, n_tables in PRESETS:
        t0 = time.time()
        lsh_df = neardup_pairs_lsh(df, threshold=THRESHOLD, n_tables=n_tables)
        in_scope = (
            lsh_df.filter((F.col("id_a") % m == 0) | (F.col("id_b") % m == 0))
            if m
            else lsh_df
        ).persist(StorageLevel.DISK_ONLY)
        found_total = in_scope.count()
        t_lsh = time.time() - t0
        # precision 1.0: every in-scope LSH pair must be an exact pair
        # with a bit-identical cosine (distributed anti-join, scalar out)
        bad = in_scope.join(
            exact_df, on=["id_a", "id_b", "cos_sim"], how="left_anti"
        ).count()
        assert bad == 0, f"precision violation: {bad} pairs"
        matched = _band_counts(
            exact_df.join(in_scope, on=["id_a", "id_b", "cos_sim"], how="left_semi")
        )
        lsh_df.plan_caches.unpersist()
        in_scope.unpersist()
        rec = {
            f"recall_{b}": (
                round(matched.get(b, 0) / exact_bands[b], 4)
                if exact_bands.get(b)
                else None
            )
            for b in ("0.4_0.6", "0.6_0.8", "0.8_1.0")
        }
        print(
            json.dumps(
                {
                    "preset": name,
                    "n_vectors": n,
                    "sample_mod": m or None,
                    "n_tables": n_tables,
                    "exact_pairs": exact_total,
                    "lsh_pairs_in_scope": found_total,
                    "recall_overall": round(found_total / exact_total, 4)
                    if exact_total
                    else None,
                    **rec,
                    "t_exact_s": round(t_exact, 1),
                    "t_lsh_s": round(t_lsh, 1),
                }
            ),
            flush=True,
        )
    exact_df.unpersist()


if __name__ == "__main__":
    main()
