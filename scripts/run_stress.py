"""Run registry queries one-at-a-time against a stress dataset.

Same execution discipline as bench.py (noop sink, cache cleared per
query) but single cold run per query — stress runs measure scaling
shape, not steady-state minima. One broken query records an error and
the run keeps going.

    python scripts/run_stress.py /tmp/stress100x_llm dedup_exact dedup_minhash_lsh ...
    python scripts/run_stress.py /tmp/stress100x_llm @llm   # the LLM family preset
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    "@llm-linear": [
        "dedup_exact", "dedup_simhash", "minhash_band_hashes",
        "text_language_id", "text_quality", "text_token_counts",
        "text_fingerprint", "text_repetition", "text_normalize",
        "text_pii_redact", "chunk_documents", "sequence_packing",
        "bm25_components", "vocab_top_words", "corpus_stats",
        "dedup_rate_report", "source_quality_gate",
        "sample_documents_10pct", "split_train_val_test",
        "training_shard_stats", "training_shuffle_manifest",
        "multimodal_metadata", "multimodal_features",
        "multimodal_frame_sample", "multimodal_resize",
    ],
    "@llm-pairs": [
        "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash_pairs",
        "incremental_dedup", "dedup_clusters", "decontamination_report",
        "training_data_pipeline",
    ],
    "@embeddings": [
        "knn_brute_cosine", "ann_lsh_cosine", "ann_ivf_cosine",
        "ivf_kmeans_assign", "embedding_neardup_auto", "embedding_coverage",
    ],
}


FLAGS = ("--isolate", "--counts", "--bucket-stats")

# pair families whose recall guard (max_bucket drops) must be visible
# at stress scale — reported via the count-aggregate fallback
# (dedup.pair_bucket_stats), because Observation.get dies with a
# row-conversion AssertionError on very large AQE plans
_BUCKET_FAMILY = {
    "dedup_minhash_lsh": "minhash",
    "dedup_simhash_pairs": "simhash",
    "dedup_ngram_jaccard": "ngram",
}


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in FLAGS]
    isolate = "--isolate" in sys.argv
    # --counts: report result-row counts alongside timings. A stress
    # timing on a silently EMPTY result is meaningless (observed: a
    # digit-bearing synthetic vocab collapsed every token under the
    # letters-only split, so the pair ops "scaled" over zero pairs);
    # counting forces the volume into the record. The TIMED run is the
    # noop write in BOTH modes (ADVICE r5: count() plans differ
    # materially — partial-count aggs, column pruning — so count-mode
    # timings were not comparable with write-mode ones); the row count
    # comes from an observe metric on the same write, falling back to a
    # separate UNTIMED count() if Observation.get fails at scale.
    counts = "--counts" in sys.argv
    # --bucket-stats: after each pair-family query, report
    # dropped_buckets/total_buckets at the operator's own defaults
    bucket_stats = "--bucket-stats" in sys.argv
    sf_dir = args[0]
    names: list[str] = []
    for a in args[1:]:
        names.extend(PRESETS.get(a, [a]))

    if isolate:
        # one subprocess per query: a heap-death or stopped SparkContext
        # in one query cannot zero out the rest of the run (observed:
        # the 100x ngram-Jaccard GC death took six queries' rows with
        # it). Costs one JVM startup per query — irrelevant for stress.
        import subprocess

        out: dict[str, float | str] = {}
        passthrough = [f for f in ("--counts", "--bucket-stats") if f in sys.argv]
        for name in names:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sf_dir, name]
                + passthrough,
                capture_output=True,
                text=True,
            )
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            got = json.loads(lines[-1]) if lines else {
                name: f"ERR subprocess rc={r.returncode}: {r.stderr[-160:]}"
            }
            out.update(got)
            print(f"[stress] {name}: {out[name]}", flush=True)
        print(json.dumps(out))
        return

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from solace_apache_beam_spark.registry import all_queries
    from solace_apache_beam_spark.session import get_spark

    spark = get_spark("stress")
    queries = all_queries()
    out: dict[str, float | str] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            ob = None
            if counts:
                ob = Observation(f"rows_{name}")
                df = df.observe(ob, F.count(F.lit(1)).alias("rows"))
            df.write.format("noop").mode("overwrite").save()
            t = round(time.perf_counter() - t0, 2)
            if counts:
                try:
                    n = ob.get["rows"]
                except Exception:  # Observation.get dies on huge AQE plans
                    n = queries[name](spark, sf_dir).count()  # untimed
                out[name] = f"{t}s rows={n}"
            else:
                out[name] = t
            if bucket_stats and name in _BUCKET_FAMILY:
                from solace_apache_beam_spark.llm.dedup import pair_bucket_stats
                from solace_apache_beam_spark.session import load_table

                s = pair_bucket_stats(
                    load_table(spark, sf_dir, "documents"), _BUCKET_FAMILY[name]
                )
                out[name] = (
                    f"{out[name]} dropped={s['dropped_buckets']}"
                    f"/{s['total_buckets']}"
                )
                if _BUCKET_FAMILY[name] == "minhash":
                    # surface the recall/cost trade at the call site
                    # (VERDICT r6 Next #5): the operator's defaults are
                    # the cheap SCREEN preset, not a complete pass.
                    # NOTE: the stamp describes the registry queries'
                    # parameterization (library defaults); if a gate
                    # query is ever re-registered with a non-default
                    # preset, update this stamp in the same commit
                    from solace_apache_beam_spark.llm.dedup import (
                        minhash_recall_info,
                    )

                    ri = minhash_recall_info()
                    out[name] = (
                        f"{out[name]} recall_preset={ri['recall_preset']}"
                        f"({ri['measured_recall']:.3f})"
                    )
            if bucket_stats and name == "ann_lsh_cosine":
                from solace_apache_beam_spark.llm.similarity import (
                    ann_recall_info,
                )

                ri = ann_recall_info()
                out[name] = (
                    f"{out[name]} recall_preset={ri['recall_preset']}"
                    f"({ri['measured_recall']:.3f})"
                )
        except Exception as ex:  # noqa: BLE001
            out[name] = f"ERR {type(ex).__name__}: {ex}"[:200]
        print(f"[stress] {name}: {out[name]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
