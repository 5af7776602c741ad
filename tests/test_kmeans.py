"""Quantized Lloyd k-means: centroid updates, empty-cell retention,
and the trained-centroid plug into ivf_topk. (Cross-engine exactness
of the full training loop is gated by the ivf_kmeans_assign oracle.)"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_centroids_move_to_cluster_means(spark):
    from solace_apache_beam_spark.llm.similarity import QUANT, kmeans_centroids

    # two tight direction-clusters; seeds 0 and 1 are one vector from each
    a = [[1.0, 0.0], [0.9, 0.1], [1.1, -0.1]]
    b = [[0.0, 1.0], [0.1, 0.9], [-0.1, 1.1]]
    df = _vec_df(spark, [a[0], b[0], a[1], a[2], b[1], b[2]])
    cids, cmat = kmeans_centroids(df, n_cells=2, n_iters=2)
    assert list(cids) == [0, 1]
    got = cmat / QUANT
    # cluster means: a -> (1.0, 0.0), b -> (0.0, 1.0)
    assert np.allclose(got[0], [1.0, 0.0], atol=1e-5)
    assert np.allclose(got[1], [0.0, 1.0], atol=1e-5)


def test_empty_cell_keeps_previous_centroid(spark):
    from solace_apache_beam_spark.llm.similarity import QUANT, kmeans_centroids

    # a seed always has cos 1.0 with itself, so the only way a cell can
    # empty is a TIE broken toward a smaller cid: seed 1 = [2,0] is
    # parallel to seed 0 = [1,0] (cos 1.0 with both), tie -> cell 0.
    df = _vec_df(spark, [[1.0, 0.0], [2.0, 0.0], [0.5, 0.5], [0.6, 0.4]])
    cids, cmat = kmeans_centroids(df, n_cells=2, n_iters=1)
    # cell 1 is empty; its centroid must stay its seed [2,0]
    assert list(cmat[1] / QUANT) == [2.0, 0.0]


def test_trained_centroids_plug_into_ivf_topk(spark):
    from solace_apache_beam_spark.llm.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    vecs = [[1.0, 0.0], [0.0, 1.0], [0.9, 0.1], [0.1, 0.9], [0.8, 0.2], [0.2, 0.8]]
    df = _vec_df(spark, vecs)
    cents = kmeans_centroids(df, n_cells=2, n_iters=2)
    out = ivf_topk(df, k=1, centroids=cents).collect()
    by_q = {r.query_id: r.neighbor_id for r in out}
    # x-cluster members 0,2,4 neighbor each other; y-cluster 1,3,5
    assert by_q[2] in (0, 4) and by_q[4] in (0, 2)
    assert by_q[3] in (1, 5) and by_q[5] in (1, 3)


def test_multi_table_lsh_raises_recall(spark, sf_dir):
    """OR-construction recall lever: 3 independent hyperplane tables
    more than double single-table recall on the fixed corpus. Values
    are exact pins — hashes and data are fully deterministic."""
    from solace_apache_beam_spark.llm.similarity import (
        ann_lsh_topk,
        brute_force_topk,
    )
    from solace_apache_beam_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, emb, k=5).collect()
    }
    recalls = {}
    for n_tables in (1, 3):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ann_lsh_topk(
                emb, n_planes=4, k=5, n_tables=n_tables
            ).collect()
        }
        recalls[n_tables] = len(exact & approx) / len(exact)
    assert recalls[1] == 386 / 2500
    assert recalls[3] == 924 / 2500
