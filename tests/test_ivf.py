"""IVF coarse-quantizer ANN: deterministic k-means training, bucket
assignment, and probe search recall."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from redo_log_parser_spark.operators.similarity import (
    cosine_topk, ivf_ann, train_ivf_centroids, with_ivf_bucket)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(3)
    # three well-separated gaussian clusters in 8-d
    centers = rng.randn(3, 8) * 10
    rows = []
    for i in range(120):
        c = i % 3
        rows.append((i, list(centers[c] + rng.randn(8) * 0.1)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).cache()


def test_kmeans_is_deterministic(emb):
    c1 = train_ivf_centroids(emb, k=3, iters=4)
    c2 = train_ivf_centroids(emb, k=3, iters=4)
    assert c1 == c2


def test_buckets_separate_clusters(emb):
    cents = train_ivf_centroids(emb, k=3, iters=4)
    b = with_ivf_bucket(emb, cents)
    rows = b.select("vec_id", "ivf_bucket").collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["vec_id"] % 3, set()).add(r["ivf_bucket"])
    # every ground-truth cluster maps to exactly one IVF list
    assert all(len(s) == 1 for s in by_cluster.values())
    assert len({next(iter(s)) for s in by_cluster.values()}) == 3


def test_ivf_ann_matches_bruteforce_topk(emb):
    cents = train_ivf_centroids(emb, k=3, iters=4)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 5).first()["embedding"]]
    approx = [r["vec_id"] for r in ivf_ann(emb, q, cents, k=5, n_probe=1).collect()]
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    # clusters are well-separated: single-probe IVF recovers exact top-5
    assert approx == exact
