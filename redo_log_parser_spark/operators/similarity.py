"""Similarity search over an embedding column (array<float>).

  cosine_topk       brute-force top-k vs one query vector: a narrow
                    projection + TakeOrderedAndProject — no global sort
                    materialization, scales linearly, the correctness
                    baseline.
  lsh_bucketed_ann  sign-random-projection LSH: embeddings hash into
                    2^n_planes buckets via deterministic hyperplanes;
                    the query probes its own bucket (and optional
                    multi-probe neighbors), brute-forcing only within.
                    The 100 TB scale path: the bucket join prunes the
                    candidate set by ~2^n_planes.
  embedding_near_dup_pairs  all-pairs near-duplicates within LSH buckets.

Hyperplanes are generated from a seeded RNG on the driver and folded
into the plan as literal arrays — identical on every executor and every
run. Dot products use F.aggregate/zip_with (JVM-side, codegen); no UDFs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, score) — top-k by cosine vs a literal query vector.
    orderBy+limit compiles to TakeOrderedAndProject: each partition keeps
    a k-heap, the driver merges k×P rows."""
    q = F.array(*[F.lit(float(v)) for v in query])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), id_col).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-projection bucket id: bit p = sign(vec · plane_p)."""
    sig = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, lit_plane) > 0,
                     F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(F.lit(0).cast("bigint"))
        sig = sig + bit
    return sig


def with_lsh_bucket(
    emb: DataFrame, dim: int, n_planes: int = 8, seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    planes = _hyperplanes(dim, n_planes, seed)
    return emb.withColumn(
        "lsh_bucket", lsh_signature(F.col(vec_col).cast("array<double>"), planes)
    )


def lsh_bucketed_ann(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is the query's
    bucket or differs in ≤ multiprobe_bits planes (multi-probe recall
    boost). At scale, `lsh_bucket` doubles as the storage partition key
    so probes become partition-pruned scans."""
    planes = _hyperplanes(len(query), n_planes, seed)
    qsig = 0
    for p, plane in enumerate(planes):
        if float(np.dot(query, plane)) > 0:
            qsig |= 1 << p
    probe = [qsig]
    if multiprobe_bits >= 1:
        probe += [qsig ^ (1 << p) for p in range(n_planes)]
    bucketed = with_lsh_bucket(emb, len(query), n_planes, seed, vec_col)
    cand = bucketed.filter(F.col("lsh_bucket").isin(probe))
    q = F.array(*[F.lit(float(v)) for v in query])
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), id_col).limit(k)


def _sq_dist(a: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(a, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def train_ivf_centroids(
    emb, k: int = 8, iters: int = 5, seed: int = 42,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Driver-iterated Lloyd's k-means (the IVF coarse quantizer).

    Each iteration is ONE distributed aggregation: assign = argmin over
    k literal centroids (pure expressions), then groupBy(cluster) mean
    per dimension. Only k×dim floats ever reach the driver. Iteration
    count is fixed (deterministic); init picks the k rows with the
    smallest xxhash64 of the id — stable across runs and partitionings."""
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F811

    dim = len(emb.select(vec_col).first()[0])
    first_cols = [c for c in emb.columns if c != vec_col][:1]
    seed_rows = (
        emb.withColumn("__h", F.xxhash64(F.lit(seed), *first_cols))
        .orderBy("__h")
        .limit(k)
        .select(vec_col)
        .collect()
    )
    cents = [list(map(float, r[0])) for r in seed_rows]
    v = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        dists = F.array(*[_sq_dist(v, c) for c in cents])
        assign = F.array_position(dists, F.array_min(dists)) - 1
        agg = (
            emb.withColumn("__c", assign)
            .select(
                "__c",
                *[F.element_at(v, i + 1).alias(f"d{i}") for i in range(dim)],
            )
            .groupBy("__c")
            .agg(*[F.avg(f"d{i}").alias(f"d{i}") for i in range(dim)])
            .collect()
        )
        new = {int(r["__c"]): [float(r[f"d{i}"]) for i in range(dim)] for r in agg}
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    return cents


def with_ivf_bucket(emb, centroids: list[list[float]], vec_col: str = "embedding"):
    """Assign each vector to its nearest coarse centroid — the IVF list
    id, usable as a storage partition key at scale."""
    v = F.col(vec_col).cast("array<double>")
    dists = F.array(*[_sq_dist(v, c) for c in centroids])
    return emb.withColumn(
        "ivf_bucket", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )


def ivf_ann(
    emb,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: brute-force cosine only within the n_probe coarse
    lists nearest to the query."""
    import numpy as np

    q = np.asarray(query, dtype=float)
    order = np.argsort([float(((q - np.asarray(c)) ** 2).sum()) for c in centroids])
    probe = [int(i) for i in order[:n_probe]]
    cand = with_ivf_bucket(emb, centroids, vec_col).filter(
        F.col("ivf_bucket").isin(probe)
    )
    qcol = F.array(*[F.lit(float(x)) for x in query])
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), qcol), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), id_col).limit(k)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, candidate-limited to
    same-LSH-bucket pairs (high-cosine pairs collide with high
    probability; recall tunable via n_planes)."""
    # infer dim from one row (tiny driver action)
    dim = len(emb.select(vec_col).first()[0])
    bucketed = with_lsh_bucket(emb, dim, n_planes, seed, vec_col).select(
        id_col, vec_col, "lsh_bucket"
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(b, "lsh_bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                cosine(
                    F.col(f"a.{vec_col}").cast("array<double>"),
                    F.col(f"b.{vec_col}").cast("array<double>"),
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs.distinct()
