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
