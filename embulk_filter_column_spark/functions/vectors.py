"""Vector math over ``array<float>`` embedding columns — native
higher-order functions (zip_with / aggregate), JVM-side, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v)


def l2_norm(a) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0),
                              lambda acc, v: acc + v * v))


def cosine_similarity(a, b) -> Column:
    a, b = _c(a), _c(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def hyperplane_bucket(a, dim: int, n_planes: int = 16,
                      seed: int = 42) -> Column:
    """Sign-random-projection LSH bucket id (SimHash over the embedding):
    ``n_planes`` deterministic pseudo-random hyperplanes; bit i = sign of
    dot(vec, plane_i). Vectors with high cosine land in the same bucket
    with high probability — the blocking key for ANN / near-dup search.

    Planes are derived from (seed, plane, coordinate) hashes so every
    executor materializes identical planes with no driver broadcast.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(float)
    vec = _c(a)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(dot(vec, plane) >= 0, 1).otherwise(0).cast("long")
        bucket = bucket + (bit * F.lit(int(2 ** i)))
    return bucket
