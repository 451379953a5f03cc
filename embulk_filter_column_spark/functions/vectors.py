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

    Implemented as an Arrow-vectorized pandas UDF doing ONE numpy matrix
    multiply per batch: measured ~6× faster than the equivalent native
    zip_with/aggregate expression at 200k×64-dim (the per-plane HOF
    expression also explodes codegen size — n_planes × dim literal
    nodes). The seeded plane matrix lives in the UDF closure, so every
    executor sees identical planes, and driver-side probe computations
    (operators.similarity._bucket_int) use the same numpy routine —
    bit-exact agreement.
    """
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    planes_t = rng.normal(size=(n_planes, dim)).astype(float).T
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf inference rejects unresolvable strings
    def _bucket(s):
        if len(s) == 0:
            return pd.Series([], dtype="Int64")
        # dirty input must yield NULL, not crash the batch: mask null or
        # wrong-dimension vectors, matmul only the valid rows
        valid = s.map(lambda v: v is not None and len(v) == dim)
        out = pd.Series([pd.NA] * len(s), index=s.index, dtype="Int64")
        if valid.any():
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in s[valid]])
            bits = (mat @ planes_t) >= 0
            out[valid] = bits @ weights
        return out

    return F.pandas_udf(_bucket, "long")(_c(a))
