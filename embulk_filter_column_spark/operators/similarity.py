"""Approximate-nearest-neighbor similarity search over embedding columns.

* brute_force_topk — exact cosine top-k; the baseline/oracle. One pass,
  native HOF cosine, orderBy+limit (Spark executes as TakeOrdered — no
  full sort materialization).
* lsh_topk — hyperplane-LSH bucketed search: candidates share the query's
  bucket (multi-probe: buckets within Hamming distance ``probe_bits``),
  exact rerank inside the candidate set. At 10^10 rows the scan prunes to
  the probed buckets when the table is written bucketed/partitioned by
  the LSH key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, hyperplane_bucket


def _query_lit(query_vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(df: DataFrame, query_vec, k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    q = _query_lit(query_vec)
    return (df.select(
                F.col(id_col),
                F.round(cosine_similarity(F.col(vec_col), q), 6)
                 .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def _bucket_int(vec, dim: int, n_planes: int, seed: int) -> int:
    """Driver-side bucket of a single query vector (mirrors
    functions.vectors.hyperplane_bucket exactly)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(float)
    v = np.asarray(list(vec), dtype=float)
    bits = (planes @ v) >= 0
    return int(sum(int(b) << i for i, b in enumerate(bits)))


def lsh_topk(df: DataFrame, query_vec, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             dim: int = 64, n_planes: int = 12, probe_bits: int = 1,
             seed: int = 42) -> DataFrame:
    """ANN top-k: restrict to LSH buckets within ``probe_bits`` bit flips
    of the query's bucket, then exact cosine rerank."""
    qb = _bucket_int(query_vec, dim, n_planes, seed)
    probes = {qb}
    if probe_bits >= 1:
        probes |= {qb ^ (1 << i) for i in range(n_planes)}
    if probe_bits >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qb ^ (1 << i) ^ (1 << j))
    q = _query_lit(query_vec)
    bucket = hyperplane_bucket(vec_col, dim, n_planes, seed)
    return (df.withColumn("_bucket", bucket)
            .where(F.col("_bucket").isin(*sorted(probes)))
            .select(F.col(id_col),
                    F.round(cosine_similarity(F.col(vec_col), q), 6)
                     .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))
