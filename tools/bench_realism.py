"""Realism bench for the round-4 operator additions (VERDICT r4 item 7).

Two measurements the sf0.1 driver bench can't provide:

1. **Decontamination at the 13-gram production default** against a
   >=10k-item eval set over a realistic-vocabulary corpus (the driver
   documents table's ~30-word vocabulary makes every 13-gram unique to
   its doc — trivially easy; and bench.py's 500-doc trigram setting
   exercises the guard-rails, not the default). Planted contamination:
   a fraction of eval items are verbatim 31-token slices of training
   docs, so every one of their 13-grams appears in the source doc and
   detection recall is checkable exactly.

2. **IVF recall-vs-nprobe** for ``ivf_knn_join`` on a clustered
   embedding corpus (uniform random vectors make nprobe meaningless —
   every cell is equidistant; clustered data is what IVF is FOR).
   ``topk_recall`` against the exact ``knn_join`` at k=10, one row per
   nprobe with its wall time — the table that picks nprobe before a
   10^10-row rollout.

Everything is a deterministic expression of (id, seed) — no RNG, no
external data. Usage:

    python tools/bench_realism.py [n_train] [n_eval] [n_vecs]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench_similarity_corpus import realistic_docs  # noqa: E402


def _u(*cols):
    """Deterministic uniform in [0,1) from hashable columns."""
    from pyspark.sql import functions as F
    return F.abs(F.xxhash64(*cols)) / F.lit(float(2 ** 63))


def planted_eval(spark, train, n_eval: int, contam_rate: float = 0.02,
                 slice_len: int = 31, seed: int = 99):
    """Eval set of ``n_eval`` items: ``contam_rate`` of them are
    verbatim ``slice_len``-token slices of a training doc (positions
    10..10+slice_len of its token stream — well above the 13-gram
    window, so overlap under normalize='eval' is exactly 1.0); the
    rest draw from the same vocabulary shape but a disjoint hash
    stream (shift 31337), so chance 13-gram collisions are
    negligible at 50k vocab."""
    from pyspark.sql import functions as F

    n_contam = int(n_eval * contam_rate)
    contam = (train.orderBy("doc_id").limit(n_contam)
              .select((F.col("doc_id") + 20_000_000).alias("eval_id"),
                      F.col("doc_id").alias("src_doc"),
                      F.concat_ws(" ", F.slice(
                          F.split(F.col("text"), " "), 11, slice_len))
                      .alias("text")))
    pos = F.sequence(F.lit(0), F.lit(slice_len - 1))
    clean = (spark.range(n_eval - n_contam)
             .select((F.col("id") + 30_000_000).alias("eval_id"),
                     F.lit(None).cast("long").alias("src_doc"),
                     F.concat_ws(" ", F.transform(
                         pos,
                         lambda p: F.concat(F.lit("w"), (
                             F.pow(_u(F.col("id"), p + F.lit(31337),
                                      F.lit(seed)), F.lit(3.0))
                             * F.lit(50_000)).cast("long")
                             .cast("string"))))
                     .alias("text")))
    return contam.unionByName(clean)


def clustered_vectors(spark, n: int, dim: int = 64, n_clusters: int = 64,
                      noise: float = 0.35, id_offset: int = 0,
                      seed: int = 7):
    """(vec_id, embedding) with vectors scattered around ``n_clusters``
    deterministic centers — center(c)_j and noise(id,j) are both
    hash-uniforms in [-1,1]; cluster membership is id % n_clusters."""
    from pyspark.sql import functions as F

    base = spark.range(n).select((F.col("id") + id_offset)
                                 .alias("vec_id"),
                                 (F.col("id") % n_clusters).alias("_c"))
    dims = F.sequence(F.lit(0), F.lit(dim - 1))

    def coord(j):
        center = _u(F.col("_c"), j, F.lit(seed)) * 2 - 1
        jitter = (_u(F.col("vec_id"), j, F.lit(seed + 1)) * 2 - 1) * noise
        return (center + jitter).cast("float")

    return base.select(
        "vec_id", F.transform(dims, coord).alias("embedding"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from embulk_filter_column_spark.operators.decontaminate import (
        decontaminate,
    )
    from embulk_filter_column_spark.operators.similarity import (
        ivf_knn_join,
        knn_join,
        topk_recall,
        train_ivf_centroids,
        write_ivf_table,
    )

    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_eval = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName("realism-bench")
             .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "realism_bench", "unit": "sec",
           "n_train": n_train, "n_eval": n_eval, "n_vecs": n_vecs}

    # -- decontamination @ 13-gram default -----------------------------
    train = realistic_docs(spark, n_train, dup_rate=0.0)
    ev = planted_eval(spark, train, n_eval)
    train.write.format("noop").mode("overwrite").save()   # warm + gen
    ev.write.format("noop").mode("overwrite").save()
    planted = {r["src_doc"] for r in
               ev.where(F.col("src_doc").isNotNull())
               .select("src_doc").collect()}

    t0 = time.monotonic()
    flagged = decontaminate(
        train, ev.select("eval_id", "text"),
        id_col="doc_id", eval_id_col="eval_id",
        shingle_n=13, threshold=0.8).collect()
    out["decontaminate_13gram_sec"] = round(time.monotonic() - t0, 2)
    got = {r["doc_id"] for r in flagged}
    out["decon_planted"] = len(planted)
    out["decon_flagged"] = len(got)
    out["decon_recall"] = round(
        len(got & planted) / max(len(planted), 1), 4)
    out["decon_false_pos"] = len(got - planted)

    # -- substring dedup on realistic vocabulary -----------------------
    from embulk_filter_column_spark.operators import dedup_substrings

    dup_corpus = realistic_docs(spark, n_train, dup_rate=0.05)
    dup_corpus.write.format("noop").mode("overwrite").save()
    t0 = time.monotonic()
    cleaned = dedup_substrings(dup_corpus, window_tokens=20,
                               min_count=2)
    n_changed = (cleaned.join(dup_corpus, "doc_id")
                 .where(F.col("text_clean") != F.col("text")).count())
    out["dedup_substrings_sec"] = round(time.monotonic() - t0, 2)
    # planted dups share a 115-token prefix with their base doc, so
    # both members of each pair lose the shared windows (no-survivor
    # semantics): changed ≈ 2 × planted
    out["substr_docs_changed"] = n_changed
    out["substr_planted_dups"] = n_train - int(n_train * 0.95)

    # -- IVF recall vs nprobe ------------------------------------------
    corpus = clustered_vectors(spark, n_vecs)
    queries = clustered_vectors(
        spark, 256, id_offset=50_000_000, seed=7).withColumnRenamed(
            "vec_id", "query_id")
    path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"ivf-realism-{os.getpid()}")
    cents = train_ivf_centroids(corpus, n_centroids=64)
    write_ivf_table(corpus, path, cents)

    t0 = time.monotonic()
    exact = knn_join(corpus, queries, k=10).collect()
    out["knn_exact_sec"] = round(time.monotonic() - t0, 2)
    exact_df = spark.createDataFrame(exact)

    sweep = {}
    for nprobe in (1, 2, 4, 8, 16):
        t0 = time.monotonic()
        approx = ivf_knn_join(spark, path, queries, cents,
                              k=10, nprobe=nprobe).collect()
        secs = round(time.monotonic() - t0, 2)
        rec = (topk_recall(spark.createDataFrame(approx), exact_df)
               .agg(F.avg("recall")).first()[0])
        sweep[str(nprobe)] = {"sec": secs, "recall": round(rec, 4)}
    out["ivf_nprobe_sweep"] = sweep

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
