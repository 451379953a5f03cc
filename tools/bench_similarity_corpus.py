"""Similarity-join bench on a REALISTIC-vocabulary corpus.

The driver testdata's documents table draws from a ~30-word vocabulary,
which makes every shingle a stop-word: prefix-filter/LSH buckets are
~100x denser than on real web text, so the sf0.1 similarity numbers in
bench.py are dominated by degenerate bucket density (VERDICT r2 item 9).
This tool synthesizes a deterministic corpus with a web-scale-shaped
vocabulary (50k distinct words, zipf-ish frequencies, ~120 tokens/doc,
5% planted near-duplicates) and times the same operators, so the claim
"ngram_jaccard is corpus-bound, not plan-bound" is measured, not argued.

Usage: python tools/bench_similarity_corpus.py [n_docs]
Prints one JSON line with per-operator seconds and pair counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def realistic_docs(spark, n_docs: int, vocab: int = 50_000,
                   doc_len: int = 120, dup_rate: float = 0.05,
                   seed: int = 42):
    """Deterministic corpus: every token is a pure expression of
    (doc_id, position, seed). Word draw is zipf-ish (u^3 skews toward
    low word-ids, mimicking natural-language frequency); planted dups
    copy a base doc's token stream with the last 5 positions perturbed
    (Jaccard >> 0.8 against the base)."""
    from pyspark.sql import functions as F

    n_base = int(n_docs * (1 - dup_rate))
    base = spark.range(n_base).select(F.col("id").alias("doc_id"))
    pos = F.sequence(F.lit(0), F.lit(doc_len - 1))

    def word_at(doc, p, shift):
        u = (F.abs(F.xxhash64(doc, p + shift, F.lit(seed)))
             / F.lit(float(2 ** 63)))
        wid = (F.pow(u, F.lit(3.0)) * F.lit(vocab)).cast("long")
        return F.concat(F.lit("w"), wid.cast("string"))

    text_of = lambda doc, shift: F.concat_ws(  # noqa: E731
        " ", F.transform(pos, lambda p: word_at(doc, p, shift)))
    docs = base.select("doc_id", text_of(F.col("doc_id"), F.lit(0))
                       .alias("text"))
    n_dup = n_docs - n_base
    dups = (spark.range(n_dup)
            .select((F.col("id") + 10_000_000).alias("doc_id"),
                    F.col("id").alias("_src"))
            .select("doc_id", F.concat_ws(" ", F.transform(
                pos,
                lambda p: F.when(p < doc_len - 5,
                                 word_at(F.col("_src"), p, F.lit(0)))
                           .otherwise(word_at(F.col("_src"), p,
                                              F.lit(777)))))
                .alias("text")))
    return docs.unionByName(dups)


def main() -> None:
    from pyspark.sql import SparkSession

    from embulk_filter_column_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from embulk_filter_column_spark.operators.groups import dedup_groups

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName("similarity-corpus-bench")
             .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = realistic_docs(spark, n_docs)
    docs.write.format("noop").mode("overwrite").save()  # warm-up + gen

    out = {"metric": "similarity_realistic_corpus", "n_docs": n_docs,
           "vocab": 50_000, "unit": "sec", "queries": {}}

    t0 = time.monotonic()
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    n_pairs = pairs.count()
    out["queries"]["ngram_jaccard"] = round(time.monotonic() - t0, 2)
    out["ngram_pairs"] = n_pairs

    t0 = time.monotonic()
    n_mh = minhash_lsh_pairs(docs, threshold=0.8).count()
    out["queries"]["minhash_lsh"] = round(time.monotonic() - t0, 2)
    out["minhash_pairs"] = n_mh

    t0 = time.monotonic()
    groups = dedup_groups(pairs.select("a", "b"))
    out["n_grouped_docs"] = groups.count()
    out["queries"]["dedup_groups"] = round(time.monotonic() - t0, 2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
