"""Incremental corpus dedup: a persistent fingerprint index that new
batches are checked against — the streaming counterpart of
``exact_dedup`` (a one-shot groupBy can't answer "is this NEW document
a duplicate of anything ingested last month?" without rescanning the
corpus).

Layout: a parquet directory partitioned by ``bucket =
pmod(fingerprint, num_buckets)`` holding ``(fingerprint, doc_id)`` of
everything ever accepted. Per batch:

1. fingerprint the batch (same normalized 64-bit fingerprint as
   ``exact_dedup`` — case/punctuation jitter collapses);
2. in-batch dedup (keep min id per fingerprint);
3. anti-join against the index, reading ONLY the bucket partitions the
   batch's fingerprints hash into (partition-pruned scan: the batch is
   the small side, the index never shuffles — it streams through a
   broadcast-hash anti-join against the batch's fingerprints);
4. append the survivors' fingerprints to their bucket partitions.

At 10^10 indexed documents with B=4096 buckets, a batch touching k
distinct buckets reads k/4096 of the index — the same bucket-pruning
contract as the CDC lake's MERGE.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint


class FingerprintIndex:
    def __init__(self, spark: SparkSession, path: str,
                 num_buckets: int = 64):
        self.spark = spark
        self.path = path
        self.num_buckets = num_buckets

    def _bucket(self, col) -> F.Column:
        return F.pmod(col, F.lit(self.num_buckets)).cast("int")

    def _exists(self) -> bool:
        return bool(glob.glob(os.path.join(self.path, "bucket=*")))

    def dedup_and_update(self, df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
        """Returns the batch rows whose normalized text was never seen
        — neither earlier in this batch (min id survives) nor in any
        previous batch — and appends the survivors' fingerprints to the
        index. The accept/reject decision is MATERIALIZED (eager
        localCheckpoint) before the index update: a lazy plan
        re-evaluated after the append would see the batch's own
        fingerprints in the index and anti-join itself to empty."""
        fp = doc_fingerprint(text_col).alias("fingerprint")
        batch = df.select(F.col(id_col), fp)
        firsts = (batch.groupBy("fingerprint")
                  .agg(F.min(id_col).alias(id_col)))
        if self._exists():
            probe = (firsts
                     .withColumn("bucket",
                                 self._bucket(F.col("fingerprint"))))
            buckets = [r["bucket"] for r in
                       probe.select("bucket").distinct().collect()]
            seen = (self.spark.read.parquet(self.path)
                    .where(F.col("bucket").isin(buckets))
                    .select("fingerprint"))
            fresh = firsts.join(seen, "fingerprint", "left_anti")
        else:
            fresh = firsts
        fresh = fresh.localCheckpoint(eager=True)
        (fresh
         .withColumn("bucket", self._bucket(F.col("fingerprint")))
         .repartition("bucket")
         .write.mode("append").partitionBy("bucket")
         .parquet(self.path))
        return (df.join(fresh.select(id_col), id_col, "left_semi")
                .select(*df.columns))
