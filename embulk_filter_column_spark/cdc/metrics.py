"""Per-batch lineage + metrics tables (SURVEY.md §7 step 7).

Appended as small parquet rows next to the lake table:

* ``_lineage``  — batch id → WAL offset range → lake snapshot id
* ``_metrics``  — per-batch row counts (from ``Observation``s collected
  during the merge job itself — no extra pass over the data) + wall time

Both are ordinary tables readable with ``spark.read.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType([
    T.StructField("batch_id", T.LongType()),
    T.StructField("chunk_lo", T.LongType()),
    T.StructField("chunk_hi", T.LongType()),
    T.StructField("snapshot_id", T.LongType()),
    T.StructField("skipped", T.BooleanType()),
])

METRICS_SCHEMA = T.StructType([
    T.StructField("batch_id", T.LongType()),
    T.StructField("rows_in", T.LongType()),
    T.StructField("winners", T.LongType()),
    T.StructField("tombstones", T.LongType()),
    T.StructField("buckets_touched", T.LongType()),
    T.StructField("wall_sec", T.DoubleType()),
])


class BatchJournal:
    def __init__(self, spark: SparkSession, lake_path: str):
        self.spark = spark
        self.lineage_path = os.path.join(lake_path, "_lineage")
        self.metrics_path = os.path.join(lake_path, "_metrics")

    def record(self, result, chunk_lo: int, chunk_hi: int,
               wall_sec: float) -> None:
        lineage = self.spark.createDataFrame(
            [(result.batch_id, chunk_lo, chunk_hi, result.snapshot_id,
              result.skipped)], LINEAGE_SCHEMA)
        lineage.coalesce(1).write.mode("append").parquet(self.lineage_path)
        metrics = self.spark.createDataFrame(
            [(result.batch_id, result.rows_in, result.winners,
              result.tombstones, result.buckets_touched, wall_sec)],
            METRICS_SCHEMA)
        metrics.coalesce(1).write.mode("append").parquet(self.metrics_path)

    def lineage(self):
        return self.spark.read.parquet(self.lineage_path)

    def metrics(self):
        return self.spark.read.parquet(self.metrics_path)
