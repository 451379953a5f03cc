"""Per-batch lineage + metrics tables (SURVEY.md §7 step 7).

Appended as small parquet files next to the lake table:

* ``_lineage``  — batch id → WAL offset range → lake snapshot id
* ``_metrics``  — per-batch row counts (from ``Observation``s collected
  during the merge job itself — no extra pass over the data) + wall time

Both are ordinary parquet directories readable with
``spark.read.parquet``. The rows are written with pyarrow directly on
the driver: a one-row metadata append must not cost a Spark job
(measured 4-13 s per batch for two ``createDataFrame(...).coalesce(1)``
writes — the Python-worker round trips scale with defaultParallelism
and were the single largest per-batch overhead in the replay loop).
"""

from __future__ import annotations

import os
import re
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import SparkSession
from pyspark.sql import types as T

# URI scheme prefix (hdfs://, s3a://, file://, ...) — anything that is not
# a plain local path must go through the Hadoop FileSystem API, not
# os.makedirs/os.replace on the driver's local disk
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")

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

_LINEAGE_PA = pa.schema([
    ("batch_id", pa.int64()), ("chunk_lo", pa.int64()),
    ("chunk_hi", pa.int64()), ("snapshot_id", pa.int64()),
    ("skipped", pa.bool_()),
])

_METRICS_PA = pa.schema([
    ("batch_id", pa.int64()), ("rows_in", pa.int64()),
    ("winners", pa.int64()), ("tombstones", pa.int64()),
    ("buckets_touched", pa.int64()), ("wall_sec", pa.float64()),
])


def _append_row_local(path: str, schema: pa.Schema, row: dict) -> None:
    """Atomic single-row parquet append: write temp file, rename in."""
    os.makedirs(path, exist_ok=True)
    table = pa.Table.from_pylist([row], schema=schema)
    name = "part-%08d-%s.parquet" % (row["batch_id"], uuid.uuid4().hex[:8])
    tmp = os.path.join(path, "." + name + ".tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(path, name))


def _append_row_hadoop(spark: SparkSession, path: str, schema: pa.Schema,
                       row: dict) -> None:
    """Same append through the Hadoop FileSystem API (hdfs://, s3a://,
    ...): write the 1-row parquet locally with pyarrow (milliseconds),
    then moveFromLocalFile into the target FS — still no Spark job, and
    the rows land where ``lineage()``/``metrics()`` actually read
    (spark.read.parquet resolves the same Hadoop FS)."""
    import tempfile

    jvm = spark._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    dst_dir = jvm.org.apache.hadoop.fs.Path(path)
    fs = dst_dir.getFileSystem(conf)
    fs.mkdirs(dst_dir)
    name = "part-%08d-%s.parquet" % (row["batch_id"], uuid.uuid4().hex[:8])
    local = os.path.join(tempfile.gettempdir(),
                         ".journal-%s-%s" % (uuid.uuid4().hex[:8], name))
    pq.write_table(pa.Table.from_pylist([row], schema=schema), local)
    fs.moveFromLocalFile(
        jvm.org.apache.hadoop.fs.Path("file://" + local),
        jvm.org.apache.hadoop.fs.Path(path + "/" + name))


class BatchJournal:
    def __init__(self, spark: SparkSession, lake_path: str):
        self.spark = spark
        self._remote = bool(_SCHEME_RE.match(lake_path)) \
            and not lake_path.startswith("file:")
        if lake_path.startswith("file:"):
            # file: is local — strip the scheme (file:///p, file://p and
            # file:/p all resolve to /p; file://host/p is not supported)
            # so os-level writes land where spark.read.parquet reads
            lake_path = "/" + lake_path[len("file:"):].lstrip("/")
        if self._remote:
            self.lineage_path = lake_path.rstrip("/") + "/_lineage"
            self.metrics_path = lake_path.rstrip("/") + "/_metrics"
        else:
            self.lineage_path = os.path.join(lake_path, "_lineage")
            self.metrics_path = os.path.join(lake_path, "_metrics")

    def _append(self, path: str, schema: pa.Schema, row: dict) -> None:
        if self._remote:
            _append_row_hadoop(self.spark, path, schema, row)
        else:
            _append_row_local(path, schema, row)

    def record(self, result, chunk_lo: int, chunk_hi: int,
               wall_sec: float) -> None:
        self._append(self.lineage_path, _LINEAGE_PA, {
            "batch_id": result.batch_id, "chunk_lo": chunk_lo,
            "chunk_hi": chunk_hi, "snapshot_id": result.snapshot_id,
            "skipped": result.skipped})
        self._append(self.metrics_path, _METRICS_PA, {
            "batch_id": result.batch_id, "rows_in": result.rows_in,
            "winners": result.winners, "tombstones": result.tombstones,
            "buckets_touched": result.buckets_touched,
            "wall_sec": float(wall_sec)})

    def lineage(self):
        return self.spark.read.parquet(self.lineage_path)

    def metrics(self):
        return self.spark.read.parquet(self.metrics_path)
