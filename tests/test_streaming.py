"""Structured-Streaming CDC mode: readStream over the WAL → foreachBatch
MERGE; availableNow drain equals the batch pipeline's final state."""

import pytest

from embulk_filter_column_spark.sources import web_change_events, write_wal
from embulk_filter_column_spark.streaming import StreamingCDC


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_wal"))
    events = web_change_events(spark, 1200, n_domains=15,
                               pages_per_domain=8, seed=7)
    write_wal(events, path, chunk_rows=400)
    return path


def oracle_pairs(spark, wal_path):
    pdf = spark.read.parquet(wal_path).drop("chunk").toPandas()
    pdf = pdf.sort_values(["warc_ts", "seq"])
    w = pdf.groupby("url", as_index=False).last()
    w = w[w["op"] != "D"]
    return sorted(zip(w["url"], w["text"]))


def test_streaming_drain_matches_oracle(spark, wal, tmp_path):
    job = StreamingCDC(spark, wal, str(tmp_path / "lake"),
                       str(tmp_path / "cp"), num_buckets=8,
                       max_files_per_trigger=2)
    job.run_available_now()
    got = sorted((r["url"], r["text"])
                 for r in job.table().read().collect())
    assert got == oracle_pairs(spark, wal)

    # drain again: stream checkpoint says nothing new; state unchanged
    snap = job.table().head()["snapshot_id"]
    job.run_available_now()
    assert job.table().head()["snapshot_id"] == snap
