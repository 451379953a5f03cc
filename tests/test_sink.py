"""Iceberg MERGE-INTO adapter seam (SURVEY.md §7 step 4): the sandbox has
no Iceberg runtime jar, so the generated DDL/DML text is pinned here and
the runtime class is checked to refuse sessions without a catalog."""

import pytest
from pyspark.sql import types as T

from embulk_filter_column_spark.cdc.sink import (
    IcebergSink,
    Sink,
    create_table_sql,
    evolve_sql,
    merge_sql,
    set_batch_id_sql,
)
from embulk_filter_column_spark.cdc.lake import LakeTable
from embulk_filter_column_spark.errors import EngineError

PAGES = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("seq", T.LongType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def test_lake_table_satisfies_sink_protocol():
    # Protocol has a property member, so issubclass() is unavailable;
    # assert the structural surface directly
    assert Sink is not None
    for cls in (LakeTable, IcebergSink):
        for attr in ("merge", "evolve", "read", "committed_batch_id"):
            assert hasattr(cls, attr), (cls, attr)


def test_create_table_sql():
    sql = create_table_sql("cat.db.pages", PAGES, key="url",
                           num_buckets=4096)
    assert "CREATE TABLE IF NOT EXISTS cat.db.pages" in sql
    assert "url STRING" in sql
    assert "warc_ts TIMESTAMP" in sql
    assert "seq BIGINT" in sql
    assert "html BINARY" in sql
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(4096, url))" in sql
    assert "'format-version' = '2'" in sql


def test_merge_sql_last_writer_wins():
    sql = merge_sql("cat.db.pages", "batch_view", key="url",
                    order=("warc_ts", "seq"),
                    columns=["url", "warc_ts", "seq", "text"])
    assert "MERGE INTO cat.db.pages AS t" in sql
    assert "USING batch_view AS s" in sql
    assert "ON t.url = s.url" in sql
    # lexicographic (warc_ts, seq) comparison
    assert ("((s.warc_ts > t.warc_ts) OR "
            "(s.warc_ts = t.warc_ts AND s.seq > t.seq))") in sql
    assert "WHEN MATCHED AND s._op = 'D'" in sql
    assert "THEN DELETE" in sql
    assert "t.text = s.text" in sql
    assert "WHEN NOT MATCHED AND s._op <> 'D'" in sql
    assert "INSERT (url, warc_ts, seq, text)" in sql
    # replay idempotence: equal order columns must NOT satisfy `newer`
    assert "s.warc_ts >= t.warc_ts" not in sql


def test_evolve_sql_rename_add_drop():
    current = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("legacy", T.StringType()),
    ])
    new = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("etype", T.StringType()),
        T.StructField("quality", T.DoubleType()),
    ])
    stmts = evolve_sql("t", current, new, renames={"event_type": "etype"})
    assert stmts == [
        "ALTER TABLE t RENAME COLUMN event_type TO etype",
        "ALTER TABLE t ADD COLUMNS (quality DOUBLE)",
        "ALTER TABLE t DROP COLUMN legacy",
    ]


def test_evolve_sql_noop():
    assert evolve_sql("t", PAGES, PAGES) == []


def test_set_batch_id_sql():
    assert set_batch_id_sql("t", 42) == (
        "ALTER TABLE t SET TBLPROPERTIES "
        "('cdc.committed_batch_id' = '42')")


def test_iceberg_sink_requires_catalog(spark):
    with pytest.raises(EngineError, match="Iceberg catalog"):
        IcebergSink(spark, "cat.db.pages")
