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


class InMemorySink:
    """Minimal Sink implementation (pandas-backed) proving the pipeline's
    sink seam: CDCPipeline drives create/evolve/merge/committed_batch_id
    through the injected object only — the same calls IcebergSink maps
    to catalog SQL."""

    def __init__(self, spark, key="url", order=("warc_ts", "seq")):
        self.spark = spark
        self.key = key
        self.order = list(order)
        self._schema = None
        self._rows = {}          # key -> row dict (live, post-LWW)
        self._batch_id = 0
        self.merges = 0

    def exists(self):
        return self._schema is not None

    def create(self, schema):
        self._schema = schema

    def schema(self):
        return self._schema

    @property
    def committed_batch_id(self):
        return self._batch_id

    def evolve(self, new_schema, renames=None):
        for old, new in (renames or {}).items():
            for row in self._rows.values():
                if old in row:
                    row[new] = row.pop(old)
        names = [f.name for f in new_schema.fields]
        for row in self._rows.values():
            for n in names:
                row.setdefault(n, None)
            for k in list(row):
                if k not in names and k != "_op":
                    del row[k]
        self._schema = new_schema
        return 0

    def merge(self, batch, batch_id, op_col="op", n_salts=None):
        from embulk_filter_column_spark.cdc.lake import MergeResult

        if batch_id <= self._batch_id:
            return MergeResult(batch_id, -1, skipped=True)
        self.merges += 1
        rows = [r.asDict() for r in batch.collect()]
        for r in rows:
            r["_op"] = r.pop(op_col)
        names = [f.name for f in self._schema.fields]
        for r in rows:
            for n in names:
                r.setdefault(n, None)
        # order-insensitive LWW: a row only wins if its order tuple
        # beats the incumbent's (same semantics as the lake MERGE —
        # batches are not time-ordered)
        for r in rows:
            cur = self._rows.get(r[self.key])
            okey = tuple(r[c] for c in self.order)
            if cur is None or okey > tuple(cur[c] for c in self.order):
                self._rows[r[self.key]] = r
        self._batch_id = batch_id
        return MergeResult(batch_id, -1, skipped=False,
                           rows_in=len(rows))

    def read(self, include_tombstones=False):
        names = [f.name for f in self._schema.fields]
        live = [tuple(r[n] for n in names) for r in self._rows.values()
                if include_tombstones or r["_op"] != "D"]
        return self.spark.createDataFrame(live, self._schema)


def test_pipeline_drives_custom_sink(spark, tmp_path):
    """CDCPipeline with an injected Sink: create on first batch, merges
    by batch id, resume skips committed batches, final state matches the
    LakeTable run on the same WAL."""
    from embulk_filter_column_spark.cdc import CDCPipeline
    from embulk_filter_column_spark.sources import (
        web_change_events,
        write_wal,
    )

    wal = str(tmp_path / "wal")
    ev = web_change_events(spark, 1500, n_domains=10, pages_per_domain=10,
                           seed=3)
    write_wal(ev, wal, chunk_rows=500)

    sink = InMemorySink(spark)
    pipe = CDCPipeline(spark, wal, str(tmp_path / "ignored"),
                       str(tmp_path / "cp"), chunks_per_batch=1,
                       sink=sink, journal_path=str(tmp_path / "journal"))
    results = pipe.run()
    assert len(results) == 3 and sink.merges == 3
    assert pipe.table() is sink
    assert pipe.journal.lineage().count() == 3

    # resume: nothing new, no extra merges
    pipe2 = CDCPipeline(spark, wal, str(tmp_path / "ignored"),
                        str(tmp_path / "cp"), chunks_per_batch=1,
                        sink=sink, journal_path=str(tmp_path / "journal"))
    assert pipe2.run() == [] and sink.merges == 3

    # reference run through the default LakeTable
    ref = CDCPipeline(spark, wal, str(tmp_path / "lake"),
                      str(tmp_path / "cp2"), chunks_per_batch=1)
    ref.run()
    want = sorted((r["url"], r["seq"], r["text"])
                  for r in ref.table().read().collect())
    got = sorted((r["url"], r["seq"], r["text"])
                 for r in sink.read().collect())
    assert got == want


def _iceberg_jar_obtainable() -> bool:
    """Cheap pre-flight for the end-to-end Iceberg test: a cached
    runtime jar, or network reach to Maven Central to fetch one. The
    sandbox has neither — the test then SKIPS (never red, never a
    multi-minute ivy timeout inside a JVM launch)."""
    import glob as _glob
    import os as _os
    import socket

    patterns = [
        _os.path.expanduser(
            "~/.ivy2/jars/*iceberg-spark-runtime*.jar"),
        _os.path.expanduser(
            "~/.ivy2/cache/org.apache.iceberg/**/*.jar"),
        _os.path.join(_os.environ.get("SPARK_HOME", "/nonexistent"),
                      "jars", "*iceberg-spark-runtime*.jar"),
    ]
    if any(_glob.glob(p, recursive=True) for p in patterns):
        return True
    try:
        socket.create_connection(("repo1.maven.org", 443),
                                 timeout=2).close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _iceberg_jar_obtainable(),
                    reason="iceberg-spark-runtime jar unavailable "
                           "(offline sandbox, no cached jar)")
def test_iceberg_sink_end_to_end(tmp_path):
    """With the runtime jar present (VERDICT r2 item 6): a fresh session
    with a hadoop-catalog Iceberg warehouse, CDCPipeline(sink=
    IcebergSink), replay a small WAL, and check LWW final state. Runs in
    a SUBPROCESS so the jar/catalog configs don't leak into the shared
    session fixture."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(f"""
        import sys
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
            .appName("iceberg-e2e")
            .config("spark.jars.packages",
                    "org.apache.iceberg:"
                    "iceberg-spark-runtime-4.0_2.13:1.10.0")
            .config("spark.sql.catalog.ice",
                    "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.ice.type", "hadoop")
            .config("spark.sql.catalog.ice.warehouse",
                    {str(tmp_path / 'warehouse')!r})
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .getOrCreate())
        from embulk_filter_column_spark.cdc import CDCPipeline
        from embulk_filter_column_spark.cdc.sink import IcebergSink
        from embulk_filter_column_spark.sources import (
            web_change_events, write_wal)
        events = web_change_events(spark, 500, n_domains=5,
                                   pages_per_domain=10, seed=7)
        write_wal(events, {str(tmp_path / 'wal')!r}, chunk_rows=250)
        sink = IcebergSink(spark, "ice.db.pages", num_buckets=8)
        pipe = CDCPipeline(spark, {str(tmp_path / 'wal')!r},
                           {str(tmp_path / 'lake')!r},
                           {str(tmp_path / 'cp')!r}, sink=sink,
                           journal_path={str(tmp_path / 'journal')!r})
        pipe.run()
        rows = spark.sql(
            "SELECT count(*) AS n, count(DISTINCT url) AS u "
            "FROM ice.db.pages").first()
        assert rows["n"] == rows["u"] > 0, rows
        print("ICEBERG_E2E_OK", rows["n"])
        spark.stop()
    """)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ICEBERG_E2E_OK" in proc.stdout
