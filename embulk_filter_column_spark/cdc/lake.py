"""Iceberg-style lake table: bucketed copy-on-write MERGE with snapshot
manifests, idempotent commits, schema evolution, tombstoned deletes.

The sandbox ships no Iceberg runtime jar, so the table format is
implemented directly on parquet + JSON manifests with the same contract
(SURVEY.md §7 step 4 "HadoopMergeSink"):

* ``data/s<snapshot>/bucket=<b>/*.parquet`` — immutable data files
* ``_meta/snapshot-<n>.json`` — manifest: schema versions, rename chain,
  bucket → file list, committed batch id
* ``_meta/HEAD`` — current snapshot pointer, committed by atomic rename
  (write-audit-publish: data + manifest are fully written and fsynced
  before HEAD moves; a crash before the rename leaves the old snapshot
  live and the orphaned files are overwritten on retry)

Scale design
------------
Rows are hash-bucketed on the merge key (``pmod(xxhash64(url), B)``). A
MERGE only reads + rewrites the buckets the batch touches — at 10^10 rows
with B=4096, a batch touching 5% of key-space rewrites 5% of files, not
the table. Dedup inside the merge is the map-side-combining ``max_by``
aggregate (see ``dedup.py``), so hot-url skew collapses before the
shuffle. Deletes are kept as tombstone rows (``_op = 'D'``) and filtered
on read, which makes replay **order-insensitive**: the final state equals
last-writer-wins over every event ever merged, no matter how late an
update arrives — the exactly-once story needs only idempotent-by-batch-id
commits, not ordering.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import EngineError
from ..fsio import io_for
from .dedup import last_writer_wins, salted_last_writer_wins

OP_COL = "_op"


class MergeResult:
    def __init__(self, batch_id: int, snapshot_id: int, skipped: bool,
                 rows_in: int = 0, winners: int = 0, tombstones: int = 0,
                 buckets_touched: int = 0):
        self.batch_id = batch_id
        self.snapshot_id = snapshot_id
        self.skipped = skipped
        self.rows_in = rows_in
        self.winners = winners
        self.tombstones = tombstones
        self.buckets_touched = buckets_touched

    def __repr__(self) -> str:  # pragma: no cover
        return ("MergeResult(batch=%d snap=%d skipped=%s in=%d winners=%d "
                "tombstones=%d buckets=%d)"
                % (self.batch_id, self.snapshot_id, self.skipped,
                   self.rows_in, self.winners, self.tombstones,
                   self.buckets_touched))


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        # metadata IO routes through the filesystem the path's scheme
        # names (hdfs://, s3a://, file:/ → Hadoop FileSystem API; plain
        # paths → os level), keeping the atomic-rename commit contract
        # on either (fsio module docstring; VERDICT r4 item 2)
        self._io = io_for(spark, path)
        self.meta_dir = self._io.join(path, "_meta")

    # -- creation / manifest ------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, path: str, schema: T.StructType,
               key: str = "url", order: tuple = ("warc_ts", "seq"),
               num_buckets: int = 64) -> "LakeTable":
        t = cls(spark, path)
        t._io.mkdirs(t.meta_dir)
        manifest = {
            "snapshot_id": 0,
            "batch_id": 0,
            "key": key,
            "order": list(order),
            "num_buckets": num_buckets,
            "schema_id": 0,
            "schemas": {"0": json.loads(schema.json())},
            "renames": {},
            "buckets": {},
            "parent": None,
        }
        t._write_manifest(manifest)
        t._commit_head(0)
        return t

    @classmethod
    def exists(cls, spark: SparkSession, path: str) -> bool:
        io = io_for(spark, path)
        return io.exists(io.join(path, "_meta", "HEAD"))

    def _write_manifest(self, manifest: dict) -> None:
        p = self._io.join(self.meta_dir,
                          "snapshot-%08d.json" % manifest["snapshot_id"])
        self._io.write_text_atomic(p, json.dumps(manifest))

    def _commit_head(self, snapshot_id: int,
                     expected_parent: int | None = None) -> None:
        """Move HEAD. With ``expected_parent``, refuse when another
        writer advanced HEAD since this commit's manifest was derived —
        best-effort optimistic concurrency (the check-then-rename window
        is not atomic on a plain filesystem; Iceberg closes it with a
        catalog CAS — the IcebergSink path inherits that). The engine's
        single-writer pipelines never trip this; it guards operator
        error (two pipelines pointed at one lake)."""
        if expected_parent is not None:
            head_file = self._io.join(self.meta_dir, "HEAD")
            if self._io.exists(head_file):
                current = int(self._io.read_text(head_file).strip())
                if current != expected_parent:
                    raise EngineError(
                        "concurrent commit detected: HEAD moved to "
                        "snapshot %d while this commit was derived from "
                        "%d — retry from the new table state"
                        % (current, expected_parent))
        self._io.write_text_atomic(self._io.join(self.meta_dir, "HEAD"),
                                   str(snapshot_id))

    def head(self) -> dict:
        snap = int(self._io.read_text(
            self._io.join(self.meta_dir, "HEAD")).strip())
        return json.loads(self._io.read_text(
            self._io.join(self.meta_dir, "snapshot-%08d.json" % snap)))

    @property
    def committed_batch_id(self) -> int:
        return self.head()["batch_id"]

    def schema(self, manifest: dict | None = None) -> T.StructType:
        m = manifest or self.head()
        return T.StructType.fromJson(m["schemas"][str(m["schema_id"])])

    # -- schema evolution ----------------------------------------------------

    def evolve(self, new_schema: T.StructType,
               renames: dict | None = None) -> int:
        """Metadata-only schema change (SURVEY.md §7 step 6) — the analog
        of Iceberg ALTER TABLE ADD/DROP/RENAME COLUMN. ``renames`` maps
        old column name → new column name; added columns read as NULL from
        old files; dropped columns are projected away."""
        m = self.head()
        new_id = m["schema_id"] + 1
        m["schemas"][str(new_id)] = json.loads(new_schema.json())
        if renames:
            m["renames"][str(new_id)] = dict(renames)
        m["schema_id"] = new_id
        m["parent"] = m["snapshot_id"]
        m["snapshot_id"] += 1
        self._write_manifest(m)
        self._commit_head(m["snapshot_id"], expected_parent=m["parent"])
        return m["snapshot_id"]

    def _align(self, df: DataFrame, from_schema_id: int,
               manifest: dict) -> DataFrame:
        """Project a file written under an older schema version to the
        current one: apply the rename chain, null-fill added columns,
        drop removed ones."""
        cur_id = manifest["schema_id"]
        for v in range(from_schema_id + 1, cur_id + 1):
            for old, new in manifest["renames"].get(str(v), {}).items():
                if old in df.columns:
                    df = df.withColumnRenamed(old, new)
        target = self.schema(manifest)
        cols = []
        have = set(df.columns)
        for f in target.fields:
            if f.name in have:
                cols.append(F.col(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        if OP_COL in have:
            cols.append(F.col(OP_COL))
        return df.select(*cols)

    def rebucket(self, new_num_buckets: int) -> int:
        """Re-bucketing snapshot: rewrite the current table state under a
        new bucket count and commit it as a new snapshot (the analog of
        Iceberg's REWRITE DATA with a changed bucket-transform width).

        Why this exists at 100 TB: a MERGE rewrites every file of every
        touched bucket (copy-on-write), so per-batch write amplification
        is bounded by (touched buckets) × (table size / num_buckets). A
        table created small (say 16 buckets) and grown 1000× would
        rewrite ~1/16 of 100 TB per hot batch; raising the bucket count
        to O(10³-10⁴) shrinks the rewrite unit proportionally. The
        rewrite itself is one full-table pass — schedule it like a
        compaction. Tombstones are carried over (replay order-insensitivity
        must survive re-bucketing), and the committed batch id is
        preserved so exactly-once resume is unaffected."""
        m = self.head()
        if new_num_buckets == m["num_buckets"]:
            return m["snapshot_id"]
        df = self.read(include_tombstones=True)
        bucket_expr = F.pmod(F.xxhash64(F.col(m["key"])),
                             F.lit(new_num_buckets)).cast("int")
        new_snap = m["snapshot_id"] + 1
        rel_dir = "data/s%08d" % new_snap
        out_dir = self._io.join(self.path, rel_dir)
        (df.withColumn("bucket", bucket_expr)
           .repartition(new_num_buckets, "bucket")
           .write.mode("overwrite").partitionBy("bucket")
           .parquet(out_dir))
        new_buckets = {}
        cur_schema_id = m["schema_id"]
        for bdir in self._io.glob(self._io.join(out_dir, "bucket=*")):
            b = int(self._io.basename(bdir).split("=", 1)[1])
            paths = [self._io.relpath(p, self.path)
                     for p in self._io.glob(
                         self._io.join(bdir, "*.parquet"))]
            new_buckets[str(b)] = [
                {"path": p, "schema_id": cur_schema_id} for p in paths]
        m2 = dict(m)
        m2["snapshot_id"] = new_snap
        m2["parent"] = m["snapshot_id"]
        m2["num_buckets"] = new_num_buckets
        m2["buckets"] = new_buckets
        self._write_manifest(m2)
        self._commit_head(new_snap, expected_parent=m["snapshot_id"])
        return new_snap

    # -- read ----------------------------------------------------------------

    def _read_files(self, groups: dict, manifest: dict) -> DataFrame | None:
        """groups: schema_id -> [paths]; returns aligned union or None."""
        parts = []
        for sid, paths in groups.items():
            if not paths:
                continue
            df = self.spark.read.parquet(*paths)
            parts.append(self._align(df, int(sid), manifest))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _file_groups(self, manifest: dict, buckets=None) -> dict:
        groups: dict = {}
        sel = None if buckets is None else {int(b) for b in buckets}
        for b, files in manifest["buckets"].items():
            if sel is not None and int(b) not in sel:
                continue
            for entry in files:
                groups.setdefault(entry["schema_id"], []).append(
                    self._io.join(self.path, entry["path"]))
        return groups

    def _has_delta(self, manifest: dict, buckets=None) -> bool:
        """True when any selected bucket carries delta files (merge-on-
        read): its rows are then base ∪ deltas and need a read-time LWW
        to resolve to table state."""
        sel = None if buckets is None else {int(b) for b in buckets}
        for b, files in manifest["buckets"].items():
            if sel is not None and int(b) not in sel:
                continue
            if any(entry.get("delta") for entry in files):
                return True
        return False

    def _state_resolved(self, manifest: dict, buckets=None,
                        align_to: dict | None = None) -> DataFrame:
        """Snapshot state (tombstones included) of the selected buckets,
        with merge-on-read resolution applied ONLY where needed: buckets
        whose manifest entries are all base files hold exactly one row
        per key and stream straight through; delta-carrying buckets get
        the read-time LWW. Keys never cross buckets, so resolving the
        two groups independently is exact — and a 10^10-row table whose
        trickle batches touched 1% of buckets pays the resolve shuffle
        on 1% of its rows, not a full-table shuffle. ``align_to`` reads
        under a different (later) manifest's schema (changelog use)."""
        man_align = align_to or manifest
        sel = (list(manifest["buckets"].keys()) if buckets is None
               else [str(int(b)) for b in buckets])
        delta_bs = [b for b in sel
                    if any(e.get("delta")
                           for e in manifest["buckets"].get(b, []))]
        clean_bs = [b for b in sel if b not in set(delta_bs)]
        parts = []
        clean = self._read_files(
            self._file_groups(manifest, clean_bs), man_align)
        if clean is not None:
            parts.append(clean)
        if delta_bs:
            raw = self._read_files(
                self._file_groups(manifest, delta_bs), man_align)
            if raw is not None:
                parts.append(last_writer_wins(
                    raw, key=manifest["key"],
                    order=tuple(manifest["order"])))
        if not parts:
            fields = list(self.schema(man_align).fields)
            fields.append(T.StructField(OP_COL, T.StringType()))
            return self.spark.createDataFrame([], T.StructType(fields))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def manifest(self, snapshot_id: int) -> dict:
        p = self._io.join(self.meta_dir,
                          "snapshot-%08d.json" % snapshot_id)
        if not self._io.exists(p):
            raise EngineError(
                "snapshot %d does not exist (expired or never written)"
                % snapshot_id)
        return json.loads(self._io.read_text(p))

    def snapshot_ids(self) -> list:
        out = []
        for name in self._io.listnames(self.meta_dir):
            if name.startswith("snapshot-") and name.endswith(".json"):
                out.append(int(name[len("snapshot-"):-len(".json")]))
        return sorted(out)

    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Delete data files and manifests referenced ONLY by snapshots
        older than the newest ``keep_last`` (the analog of Iceberg's
        expire_snapshots). COW merges rewrite whole buckets, so without
        expiry every snapshot pins a full copy of its touched buckets —
        unbounded storage at 10^10 rows. Time travel remains available
        within the kept window. Returns the number of files removed."""
        if keep_last < 1:
            # ids[-0:] would slice the whole list and expire nothing —
            # reject instead of silently inverting the caller's intent
            raise EngineError("keep_last must be >= 1")
        ids = self.snapshot_ids()
        head_id = self.head()["snapshot_id"]
        keep = set(ids[-keep_last:]) | {head_id}
        live: set = set()
        for sid in keep:
            m = self.manifest(sid)
            for files in m["buckets"].values():
                for entry in files:
                    live.add(entry["path"])
        removed = 0
        data_root = self._io.join(self.path, "data")
        for full in self._io.walk_files(data_root):
            rel = self._io.relpath(full, self.path)
            if rel not in live and full.endswith(".parquet"):
                self._io.delete(full)
                removed += 1
        # prune now-empty snapshot dirs and expired manifests
        self._io.remove_empty_dirs(data_root)
        for sid in ids:
            if sid not in keep:
                self._io.delete(self._io.join(
                    self.meta_dir, "snapshot-%08d.json" % sid))
        return removed

    def read(self, include_tombstones: bool = False,
             snapshot_id: int | None = None) -> DataFrame:
        """Table state — live rows only unless asked otherwise.
        ``snapshot_id`` time-travels to an older (unexpired) snapshot."""
        m = self.head() if snapshot_id is None else self.manifest(snapshot_id)
        df = self._state_resolved(m)
        if include_tombstones:
            return df
        return df.where(F.col(OP_COL) != "D").drop(OP_COL)

    def changes(self, from_snapshot: int, to_snapshot: int) -> DataFrame:
        """Changelog between two retained snapshots (the Iceberg
        changelog-scan analog): one row per key whose state differs,
        with ``_change_type`` ∈ {insert, update, delete} and the TO-side
        payload (FROM-side payload for deletes). Lets downstream
        consumers read the lake incrementally instead of diffing full
        states themselves. Both snapshots must be within the
        expire_snapshots retention window.

        Scale design: the manifests record exactly which bucket → file
        lists changed between the snapshots, and a COW merge rewrites
        whole buckets — a bucket with an identical file list is
        byte-identical, so only DIFFERING buckets are read and diffed.
        An adjacent-snapshot changelog therefore costs O(touched
        buckets), not O(table). Falls back to the full diff only when
        the bucket count changed in between (a rebucket rewrites
        everything anyway). Both sides are aligned to the TO-snapshot's
        schema (rename chain applied, added columns null-filled), so
        changelogs spanning an evolve() compare like for like instead
        of misreporting renames as insert+delete."""
        m_to = self.manifest(to_snapshot)
        m_from = self.manifest(from_snapshot)
        key = m_to["key"]
        buckets = None
        if m_from["num_buckets"] == m_to["num_buckets"]:
            buckets = [
                b for b in set(m_from["buckets"]) | set(m_to["buckets"])
                if m_from["buckets"].get(b) != m_to["buckets"].get(b)]
        frm = self._state_resolved(m_from, buckets, align_to=m_to)
        to = self._state_resolved(m_to, buckets, align_to=m_to)
        f_live = frm.where(F.col(OP_COL) != "D")
        t_live = to.where(F.col(OP_COL) != "D")
        cols = [c for c in t_live.columns if c != OP_COL]
        lhs = f_live.select(
            F.col(key).alias("_k"),
            F.struct(*[F.col(c) for c in cols if c != key]).alias("_old"))
        rhs = t_live.select(
            *[F.col(c) for c in cols],
            F.col(key).alias("_k2"),
            F.struct(*[F.col(c) for c in cols if c != key]).alias("_new"))
        joined = rhs.join(lhs, rhs["_k2"] == lhs["_k"], "full_outer")
        inserts = (joined.where(F.col("_k").isNull())
                   .select(*cols, F.lit("insert").alias("_change_type")))
        updates = (joined.where(F.col("_k").isNotNull()
                                & F.col("_k2").isNotNull()
                                & (F.col("_old") != F.col("_new")))
                   .select(*cols, F.lit("update").alias("_change_type")))
        deleted_keys = (joined.where(F.col("_k2").isNull())
                        .select(F.col("_k").alias(key)))
        deletes = (f_live.join(deleted_keys, key, "inner")
                   .select(*cols, F.lit("delete").alias("_change_type")))
        return inserts.unionByName(updates).unionByName(deletes)

    # -- merge ----------------------------------------------------------------

    def merge(self, batch: DataFrame, batch_id: int,
              op_col: str = "op", n_salts: int | None = None,
              mode: str = "cow") -> MergeResult:
        """Key-partitioned MERGE upsert (last-writer-wins by the table's
        order columns; op 'D' → tombstone). Replay-safe: a batch id at or
        below the committed one is skipped without touching data.
        ``n_salts`` switches the in-batch dedup to the two-stage salted
        LWW for hot-key skew (cdc.dedup.salted_last_writer_wins).

        ``mode`` picks the commit shape (VERDICT r2 item 7):

        * ``"cow"`` (default): copy-on-write — touched buckets are read,
          combined with the batch winners, and fully rewritten. Reads
          stay cheap (one row per key on disk) but a 1-row batch
          rewrites its whole bucket: per-batch write amplification is
          O(touched buckets × bucket size). Right for large batches.
        * ``"delta"``: merge-on-read — ONLY the batch winners are
          written, appended to the touched buckets as delta files;
          nothing is read back. Write cost is O(batch), so N tiny
          batches cost O(N × batch) bytes, not O(N × bucket size).
          Reads of delta-carrying buckets resolve base ∪ deltas with a
          read-time LWW (replay order-insensitivity makes this exact);
          ``compact()`` folds deltas back into base files — schedule it
          like any other table maintenance.
        """
        if mode not in ("cow", "delta"):
            raise EngineError("merge mode must be 'cow' or 'delta'")
        m = self.head()
        if batch_id <= m["batch_id"]:
            return MergeResult(batch_id, m["snapshot_id"], skipped=True)

        key = m["key"]
        order = tuple(m["order"])
        nbuckets = m["num_buckets"]
        target = self.schema(m)
        target_names = [f.name for f in target.fields]

        missing = [c for c in (key, *order, op_col) if c not in batch.columns]
        if missing:
            raise EngineError(
                "merge batch is missing required columns %s" % missing)

        src = batch.withColumnRenamed(op_col, OP_COL)
        src = src.select(*[c for c in (*target_names, OP_COL)
                           if c in src.columns])

        bucket_expr = F.pmod(F.xxhash64(F.col(key)), F.lit(nbuckets)) \
            .cast("int")
        obs_in = None
        if mode == "delta":
            # delta commits never read existing buckets, so `touched`
            # is not needed BEFORE the write — it is derived from the
            # written bucket directories afterwards, and rows_in rides
            # an Observation on the batch source. A delta merge is
            # therefore exactly ONE Spark job per batch (the write) —
            # the shape a trickle/streaming ingest wants.
            touched = None
            rows_in = None
            obs_in = Observation()
            src = src.observe(obs_in,
                              F.count(F.lit(1)).alias("rows_in"))
        else:
            # touched buckets + rows_in from ONE aggregation over the
            # batch KEYS, not from materialized winners: LWW preserves
            # the key set, so the bucket sets are identical — and this
            # query column-prunes the batch down to the key (the rule
            # projection's other columns, including the Arrow json UDF,
            # are pruned away). The winners pipeline is then consumed by
            # exactly ONE job (the bucket write), so nothing is
            # persisted/read back through the block store — on a
            # bandwidth-bound host that double materialization was the
            # single largest per-batch memory cost.
            bucket_counts = (src.groupBy(bucket_expr.alias("bucket"))
                             .count().collect())
            touched = sorted(r["bucket"] for r in bucket_counts)
            rows_in = sum(r["count"] for r in bucket_counts)

        if n_salts:
            winners = salted_last_writer_wins(
                src, key=key, order=order, n_salts=n_salts)
        else:
            winners = last_writer_wins(src, key=key, order=order)
        winners = winners.withColumn("bucket", bucket_expr)

        if mode == "delta":
            # nothing read back: base ∪ deltas resolve at read time
            combined = winners
        else:
            # a delta-carrying bucket needs no pre-resolve here: the
            # combined LWW below collapses base, deltas, and the batch
            # in one aggregate (and the rewrite folds the deltas away)
            existing = self._read_files(self._file_groups(m, touched), m)
            if existing is not None:
                existing = existing.withColumn("bucket", bucket_expr)
                combined = last_writer_wins(
                    existing.unionByName(winners,
                                         allowMissingColumns=True),
                    key=key, order=order)
            else:
                combined = winners

        obs2 = Observation()
        combined = combined.observe(
            obs2,
            F.count(F.lit(1)).alias("winners"),
            F.sum(F.when(F.col(OP_COL) == "D", 1).otherwise(0))
             .alias("tombstones"))

        new_snap = m["snapshot_id"] + 1
        rel_dir = "data/s%08d" % new_snap
        out_dir = self._io.join(self.path, rel_dir)
        # cow: one task per touched bucket (winners are bucket-grouped
        # already). delta: touched is unknown pre-write — hash the small
        # winner set across the session's parallelism instead
        n_parts = (max(len(touched), 1) if touched is not None
                   else self.spark.sparkContext.defaultParallelism)
        (combined
         .repartition(n_parts, "bucket")
         .write.mode("overwrite").partitionBy("bucket")
         .parquet(out_dir))

        written = {
            int(self._io.basename(d).split("=", 1)[1])
            for d in self._io.glob(self._io.join(out_dir, "bucket=*"))}
        if touched is None:
            # delta mode: the written directories ARE the touched set
            touched = sorted(written)
            rows_in = int(obs_in.get["rows_in"] or 0)
        else:
            # reconcile what was actually written against the `touched`
            # set computed from the separate key-scan job: a
            # nondeterministic batch (unstable UDF/source) could place
            # winner rows in buckets the key scan never saw — silently
            # omitting those directories from the manifest would be row
            # loss with no error
            unexpected = written - set(touched)
            if unexpected:
                raise EngineError(
                    "merge wrote unexpected bucket directories %s "
                    "(touched set was %s): the batch is nondeterministic "
                    "between jobs — aborting before commit so no rows "
                    "are lost" % (sorted(unexpected), touched))

        new_buckets = dict(m["buckets"])
        cur_schema_id = m["schema_id"]
        for b in touched:
            paths = [
                self._io.relpath(p, self.path)
                for p in self._io.glob(self._io.join(
                    out_dir, "bucket=%d" % b, "*.parquet"))
            ]
            if mode == "delta":
                new_buckets[str(b)] = list(m["buckets"].get(str(b), [])) + [
                    {"path": p, "schema_id": cur_schema_id, "delta": True}
                    for p in paths]
            else:
                new_buckets[str(b)] = [
                    {"path": p, "schema_id": cur_schema_id} for p in paths]

        m2 = dict(m)
        m2["snapshot_id"] = new_snap
        m2["parent"] = m["snapshot_id"]
        m2["batch_id"] = batch_id
        m2["buckets"] = new_buckets
        self._write_manifest(m2)
        self._commit_head(new_snap, expected_parent=m["snapshot_id"])

        stats2 = obs2.get
        return MergeResult(
            batch_id, new_snap, skipped=False,
            rows_in=int(rows_in),
            winners=int(stats2.get("winners") or 0),
            tombstones=int(stats2.get("tombstones") or 0),
            buckets_touched=len(touched))

    def rollback(self, snapshot_id: int) -> int:
        """Roll the table back to a retained snapshot (the Iceberg
        ``rollback_to_snapshot`` analog): commits a NEW snapshot whose
        buckets/schema/batch-id are copied from the target, so history
        stays linear and expire_snapshots keeps working. Because the
        committed batch id rolls back too, a checkpoint-driven pipeline
        re-applies everything after the rollback point on its next run
        — the recovery story for a bad deploy that merged garbage
        batches: rollback, reset the pipeline checkpoint, re-run — the
        idempotent batch-id skip fast-forwards through everything at or
        before the rollback point and re-applies the rest. Data files
        are not touched (the target snapshot's files are still
        referenced; expire_snapshots reclaims the rolled-back ones
        later)."""
        target = self.manifest(snapshot_id)
        m = self.head()
        if snapshot_id == m["snapshot_id"]:
            return snapshot_id
        m2 = dict(target)
        m2["snapshot_id"] = m["snapshot_id"] + 1
        m2["parent"] = m["snapshot_id"]
        self._write_manifest(m2)
        self._commit_head(m2["snapshot_id"],
                          expected_parent=m["snapshot_id"])
        return m2["snapshot_id"]

    def compact(self, buckets=None) -> int:
        """Fold delta files back into a single base file set per bucket
        (the maintenance half of ``merge(mode="delta")`` — the analog of
        Iceberg's rewrite_data_files over MOR deletes). Only buckets
        that actually carry deltas are read and rewritten; the rest keep
        their entries untouched. ``buckets`` restricts further (compact
        incrementally, a shard at a time, at 10^10 rows). Tombstones are
        retained, batch id preserved — exactly-once resume and replay
        order-insensitivity are unaffected. Returns the new snapshot id
        (or the current one when there was nothing to fold)."""
        m = self.head()
        sel = None if buckets is None else {int(b) for b in buckets}
        target = sorted(
            int(b) for b, files in m["buckets"].items()
            if any(e.get("delta") for e in files)
            and (sel is None or int(b) in sel))
        if not target:
            return m["snapshot_id"]
        df = self._read_files(self._file_groups(m, target), m)
        resolved = last_writer_wins(df, key=m["key"],
                                    order=tuple(m["order"]))
        bucket_expr = F.pmod(F.xxhash64(F.col(m["key"])),
                             F.lit(m["num_buckets"])).cast("int")
        new_snap = m["snapshot_id"] + 1
        out_dir = self._io.join(self.path, "data/s%08d" % new_snap)
        (resolved.withColumn("bucket", bucket_expr)
         .repartition(len(target), "bucket")
         .write.mode("overwrite").partitionBy("bucket").parquet(out_dir))
        new_buckets = dict(m["buckets"])
        for b in target:
            paths = [
                self._io.relpath(p, self.path)
                for p in self._io.glob(self._io.join(
                    out_dir, "bucket=%d" % b, "*.parquet"))
            ]
            new_buckets[str(b)] = [
                {"path": p, "schema_id": m["schema_id"]} for p in paths]
        m2 = dict(m)
        m2["snapshot_id"] = new_snap
        m2["parent"] = m["snapshot_id"]
        m2["buckets"] = new_buckets
        self._write_manifest(m2)
        self._commit_head(new_snap, expected_parent=m["snapshot_id"])
        return new_snap
