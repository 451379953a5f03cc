"""Offset checkpoint with atomic commit (SURVEY.md §7 step 5).

The checkpoint records the next WAL chunk to read and the last batch id
written. It is committed AFTER the lake snapshot commit; a crash between
the two replays the last batch, which the lake skips idempotently by
batch id (LakeTable.merge) — together: exactly-once.
"""

from __future__ import annotations

import json
import os


class Checkpoint:
    FILE = "checkpoint.json"

    def __init__(self, path: str, next_chunk: int = 0, batch_id: int = 0):
        self.path = path
        self.next_chunk = next_chunk
        self.batch_id = batch_id

    @classmethod
    def load(cls, path: str) -> "Checkpoint":
        f = os.path.join(path, cls.FILE)
        if os.path.exists(f):
            with open(f) as fh:
                d = json.load(fh)
            return cls(path, d["next_chunk"], d["batch_id"])
        return cls(path)

    def commit(self, next_chunk: int, batch_id: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, self.FILE + ".tmp")
        with open(tmp, "w") as fh:
            json.dump({"next_chunk": next_chunk, "batch_id": batch_id}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(self.path, self.FILE))
        self.next_chunk = next_chunk
        self.batch_id = batch_id
