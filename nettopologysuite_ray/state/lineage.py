"""Per-partition lineage + checkpoint metadata → idempotent, resumable runs.

north_rule requirement: "resumable from checkpoint with per-partition
lineage + metrics".  Ray Data gives task-level retry within a run
(SURVEY.md §4.2); cross-run resume is ours:

* output is partitioned Parquet, one directory per deterministic partition
  id (never one giant file);
* every completed partition writes `_lineage/part-{pid}.json` with the
  input fragments, a hash of the operator parameters, and row/byte counts;
* a re-run with the same params_hash skips partitions whose done-marker
  exists (resume-by-skipping-complete-partitions).
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def params_hash(params: dict) -> str:
    blob = json.dumps(params, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


class LineageLog:
    def __init__(self, out_dir: str, params: dict):
        self.out_dir = out_dir
        self.meta_dir = os.path.join(out_dir, "_lineage")
        self.params = dict(params)
        self.phash = params_hash(params)
        os.makedirs(self.meta_dir, exist_ok=True)

    def marker_path(self, pid: str) -> str:
        return os.path.join(self.meta_dir, f"part-{pid}.json")

    def is_done(self, pid: str) -> bool:
        p = self.marker_path(pid)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                meta = json.load(f)
            return meta.get("params_hash") == self.phash and meta.get("status") == "done"
        except (json.JSONDecodeError, OSError):
            return False

    def pending(self, pids) -> list:
        return [p for p in pids if not self.is_done(p)]

    def mark_done(self, pid: str, inputs: list, rows: int, nbytes: int = 0, metrics: dict | None = None):
        meta = {
            "partition": pid,
            "params_hash": self.phash,
            "params": self.params,
            "inputs": inputs,
            "rows": int(rows),
            "bytes": int(nbytes),
            "metrics": metrics or {},
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "status": "done",
        }
        tmp = self.marker_path(pid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, sort_keys=True)
        os.replace(tmp, self.marker_path(pid))  # atomic done-marker

    def write_run_manifest(self, extra: dict | None = None):
        man = {"params": self.params, "params_hash": self.phash}
        if extra:
            man.update(extra)
        with open(os.path.join(self.meta_dir, "run.json"), "w") as f:
            json.dump(man, f, sort_keys=True, indent=1)
