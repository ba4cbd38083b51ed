"""Per-partition lineage manifests — checkpoint/resume for batch pipelines.

The reference has no resume (it refuses to touch a non-empty store,
LoadGrameneGraphDb.groovy:40-42; restart = full rerun). The north rule
requires the opposite: a killed run must resume without recomputing
completed partitions.

Design (SURVEY.md §4 "Checkpoint / resume"):
  - a stage writes its output under ``<root>/<stage>/part=<pid>/`` —
    one directory per partition, written to a ``.tmp-<pid>`` dir first and
    committed by atomic ``os.replace`` rename
  - ``<root>/<stage>/_manifest.json`` records, per completed partition, the
    input fingerprint (file paths + sizes + mtimes hashed) and counters;
    it is rewritten atomically after each partition commit
  - on resume, a partition is skipped iff its fingerprint matches; a
    changed input invalidates just that partition
  - partially-written partitions are invisible: only the rename + manifest
    update publish them
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def fingerprint_paths(paths: list[str]) -> str:
    """Stable hash of input identity: path + size + mtime_ns per file."""
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


class StageManifest:
    def __init__(self, root: str, stage: str) -> None:
        self.stage_dir = os.path.join(root, stage)
        self.path = os.path.join(self.stage_dir, "_manifest.json")
        os.makedirs(self.stage_dir, exist_ok=True)
        self.partitions: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as fh:
                self.partitions = json.load(fh).get("partitions", {})

    def is_done(self, pid: str, fingerprint: str) -> bool:
        entry = self.partitions.get(pid)
        return entry is not None and entry.get("fingerprint") == fingerprint

    def partition_dir(self, pid: str) -> str:
        # 'part-' not 'part=': a key=value dir name triggers hive-partition
        # column inference in downstream parquet reads
        return os.path.join(self.stage_dir, f"part-{pid}")

    def tmp_dir(self, pid: str) -> str:
        return os.path.join(self.stage_dir, f".tmp-{pid}")

    def start(self, pid: str) -> str:
        """Fresh tmp dir for the partition's output."""
        tmp = self.tmp_dir(pid)
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        return tmp

    def commit(self, pid: str, fingerprint: str,
               counters: dict | None = None) -> None:
        """Atomic publish: rename tmp -> part=<pid>, then rewrite manifest."""
        final = self.partition_dir(pid)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(self.tmp_dir(pid), final)
        self.partitions[pid] = {"fingerprint": fingerprint,
                                "counters": counters or {}}
        self._write()

    def _write(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"partitions": self.partitions}, fh, indent=1,
                      sort_keys=True)
        os.replace(tmp, self.path)

    def completed_dirs(self) -> list[str]:
        return [self.partition_dir(pid) for pid in sorted(self.partitions)]

    def counters_total(self) -> dict:
        total: dict[str, int] = {}
        for entry in self.partitions.values():
            for k, v in entry.get("counters", {}).items():
                total[k] = total.get(k, 0) + v
        return total
