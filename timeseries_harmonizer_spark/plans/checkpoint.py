"""Checkpoint manifest — per-stage lineage + idempotent resume.

The reference gets resumability operationally: every run re-reads a trailing
lookback window, trims the overlap head, and the store dedups by
last-write-wins (reference harmonizers/__init__.py:387-388, launcher.py:40-44).
This engine makes it explicit (north rule): after each stage commits its
table snapshot, a manifest row records

  (run_id, stage, tier, bucket_range, snapshot_id, watermark,
   points_in, points_out, errors, wall_ms, status)

committed atomically (write-temp + rename). A restarted run replays the
plan but skips every (stage, tier) already COMMITTED for the same run_id —
and because every write is either an idempotent dynamic-partition overwrite
or an append deduped by last-write-wins on read, a crash *between* data
commit and manifest commit only causes a harmless re-write.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field


@dataclass
class StageRecord:
    run_id: str
    stage: str
    tier: str
    snapshot_id: int | None = None
    bucket_range: str = "0:64"
    watermark: str | None = None
    points_in: int | None = None
    points_out: int | None = None
    errors: int = 0
    wall_ms: int | None = None
    status: str = "COMMITTED"
    committed_at: float = field(default_factory=time.time)


class Manifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def records(self) -> list[StageRecord]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [StageRecord(**r) for r in json.load(f)]

    def is_done(self, run_id: str, stage: str, tier: str) -> bool:
        return any(
            r.run_id == run_id
            and r.stage == stage
            and r.tier == tier
            and r.status == "COMMITTED"
            for r in self.records()
        )

    def commit(self, rec: StageRecord) -> None:
        recs = [asdict(r) for r in self.records()] + [asdict(rec)]
        d = os.path.dirname(self.path) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(recs, f, indent=1)
        os.replace(tmp, self.path)  # atomic commit point


class StageRunner:
    """Wraps stage execution with manifest bookkeeping + resume-skip."""

    def __init__(self, manifest: Manifest, run_id: str, tier: str):
        self.manifest = manifest
        self.run_id = run_id
        self.tier = tier

    def run(self, stage: str, fn, watermark: str | None = None):
        """fn() -> (snapshot_id, points_out) | snapshot_id. Skips if the
        stage already committed for this (run_id, tier)."""
        if self.manifest.is_done(self.run_id, stage, self.tier):
            return None
        t0 = time.time()
        out = fn()
        snap, points_out = out if isinstance(out, tuple) else (out, None)
        self.manifest.commit(
            StageRecord(
                run_id=self.run_id,
                stage=stage,
                tier=self.tier,
                snapshot_id=snap,
                watermark=watermark,
                points_out=points_out,
                wall_ms=int((time.time() - t0) * 1000),
            )
        )
        return snap
