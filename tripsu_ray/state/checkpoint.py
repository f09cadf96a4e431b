"""Per-stage checkpoints, resume manifests, job metrics.

"Resumable from per-partition checkpoints" for a batch pipeline means:

- every stage that materializes writes a Parquet DIRECTORY (many part
  files — Ray writes one per block, so partitions are the unit of work),
- completion is recorded ATOMICALLY via a manifest written after the data
  (write temp + rename), holding row count, wall time, and lineage (the
  stage's input manifest names + parameters hash),
- a rerun with the same checkpoint root skips stages whose manifest is
  present and whose lineage matches, re-reading their Parquet instead of
  recomputing — a crashed run resumes at the first incomplete stage.

Metrics accumulate in ``metrics.json`` next to the manifests: per-stage
rows in/out and seconds — the job summary the north rule asks for.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from ..sources import read_parquet_clean as _read_parquet_clean


def _sweep_partial_parquet(out_dir: str) -> int:
    """Delete unreadable part-files left by memory-killed write tasks.

    A Ray write task killed mid-write and retried leaves an orphaned
    PARTIAL file beside the retry's complete one ("Parquet magic bytes
    not found" on readback — observed under memory pressure on this
    host). ``write_parquet`` returning does not preclude such orphans,
    so validate each footer (metadata-only, cheap) before the stage's
    readback and drop the corpses. Returns the number swept."""
    import pyarrow.parquet as pq

    swept = 0
    try:
        names = os.listdir(out_dir)
    except FileNotFoundError:
        return 0
    for name in names:
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(out_dir, name)
        try:
            pq.read_metadata(path)
        except Exception:
            os.unlink(path)
            swept += 1
    return swept


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.metrics: dict = {"stages": {}}

    # -- manifest plumbing --------------------------------------------------

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}.manifest.json")

    def _lineage_key(self, stage: str, params: dict | None) -> str:
        blob = json.dumps({"stage": stage, "params": params or {}}, sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]

    def is_complete(self, stage: str, params: dict | None = None) -> bool:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return False
        try:
            m = json.load(open(p))
        except (json.JSONDecodeError, OSError):
            return False
        return m.get("lineage") == self._lineage_key(stage, params)

    def _write_manifest(self, stage: str, info: dict) -> None:
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(info, f, indent=2, default=str)
        os.replace(tmp, self._manifest_path(stage))  # atomic completion marker

    # -- stage execution ----------------------------------------------------

    def dataset_stage(self, stage: str, fn, params: dict | None = None):
        """Run ``fn() -> Dataset`` with checkpoint/resume.

        Complete → re-read the stage's Parquet (no recompute). Incomplete →
        execute, write Parquet, then write the manifest (data before
        marker, so a crash mid-write never fakes completion).
        """

        out_dir = os.path.join(self.root, stage)
        # the data-dir guard mirrors value_stage: a manifest whose Parquet
        # was deleted must recompute, not lazily fail far downstream
        if self.is_complete(stage, params) and os.path.isdir(out_dir):
            self.metrics["stages"].setdefault(stage, {})["resumed"] = True
            return _read_parquet_clean(out_dir)
        # incomplete (crashed attempt / stale params): clear leftover part
        # files FIRST — Ray's write_parquet appends uniquely-named files, so
        # writing into a dirty dir would silently return old+new rows on the
        # exact path resume exists for
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = fn()
        ds.write_parquet(out_dir)
        _sweep_partial_parquet(out_dir)
        result = _read_parquet_clean(out_dir)
        n = result.count()
        secs = time.perf_counter() - t0
        self._write_manifest(
            stage,
            {
                "stage": stage,
                "lineage": self._lineage_key(stage, params),
                "params": params or {},
                "rows": n,
                "seconds": round(secs, 3),
                "completed_at": time.time(),
                "path": out_dir,
            },
        )
        self.metrics["stages"][stage] = {"rows": n, "seconds": round(secs, 3)}
        return result

    def value_stage(self, stage: str, fn, params: dict | None = None):
        """Run ``fn() -> picklable value`` with checkpoint/resume (driver
        folds: type-index pairs, link maps)."""
        import pickle

        out = os.path.join(self.root, f"{stage}.pkl")
        if self.is_complete(stage, params) and os.path.exists(out):
            self.metrics["stages"].setdefault(stage, {})["resumed"] = True
            with open(out, "rb") as f:
                return pickle.load(f)
        t0 = time.perf_counter()
        value = fn()
        tmp = out + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(value, f)
        os.replace(tmp, out)
        secs = time.perf_counter() - t0
        self._write_manifest(
            stage,
            {
                "stage": stage,
                "lineage": self._lineage_key(stage, params),
                "seconds": round(secs, 3),
                "completed_at": time.time(),
                "path": out,
            },
        )
        self.metrics["stages"][stage] = {"seconds": round(secs, 3)}
        return value

    def finish(self, **extra) -> dict:
        self.metrics.update(extra)
        with open(os.path.join(self.root, "metrics.json"), "w") as f:
            json.dump(self.metrics, f, indent=2, default=str)
        return self.metrics
