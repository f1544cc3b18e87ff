"""Per-stage checkpointing with lineage fingerprints and metrics
(SURVEY.md §4.4; BASELINE.json north_rule "resumable from checkpoint with
per-partition lineage + metrics").

Layout under ``out_root``::

    <stage>/part=<k>/*.parquet     # partitioned write (when schema has `part`)
    <stage>/*.parquet              # plain write otherwise
    <stage>.manifest.json          # {fingerprint, rows, files: {path: rows},
                                   #  wall_s, schema, params}
    metrics.jsonl                  # append-only per-stage metrics rollup

Lineage = the fingerprint chain: a stage's fingerprint hashes its params +
code version + every upstream fingerprint. A stage is *done* iff its
manifest exists AND its fingerprint matches the recomputed expectation —
so editing an upstream stage (or its params) transitively invalidates
downstream checkpoints, while a rerun over unchanged inputs reads parquet
instead of recomputing (tested in tests/test_checkpoint.py).

Writes are atomic: data lands in ``<stage>.tmp-<pid>/`` and is renamed
into place before the manifest is written; a killed job can never leave a
half-written stage that looks done (the manifest is written last).

Per-partition detail: the manifest records per-file row counts, and
partitioned stages (schema carries ``part``) write one directory per
bucket — a downstream consumer or selective backfill can prune/redo
single ``part=<k>`` directories and the manifest tells it what each held.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from pathlib import Path
from typing import Callable

import pyarrow.parquet as pq
import ray.data

CODE_VERSION = "1"  # bump to invalidate every checkpoint


def fingerprint(stage: str, params: dict, deps: list[str]) -> str:
    payload = json.dumps(
        {"stage": stage, "params": params, "deps": sorted(deps),
         "code": CODE_VERSION},
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class Checkpointer:
    """Runs stages with skip-if-done semantics over a shared ``out_root``."""

    def __init__(self, out_root: str | Path):
        self.root = Path(out_root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.fingerprints: dict[str, str] = {}

    # -- manifest helpers ---------------------------------------------------

    def _manifest_path(self, stage: str) -> Path:
        return self.root / f"{stage}.manifest.json"

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not p.exists():
            return None
        try:
            return json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            return None

    def is_done(self, stage: str, fp: str) -> bool:
        m = self.manifest(stage)
        return bool(m) and m.get("fingerprint") == fp

    # -- the stage runner ---------------------------------------------------

    def run(
        self,
        stage: str,
        build: Callable[[], ray.data.Dataset],
        *,
        params: dict | None = None,
        deps: list[str] | None = None,
    ) -> ray.data.Dataset:
        """Return the stage's Dataset, computing + persisting it only if no
        valid checkpoint exists. ``deps`` are upstream STAGE NAMES already
        run through this checkpointer (their fingerprints chain in)."""
        params = params or {}
        dep_fps = [self.fingerprints[d] for d in (deps or [])]
        fp = fingerprint(stage, params, dep_fps)
        self.fingerprints[stage] = fp
        out_dir = self.root / stage

        if self.is_done(stage, fp):
            return ray.data.read_parquet(str(out_dir))

        ds = build()
        t0 = time.perf_counter()
        tmp = self.root / f"{stage}.tmp-{os.getpid()}"
        if tmp.exists():
            shutil.rmtree(tmp)
        schema = ds.schema()
        part_cols = ["part"] if "part" in schema.names else None
        ds.write_parquet(str(tmp), partition_cols=part_cols)
        wall = time.perf_counter() - t0

        files = {}
        for f in sorted(tmp.rglob("*.parquet")):
            files[str(f.relative_to(tmp))] = pq.ParquetFile(f).metadata.num_rows
        rows = sum(files.values())

        if out_dir.exists():
            shutil.rmtree(out_dir)
        tmp.rename(out_dir)
        self._manifest_path(stage).write_text(
            json.dumps(
                {
                    "fingerprint": fp,
                    "rows": rows,
                    "files": files,
                    "wall_s": round(wall, 3),
                    "schema": dict(zip(schema.names, map(str, schema.types))),
                    "params": params,
                    "deps": {d: self.fingerprints[d] for d in (deps or [])},
                },
                indent=1,
            )
        )
        with open(self.root / "metrics.jsonl", "a") as fh:
            fh.write(
                json.dumps(
                    {"stage": stage, "rows_out": rows, "wall_s": round(wall, 3),
                     "fingerprint": fp, "n_files": len(files)}
                )
                + "\n"
            )
        return ray.data.read_parquet(str(out_dir))
