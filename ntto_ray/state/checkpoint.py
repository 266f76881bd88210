"""Checkpoint / resume / lineage for partitioned pipeline runs.

The reference has no checkpointing (its only intermediate is the ``-a -j``
tempfile, ntto.go:133-142,207-210). At 10^12 turns a run MUST be
resumable, so the engine adds it explicitly (SURVEY.md §4.4):

- the input is split into deterministic partitions (here: hash of the
  input file path + conv_id range; in production: file groups);
- each partition runs the full pipeline and lands under
  ``out/part=<pid>/`` via write-to-temp + atomic rename;
- a manifest line (JSON: partition id, input fingerprint, row counts,
  wall time) commits the partition; a rerun loads the manifest and skips
  committed partitions whose fingerprint still matches.

This is driver-level orchestration AROUND Ray Data jobs — each partition
is itself a streaming Dataset topology; the checkpoint unit is the
partition, not the block.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass

import ray.data


@dataclass(frozen=True)
class PartitionResult:
    partition: int
    rows: int
    seconds: float
    skipped: bool


class CheckpointManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "MANIFEST.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed(self) -> dict[int, dict]:
        done: dict[int, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        done[rec["partition"]] = rec
        return done

    def commit(self, rec: dict) -> None:
        # append is atomic enough for a single driver; multi-driver runs
        # would use a per-partition marker file instead
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")


def stage_metrics(ds: ray.data.Dataset) -> list[dict]:
    """Compact per-stage lineage from an EXECUTED dataset's stats: one
    record per operator with wall-clock span, task count and output rows
    — the manifest-friendly subset of ``ds.stats()`` (whose full text is
    driver-log-sized). Parsing the formatted stats keeps us off Ray's
    internal stats classes, which have no stable public surface."""
    import re

    out: list[dict] = []
    try:
        text = ds.stats()
    except Exception:
        return out
    op = None
    for line in text.splitlines():
        m = re.match(
            r"Operator (\d+) (.+?): (?:(\d+) tasks executed, )?"
            r"(?:\d+ blocks produced in |executed in )([\d.]+)s",
            line.strip(),
        )
        if m:
            op = {
                "stage": m.group(2)[:120],
                "tasks": int(m.group(3)) if m.group(3) else None,
                "wall_sec": float(m.group(4)),
                "rows_out": None,
            }
            out.append(op)
            continue
        m = re.match(r"\* Output num rows per block:.* (\d+) total", line.strip())
        if m and op is not None and op["rows_out"] is None:
            op["rows_out"] = int(m.group(1))
    return out


def content_fingerprint(paths: str | list[str]) -> str:
    """Fingerprint of the INPUT DATA (not its path): blake2 over each
    file's (relative name, size, mtime_ns). A resumed run whose data
    changed under the same path re-runs instead of silently skipping.
    Directories are walked recursively; order is deterministic."""
    import hashlib

    if isinstance(paths, str):
        paths = [paths]
    h = hashlib.blake2b(digest_size=16)
    for root in sorted(paths):
        if os.path.isdir(root):
            files = sorted(
                os.path.join(dp, f)
                for dp, _, fs in os.walk(root)
                for f in fs
            )
        else:
            files = [root]
        for f in files:
            st = os.stat(f)
            h.update(
                f"{os.path.relpath(f, root)}|{st.st_size}|{st.st_mtime_ns}\n".encode()
            )
    return h.hexdigest()


def run_partitioned(
    *,
    num_partitions: int,
    out_dir: str,
    make_partition_ds: Callable[[int, int], ray.data.Dataset],
    fingerprint: str,
) -> list[PartitionResult]:
    """Run ``make_partition_ds(pid, num_partitions)`` for every partition
    not already committed with a matching fingerprint; write each result
    to ``out/part=<pid>`` (temp dir + atomic rename) and commit a manifest
    line with lineage metadata."""
    manifest = CheckpointManifest(out_dir)
    done = manifest.completed()
    results: list[PartitionResult] = []
    for pid in range(num_partitions):
        rec = done.get(pid)
        final = os.path.join(out_dir, f"part={pid}")
        # skip only when the committed OUTPUT still exists on disk —
        # a manifest line with a deleted part dir must re-run
        if (
            rec is not None
            and rec.get("fingerprint") == fingerprint
            and os.path.isdir(final)
        ):
            results.append(PartitionResult(pid, rec["rows"], 0.0, skipped=True))
            continue
        t0 = time.time()
        ds = make_partition_ds(pid, num_partitions)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        ds.write_parquet(tmp)
        rows = sum(
            _count_parquet_rows(os.path.join(tmp, f)) for f in os.listdir(tmp)
        )
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        secs = time.time() - t0
        manifest.commit(
            {
                "partition": pid,
                "fingerprint": fingerprint,
                "rows": rows,
                "seconds": round(secs, 3),
                "stages": stage_metrics(ds),
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
        )
        results.append(PartitionResult(pid, rows, secs, skipped=False))
    return results


def _count_parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    if not path.endswith(".parquet"):
        return 0
    return pq.read_metadata(path).num_rows


def conv_partition_filter(pid: int, num_partitions: int):
    """Deterministic conv_id → partition assignment (pandas
    ``hash_array`` — 64-bit siphash with pandas' fixed default key —
    of the conv_id string, mod P) as a vectorized batch filter — the
    partition key every stage reuses. To reproduce the assignment
    outside this engine, use pandas' hash_array with default settings;
    it is stable across processes and versions by contract."""
    import pandas as pd
    import numpy as np
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(t["conv_id"].to_numpy(zero_copy_only=False), dtype=object)
        )
        return t.filter(pa.array((h % num_partitions) == pid))

    return fn
