"""Host parallel-scaling ceiling microbenchmark (no Ray).

Runs a fixed amount of Arrow/pandas string-kernel work (split, flatten,
siphash, slice — the exact kernel family the KG pipeline's hot stages
use) across N plain multiprocessing workers and reports wall time. The
8→32 ratio of THIS benchmark is the box's own scaling ceiling: on the
current shared host it measures ~0.44-0.57 efficiency beyond ~8-12
concurrent workers (memory-bandwidth saturation of the single socket),
so any pipeline efficiency number at 8→32 CPUs must be read against it.
A real 4×-node cluster comparison does not have this artifact — each
node brings its own memory controllers.

Usage: python scripts/host_ceiling.py [N ...]   (default: 2 8 32)
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np

TASKS = 64


def _work(_):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    rng = np.random.RandomState(0)
    toks = np.array(["tok%d" % i for i in range(1000)], dtype=object)
    texts = [" ".join(toks[rng.randint(0, 1000, 60)]) for _ in range(2000)]
    arr = pa.array(texts * 4)
    t0 = time.time()
    for _ in range(6):
        s = pc.split_pattern(arr, " ")
        flat = pc.list_flatten(s)
        pd.util.hash_array(flat.to_numpy(zero_copy_only=False))
        pc.utf8_slice_codeunits(arr, start=0, stop=40)
    return time.time() - t0


def measure(n: int) -> dict:
    t0 = time.time()
    with mp.Pool(n) as p:
        per_task = p.map(_work, range(TASKS))
    return {
        "procs": n,
        "wall_sec": round(time.time() - t0, 2),
        "mean_task_sec": round(float(np.mean(per_task)), 3),
    }


def ceiling(lo: int, hi: int) -> dict:
    """Best-of-2 interleaved efficiency of pure kernel work lo→hi procs."""
    runs = {lo: [], hi: []}
    for n in (hi, lo, hi, lo):
        runs[n].append(measure(n))
    best = {n: min(rs, key=lambda r: r["wall_sec"]) for n, rs in runs.items()}
    eff = (best[lo]["wall_sec"] / best[hi]["wall_sec"]) / (hi / lo)
    return {
        "lo": best[lo],
        "hi": best[hi],
        "host_ceiling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    for n in levels:
        print(measure(n))
