"""Driver-style correctness sweep: run every registered query against its
DuckDB oracle at a given sf dir and report rows/schema/hash matches.

Usage:
    PYTHONPATH=/root/repo python scripts/verify_sweep.py [sf_dir] [name ...]

With query names given, only those run. Mirrors the graft driver's
compare: sort columns by name, sort rows by all columns, md5 the
canonical CSV of the values.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            df[c] = col.round(6)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.md5(payload).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
        )

    from ntto_ray.registry import oracle_sql, queries

    q, o = queries(), oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    failures = []
    for name, fn in q.items():
        if only and name not in only:
            continue
        t0 = time.time()
        t_mine = 0.0
        try:
            mine = _to_pandas(fn(sf_dir))
            t_mine = time.time() - t0
            orc = con.execute(o[name]).df()
            rows = len(mine) == len(orc)
            schema = sorted(mine.columns) == sorted(orc.columns)
            h = _canon_hash(mine) == _canon_hash(orc) if rows and schema else False
            ok = rows and schema and h
            status = "OK" if ok else (
                f"ROWS {len(mine)}!={len(orc)}" if not rows
                else "SCHEMA" if not schema else "HASH"
            )
        except Exception as e:  # noqa: BLE001
            ok, status = False, f"ERR {type(e).__name__}: {e}"
        dt = time.time() - t0
        print(
            f"{name:32s} {status:12s} {dt:6.1f}s"
            f" (ray {t_mine:5.1f}s, oracle {dt - t_mine:5.1f}s)",
            flush=True,
        )
        if not ok:
            failures.append((name, status))

    print(json.dumps({"failures": [f[0] for f in failures]}))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
