"""Custom join operators Ray Data lacks natively.

``copartition_inner_join``: generic equi-join as ONE tag-union hash
exchange + a per-partition C++ (acero) hash join — replaces Ray's
native ``Dataset.join`` where its per-partition aggregator-actor
spin-up dominates (measured on rel_q7: three native joins = 26 s at
sf0.1/32 CPUs for ~600 k rows — almost all fixed operator cost). Data
volume moved is identical (both sides cross the wire once either way);
only the fixed cost changes.

``asof_join_latest``: for every left row, the single right row with the
greatest (ts, tiebreak) at-or-before the left row's ts within the same
key — the classic event-to-dimension-history / trade-to-quote join.

Partitioning contract: ONE tag-union hash exchange on the join key
co-locates each key's left and right rows in a single block
(``hash_grouped``), so the per-block kernel sees whole keys; skewed keys
are bounded by that key's own row count, the same budget as any
per-key windowed operator (sessionization). No driver materialization,
no broadcast: both sides stream."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ntto_ray.stages.exchange import NO_FUSE_ARGS, conform, hash_grouped, runs


def copartition_inner_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    parallelism: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Distributed inner equi-join on one integer key: tag both sides,
    union, ONE ``hash_grouped`` exchange on the key, then a block-local
    acero hash join per partition (all rows of a key land in one block,
    so the local join is globally exact). Both sides stream — neither is
    broadcast or driver-materialized; skew is bounded by the hottest
    key's own row count, the same budget as any keyed exchange.

    Output columns: ``on`` (the left key name; int64) + the left payload
    + the right payload (names must be disjoint). Key columns are cast
    to int64; rows with null keys never match (inner semantics).

    Vs Ray-native ``Dataset.join``: same shuffle volume, but one
    exchange through the session-tuned aggregator pool instead of a
    per-join hash-join operator whose actor spin-up dominates small-to-
    medium inputs (see module docstring for the measurement).

    Pass ``left_schema``/``right_schema`` when the input is a LAZY chain
    — ``Dataset.schema()`` on one executes a pipeline prefix just to
    sniff types, which would run the upstream twice."""
    right_on = right_on or on
    l_schema = left_schema if left_schema is not None else left.schema()
    r_schema = right_schema if right_schema is not None else right.schema()
    if hasattr(l_schema, "base_schema"):  # ray.data Schema wrapper
        l_schema = l_schema.base_schema
    if hasattr(r_schema, "base_schema"):
        r_schema = r_schema.base_schema
    l_cols = [n for n in l_schema.names if n != on]
    r_cols = [n for n in r_schema.names if n != right_on]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")

    fields = [("__k", pa.int64()), ("__side", pa.int8())]
    fields += [(n, l_schema.field(n).type) for n in l_cols]
    fields += [(n, r_schema.field(n).type) for n in r_cols]
    union_schema = pa.schema(fields)

    def _prep(key_col: str, side: int, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or key_col not in t.column_names:
                return union_schema.empty_table()
            data: dict[str, object] = {
                "__k": t[key_col].cast(pa.int64()),
                "__side": pa.array(
                    np.full(t.num_rows, side, dtype=np.int8), pa.int8()
                ),
            }
            for n in cols:
                data[n] = t[n]
            # conform fills the other side's payload columns with nulls
            return conform_nullfill(pa.table(data), union_schema)

        return fn

    tagged = left.map_batches(
        _prep(on, 0, l_cols), batch_format="pyarrow"
    ).union(right.map_batches(_prep(right_on, 1, r_cols), batch_format="pyarrow"))
    # sort=False: the kernel is a hash join, contiguous runs aren't needed.
    # reserve_cpus=False: q7-style pipelines chain several of these; a
    # second exchange's aggregators must not pend behind the first's
    # reserved actors (see hash_grouped's deadlock note).
    grouped = hash_grouped(
        tagged, ["__k"], parallelism=parallelism, sort=False, reserve_cpus=False
    )

    out_schema = pa.schema(
        [(on, pa.int64())]
        + [(n, l_schema.field(n).type) for n in l_cols]
        + [(n, r_schema.field(n).type) for n in r_cols]
    )

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__k" not in t.column_names:
            return out_schema.empty_table()
        side = t["__side"].to_numpy()
        lt = t.filter(pa.array(side == 0)).select(["__k", *l_cols])
        rt = t.filter(pa.array(side == 1)).select(["__k", *r_cols])
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        j = lt.join(rt, keys=["__k"], join_type="inner")
        return j.select(["__k", *l_cols, *r_cols]).rename_columns(
            [on, *l_cols, *r_cols]
        )

    return grouped.map_batches(
        kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


def conform_nullfill(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Like :func:`ntto_ray.stages.exchange.conform`, but columns absent
    from ``t`` become all-null arrays of the target type (the tag-union
    pattern: each side carries only its own payload)."""
    if t.num_rows == 0:
        return schema.empty_table()
    cols = []
    for f in schema:
        if f.name in t.column_names:
            col = t[f.name]
            if col.type != f.type:
                col = col.cast(f.type)
        else:
            col = pa.nulls(t.num_rows, f.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


def asof_join_latest(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
) -> ray.data.Dataset:
    """Inner as-of join: (left_id, key, right_id) where right_id is the
    right row of the same ``key`` with maximal (``right_ts``,
    ``right_id``) such that right_ts <= left_ts (keys join
    ``left_key`` = ``right_key``). Left rows with no such
    right row are dropped (inner semantics). Timestamps compare as their
    int64 epoch-microsecond representation."""

    union_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("ts_us", pa.int64()),
            ("rid", pa.int64()),
            ("is_right", pa.int8()),
        ]
    )

    def prep_left(t: pa.Table) -> pa.Table:
        return conform(
            pa.table(
                {
                    "key": t[left_key].cast(pa.int64()),
                    "ts_us": t[left_ts].cast(pa.timestamp("us")).cast(pa.int64()),
                    "rid": t[left_id].cast(pa.int64()),
                    "is_right": pa.array(
                        np.zeros(t.num_rows, dtype=np.int8), type=pa.int8()
                    ),
                }
            ),
            union_schema,
        )

    def prep_right(t: pa.Table) -> pa.Table:
        return conform(
            pa.table(
                {
                    "key": t[right_key].cast(pa.int64()),
                    "ts_us": t[right_ts].cast(pa.timestamp("us")).cast(pa.int64()),
                    "rid": t[right_id].cast(pa.int64()),
                    "is_right": pa.array(
                        np.ones(t.num_rows, dtype=np.int8), type=pa.int8()
                    ),
                }
            ),
            union_schema,
        )

    tagged = left.map_batches(prep_left, batch_format="pyarrow").union(
        right.map_batches(prep_right, batch_format="pyarrow")
    )
    grouped = hash_grouped(tagged, ["key"], sort=True)

    out_schema = pa.schema(
        [("left_id", pa.int64()), ("key", pa.int64()), ("right_id", pa.int64())]
    )

    def kernel(t: pa.Table) -> pa.Table:
        """Per block (whole keys, key-sorted): for each key run, sort the
        right rows by (ts, id) once and binary-search every left ts —
        vectorized inside the run; the Python loop is O(distinct keys per
        block), the sessionization budget."""
        if t.num_rows == 0 or "key" not in t.column_names:
            return out_schema.empty_table()
        k = t["key"].to_numpy()
        ts = t["ts_us"].to_numpy()
        rid = t["rid"].to_numpy()
        is_r = t["is_right"].to_numpy().astype(bool)
        out_l, out_k, out_r = [], [], []
        starts, ends = runs(k)
        for s, e in zip(starts, ends):
            rm = is_r[s:e]
            if not rm.any() or rm.all():
                continue
            r_ts, r_id = ts[s:e][rm], rid[s:e][rm]
            order = np.lexsort((r_id, r_ts))
            r_ts, r_id = r_ts[order], r_id[order]
            l_ts, l_id = ts[s:e][~rm], rid[s:e][~rm]
            idx = np.searchsorted(r_ts, l_ts, side="right")
            ok = idx > 0
            if not ok.any():
                continue
            out_l.append(l_id[ok])
            out_k.append(np.full(int(ok.sum()), k[s], dtype=np.int64))
            out_r.append(r_id[idx[ok] - 1])
        if not out_l:
            return out_schema.empty_table()
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_l)),
                pa.array(np.concatenate(out_k)),
                pa.array(np.concatenate(out_r)),
            ],
            schema=out_schema,
        )

    return grouped.map_batches(kernel, batch_size=None, batch_format="pyarrow")


def interval_count_self(
    ds: ray.data.Dataset,
    *,
    key: str,
    ts: str,
    id_col: str,
    window_us: int,
) -> ray.data.Dataset:
    """Interval self-join as a count: for every row, how many OTHER rows
    of the same ``key`` fall in the half-open window
    (ts - window_us, ts]. The streaming rate-counting primitive (events
    per user per trailing hour) — a range join Ray Data has no operator
    for, built as ONE hash exchange on the key + two binary searches per
    row inside each key run (the sessionization partitioning budget).
    Rows with zero neighbors are kept (left-join semantics)."""

    prep_schema = pa.schema(
        [("key", pa.int64()), ("ts_us", pa.int64()), ("rid", pa.int64())]
    )

    def prep(t: pa.Table) -> pa.Table:
        return conform(
            pa.table(
                {
                    "key": t[key].cast(pa.int64()),
                    "ts_us": t[ts].cast(pa.timestamp("us")).cast(pa.int64()),
                    "rid": t[id_col].cast(pa.int64()),
                }
            ),
            prep_schema,
        )

    grouped = hash_grouped(
        ds.map_batches(prep, batch_format="pyarrow"), ["key"], sort=True
    )

    out_schema = pa.schema(
        [("rid", pa.int64()), ("key", pa.int64()), ("n_window", pa.int64())]
    )

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key" not in t.column_names:
            return out_schema.empty_table()
        k = t["key"].to_numpy()
        tsv = t["ts_us"].to_numpy()
        rid = t["rid"].to_numpy()
        out_r, out_k, out_n = [], [], []
        starts, ends = runs(k)
        for s, e in zip(starts, ends):
            sub = np.sort(tsv[s:e])
            upper = np.searchsorted(sub, tsv[s:e], side="right")
            lower = np.searchsorted(sub, tsv[s:e] - window_us, side="right")
            n = upper - lower - 1  # exclude self (always inside its window)
            out_r.append(rid[s:e])
            out_k.append(k[s:e])
            out_n.append(n.astype(np.int64))
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_r)),
                pa.array(np.concatenate(out_k)),
                pa.array(np.concatenate(out_n)),
            ],
            schema=out_schema,
        )

    return grouped.map_batches(kernel, batch_size=None, batch_format="pyarrow")
