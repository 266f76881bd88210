"""Graph materialize: sorted, bucket-partitioned Parquet adjacency plus
ntto-compatible NDJSON (``{"s":...,"p":...,"o":...}`` lines, byte-parity
escaping with Go's ``encoding/json`` — cmd/ntto/ntto.go:36-50).

The NDJSON render is vectorized: the Go escaping (``\\``, ``"``, control
chars, ``<``/``>``/``&`` → ``\\u003c``/``\\u003e``/``\\u0026``) is a chain
of ``pc.replace_substring`` kernels; rows containing rare control
characters fall back to the scalar renderer (core.render_ndjson_line) via
a mask. Output files are written by a distributed file datasink (one file
per block), never a driver-side loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.block import BlockAccessor
from ray.data.datasource import BlockBasedFileDatasink
from ray.data.datasource.filename_provider import FilenameProvider

from ntto_ray.core import Triple, render_ndjson_line

# Escapes applied in order; backslash first.
_VECTOR_ESCAPES = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("<", "\\u003c"),
    (">", "\\u003e"),
    ("&", "\\u0026"),
    ("\u2028", "\\u2028"),
    ("\u2029", "\\u2029"),
]
_CONTROL_RX = r"[\x00-\x1f]"


def _escape_col(arr: pa.Array) -> pa.Array:
    for pat, repl in _VECTOR_ESCAPES:
        arr = pc.replace_substring(arr, pattern=pat, replacement=repl)
    return arr


def render_ndjson_batch(batch: pa.Table) -> pa.Table:
    """triples batch → single ``line`` column of Go-escaped NDJSON."""
    s = batch["subj"].combine_chunks()
    p = batch["pred"].combine_chunks()
    o = batch["obj"].combine_chunks()

    has_ctrl = pc.or_(
        pc.or_(
            pc.match_substring_regex(s, _CONTROL_RX),
            pc.match_substring_regex(p, _CONTROL_RX),
        ),
        pc.match_substring_regex(o, _CONTROL_RX),
    )

    lines = pc.binary_join_element_wise(
        pa.scalar('{"s":"'),
        _escape_col(s),
        pa.scalar('","p":"'),
        _escape_col(p),
        pa.scalar('","o":"'),
        _escape_col(o),
        pa.scalar('"}'),
        "",
    )

    if pc.any(has_ctrl).as_py():
        idx = np.flatnonzero(has_ctrl.to_numpy(zero_copy_only=False))
        fixed = lines.to_numpy(zero_copy_only=False).astype(object)
        sv, pv, ov = (
            s.to_numpy(zero_copy_only=False),
            p.to_numpy(zero_copy_only=False),
            o.to_numpy(zero_copy_only=False),
        )
        for i in idx:
            fixed[i] = render_ndjson_line(Triple(sv[i], pv[i], ov[i]))
        lines = pa.array(fixed, type=pa.string())

    return pa.Table.from_arrays([lines], names=["line"])


class _StableNames(FilenameProvider):
    """Deterministic part names (``part-<task>-<block>.ldj``) instead of
    Ray's default ``<write_uuid>_...`` — byte-stable reruns need stable
    names, and a resumed run can overwrite parts idempotently."""

    def get_filename_for_block(self, block, write_uuid, task_index, block_index):
        return f"part-{task_index:06d}-{block_index:06d}.ldj"


class NDJSONLinesSink(BlockBasedFileDatasink):
    """Distributed sink writing the ``line`` column raw, one NDJSON file
    per block."""

    def __init__(self, path: str, **kwargs):
        kwargs.setdefault("filename_provider", _StableNames())
        super().__init__(path, file_format="ldj", **kwargs)

    def write_block_to_file(self, block: BlockAccessor, file) -> None:
        tbl = block.to_arrow()
        # append "\n" per line, then write the string array's VALUES
        # buffer directly — the concatenated bytes of all lines, no
        # Python-level join over millions of strings
        col = pc.binary_join_element_wise(
            tbl["line"].combine_chunks(), pa.scalar("\n"), ""
        )
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count == 0 and len(col):
            off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
            offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
                col.offset : col.offset + len(col) + 1
            ]
            file.write(memoryview(col.buffers()[2])[offs[0] : offs[-1]])
        elif len(col):
            file.write("".join(col.to_pylist()).encode("utf-8"))


def _sort_block_triples(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return t
    keys = [(c, "ascending") for c in ("subj", "pred", "obj") if c in t.column_names]
    return t.sort_by(keys) if keys else t


def write_ndjson(
    triples: ray.data.Dataset, path: str, *, stable: bool = True
) -> None:
    """Render + write ntto-style NDJSON to ``path`` (a directory of .ldj
    part files — resumable layout, never one giant file).

    ``stable=True`` (default) makes two runs over the same input
    byte-identical — the reference's ``-w``>1 channel fan-in is
    explicitly order-nondeterministic (ntto.go:174-199); this sink fixes
    that: ``preserve_order`` pins the executor's block order to the
    (deterministic) input order, and a per-block C++ sort on
    (subj, pred, obj) pins row order WITHIN each block, which an
    upstream hash exchange otherwise leaves at shard-arrival order."""
    if stable:
        triples.context.execution_options.preserve_order = True
        triples = triples.map_batches(
            _sort_block_triples, batch_size=None, batch_format="pyarrow"
        )
    lines = triples.map_batches(render_ndjson_batch, batch_format="pyarrow")
    lines.write_datasink(NDJSONLinesSink(path))


def _add_subj_bucket(batch: pa.Table, *, buckets: int) -> pa.Table:
    h = pd.util.hash_array(
        np.asarray(batch["subj"].to_numpy(zero_copy_only=False), dtype=object)
    )
    return batch.append_column(
        "subj_bucket", pa.array((h % buckets).astype("int64"))
    )


def _sort_block_by_subj(t: pa.Table) -> pa.Table:
    """Full (subj, pred, obj) block sort: subject-clusters the row groups
    AND makes each bucket's parquet bytes deterministic across runs (a
    subj-only sort leaves tie order at shard-arrival order)."""
    if t.num_rows == 0 or "subj" not in t.column_names:
        return t
    keys = [(c, "ascending") for c in ("subj", "pred", "obj") if c in t.column_names]
    return t.sort_by(keys)


def write_adjacency(
    canonical: ray.data.Dataset,
    path: str,
    *,
    buckets: int = 64,
    sort: bool = True,
) -> None:
    """Materialize canonical triples as Parquet adjacency partitioned by
    subject hash bucket (``partition_cols=["subj_bucket"]``): co-locates
    each subject's edges, bounds file sizes, and gives a rerun a
    per-bucket resume unit. ``sort=True`` additionally sorts each bucket
    by subject so its row groups are subject-clustered.

    At most one hash exchange on the bucket id + a per-block C++ sort —
    NOT a global range sort: a global sort is a second all-to-all whose
    output blocks each straddle many hash buckets, so the partitioned
    write shredded every block into up to ``buckets`` tiny files.

    If ``canonical`` already carries a ``subj_bucket`` column (the
    ``canonicalize(keep_bucket=True)`` path), its blocks ARE the bucket
    partitions — no exchange at all, just the per-block sort + write."""
    if "subj_bucket" in (canonical.schema().names or []):
        ds = canonical
    else:
        from ntto_ray.stages.exchange import hash_grouped

        ds = canonical.map_batches(
            _add_subj_bucket, batch_format="pyarrow", fn_kwargs={"buckets": buckets}
        )
        ds = hash_grouped(ds, ["subj_bucket"], parallelism=buckets, sort=False)
    if sort:
        ds = ds.map_batches(
            _sort_block_by_subj, batch_size=None, batch_format="pyarrow"
        )
    ds.write_parquet(path, partition_cols=["subj_bucket"])
