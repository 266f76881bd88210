"""NDJSON triple source — re-ingests the engine's own ``-j`` sink output
(ntto-style ``{"s":...,"p":...,"o":...}`` lines, cmd/ntto/ntto.go:36-50
escaping) back into a (subj, pred, obj) Dataset, closing the write→read
loop so downstream pipelines can consume a materialized graph without
the Parquet adjacency.

Same vector/scalar split as the renderer (stages/materialize.py): lines
with no backslash (the overwhelming majority — abbreviation strips the
characters Go escapes) parse with one ``extract_regex`` kernel; lines
containing escapes fall back to a real JSON parse per row."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_FAST_RX = r'^\{"s":"(?P<s>[^"\\]*)","p":"(?P<p>[^"\\]*)","o":"(?P<o>[^"\\]*)"\}$'


def parse_ndjson_batch(batch: pa.Table) -> pa.Table:
    col = batch["text"].combine_chunks()
    m = pc.extract_regex(col, pattern=_FAST_RX)
    s = pc.struct_field(m, "s")
    p = pc.struct_field(m, "p")
    o = pc.struct_field(m, "o")
    misses = pc.is_null(m)
    if pc.any(misses).as_py():
        idx = np.flatnonzero(misses.to_numpy(zero_copy_only=False))
        sv = s.to_numpy(zero_copy_only=False).astype(object)
        pv = p.to_numpy(zero_copy_only=False).astype(object)
        ov = o.to_numpy(zero_copy_only=False).astype(object)
        raw = col.to_numpy(zero_copy_only=False)
        for i in idx:
            rec = json.loads(raw[i])
            sv[i], pv[i], ov[i] = rec["s"], rec["p"], rec["o"]
        s, p, o = (pa.array(v, type=pa.string()) for v in (sv, pv, ov))
    return pa.Table.from_arrays([s, p, o], names=["subj", "pred", "obj"])


def read_ndjson_triples(path: str) -> ray.data.Dataset:
    """Read a directory of ``.ldj`` part files (the NDJSONLinesSink
    layout) into a (subj, pred, obj) Dataset."""
    lines = ray.data.read_text(path, file_extensions=["ldj"])
    return lines.map_batches(parse_ndjson_batch, batch_format="pyarrow")
