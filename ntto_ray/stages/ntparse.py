"""N-Triples parse/render as Ray Data stages — the reference's JSON-convert
path (``ntto -j``, cmd/ntto/ntto.go:162-206) re-expressed as a streaming
``read_text → map_batches`` topology.

The parser reproduces ParseNTriple's quirky semantics exactly
(common.go:41-66, see core.parse_ntriple). Hot path: a single
``pc.extract_regex`` kernel handles the dominant well-formed shapes
(no internal whitespace in the object); rows that don't match fall back
to the scalar conformance parser. Unlike the reference's worker pool
(order-nondeterministic channel fan-in, ntto.go:174-199), block order is
deterministic under Ray Data with ``preserve_order``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ntto_ray.core import _GO_WS, BrokenInputError, parse_ntriple

# well-formed fast path: exactly 3 tokens (+ optional final dot). The
# separator/token classes use the full Go-whitespace set (_GO_WS), not
# just ASCII space/tab — strings.Fields splits on NBSP, NEL and the
# U+2000-U+3000 space separators too, so a line like '<a> <b> <c\xa0d> .'
# must MISS the fast path and take the scalar parser (which yields
# obj 'c d'), keeping the module's exact-parity contract.
_WS = _GO_WS
_FAST_RX = rf"^(?P<s>[^{_WS}]+)[{_WS}]+(?P<p>[^{_WS}]+)[{_WS}]+(?P<o>[^{_WS}]+)(?:[{_WS}]+\.)?$"


def _trim(arr: pa.Array) -> pa.Array:
    return pc.utf8_trim(arr, characters='<>"')


def parse_nt_batch(batch: pa.Table, *, on_error: str = "raise") -> pa.Table:
    """lines → (s, p, o) columns. ``on_error``: 'raise' (reference default,
    ntto.go:26-28) or 'drop' (the ``-i`` flag as a sane drop-row policy —
    the reference would forward a nil triple, ntto.go:29-31)."""
    col = batch["text"].combine_chunks() if "text" in batch.column_names else batch[0]
    # Go TrimSpace parity: Arrow's utf8_trim_whitespace also strips the
    # ASCII separator controls \x1c-\x1f, which Go's unicode.IsSpace
    # does not — trim exactly the Go set.
    col = pc.utf8_trim(col, characters=_GO_WS)
    m = pc.extract_regex(col, pattern=_FAST_RX)
    ok = pc.is_valid(m)
    s = pc.struct_field(m, "s")
    p = pc.struct_field(m, "p")
    o = pc.struct_field(m, "o")

    # fast-path trims; note the fast path can't see >4-token objects, and a
    # line like "a b c ." matches with o="c" — identical to words[2].
    s, p, o = _trim(s), _trim(p), _trim(o)

    if not pc.all(ok).as_py():
        idx = np.flatnonzero(np.logical_not(ok.to_numpy(zero_copy_only=False)))
        sv = s.to_numpy(zero_copy_only=False).astype(object)
        pv = p.to_numpy(zero_copy_only=False).astype(object)
        ov = o.to_numpy(zero_copy_only=False).astype(object)
        lines = col.to_numpy(zero_copy_only=False)
        drop = np.zeros(len(lines), dtype=bool)
        for i in idx:
            try:
                t = parse_ntriple(lines[i])
                sv[i], pv[i], ov[i] = t.s, t.p, t.o
            except BrokenInputError:
                if on_error == "raise":
                    raise
                drop[i] = True
        keep = ~drop
        return pa.Table.from_arrays(
            [
                pa.array(sv[keep], type=pa.string()),
                pa.array(pv[keep], type=pa.string()),
                pa.array(ov[keep], type=pa.string()),
            ],
            names=["subj", "pred", "obj"],
        )

    return pa.Table.from_arrays([s, p, o], names=["subj", "pred", "obj"])


def render_nt_batch(batch: pa.Table) -> pa.Table:
    """(subj, pred, obj) → canonical NT lines ``<s> <p> <o> .`` (IRI-style
    brackets; note the reference's parser strips them regardless of
    whether the value is an IRI)."""
    line = pc.binary_join_element_wise(
        pa.scalar("<"),
        batch["subj"].combine_chunks(),
        pa.scalar("> <"),
        batch["pred"].combine_chunks(),
        pa.scalar("> <"),
        batch["obj"].combine_chunks(),
        pa.scalar("> ."),
        "",
    )
    return pa.Table.from_arrays([line], names=["line"])


def read_nt(paths: str | list[str], *, on_error: str = "raise") -> ray.data.Dataset:
    """NT file(s) → triples Dataset (streaming line source + vectorized
    parse)."""
    lines = ray.data.read_text(paths)
    return lines.map_batches(
        parse_nt_batch, batch_format="pyarrow", fn_kwargs={"on_error": on_error}
    )
