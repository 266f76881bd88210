"""Extraction stages: mention detector + entity linker (stateful actor-pool
``map_batches`` classes) and the raw-triple emit (stateless, vectorized).

Pipeline position (see pipelines/kg.py):

    transcripts ─ MentionDetector ─ EntityLinker ─ emit_triples → triples_raw

The detector/linker are the "model" stages of the target contract: state
(compiled patterns, gazetteer) is built once per actor in ``__init__`` and
applied per batch in ``__call__``. The models here are deterministic
(regex IRI detection; exact-token gazetteer lookup) so the whole pipeline
stays hermetic and DuckDB-mirrorable (functions/kgspec.py), but the
plumbing — actor pools, broadcast alias table via ``ray.put``, batched
inference, list-typed mention columns — is exactly what a learned model
would use.

The reference (miku/ntto) has no extraction stage; it starts from NT text
(common.go:41-66). These stages produce the triples that ntto's core
algorithm (prefix abbreviation, stages/prefix.py) then processes.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ntto_ray.functions import kgspec as K

TRIPLES_RAW_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)


def _cc(a):
    """ChunkedArray → contiguous Array (no-op for plain Arrays)."""
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _regroup_distinct(
    parent: np.ndarray, values: pa.Array, n_rows: int
) -> pa.ListArray:
    """(parent row index, value) pairs → ``list<string>`` column of
    per-row DISTINCT values. Vectorized: dedup via a single Arrow
    group_by over the pairs, then ListArray reconstruction from
    np.bincount offsets. List-internal order is unspecified (the
    per-turn DISTINCT contract is order-insensitive — kgspec
    triples_raw_sql uses SELECT DISTINCT)."""
    if len(parent) == 0:
        return _regroup_coded(parent, np.empty(0, np.int64), pa.array([], type=pa.string()), n_rows)
    enc = _cc(pc.dictionary_encode(values))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return _regroup_coded(parent, codes, enc.dictionary, n_rows)


def _regroup_coded(
    parent: np.ndarray, codes: np.ndarray, dictionary: pa.Array, n_rows: int
) -> pa.ListArray:
    """Same as :func:`_regroup_distinct` but for values already encoded as
    integer codes into ``dictionary`` — dedup is one ``np.unique`` over a
    packed (parent, code) int64 key."""
    if len(parent) == 0:
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n_rows + 1, np.int32)), pa.array([], type=pa.string())
        )
    m = max(len(dictionary), 1)
    key = np.unique(parent.astype(np.int64) * m + codes)  # sorted dedup in C
    up, uc = key // m, key % m
    vals = pc.take(dictionary, pa.array(uc))
    counts = np.bincount(up, minlength=n_rows)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), _cc(vals))


class MentionDetector:
    """Actor-pool stage: find IRI mentions ``<...>`` in turn text.

    Adds an ``iri_mentions: list<string>`` column (distinct per turn).
    Fully vectorized Arrow path: split on ``<``, slice each segment at its
    first ``>`` (second split), validity-mask segments that match the IRI
    grammar ``[^<> ]+`` — no Python loop over rows. A compiled-regex
    fallback (``engine="regex"``) keeps the reference semantics checkable
    against an independent implementation in tests.
    """

    def __init__(self, pattern: str = K.IRI_PATTERN, engine: str = "arrow"):
        self._rx = re.compile(pattern)
        self._engine = engine

    def _arrow(self, batch: pa.Table) -> pa.ListArray:
        text = _cc(batch["text"])
        n = batch.num_rows
        parts = pc.split_pattern(text, "<")
        flat = _cc(pc.list_flatten(parts))
        parent = pc.list_parent_indices(parts).to_numpy()
        # first segment of each row precedes any '<' — mask it out
        off = _cc(parts).offsets.to_numpy()
        is_first = np.zeros(len(flat), dtype=bool)
        starts = off[:-1][off[:-1] < len(flat)]
        is_first[starts] = True
        # candidate = segment up to its first '>'; requires a '>' present
        sub = pc.split_pattern(flat, ">", max_splits=1)
        has_close = pc.equal(pc.list_value_length(sub), 2).to_numpy(
            zero_copy_only=False
        )
        cand = pc.list_element(sub, 0)
        ok = (
            ~is_first
            & has_close
            & pc.greater(pc.utf8_length(cand), 0).to_numpy(zero_copy_only=False)
            & ~pc.match_substring(cand, " ").to_numpy(zero_copy_only=False)
        )
        keep = np.flatnonzero(ok)
        return _regroup_distinct(
            parent[keep], pc.take(cand, pa.array(keep)), n
        )

    def _regex(self, batch: pa.Table) -> pa.ListArray:
        rx = self._rx
        mentions = [
            list(dict.fromkeys(rx.findall(t)))
            for t in batch["text"].to_pylist()
        ]
        return pa.array(mentions, type=pa.list_(pa.string()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = self._arrow(batch) if self._engine == "arrow" else self._regex(batch)
        return batch.append_column("iri_mentions", col)


class EntityLinker:
    """Actor-pool stage: link gazetteer aliases in turn text to canonical
    IRIs. The alias table is broadcast once (``ray.put`` on the driver →
    object ref in ``fn_constructor_kwargs``) and fetched once per actor —
    not re-shipped per batch.

    Adds ``entity_mentions: list<string>`` (distinct linked IRIs per
    turn). Vectorized: whitespace tokenize → ``pc.index_in`` against the
    broadcast alias token array (a hash lookup in C) → take canonical
    IRIs — no Python loop over rows or tokens.
    """

    def __init__(self, aliases_ref=None):
        if aliases_ref is not None:
            import ray

            aliases = ray.get(aliases_ref)
        else:
            aliases = dict(K.ALIASES)
        self._tokens = pa.array(list(aliases.keys()), type=pa.string())
        # token code → unique-IRI code (two aliases may share an IRI;
        # per-turn DISTINCT is on the IRI)
        uniq = list(dict.fromkeys(aliases.values()))
        pos = {iri: i for i, iri in enumerate(uniq)}
        self._token_to_iri = np.array(
            [pos[v] for v in aliases.values()], dtype=np.int64
        )
        self._iris = pa.array(uniq, type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = _cc(batch["text"])
        n = batch.num_rows
        # Small gazetteer (≤ ~100 aliases): one C substring scan per alias
        # over space-padded text beats materializing every token as a
        # string. For a large gazetteer, switch to split_pattern +
        # pc.index_in (hash lookup) — same output contract.
        padded = pc.binary_join_element_wise(" ", text, " ", "")
        parents: list[np.ndarray] = []
        codes: list[np.ndarray] = []
        for t, tok in enumerate(self._tokens.to_pylist()):
            hit = np.flatnonzero(
                pc.match_substring(padded, f" {tok} ").to_numpy(
                    zero_copy_only=False
                )
            )
            if len(hit):
                parents.append(hit)
                codes.append(np.full(len(hit), self._token_to_iri[t], np.int64))
        if parents:
            col = _regroup_coded(
                np.concatenate(parents), np.concatenate(codes), self._iris, n
            )
        else:
            col = _regroup_coded(
                np.empty(0, np.int64), np.empty(0, np.int64), self._iris, n
            )
        return batch.append_column("entity_mentions", col)


def _concat(*parts) -> pa.Array:
    return pc.binary_join_element_wise(*parts, "")


def emit_triples(batch: pa.Table) -> pa.Table:
    """Stateless row-expanding stage: one annotated turn → N raw triples.

    Emits (vectorized — list-column flatten via parent indices, no Python
    row loop):
      1. (conv_iri, ont:hasTurn, turn_iri)
      2. (turn_iri, rdf:type, ont:<role>)
      3. one ont:mentions triple per detected IRI
      4. one ont:mentionsEntity triple per linked alias
    Lineage columns (conv_id, turn_idx) ride along for checkpoint /
    partition bookkeeping.
    """
    conv_id = batch["conv_id"].combine_chunks()
    turn_idx = batch["turn_idx"].combine_chunks()
    role = batch["role"].combine_chunks()

    conv_iri = _concat(pa.scalar(K.CONV_NS), conv_id)
    turn_iri = _concat(
        conv_iri, pa.scalar("/turn/"), pc.cast(turn_idx, pa.string())
    )

    n = batch.num_rows
    parts: list[pa.Table] = []

    def mk(subj, pred_scalar_or_arr, obj, cid, tix):
        if isinstance(pred_scalar_or_arr, str):
            pred = pa.array([pred_scalar_or_arr] * len(subj), type=pa.string())
        else:
            pred = pred_scalar_or_arr
        return pa.Table.from_arrays(
            [subj, pred, obj, cid, tix], schema=TRIPLES_RAW_SCHEMA
        )

    # 1. structural hasTurn
    parts.append(mk(conv_iri, K.P_HAS_TURN, turn_iri, conv_id, turn_idx))
    # 2. rdf:type
    parts.append(
        mk(turn_iri, K.RDF_TYPE, _concat(pa.scalar(K.ONT), role), conv_id, turn_idx)
    )
    # 3 & 4. flatten list columns; 5. conversation-level discusses edges
    # (same flatten, conv subject) — these recur across turns, giving the
    # canonicalize shuffle real multiplicities (kgspec.P_DISCUSSES)
    for col, pred in (
        ("iri_mentions", K.P_MENTIONS),
        ("entity_mentions", K.P_MENTIONS_ENTITY),
    ):
        if col not in batch.column_names:
            continue
        lst = batch[col].combine_chunks()
        flat = pc.list_flatten(lst)
        if len(flat) == 0:
            continue
        parent = pc.list_parent_indices(lst)
        cid = conv_id.take(parent)
        tix = turn_idx.take(parent)
        parts.append(mk(turn_iri.take(parent), pred, flat, cid, tix))
        parts.append(mk(conv_iri.take(parent), K.P_DISCUSSES, flat, cid, tix))

    return pa.concat_tables(parts)
