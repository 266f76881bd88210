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


class MentionDetector:
    """Actor-pool stage: find IRI mentions ``<...>`` in turn text.

    Adds an ``iri_mentions: list<string>`` column (distinct per turn,
    first-occurrence order). The pattern is compiled once per actor.
    """

    def __init__(self, pattern: str = K.IRI_PATTERN):
        self._rx = re.compile(pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rx = self._rx
        texts = batch["text"].to_pylist()
        mentions = [list(dict.fromkeys(rx.findall(t))) for t in texts]
        return batch.append_column(
            "iri_mentions", pa.array(mentions, type=pa.list_(pa.string()))
        )


class EntityLinker:
    """Actor-pool stage: link gazetteer aliases in turn text to canonical
    IRIs. The alias table is broadcast once (``ray.put`` on the driver →
    object ref in ``fn_constructor_kwargs``) and fetched once per actor —
    not re-shipped per batch.

    Adds ``entity_mentions: list<string>`` (distinct linked IRIs per turn,
    alias-order stable).
    """

    def __init__(self, aliases_ref=None):
        if aliases_ref is not None:
            import ray

            self._aliases = ray.get(aliases_ref)
        else:
            self._aliases = dict(K.ALIASES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        aliases = self._aliases
        texts = batch["text"].to_pylist()
        linked = []
        for t in texts:
            seen: dict[str, None] = {}
            for tok in t.split(" "):
                iri = aliases.get(tok)
                if iri is not None:
                    seen[iri] = None
            linked.append(list(seen))
        return batch.append_column(
            "entity_mentions", pa.array(linked, type=pa.list_(pa.string()))
        )


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
