"""Graph operators over pair/edge datasets — the clustering step that
turns near-duplicate PAIRS (jaccard_pairs / simhash_pairs /
minhash_lsh_pairs) into duplicate GROUPS, so a corpus-dedup pipeline can
keep one canonical document per component.

Scale contract: the EDGE set stays a distributed Dataset throughout
(each round is one vectorized map over edge blocks + one grouped min
aggregate). Only the LABEL table materializes per round — its size is
the number of near-duplicate documents, i.e. result-scale (bounded by
the dup rate, not the corpus), the same budget as the repo's broadcast
dimension tables. A corpus whose *duplicate* set alone exceeds driver
memory would need the labels kept as a Dataset and a join per round —
documented trade-off, not the common case."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


class UnconvergedComponentsError(RuntimeError):
    """Label propagation hit ``max_rounds`` before reaching a fixpoint —
    returning the partial labels would silently split real components."""


def connected_components(
    pairs: ray.data.Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 50,
) -> pa.Table:
    """Connected components of the undirected pair graph by min-label
    propagation: every node's label starts as its own id; each round,
    every edge pushes ``min(label[a], label[b])`` to both endpoints and a
    grouped min folds the pushes; converged when no label changes. Round
    count is bounded by the component diameter — near-dup components are
    clique-like (diameter 1-2), so 2-3 rounds in practice; a path graph
    of diameter > ``max_rounds`` raises UnconvergedComponentsError
    rather than silently returning split components.

    Returns (doc_id, component) with component = min node id reachable —
    matching the transitive-closure SQL oracle exactly."""
    from ray.data.aggregate import Min

    edges = pairs.select_columns([a_col, b_col]).materialize()

    # node set: ONE distributed pass over both endpoint columns
    def emit_nodes(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy().astype(np.int64)
        b = t[b_col].to_numpy().astype(np.int64)
        return pa.table({"node": np.unique(np.concatenate([a, b]))})

    nodes = np.array(
        sorted(
            edges.map_batches(emit_nodes, batch_format="pyarrow").unique("node")
        ),
        dtype=np.int64,
    )
    labels = nodes.copy()

    def push_min(t: pa.Table, *, ref) -> pa.Table:
        """Per edge block: push min(label[a], label[b]) to both ends,
        then FOLD within the block (np.minimum.at over the block's
        distinct nodes) — the round's shuffle moves node-scale partials,
        not 2×edges rows. Plain task (not an actor pool) — the label ref
        changes every round, so per-round actor spin-up would only add
        overhead."""
        if t.num_rows == 0:
            return pa.schema([("node", pa.int64()), ("lab", pa.int64())]).empty_table()
        node_arr, lab_arr = ray.get(ref)
        a = t[a_col].to_numpy().astype(np.int64)
        b = t[b_col].to_numpy().astype(np.int64)
        la = lab_arr[np.searchsorted(node_arr, a)]
        lb = lab_arr[np.searchsorted(node_arr, b)]
        m = np.minimum(la, lb)
        touched = np.concatenate([a, b])
        pushed = np.concatenate([m, m])
        uniq, inv = np.unique(touched, return_inverse=True)
        part = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(part, inv, pushed)
        return pa.table({"node": uniq, "lab": part})

    for _ in range(max_rounds):
        ref = ray.put((nodes, labels))
        folded = (
            edges.map_batches(push_min, batch_format="pyarrow", fn_kwargs={"ref": ref})
            .groupby("node")
            .aggregate(Min("lab", alias_name="lab"))
            .to_pandas()
        )
        new_labels = labels.copy()
        idx = np.searchsorted(nodes, folded["node"].to_numpy())
        np.minimum.at(new_labels, idx, folded["lab"].to_numpy())
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    else:
        raise UnconvergedComponentsError(
            f"no fixpoint after {max_rounds} rounds — component diameter "
            f"exceeds max_rounds; raise max_rounds for chain-like graphs"
        )

    return pa.table({"doc_id": nodes, "component": labels})
