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
    clique-like (diameter 1-2), so 2-3 rounds in practice; ``max_rounds``
    guards pathological chains.

    Returns (doc_id, component) with component = min node id reachable —
    matching the transitive-closure SQL oracle exactly."""
    from ray.data.aggregate import Min

    edges = pairs.select_columns([a_col, b_col]).materialize()

    # node set + initial labels (result-scale driver arrays, sorted)
    a_ids = np.unique(
        np.concatenate(
            [
                edges.unique(a_col),
                edges.unique(b_col),
            ]
        ).astype(np.int64)
    )
    labels = a_ids.copy()

    for _ in range(max_rounds):
        ref = ray.put((a_ids, labels))

        class PushMin:
            def __init__(self, ref):
                self.nodes, self.labels = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return pa.schema(
                        [("node", pa.int64()), ("lab", pa.int64())]
                    ).empty_table()
                a = t[a_col].to_numpy().astype(np.int64)
                b = t[b_col].to_numpy().astype(np.int64)
                la = self.labels[np.searchsorted(self.nodes, a)]
                lb = self.labels[np.searchsorted(self.nodes, b)]
                m = np.minimum(la, lb)
                return pa.table(
                    {
                        "node": np.concatenate([a, b]),
                        "lab": np.concatenate([m, m]),
                    }
                )

        pushed = edges.map_batches(
            PushMin,
            batch_format="pyarrow",
            concurrency=(1, 4),
            fn_constructor_kwargs={"ref": ref},
        )
        folded = (
            pushed.groupby("node")
            .aggregate(Min("lab", alias_name="lab"))
            .to_pandas()
            .sort_values("node")
        )
        new_labels = labels.copy()
        idx = np.searchsorted(a_ids, folded["node"].to_numpy())
        np.minimum.at(new_labels, idx, folded["lab"].to_numpy())
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels

    return pa.table({"doc_id": a_ids, "component": labels})
