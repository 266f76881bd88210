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


def _components_unionfind(
    a: np.ndarray, b: np.ndarray
) -> pa.Table:
    """Driver-side union-find for RESULT-SCALE pair sets (the near-dup
    graph is bounded by the dup rate, not the corpus): path-halving +
    union-by-label keeps it linear-ish; labels are canonicalized to the
    min member id, identical to min-label propagation's fixpoint."""
    nodes = np.unique(np.concatenate([a, b]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(idx[x]), find(idx[y])
        if rx != ry:
            # union toward the smaller node id → root IS the min member
            if nodes[rx] < nodes[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    labels = nodes[[find(i) for i in range(len(nodes))]]
    return pa.table({"doc_id": nodes, "component": labels})


def connected_components(
    pairs: ray.data.Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 50,
    small_edge_threshold: int = 200_000,
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
    matching the transitive-closure SQL oracle exactly.

    Adaptive execution: a pair set at or under ``small_edge_threshold``
    collects to the driver and resolves by union-find in one step —
    each distributed round costs seconds of fixed scheduling overhead,
    which dominates utterly on the result-scale graphs near-dup dedup
    actually produces. The distributed min-label rounds remain the
    path for graphs past the threshold; both produce the identical
    min-member labeling."""
    from ray.data.aggregate import Min

    edges = pairs.select_columns([a_col, b_col]).materialize()

    if edges.count() <= small_edge_threshold:
        df = edges.to_pandas()
        if not len(df):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "component": pa.array([], pa.int64()),
                }
            )
        return _components_unionfind(
            df[a_col].to_numpy().astype(np.int64),
            df[b_col].to_numpy().astype(np.int64),
        )

    # node set: ONE distributed pass over both endpoint columns
    def emit_nodes(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy().astype(np.int64)
        b = t[b_col].to_numpy().astype(np.int64)
        return pa.table({"node": np.unique(np.concatenate([a, b]))})

    nodes = np.array(
        sorted(
            edges.map_batches(emit_nodes, batch_format="pyarrow").unique("node")
        or []
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


def khop_distances(
    edges_ds: ray.data.Dataset,
    seeds: np.ndarray,
    *,
    src_col: str = "subj",
    dst_col: str = "obj",
    k: int = 4,
) -> pa.Table:
    """Exact BFS hop distance (capped at ``k``) from a seed node set over
    a directed string-node edge dataset — BSP frontier expansion, the
    textbook distributed-BFS shape: each round is ONE vectorized pass
    over the edge blocks (mask sources in the broadcast frontier via
    searchsorted, fold to per-block distinct destinations) and the
    round's exchange moves node-scale partials only. The edge set never
    leaves the object store; only the distance vector (node-scale, the
    same bounded driver budget as :func:`pagerank_int`) materializes.
    Rounds stop early when a frontier empties.

    Returns (node, dist) for reached nodes only, dist in [0, k]."""
    edges = edges_ds.select_columns([src_col, dst_col]).materialize()

    def emit_nodes(t: pa.Table) -> pa.Table:
        a = t[src_col].to_numpy(zero_copy_only=False)
        b = t[dst_col].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.unique(np.concatenate([a, b]))})

    node_list = sorted(
        edges.map_batches(emit_nodes, batch_format="pyarrow").unique("node")
        or []
    )
    out_schema = pa.schema([("node", pa.string()), ("dist", pa.int64())])
    if not node_list:
        return out_schema.empty_table()
    nodes = np.array(node_list)  # unicode dtype → searchsorted in C
    nodes_ref = ray.put(nodes)
    n = len(nodes)

    dist = np.full(n, -1, dtype=np.int64)
    seed_idx = np.searchsorted(nodes, seeds)
    ok = (seed_idx < n) & (nodes[np.minimum(seed_idx, n - 1)] == seeds)
    dist[seed_idx[ok]] = 0

    for r in range(k):
        frontier = np.flatnonzero(dist == r)
        if not len(frontier):
            break
        f_ref = ray.put(frontier)  # sorted by construction

        def expand(t: pa.Table, *, ref=f_ref) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema([("i", pa.int64())]).empty_table()
            nd, fr = ray.get(nodes_ref), ray.get(ref)
            sid = np.searchsorted(nd, t[src_col].to_numpy(zero_copy_only=False))
            pos = np.searchsorted(fr, sid)
            hit = (pos < len(fr)) & (fr[np.minimum(pos, len(fr) - 1)] == sid)
            did = np.searchsorted(
                nd, t[dst_col].to_numpy(zero_copy_only=False)
            )[hit]
            return pa.table({"i": np.unique(did).astype(np.int64)})

        # a dead-end frontier (no out-edges) yields an EMPTY dataset,
        # whose unique() comes back None — guard rather than iterate it
        reached = (
            edges.map_batches(expand, batch_format="pyarrow").unique("i")
            or []
        )
        new = np.array(sorted(reached), dtype=np.int64)
        if len(new):
            fresh = new[dist[new] < 0]
            dist[fresh] = r + 1

    hit_idx = np.flatnonzero(dist >= 0)
    return pa.table(
        {
            "node": pa.array(nodes[hit_idx].tolist(), pa.string()),
            "dist": pa.array(dist[hit_idx]),
        }
    )


def kcore_peel(
    edges_ds: ray.data.Dataset,
    *,
    src_col: str = "subj",
    dst_col: str = "obj",
    k: int = 3,
    rounds: int = 6,
) -> pa.Table:
    """Bounded-round k-core peeling over the undirected simple
    projection of a string-node edge dataset: each round removes every
    node whose degree in the current induced subgraph is < ``k``. The
    round count is FIXED (not iterate-to-fixpoint) so the distributed
    result is definitionally identical to the unrolled SQL mirror —
    both sides compute exactly ``rounds`` peels; near-clique graphs
    converge in 2-3. Per round: ONE vectorized pass over the edge
    blocks (mask both endpoints against the broadcast alive vector,
    fold per-block degree partials) + one node-scale grouped Sum.
    Edge distinctness is established once up front by a packed-key
    hash exchange (degree counts distinct neighbors, so parallel
    edges must collapse globally before counting).

    Returns (node,) — the nodes surviving ``rounds`` peels."""
    from ray.data.aggregate import Sum

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    edges = edges_ds.select_columns([src_col, dst_col]).materialize()

    def emit_nodes(t: pa.Table) -> pa.Table:
        a = t[src_col].to_numpy(zero_copy_only=False)
        b = t[dst_col].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.unique(np.concatenate([a, b]))})

    node_list = sorted(
        edges.map_batches(emit_nodes, batch_format="pyarrow").unique("node")
        or []
    )
    if not node_list:
        return pa.table({"node": pa.array([], pa.string())})
    nodes = np.array(node_list)
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    _PK = pa.schema([("pk", pa.int64())])

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PK.empty_table()
        nd = ray.get(nodes_ref)
        a = np.searchsorted(nd, t[src_col].to_numpy(zero_copy_only=False))
        b = np.searchsorted(nd, t[dst_col].to_numpy(zero_copy_only=False))
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"pk": np.unique(lo * n + hi)})

    def uniq(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pk" not in t.column_names:
            return _PK.empty_table()
        return pa.table({"pk": np.unique(t["pk"].to_numpy())})

    und = hash_grouped(
        edges.map_batches(pack, batch_size=65536, batch_format="pyarrow"),
        ["pk"],
        sort=False,
    ).map_batches(
        uniq, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    ).materialize()

    alive = np.ones(n, dtype=bool)
    for _ in range(rounds):
        alive_ref = ray.put(alive)

        def deg_partial(t: pa.Table, *, ref=alive_ref) -> pa.Table:
            if t.num_rows == 0 or "pk" not in t.column_names:
                return pa.schema(
                    [("i", pa.int64()), ("c", pa.int64())]
                ).empty_table()
            av = ray.get(ref)
            pk = t["pk"].to_numpy()
            a, b = pk // n, pk % n
            keep = av[a] & av[b]
            both = np.concatenate([a[keep], b[keep]])
            u, c = np.unique(both, return_counts=True)
            return pa.table({"i": u.astype(np.int64), "c": c.astype(np.int64)})

        dp = (
            und.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("i")
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
        deg = np.zeros(n, dtype=np.int64)
        if len(dp):
            deg[dp["i"].to_numpy()] = dp["c"].to_numpy()
        new_alive = alive & (deg >= k)
        if np.array_equal(new_alive, alive):
            break  # fixpoint — further rounds are identity on both sides
        alive = new_alive

    return pa.table(
        {"node": pa.array(nodes[np.flatnonzero(alive)].tolist(), pa.string())}
    )


def pagerank_int(
    edges_ds: ray.data.Dataset,
    *,
    src_col: str = "subj",
    dst_col: str = "obj",
    iterations: int = 10,
    scale: int = 10**9,
    damping_pct: int = 85,
) -> pa.Table:
    """Fixed-iteration PageRank over a directed MULTIGRAPH of string
    nodes (every edge row contributes — parallel edges weight the link),
    in pure int64 arithmetic so the result is deterministic and
    order-independent:

        pr'[v] = (100-d)*scale // 100  +  d * Σ_{u→v}(pr[u] // out[u]) // 100

    Integer sums are exact under any reduction order, so the distributed
    result is bit-identical to the unrolled SQL mirror (no float
    accumulation-order hazard). Dangling mass (nodes with no out-edges)
    is dropped, the usual simplification; ranks are comparable, not a
    probability distribution.

    Scale contract: the EDGE set stays a distributed Dataset; each round
    is one vectorized map over edge blocks (per-block np.add.at fold on
    the block's distinct destinations) + one grouped Sum, so the shuffle
    moves node-scale partials. Only the rank vector materializes on the
    driver (node-scale — the same bounded budget as
    :func:`connected_components` labels). int64 headroom: per-node
    in-sums are bounded by total mass n*scale, so keep
    n * scale * damping_pct < 2^63 (shrink ``scale`` for billion-node
    graphs)."""
    from ray.data.aggregate import Sum

    edges = edges_ds.select_columns([src_col, dst_col]).materialize()

    def emit_nodes(t: pa.Table) -> pa.Table:
        a = t[src_col].to_numpy(zero_copy_only=False)
        b = t[dst_col].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.unique(np.concatenate([a, b]))})

    node_list = sorted(
        edges.map_batches(emit_nodes, batch_format="pyarrow").unique("node")
        or []
    )
    if not node_list:
        return pa.table(
            {"node": pa.array([], pa.string()), "pr": pa.array([], pa.int64())}
        )
    nodes = np.array(node_list)  # unicode dtype → searchsorted in C
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("i", pa.int64()), ("c", pa.int64())]).empty_table()
        nd = ray.get(nodes_ref)
        sid = np.searchsorted(nd, t[src_col].to_numpy(zero_copy_only=False))
        u, c = np.unique(sid, return_counts=True)
        return pa.table({"i": u.astype(np.int64), "c": c.astype(np.int64)})

    degp = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("i")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    odeg = np.zeros(n, dtype=np.int64)
    odeg[degp["i"].to_numpy()] = degp["c"].to_numpy()
    odeg_ref = ray.put(odeg)

    base = (100 - damping_pct) * scale // 100
    pr = np.full(n, scale, dtype=np.int64)
    for _ in range(iterations):
        pr_ref = ray.put(pr)

        def push(t: pa.Table, *, ref=pr_ref) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema(
                    [("i", pa.int64()), ("c", pa.int64())]
                ).empty_table()
            nd = ray.get(nodes_ref)
            od = ray.get(odeg_ref)
            p = ray.get(ref)
            sid = np.searchsorted(nd, t[src_col].to_numpy(zero_copy_only=False))
            did = np.searchsorted(nd, t[dst_col].to_numpy(zero_copy_only=False))
            contrib = p[sid] // od[sid]  # od > 0: sid only occurs as a source
            u, inv = np.unique(did, return_inverse=True)
            part = np.zeros(len(u), dtype=np.int64)
            np.add.at(part, inv, contrib)
            return pa.table({"i": u.astype(np.int64), "c": part})

        sp = (
            edges.map_batches(push, batch_format="pyarrow")
            .groupby("i")
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
        sums = np.zeros(n, dtype=np.int64)
        if len(sp):
            sums[sp["i"].to_numpy()] = sp["c"].to_numpy()
        pr = base + damping_pct * sums // 100

    return pa.table(
        {"node": pa.array(nodes.tolist(), pa.string()), "pr": pa.array(pr)}
    )
