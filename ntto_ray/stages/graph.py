"""Graph operators over pair/edge datasets — the clustering step that
turns near-duplicate PAIRS (jaccard_pairs / simhash_pairs /
minhash_lsh_pairs) into duplicate GROUPS, so a corpus-dedup pipeline can
keep one canonical document per component.

Scale contract — THREE regimes, chosen by measured input size, every
one producing the identical result (tests pin them against each other):

* ``fold`` (edge count ≤ ``fold_edges``): the per-round reduce skips
  the grouped exchange entirely — per-block partials come straight to
  the driver (partial volume ≤ edge rows by construction) and fold with
  ``np.add.at`` / ``np.minimum.at``. Exchanges cost seconds of fixed
  scheduling overhead per round; on test-scale graphs they dominated
  utterly (kg_pagerank spent ~90 % of its wall time in 10 tiny
  all-to-alls).
* ``driver vectors`` (node count ≤ ``max_driver_nodes``): the original
  shape — edge Dataset stays distributed, per-round grouped aggregate
  pre-reduces to node scale, only the label/rank vector lives on the
  driver and broadcasts per round.
* ``dataset labels`` (past ``max_driver_nodes``): NO node-scale driver
  state at all — labels/ranks/frontiers are themselves Datasets, each
  round is a tag-union hash exchange joining state into edges (push)
  plus one joining messages back into state (apply). This is the
  100×-node path a 10⁹-node graph needs (a driver vector would be tens
  of GB broadcast per round)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

# Regime thresholds. fold: per-round partial volume is bounded by the
# edge count, so ≤5M edges collects in one cheap driver fold. driver
# vectors: a 50M-node int64 vector is 400 MB — the upper end of what a
# driver can rebroadcast per round; past it, labels become a Dataset.
FOLD_EDGES = 5_000_000
MAX_DRIVER_NODES = 50_000_000


def _env_regime(
    fold_edges: int,
    max_driver_nodes: int,
    small_edge_threshold: int | None = None,
):
    """Bench/debug regime override. ``NTTO_GRAPH_REGIME=vector`` forces
    past the driver-fold shortcut (fold_edges=0, and the union-find
    shortcut where present); ``=dataset`` additionally forces the
    dataset-resident-labels path (max_driver_nodes=0) so a bench row or
    an oracle run can exercise the 100×-node regime on a test-scale
    graph. Unset/``auto`` leaves the measured-size thresholds alone;
    explicit kwargs from tests compose (the override only tightens)."""
    import os

    r = os.environ.get("NTTO_GRAPH_REGIME", "auto")
    if r in ("vector", "dataset"):
        fold_edges = 0
        if small_edge_threshold is not None:
            small_edge_threshold = 0
        if r == "dataset":
            max_driver_nodes = 0
    if small_edge_threshold is None:
        return fold_edges, max_driver_nodes
    return fold_edges, max_driver_nodes, small_edge_threshold


class UnconvergedComponentsError(RuntimeError):
    """Label propagation hit ``max_rounds`` before reaching a fixpoint —
    returning the partial labels would silently split real components."""


def _run_pregel(
    edges: ray.data.Dataset,
    *,
    nparts: int,
    split_fn,
    build_fn,
    init_fn,
    push_fn,
    apply_fn,
    emit_fn,
    rounds: int,
    empty_result: pa.Table,
    sort_by=None,
    round_arg: bool = False,
    convergence: str | None = "apply",
    on_unconverged=None,
) -> pa.Table:
    """THE static-partition Pregel scaffold (Malewicz et al., SIGMOD'10)
    shared by every dataset-labels graph engine here — raw Ray tasks,
    the repo's documented last resort, because an iterative fixed-point
    over a STATIC co-partitioned side is the one shape the Dataset API
    can't express (Datasets carry no partitioning metadata across
    operations; the old tag-union formulation re-shuffled the full edge
    set twice per round). Edge blocks split into ``nparts`` bucket
    pieces exactly ONCE; after that only node-scale messages move.

    Callback contract (each runs as a 1-CPU Ray task; bucket state and
    the P×P message grid live in the object store — the driver holds
    only refs plus one int per bucket per round):

    * ``split_fn(block) -> tuple[P pieces]`` — route one edge block's
      contents to their owner buckets.
    * ``build_fn(*pieces) -> pack`` — assemble one bucket's static
      side (node vector, deduped arc routing, per-target slices).
    * ``init_fn(pack) -> state`` — the bucket's round-0 state.
    * ``push_fn(pack, state[, r]) -> tuple[P messages]`` (or, with
      ``convergence="push"``, ``(new_state, count, *P messages)``) —
      one superstep's send side.
    * ``apply_fn(pack, state[, r], *messages) -> (state, count)``
      (``convergence="apply"``) or ``-> state``
      (``convergence=None``) — fold the ≤P inbound messages.
    * ``emit_fn(pack, state) -> pa.Table`` — the bucket's result rows.

    Convergence modes: ``"apply"`` stops when the apply-side counts sum
    to 0 (components' changed-labels, BFS's newly-reached); ``"push"``
    checks the push-side count BEFORE apply runs (k-core's kills — no
    kill ⇒ fixpoint, the decrements can be skipped); ``None`` runs
    exactly ``rounds`` supersteps (pagerank). ``round_arg=True`` passes
    the superstep index to push/apply (BFS engines, where the round IS
    the distance). If the round budget runs out before a fixpoint,
    ``on_unconverged`` (when given) is called to raise; otherwise the
    last state is emitted (k-core's bounded-round contract)."""
    split_r = ray.remote(num_cpus=1)(split_fn)
    build_r = ray.remote(num_cpus=1)(build_fn)
    init_r = ray.remote(num_cpus=1)(init_fn)
    push_r = ray.remote(num_cpus=1)(push_fn)
    apply_r = ray.remote(num_cpus=1)(apply_fn)
    emit_r = ray.remote(num_cpus=1)(emit_fn)

    block_refs = []
    for bundle in edges.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    if not block_refs:
        return empty_result

    split_out = [
        split_r.options(num_returns=nparts).remote(ref) for ref in block_refs
    ]
    packs = [
        build_r.remote(*[so[b] for so in split_out]) for b in range(nparts)
    ]
    states = [init_r.remote(p) for p in packs]
    converged = convergence is None
    for r in range(rounds):
        extra = (r,) if round_arg else ()
        if convergence == "push":
            # push returns 2 + nparts objects: new_state, count, msg_0…
            # — the driver ray.gets ONLY the count ints (state stays
            # remote); no count ⇒ fixpoint, apply is skipped entirely
            pushed = [
                push_r.options(num_returns=nparts + 2).remote(
                    packs[b], states[b], *extra
                )
                for b in range(nparts)
            ]
            states = [p[0] for p in pushed]
            if sum(ray.get([p[1] for p in pushed])) == 0:
                converged = True
                break
            states = [
                apply_r.remote(
                    packs[tb],
                    states[tb],
                    *extra,
                    *[pushed[sb][tb + 2] for sb in range(nparts)],
                )
                for tb in range(nparts)
            ]
            continue
        msgs = [
            push_r.options(num_returns=nparts).remote(
                packs[b], states[b], *extra
            )
            for b in range(nparts)
        ]
        if convergence == "apply":
            outs = [
                apply_r.options(num_returns=2).remote(
                    packs[tb],
                    states[tb],
                    *extra,
                    *[msgs[sb][tb] for sb in range(nparts)],
                )
                for tb in range(nparts)
            ]
            states = [o[0] for o in outs]
            if sum(ray.get([o[1] for o in outs])) == 0:
                converged = True
                break
        else:
            states = [
                apply_r.remote(
                    packs[tb],
                    states[tb],
                    *extra,
                    *[msgs[sb][tb] for sb in range(nparts)],
                )
                for tb in range(nparts)
            ]
    if not converged and on_unconverged is not None:
        on_unconverged()
    out = pa.concat_tables(
        ray.get([emit_r.remote(packs[b], states[b]) for b in range(nparts)])
    )
    return out.sort_by(sort_by) if sort_by is not None else out


def _str_bucketer(nparts: int):
    """Owner bucket per string node: first poly hash, uint64 bit-view,
    mod P. Bucket choice never affects results (folds are order-free),
    only placement. Shared by every string-node Pregel engine."""
    from ntto_ray.stages.dedup import poly_content_hashes

    def _bucket_of(col) -> np.ndarray:
        if not isinstance(col, (pa.Array, pa.ChunkedArray)):
            col = pa.array(col, pa.string())
        h1, _ = poly_content_hashes(col)
        return (h1.view(np.uint64) % np.uint64(nparts)).astype(np.int64)

    return _bucket_of


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
    fold_edges: int = FOLD_EDGES,
    max_driver_nodes: int = MAX_DRIVER_NODES,
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

    fold_edges, max_driver_nodes, small_edge_threshold = _env_regime(
        fold_edges, max_driver_nodes, small_edge_threshold
    )
    edges = pairs.select_columns([a_col, b_col]).materialize()

    n_edges = edges.count()
    if n_edges <= small_edge_threshold:
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

    fold = n_edges <= fold_edges
    if not fold and 2 * n_edges > max_driver_nodes:
        if _distinct_node_count(edges, a_col, b_col) > max_driver_nodes:
            return _components_dataset(
                edges, a_col=a_col, b_col=b_col, max_rounds=max_rounds
            )

    # node set: ONE distributed pass over both endpoint columns
    def emit_nodes(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy().astype(np.int64)
        b = t[b_col].to_numpy().astype(np.int64)
        return pa.table({"node": np.unique(np.concatenate([a, b]))})

    per_block = edges.map_batches(emit_nodes, batch_format="pyarrow")
    if fold:
        ndf = per_block.to_pandas()
        nodes = np.unique(ndf["node"].to_numpy())
    else:
        nodes = np.array(
            sorted(per_block.unique("node") or []), dtype=np.int64
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
        pushed = edges.map_batches(
            push_min, batch_format="pyarrow", fn_kwargs={"ref": ref}
        )
        if fold:
            folded = pushed.to_pandas()  # per-block partials ≤ edge rows
        else:
            folded = (
                pushed.groupby("node")
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


def _components_dataset(
    edges: ray.data.Dataset,
    *,
    a_col: str,
    b_col: str,
    max_rounds: int,
) -> pa.Table:
    """Dataset-labels regime on the shared static-partition Pregel
    scaffold (:func:`_run_pregel`, which documents the why-raw-Ray
    rationale): the undirected edge list is hash-bucketed by endpoint
    exactly ONCE; each min-label round ships only node-scale label
    messages between buckets, with the classic DELTA optimization — a
    node whose label did not change this round pushes nothing next
    round (its previous push is already min-folded into every
    neighbor), so late rounds touch only the shrinking frontier. Bucket
    b owns the labels of nodes with bucket(u) = b and the out-direction
    of every edge incident to them (both directions are emitted, so
    each endpoint pushes from its own bucket). Convergence is a
    per-round sum of P per-bucket changed-counts — P ints to the
    driver, nothing node-scale. Labels only ever decrease and min-folds
    are order-free, so the fixpoint is bit-identical to the
    driver-vector and union-find regimes (tests pin all three)."""
    from ntto_ray.stages.sketch import splitmix64
    from ntto_ray.stages.exchange import shuffle_parallelism

    nparts = max(2, shuffle_parallelism())
    _IMAX = np.iinfo(np.int64).max

    _EDGE = pa.schema([("key", pa.int64()), ("other", pa.int64())])
    _NODE = pa.schema([("node", pa.int64())])

    def _bucket_of(v: np.ndarray) -> np.ndarray:
        return (splitmix64(v.view(np.uint64)) % np.uint64(nparts)).astype(
            np.int64
        )

    def _split_fn(block):
        """Edge block → P pieces of (out-edges, node partials), both
        directions emitted so every endpoint pushes from its bucket."""
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        if block.num_rows == 0:
            return tuple(
                (_EDGE.empty_table(), _NODE.empty_table()) for _ in range(nparts)
            )
        a = block[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = block[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.concatenate([a, b])
        oth = np.concatenate([b, a])
        kb = _bucket_of(key)
        pieces = []
        for p in range(nparts):
            m = kb == p
            pieces.append(
                (
                    pa.table({"key": key[m], "other": oth[m]}).cast(_EDGE),
                    pa.table({"node": np.unique(key[m])}).cast(_NODE),
                )
            )
        return tuple(pieces)

    def _build_fn(*pieces):
        """One bucket: sorted node vector, deduped edge routing
        (key index, unique-destination grouping, per-owner slices)."""
        e = pa.concat_tables([p[0] for p in pieces])
        nt = pa.concat_tables([p[1] for p in pieces])
        nodes = np.unique(nt["node"].to_numpy())
        k = e["key"].to_numpy()
        o = e["other"].to_numpy()
        key_idx = np.searchsorted(nodes, k).astype(np.int64)
        ud, dinv = np.unique(o, return_inverse=True)
        # dedupe parallel (key, other) pairs — min-push is idempotent,
        # duplicates only cost work every round
        if len(ud):
            code = (key_idx << np.int64(32)) | dinv.astype(np.int64)
            code = np.unique(code)
            key_idx = (code >> np.int64(32)).astype(np.int64)
            dinv = (code & np.int64(0xFFFFFFFF)).astype(np.int64)
            udb = _bucket_of(ud)
            order = np.argsort(udb, kind="stable")
            rank = np.empty(len(ud), np.int64)
            rank[order] = np.arange(len(ud), dtype=np.int64)
            ud = ud[order]
            dinv = rank[dinv]
            bounds = np.searchsorted(udb[order], np.arange(nparts + 1))
        else:
            bounds = np.zeros(nparts + 1, dtype=np.int64)
        return {
            "nodes": nodes,
            "key_idx": key_idx,
            "dinv": dinv.astype(np.int64),
            "ud": ud,
            "bounds": bounds,
        }

    def _init_fn(pack):
        n = len(pack["nodes"])
        return pack["nodes"].copy(), np.ones(n, dtype=bool)

    def _push_fn(pack, state):
        """Delta push: only edges whose source label changed last round
        emit; per-slice empty mins are filtered before shipping."""
        lab, changed = state
        b = pack["bounds"]
        m = np.full(len(pack["ud"]), _IMAX, dtype=np.int64)
        if len(pack["key_idx"]):
            em = changed[pack["key_idx"]]
            if em.any():
                np.minimum.at(m, pack["dinv"][em], lab[pack["key_idx"][em]])
        out = []
        for i in range(nparts):
            s, e = b[i], b[i + 1]
            mm = m[s:e] != _IMAX
            out.append((pack["ud"][s:e][mm], m[s:e][mm]))
        return tuple(out)

    def _apply_fn(pack, state, *messages):
        lab, _ = state
        nodes = pack["nodes"]
        m = np.full(len(nodes), _IMAX, dtype=np.int64)
        for names, vals in messages:
            if len(names):
                np.minimum.at(m, np.searchsorted(nodes, names), vals)
        new = np.minimum(lab, m)
        changed = new < lab
        return (new, changed), int(changed.sum())

    def _emit_fn(pack, state):
        return pa.table({"doc_id": pack["nodes"], "component": state[0]})

    def _unconverged():
        raise UnconvergedComponentsError(
            f"no fixpoint after {max_rounds} rounds — component diameter "
            f"exceeds max_rounds; raise max_rounds for chain-like graphs"
        )

    return _run_pregel(
        edges,
        nparts=nparts,
        split_fn=_split_fn,
        build_fn=_build_fn,
        init_fn=_init_fn,
        push_fn=_push_fn,
        apply_fn=_apply_fn,
        emit_fn=_emit_fn,
        rounds=max_rounds,
        empty_result=pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "component": pa.array([], pa.int64()),
            }
        ),
        sort_by="doc_id",
        convergence="apply",
        on_unconverged=_unconverged,
    )


def khop_distances(
    edges_ds: ray.data.Dataset,
    seeds: np.ndarray,
    *,
    src_col: str = "subj",
    dst_col: str = "obj",
    k: int = 4,
    fold_edges: int = FOLD_EDGES,
    max_driver_nodes: int = MAX_DRIVER_NODES,
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
    fold_edges, max_driver_nodes = _env_regime(fold_edges, max_driver_nodes)
    edges = edges_ds.select_columns([src_col, dst_col]).materialize()
    out_schema = pa.schema([("node", pa.string()), ("dist", pa.int64())])
    n_edges = edges.count()
    if n_edges == 0:
        return out_schema.empty_table()
    fold = n_edges <= fold_edges
    if not fold and 2 * n_edges > max_driver_nodes:
        if _distinct_node_count(edges, src_col, dst_col) > max_driver_nodes:
            return _khop_dataset(
                edges, seeds, src_col=src_col, dst_col=dst_col, k=k
            )

    nodes = _nodes_driver(edges, src_col, dst_col, fold=fold)
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

        expanded = edges.map_batches(expand, batch_format="pyarrow")
        if fold:
            # per-block distinct dst ids fold on the driver — no exchange
            df = expanded.to_pandas()
            new = np.unique(df["i"].to_numpy()) if len(df) else np.array([], np.int64)
        else:
            # a dead-end frontier (no out-edges) yields an EMPTY dataset,
            # whose unique() comes back None — guard rather than iterate it
            reached = expanded.unique("i") or []
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


def _directed_pregel_fns(nparts: int, src_col: str, dst_col: str):
    """The shared SPLIT/BUILD pair of the directed-BFS Pregel engines
    (:func:`_khop_dataset`, :func:`_multi_source_dataset`): edge blocks
    split by source bucket (node names to both endpoint buckets), and
    the per-bucket build produces the node vector, globally-distinct
    arcs (BFS expansion is idempotent, so parallel arcs collapse), the
    destination grouping, and per-target-bucket slice bounds."""
    _EDGE = pa.schema([("src", pa.string()), ("dst", pa.string())])
    _NODE = pa.schema([("node", pa.string())])
    _bucket_of = _str_bucketer(nparts)

    def _split_fn(block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        if block.num_rows == 0:
            return tuple(
                (_EDGE.empty_table(), _NODE.empty_table()) for _ in range(nparts)
            )
        s = block[src_col].to_numpy(zero_copy_only=False).astype(np.str_)
        d = block[dst_col].to_numpy(zero_copy_only=False).astype(np.str_)
        sb = _bucket_of(block[src_col])
        db = _bucket_of(block[dst_col])
        pieces = []
        for b in range(nparts):
            m = sb == b
            e = pa.table(
                {
                    "src": pa.array(s[m], pa.string()),
                    "dst": pa.array(d[m], pa.string()),
                }
            ).cast(_EDGE)
            nd = np.unique(np.concatenate([s[m], d[db == b]]))
            pieces.append(
                (e, pa.table({"node": pa.array(nd, pa.string())}).cast(_NODE))
            )
        return tuple(pieces)

    def _build_fn(*pieces):
        e = pa.concat_tables([p[0] for p in pieces])
        nt = pa.concat_tables([p[1] for p in pieces])
        nodes = np.unique(nt["node"].to_numpy(zero_copy_only=False).astype(np.str_))
        s = e["src"].to_numpy(zero_copy_only=False).astype(np.str_)
        d = e["dst"].to_numpy(zero_copy_only=False).astype(np.str_)
        src_idx = np.searchsorted(nodes, s).astype(np.int64)
        ud, dinv = np.unique(d, return_inverse=True)
        if len(ud):
            # the (src_idx << 32) | dinv pack below needs both halves in
            # range or the arc dedup silently corrupts — fail loudly
            assert len(nodes) < 2**31 and len(ud) < 2**32, (
                f"bucket too large for packed arc dedup: "
                f"{len(nodes)} sources / {len(ud)} destinations"
            )
            # dedupe parallel arcs — BFS expansion is idempotent
            code = (src_idx << np.int64(32)) | dinv.astype(np.int64)
            code = np.unique(code)
            src_idx = (code >> np.int64(32)).astype(np.int64)
            dinv = (code & np.int64(0xFFFFFFFF)).astype(np.int64)
            udb = _bucket_of(ud)
            order = np.argsort(udb, kind="stable")
            rank = np.empty(len(ud), np.int64)
            rank[order] = np.arange(len(ud), dtype=np.int64)
            ud = ud[order]
            dinv = rank[dinv]
            bounds = np.searchsorted(udb[order], np.arange(nparts + 1))
        else:
            bounds = np.zeros(nparts + 1, dtype=np.int64)
        return {
            "nodes": nodes,
            "src_idx": src_idx,
            "dinv": dinv.astype(np.int64),
            "ud": ud,
            "bounds": bounds,
        }

    return _split_fn, _build_fn


def _khop_dataset(
    edges: ray.data.Dataset,
    seeds: np.ndarray,
    *,
    src_col: str,
    dst_col: str,
    k: int,
) -> pa.Table:
    """Dataset-labels regime as a static-partition Pregel engine (design
    and why-raw-Ray rationale: :func:`_run_pregel`): directed
    edges bucket by SOURCE once (deduped — BFS only needs distinct
    arcs); the per-bucket distance vector starts at −1 with seeds at 0;
    round r pushes the frontier (dist == r) along the precomputed
    destination grouping and ships only candidate NAMES (the distance
    is implied: r+1); APPLY sets still-unreached candidates and returns
    a per-bucket newly-reached count — early exit when the frontier
    empties. Seeds absent from the graph never enter a node vector and
    so never surface (same contract as the driver-vector path).
    Returns (node, dist) for reached nodes only, dist in [0, k]."""
    from ntto_ray.stages.exchange import shuffle_parallelism

    nparts = max(2, shuffle_parallelism())
    out_schema = pa.schema([("node", pa.string()), ("dist", pa.int64())])
    seed_arr = np.unique(np.asarray(seeds, dtype=np.str_))
    _split_fn, _build_fn = _directed_pregel_fns(nparts, src_col, dst_col)

    def _init_fn(pack):
        n = len(pack["nodes"])
        dist = np.full(n, -1, dtype=np.int64)
        if n and len(seed_arr):
            idx = np.searchsorted(pack["nodes"], seed_arr)
            ok = (idx < n) & (pack["nodes"][np.minimum(idx, n - 1)] == seed_arr)
            dist[idx[ok]] = 0
        return dist

    def _push_fn(pack, dist, r):
        b = pack["bounds"]
        hit = np.zeros(len(pack["ud"]), dtype=bool)
        if len(pack["src_idx"]):
            em = dist[pack["src_idx"]] == r
            if em.any():
                hit[pack["dinv"][em]] = True
        return tuple(
            pack["ud"][b[i] : b[i + 1]][hit[b[i] : b[i + 1]]]
            for i in range(nparts)
        )

    def _apply_fn(pack, dist, r, *name_lists):
        newly = 0
        for names in name_lists:
            if len(names):
                idx = np.searchsorted(pack["nodes"], names)
                fresh = idx[dist[idx] < 0]
                if len(fresh):
                    dist = dist.copy() if newly == 0 else dist
                    dist[fresh] = r + 1
                    newly += len(fresh)
        return dist, newly

    def _emit_fn(pack, dist):
        hit = dist >= 0
        return pa.table(
            {
                "node": pa.array(pack["nodes"][hit].tolist(), pa.string()),
                "dist": pa.array(dist[hit], pa.int64()),
            }
        )

    return _run_pregel(
        edges,
        nparts=nparts,
        split_fn=_split_fn,
        build_fn=_build_fn,
        init_fn=_init_fn,
        push_fn=_push_fn,
        apply_fn=_apply_fn,
        emit_fn=_emit_fn,
        rounds=k,
        empty_result=out_schema.empty_table(),
        sort_by="node",
        round_arg=True,
        convergence="apply",
    )


def kcore_peel(
    edges_ds: ray.data.Dataset,
    *,
    src_col: str = "subj",
    dst_col: str = "obj",
    k: int = 3,
    rounds: int = 6,
    fold_edges: int = FOLD_EDGES,
    max_driver_nodes: int = MAX_DRIVER_NODES,
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

    fold_edges, max_driver_nodes = _env_regime(fold_edges, max_driver_nodes)
    edges = edges_ds.select_columns([src_col, dst_col]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table({"node": pa.array([], pa.string())})
    fold = n_edges <= fold_edges
    if not fold and 2 * n_edges > max_driver_nodes:
        if _distinct_node_count(edges, src_col, dst_col) > max_driver_nodes:
            return _kcore_dataset(
                edges, src_col=src_col, dst_col=dst_col, k=k, rounds=rounds
            )

    nodes = _nodes_driver(edges, src_col, dst_col, fold=fold)
    if not len(nodes):
        return pa.table({"node": pa.array([], pa.string())})
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    if fold:
        # Bounded edge set: collapse parallel edges and run every peel
        # round driver-local (np.add.at degree folds) — the per-round
        # exchange costs seconds of fixed overhead that dominate utterly
        # at this size, and the result is definitionally identical.
        def pack_fold(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema([("pk", pa.int64())]).empty_table()
            nd = ray.get(nodes_ref)
            a = np.searchsorted(nd, t[src_col].to_numpy(zero_copy_only=False))
            b = np.searchsorted(nd, t[dst_col].to_numpy(zero_copy_only=False))
            keep = a != b
            a, b = a[keep], b[keep]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            return pa.table({"pk": np.unique(lo * n + hi)})

        df = edges.map_batches(pack_fold, batch_format="pyarrow").to_pandas()
        pk = np.unique(df["pk"].to_numpy()) if len(df) else np.array([], np.int64)
        a, b = pk // n, pk % n
        alive = np.ones(n, dtype=bool)
        for _ in range(rounds):
            keep = alive[a] & alive[b]
            deg = np.zeros(n, dtype=np.int64)
            np.add.at(deg, a[keep], 1)
            np.add.at(deg, b[keep], 1)
            new_alive = alive & (deg >= k)
            if np.array_equal(new_alive, alive):
                break
            alive = new_alive
        return pa.table(
            {"node": pa.array(nodes[np.flatnonzero(alive)].tolist(), pa.string())}
        )

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


def _kcore_dataset(
    edges: ray.data.Dataset,
    *,
    src_col: str,
    dst_col: str,
    k: int,
    rounds: int,
) -> pa.Table:
    """Dataset-labels regime as a static-partition Pregel engine (design
    and why-raw-Ray rationale: :func:`_run_pregel`): the
    undirected simple projection buckets by endpoint once — both
    directions are emitted, self-loops dropped, and the per-bucket
    dedupe IS the global dedupe (every copy of arc u→v lands in
    bucket(u)), so the build replaces the old up-front pair-collapse
    exchange too. State per bucket is (alive, deg) with deg = distinct-
    neighbor count; a peel round kills alive nodes with deg < k and
    pushes one DECREMENT per arc out of a just-killed node — the delta
    formulation: surviving nodes ship nothing, so late rounds touch
    only the shrinking boundary. Decrements landing on already-dead
    nodes are harmless (alive is monotone). Early exit when a round
    kills nothing (fixpoint — identical result to running all
    ``rounds``). Returns the alive node list, matching the
    driver-vector regime and the unrolled SQL mirror bit-for-bit."""
    from ntto_ray.stages.exchange import shuffle_parallelism

    nparts = max(2, shuffle_parallelism())

    _EDGE = pa.schema([("src", pa.string()), ("dst", pa.string())])
    _bucket_of = _str_bucketer(nparts)

    def _split_fn(block):
        """Both directions of each non-self edge, bucketed by the
        pushing endpoint."""
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        if block.num_rows == 0:
            return tuple(_EDGE.empty_table() for _ in range(nparts))
        a = block[src_col].to_numpy(zero_copy_only=False).astype(np.str_)
        b = block[dst_col].to_numpy(zero_copy_only=False).astype(np.str_)
        keep = a != b
        a, b = a[keep], b[keep]
        key = np.concatenate([a, b])
        oth = np.concatenate([b, a])
        kb = _bucket_of(pa.array(key, pa.string()))
        pieces = []
        for p in range(nparts):
            m = kb == p
            pieces.append(
                pa.table(
                    {
                        "src": pa.array(key[m], pa.string()),
                        "dst": pa.array(oth[m], pa.string()),
                    }
                ).cast(_EDGE)
            )
        return tuple(pieces)

    def _build_fn(*pieces):
        """One bucket: node vector (every node that appears as a pushing
        endpoint here — i.e. ALL nodes incident to an edge, each in its
        own bucket), globally-distinct out-arcs, destination grouping,
        owner slices, and the initial distinct-neighbor degree."""
        e = pa.concat_tables(pieces)
        s = e["src"].to_numpy(zero_copy_only=False).astype(np.str_)
        d = e["dst"].to_numpy(zero_copy_only=False).astype(np.str_)
        nodes = np.unique(s)
        src_idx = np.searchsorted(nodes, s).astype(np.int64)
        ud, dinv = np.unique(d, return_inverse=True)
        if len(ud):
            # same packed-arc bounds contract as the directed build
            assert len(nodes) < 2**31 and len(ud) < 2**32, (
                f"bucket too large for packed arc dedup: "
                f"{len(nodes)} sources / {len(ud)} destinations"
            )
            code = (src_idx << np.int64(32)) | dinv.astype(np.int64)
            code = np.unique(code)
            src_idx = (code >> np.int64(32)).astype(np.int64)
            dinv = (code & np.int64(0xFFFFFFFF)).astype(np.int64)
            udb = _bucket_of(ud)
            order = np.argsort(udb, kind="stable")
            rank = np.empty(len(ud), np.int64)
            rank[order] = np.arange(len(ud), dtype=np.int64)
            ud = ud[order]
            dinv = rank[dinv]
            bounds = np.searchsorted(udb[order], np.arange(nparts + 1))
        else:
            bounds = np.zeros(nparts + 1, dtype=np.int64)
        deg = np.zeros(len(nodes), dtype=np.int64)
        if len(src_idx):
            np.add.at(deg, src_idx, 1)  # distinct arcs = distinct neighbors
        return {
            "nodes": nodes,
            "src_idx": src_idx,
            "dinv": dinv.astype(np.int64),
            "ud": ud,
            "bounds": bounds,
            "deg0": deg,
        }

    def _init_fn(pack):
        return np.ones(len(pack["nodes"]), dtype=bool), pack["deg0"].copy()

    def _push_fn(pack, state):
        """Kill alive nodes under k, emit one decrement per out-arc of a
        just-killed node (folded per destination)."""
        alive, deg = state
        dead = alive & (deg < k)
        b = pack["bounds"]
        dec = np.zeros(len(pack["ud"]), dtype=np.int64)
        n_dead = int(dead.sum())
        if n_dead and len(pack["src_idx"]):
            em = dead[pack["src_idx"]]
            if em.any():
                np.add.at(dec, pack["dinv"][em], 1)
        new_alive = alive & ~dead
        out = [(new_alive, deg), n_dead]
        for i in range(nparts):
            s, e = b[i], b[i + 1]
            mm = dec[s:e] > 0
            out.append((pack["ud"][s:e][mm], dec[s:e][mm]))
        return tuple(out)

    def _apply_fn(pack, state, *messages):
        alive, deg = state
        new_deg = deg
        for names, vals in messages:
            if len(names):
                if new_deg is deg:
                    new_deg = deg.copy()
                idx = np.searchsorted(pack["nodes"], names)
                np.subtract.at(new_deg, idx, vals)
        return alive, new_deg

    def _emit_fn(pack, state):
        alive, _ = state
        return pa.table(
            {"node": pa.array(pack["nodes"][alive].tolist(), pa.string())}
        )

    # convergence="push": the kill count is known on the send side, so a
    # kill-free round (monotone alive set ⇒ fixpoint) skips apply
    return _run_pregel(
        edges,
        nparts=nparts,
        split_fn=_split_fn,
        build_fn=_build_fn,
        init_fn=_init_fn,
        push_fn=_push_fn,
        apply_fn=_apply_fn,
        emit_fn=_emit_fn,
        rounds=rounds,
        empty_result=pa.table({"node": pa.array([], pa.string())}),
        sort_by="node",
        convergence="push",
    )


def _nodes_driver(edges, src_col, dst_col, *, fold: bool) -> np.ndarray:
    """Sorted unicode node vector of an edge Dataset. ``fold=True`` skips
    the distinct exchange: per-block uniques (≤ block rows) come to the
    driver and one np.unique folds them."""

    def emit_nodes(t: pa.Table) -> pa.Table:
        a = t[src_col].to_numpy(zero_copy_only=False)
        b = t[dst_col].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.unique(np.concatenate([a, b]))})

    per_block = edges.map_batches(emit_nodes, batch_format="pyarrow")
    if fold:
        df = per_block.to_pandas()
        if not len(df):
            return np.array([], dtype=np.str_)
        return np.unique(df["node"].to_numpy().astype(np.str_))
    node_list = sorted(per_block.unique("node") or [])
    return np.array(node_list)  # unicode dtype → searchsorted in C


def _fold_sum(parts: "ray.data.Dataset", n: int, idx="i", val="c") -> np.ndarray:
    """Driver fold of per-block (index, count) partials — total partial
    volume is ≤ the edge count (each block emits ≤ its rows), which the
    fold regime has already bounded."""
    df = parts.to_pandas()
    out = np.zeros(n, dtype=np.int64)
    if len(df):
        np.add.at(out, df[idx].to_numpy(), df[val].to_numpy())
    return out


def _distinct_node_count(edges, src_col, dst_col) -> int:
    def emit_nodes(t: pa.Table) -> pa.Table:
        a = t[src_col].to_numpy(zero_copy_only=False)
        b = t[dst_col].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.unique(np.concatenate([a, b]))})

    from ray.data.aggregate import Count

    return (
        edges.map_batches(emit_nodes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count())
        .count()
    )


def pagerank_int(
    edges_ds: ray.data.Dataset,
    *,
    src_col: str = "subj",
    dst_col: str = "obj",
    iterations: int = 10,
    scale: int = 10**9,
    damping_pct: int = 85,
    fold_edges: int = FOLD_EDGES,
    max_driver_nodes: int = MAX_DRIVER_NODES,
    teleport_to: np.ndarray | None = None,
) -> pa.Table:
    """Fixed-iteration PageRank over a directed MULTIGRAPH of string
    nodes (every edge row contributes — parallel edges weight the link),
    in pure int64 arithmetic so the result is deterministic and
    order-independent:

        pr'[v] = (100-d)*scale // 100  +  d * Σ_{u→v}(pr[u] // out[u]) // 100

    ``teleport_to``: PERSONALIZED PageRank (Haveliwala, WWW 2002) —
    restrict the teleport term (and the initial mass) to the given seed
    nodes: base is paid only at seeds, everything else starts at 0, so
    rank measures proximity to the seed set. Same arithmetic, same
    regimes, same exactness contract.

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

    fold_edges, max_driver_nodes = _env_regime(fold_edges, max_driver_nodes)
    edges = edges_ds.select_columns([src_col, dst_col]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table(
            {"node": pa.array([], pa.string()), "pr": pa.array([], pa.int64())}
        )
    fold = n_edges <= fold_edges
    if not fold and 2 * n_edges > max_driver_nodes:
        if _distinct_node_count(edges, src_col, dst_col) > max_driver_nodes:
            return _pagerank_dataset(
                edges,
                src_col=src_col,
                dst_col=dst_col,
                iterations=iterations,
                scale=scale,
                damping_pct=damping_pct,
                teleport_to=teleport_to,
            )

    nodes = _nodes_driver(edges, src_col, dst_col, fold=fold)
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("i", pa.int64()), ("c", pa.int64())]).empty_table()
        nd = ray.get(nodes_ref)
        sid = np.searchsorted(nd, t[src_col].to_numpy(zero_copy_only=False))
        u, c = np.unique(sid, return_counts=True)
        return pa.table({"i": u.astype(np.int64), "c": c.astype(np.int64)})

    degs = edges.map_batches(deg_partial, batch_format="pyarrow")
    if fold:
        odeg = _fold_sum(degs, n)
    else:
        degp = degs.groupby("i").aggregate(Sum("c", alias_name="c")).to_pandas()
        odeg = np.zeros(n, dtype=np.int64)
        odeg[degp["i"].to_numpy()] = degp["c"].to_numpy()
    odeg_ref = ray.put(odeg)

    base = (100 - damping_pct) * scale // 100
    if teleport_to is None:
        base_vec: "np.ndarray | int" = base
        pr = np.full(n, scale, dtype=np.int64)
    else:
        tp = np.unique(np.asarray(teleport_to, dtype=np.str_))
        idx = np.searchsorted(nodes, tp)
        ok = (idx < n) & (nodes[np.minimum(idx, n - 1)] == tp)
        is_seed = np.zeros(n, dtype=bool)
        is_seed[idx[ok]] = True
        base_vec = np.where(is_seed, base, 0).astype(np.int64)
        pr = np.where(is_seed, scale, 0).astype(np.int64)
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

        pushed = edges.map_batches(push, batch_format="pyarrow")
        if fold:
            sums = _fold_sum(pushed, n)
        else:
            sp = pushed.groupby("i").aggregate(Sum("c", alias_name="c")).to_pandas()
            sums = np.zeros(n, dtype=np.int64)
            if len(sp):
                sums[sp["i"].to_numpy()] = sp["c"].to_numpy()
        pr = base_vec + damping_pct * sums // 100

    return pa.table(
        {"node": pa.array(nodes.tolist(), pa.string()), "pr": pa.array(pr)}
    )


def _pagerank_dataset(
    edges: ray.data.Dataset,
    *,
    src_col: str,
    dst_col: str,
    iterations: int,
    scale: int,
    damping_pct: int,
    teleport_to: np.ndarray | None = None,
) -> pa.Table:
    """Dataset-labels regime as a static-partition Pregel engine
    (Malewicz et al., SIGMOD'10): the edge set is hash-bucketed by
    SOURCE node exactly ONCE; after that, each round ships only
    node-scale rank messages between buckets — the edge payload never
    crosses the wire again. Raw Ray tasks here (the repo's documented
    last resort) because this is the one shape the Dataset API can't
    express: an iterative fixed-point over a STATIC co-partitioned
    side. Datasets carry no partitioning metadata across operations, so
    the previous tag-union formulation re-shuffled the full edge set
    twice per round (measured: 4 rounds over 10.8 M canonical edges =
    61 s at 32 CPUs; see BENCH_r04 for this engine on the same job).

    Partitioning contract: bucket(u) = poly_hash(u) mod P. Bucket b owns
    the state (pr, out-degree) of every node with bucket(u) = b AND the
    out-edges of exactly those nodes — so out-degree is bucket-local and
    the per-round PUSH needs no remote reads. Build precomputes, per
    bucket: src index into the bucket's node vector, the destination
    grouping (unique dsts + inverse), and the dst→target-bucket slice
    boundaries; a round is then pure numpy per bucket (contrib =
    pr[src] // od[src]; one np.add.at) emitting P message slices, and an
    APPLY per bucket folding the ≤P slices addressed to it. The driver
    holds only the P×P grid of object REFS; node-scale data lives in the
    object store end to end (the final pa.Table gather exists because
    every current caller is a registered query the driver collects
    anyway). Integer arithmetic → bit-identical to the driver-vector
    regime under any fold order (tests pin the regimes against each
    other)."""
    from ntto_ray.stages.exchange import shuffle_parallelism

    nparts = max(2, shuffle_parallelism())  # num_returns=1 would unwrap
    base = (100 - damping_pct) * scale // 100
    tp = (
        np.unique(np.asarray(teleport_to, dtype=np.str_))
        if teleport_to is not None
        else None
    )

    def _seed_mask(nodes: np.ndarray) -> np.ndarray:
        n = len(nodes)
        m = np.zeros(n, dtype=bool)
        if n == 0 or not len(tp):
            return m
        idx = np.searchsorted(nodes, tp)
        ok = (idx < n) & (nodes[np.minimum(idx, n - 1)] == tp)
        m[idx[ok]] = True
        return m

    _EDGE = pa.schema([("src", pa.string()), ("dst", pa.string())])
    _NODE = pa.schema([("node", pa.string()), ("od", pa.int64())])
    _bucket_of = _str_bucketer(nparts)

    def _split_fn(block):
        """Edge block → P pieces: bucket b gets (its out-edges, its
        node partials). Node partials: sources with per-block out-degree
        counts go to bucket(src); destinations (possible sinks) go to
        bucket(dst) with degree 0."""
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        if block.num_rows == 0:
            return tuple(
                (_EDGE.empty_table(), _NODE.empty_table()) for _ in range(nparts)
            )
        s = block[src_col].to_numpy(zero_copy_only=False).astype(np.str_)
        d = block[dst_col].to_numpy(zero_copy_only=False).astype(np.str_)
        sb = _bucket_of(block[src_col])
        db = _bucket_of(block[dst_col])
        pieces = []
        for b in range(nparts):
            m = sb == b
            e = pa.table(
                {
                    "src": pa.array(s[m], pa.string()),
                    "dst": pa.array(d[m], pa.string()),
                }
            ).cast(_EDGE)
            us, cs = np.unique(s[m], return_counts=True)
            ud = np.unique(d[db == b])
            nodes = pa.table(
                {
                    "node": pa.array(
                        np.concatenate([us, ud]).astype(np.str_), pa.string()
                    ),
                    "od": np.concatenate(
                        [cs.astype(np.int64), np.zeros(len(ud), np.int64)]
                    ),
                }
            ).cast(_NODE)
            pieces.append((e, nodes))
        return tuple(pieces)

    def _build_fn(*pieces):
        """Assemble one bucket: node vector (sorted unicode → C-speed
        searchsorted), static out-degrees, and the precomputed edge
        routing (src index, dst grouping, per-target-bucket slices)."""
        e = pa.concat_tables([p[0] for p in pieces])
        nt = pa.concat_tables([p[1] for p in pieces])
        nodes_raw = nt["node"].to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(nodes_raw.astype(np.str_), return_inverse=True)
        od = np.zeros(len(nodes), dtype=np.int64)
        if len(nodes_raw):
            np.add.at(od, inv, nt["od"].to_numpy())
        s = e["src"].to_numpy(zero_copy_only=False).astype(np.str_)
        d = e["dst"].to_numpy(zero_copy_only=False).astype(np.str_)
        src_idx = np.searchsorted(nodes, s).astype(np.int64)
        ud, dinv = np.unique(d, return_inverse=True)
        if len(ud):
            udb = _bucket_of(ud)
            order = np.argsort(udb, kind="stable")  # name-sorted within bucket
            rank = np.empty(len(ud), np.int64)
            rank[order] = np.arange(len(ud), dtype=np.int64)
            ud = ud[order]
            dinv = rank[dinv]
            bounds = np.searchsorted(udb[order], np.arange(nparts + 1))
        else:
            bounds = np.zeros(nparts + 1, dtype=np.int64)
        return {
            "nodes": nodes,
            "od": od,
            "src_idx": src_idx,
            "dinv": dinv.astype(np.int64),
            "ud": ud,
            "bounds": bounds,
        }

    def _init_fn(pack):
        if tp is None:
            return np.full(len(pack["nodes"]), scale, dtype=np.int64)
        return np.where(_seed_mask(pack["nodes"]), scale, 0).astype(np.int64)

    def _push_fn(pack, pr):
        """One superstep's send side for one bucket: fold contributions
        onto this bucket's distinct destinations, slice by owner."""
        b = pack["bounds"]
        sums = np.zeros(len(pack["ud"]), dtype=np.int64)
        if len(pack["src_idx"]):
            contrib = pr[pack["src_idx"]] // pack["od"][pack["src_idx"]]
            np.add.at(sums, pack["dinv"], contrib)
        return tuple(
            (pack["ud"][b[i] : b[i + 1]], sums[b[i] : b[i + 1]])
            for i in range(nparts)
        )

    def _apply_fn(pack, _pr, *messages):
        # the new rank is a pure function of the inbound messages — the
        # previous state arg exists only for the shared engine signature
        nodes = pack["nodes"]
        s = np.zeros(len(nodes), dtype=np.int64)
        for names, vals in messages:
            if len(names):
                np.add.at(s, np.searchsorted(nodes, names), vals)
        if tp is None:
            return base + damping_pct * s // 100
        bv = np.where(_seed_mask(nodes), base, 0).astype(np.int64)
        return bv + damping_pct * s // 100

    def _emit_fn(pack, pr):
        return pa.table(
            {
                "node": pa.array(pack["nodes"].tolist(), pa.string()),
                "pr": pa.array(pr, pa.int64()),
            }
        )

    return _run_pregel(
        edges,
        nparts=nparts,
        split_fn=_split_fn,
        build_fn=_build_fn,
        init_fn=_init_fn,
        push_fn=_push_fn,
        apply_fn=_apply_fn,
        emit_fn=_emit_fn,
        rounds=iterations,
        empty_result=pa.table(
            {"node": pa.array([], pa.string()), "pr": pa.array([], pa.int64())}
        ),
        convergence=None,
    )


def lpa_communities(
    edges_ds: ray.data.Dataset,
    *,
    src_col: str = "subj",
    dst_col: str = "obj",
    rounds: int = 3,
    fold_edges: int = FOLD_EDGES,
) -> pa.Table:
    """Synchronous label propagation (Raghavan, Albert & Kumara 2007,
    "Near linear time algorithm to detect community structures") over the
    UNDIRECTED multigraph: every node starts labeled with its own id;
    each round every node adopts the most frequent label among its
    neighbors (parallel edges weight the vote; self-loops vote the
    node's own label), ties broken to the LEXICOGRAPHICALLY SMALLEST
    label — a deterministic total order, so ``rounds`` fixed synchronous
    rounds are bit-reproducible and exactly SQL-mirrorable (classic LPA
    randomizes update order; the synchronous min-tie variant trades
    convergence speed for determinism).

    Scale contract mirrors :func:`pagerank_int`'s first two regimes: the
    edge Dataset stays distributed; each round maps edge blocks to
    (node, label, count) partials — partial volume ≤ 2× block rows —
    then either folds them on the driver (``fold_edges`` regime; the
    per-round exchange's fixed scheduling cost dominates small graphs)
    or merges with one grouped Sum; only the label vector (node-scale)
    lives on the driver and broadcasts per round. Past
    ``MAX_DRIVER_NODES`` this needs the dataset-resident-labels
    treatment (_pagerank_dataset's shape); left to that threshold's
    arrival since labels are entity-scale, not corpus-scale."""
    from ray.data.aggregate import Sum

    fold_edges, _ = _env_regime(fold_edges, MAX_DRIVER_NODES)
    edges = edges_ds.select_columns([src_col, dst_col]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table(
            {
                "node": pa.array([], pa.string()),
                "community": pa.array([], pa.string()),
            }
        )
    fold = n_edges <= fold_edges

    nodes = _nodes_driver(edges, src_col, dst_col, fold=fold)
    n = len(nodes)
    nodes_ref = ray.put(nodes)
    labels = np.arange(n, dtype=np.int64)  # label = index of node id

    _PART = pa.schema([("i", pa.int64()), ("l", pa.int64()), ("c", pa.int64())])

    for _ in range(rounds):
        lref = ray.put(labels)

        def push(t: pa.Table, *, ref=lref) -> pa.Table:
            if t.num_rows == 0:
                return _PART.empty_table()
            nd = ray.get(nodes_ref)
            lab = ray.get(ref)
            sid = np.searchsorted(nd, t[src_col].to_numpy(zero_copy_only=False))
            did = np.searchsorted(nd, t[dst_col].to_numpy(zero_copy_only=False))
            i = np.concatenate([sid, did])  # undirected: vote both ways
            l = lab[np.concatenate([did, sid])]
            key = i * np.int64(n) + l  # n^2 < 2^63 for every driver-scale n
            u, c = np.unique(key, return_counts=True)
            return pa.table(
                {
                    "i": (u // n).astype(np.int64),
                    "l": (u % n).astype(np.int64),
                    "c": c.astype(np.int64),
                }
            )

        pushed = edges.map_batches(push, batch_format="pyarrow")
        if fold:
            df = pushed.to_pandas()
            if not len(df):
                break
            key = df["i"].to_numpy() * np.int64(n) + df["l"].to_numpy()
            u, inv = np.unique(key, return_inverse=True)
            c = np.zeros(len(u), dtype=np.int64)
            np.add.at(c, inv, df["c"].to_numpy())
            i, l = (u // n).astype(np.int64), (u % n).astype(np.int64)
        else:
            df = (
                pushed.groupby(["i", "l"])
                .aggregate(Sum("c", alias_name="c"))
                .to_pandas()
            )
            i = df["i"].to_numpy()
            l = df["l"].to_numpy()
            c = df["c"].to_numpy()
        # winner per node: max count, ties to smallest label index
        # (== lexicographically smallest node string; nodes are sorted)
        order = np.lexsort((l, -c, i))
        i, l = i[order], l[order]
        first = np.flatnonzero(np.r_[True, i[1:] != i[:-1]])
        new_labels = labels.copy()
        new_labels[i[first]] = l[first]
        labels = new_labels

    return pa.table(
        {
            "node": pa.array(nodes.tolist(), pa.string()),
            "community": pa.array(nodes[labels].tolist(), pa.string()),
        }
    )


def multi_source_distances(
    edges_ds: ray.data.Dataset,
    seeds: np.ndarray,
    *,
    src_col: str = "subj",
    dst_col: str = "obj",
    k: int = 4,
    fold_edges: int = FOLD_EDGES,
    max_driver_nodes: int = MAX_DRIVER_NODES,
) -> pa.Table:
    """Multi-source BFS: exact hop distance (capped at ``k``) from EVERY
    seed at once, via frontier bitmask compression — the MS-BFS design
    (Then et al., VLDB 2015, "The More the Merrier: Efficient
    Multi-Source BFS"): with S ≤ 63 seeds, a node's per-seed frontier
    membership packs into one uint64, so a round is ONE vectorized pass
    over the edge blocks for ALL seeds (searchsorted the sources in the
    broadcast frontier, OR-fold destination bitmasks per block) instead
    of S separate BFS sweeps. The per-round message is (node, bitmask)
    — node-scale regardless of S.

    Three regimes like every iterative op here: driver-fold, driver
    vector (the (node × seed) int16 matrix under the same
    ``max_driver_nodes`` budget as :func:`pagerank_int`), and past the
    budget a static-partition Pregel engine
    (:func:`_multi_source_dataset`) whose per-bucket state is the
    bucketed matrix and whose messages carry the bitmask.

    Returns the long-form (seed, node, dist) table for reached pairs,
    dist in [0, k]; seeds absent from the graph reach nothing."""
    seeds_arr = np.unique(np.asarray(seeds, dtype=np.str_))
    S = len(seeds_arr)
    if S == 0:
        return pa.schema(
            [("seed", pa.string()), ("node", pa.string()), ("dist", pa.int64())]
        ).empty_table()
    if S > 63:
        raise ValueError(f"multi_source_distances: S={S} > 63 seeds")

    fold_edges, max_driver_nodes = _env_regime(fold_edges, max_driver_nodes)
    edges = edges_ds.select_columns([src_col, dst_col]).materialize()
    out_schema = pa.schema(
        [("seed", pa.string()), ("node", pa.string()), ("dist", pa.int64())]
    )
    n_edges = edges.count()
    if n_edges == 0:
        return out_schema.empty_table()
    fold = n_edges <= fold_edges
    # The driver-vector regime holds an (n × S) int16 matrix — 2·S bytes
    # per node vs the ~8 the node-scale budget was calibrated for in
    # pagerank_int — so scale the node cap by S before comparing.
    ms_budget = max(1, (max_driver_nodes * 8) // (2 * S))
    if not fold and 2 * n_edges > ms_budget:
        if _distinct_node_count(edges, src_col, dst_col) > ms_budget:
            return _multi_source_dataset(
                edges, seeds_arr, src_col=src_col, dst_col=dst_col, k=k
            )

    nodes = _nodes_driver(edges, src_col, dst_col, fold=fold)
    nodes_ref = ray.put(nodes)
    n = len(nodes)

    dist = np.full((n, S), -1, dtype=np.int16)
    seed_idx = np.searchsorted(nodes, seeds_arr)
    ok = (seed_idx < n) & (nodes[np.minimum(seed_idx, n - 1)] == seeds_arr)
    dist[seed_idx[ok], np.flatnonzero(ok)] = 0

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    for r in range(k):
        mask = np.zeros(n, dtype=np.uint64)
        on = dist == r  # (n, S)
        if not on.any():
            break
        rows, cols = np.nonzero(on)
        np.bitwise_or.at(mask, rows, np.uint64(1) << cols.astype(np.uint64))
        f_idx = np.flatnonzero(mask)
        f_ref = ray.put((f_idx, mask[f_idx]))

        def expand(t: pa.Table, *, ref=f_ref) -> pa.Table:
            out = pa.schema([("i", pa.int64()), ("m", pa.int64())])
            if t.num_rows == 0 or src_col not in t.column_names:
                return out.empty_table()
            nd = ray.get(nodes_ref)
            fi, fm = ray.get(ref)
            sid = np.searchsorted(nd, t[src_col].to_numpy(zero_copy_only=False))
            pos = np.searchsorted(fi, sid)
            hit = (pos < len(fi)) & (fi[np.minimum(pos, len(fi) - 1)] == sid)
            if not hit.any():
                return out.empty_table()
            did = np.searchsorted(
                nd, t[dst_col].to_numpy(zero_copy_only=False)
            )[hit]
            masks = fm[pos[hit]]
            u, inv = np.unique(did, return_inverse=True)
            orm = np.zeros(len(u), dtype=np.uint64)
            np.bitwise_or.at(orm, inv, masks)
            return pa.table(
                {"i": u.astype(np.int64), "m": orm.view(np.int64)}
            )

        expanded = edges.map_batches(expand, batch_format="pyarrow")
        if not fold:
            # one i-keyed exchange OR-folds partials to node-scale first

            def or_fold(t: pa.Table) -> pa.Table:
                out = pa.schema([("i", pa.int64()), ("m", pa.int64())])
                if t.num_rows == 0 or "i" not in t.column_names:
                    return out.empty_table()
                ii = t["i"].to_numpy()
                u, inv = np.unique(ii, return_inverse=True)
                orm = np.zeros(len(u), dtype=np.uint64)
                np.bitwise_or.at(orm, inv, t["m"].to_numpy().view(np.uint64))
                return pa.table({"i": u, "m": orm.view(np.int64)})

            expanded = hash_grouped(expanded, ["i"], sort=False).map_batches(
                or_fold, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
            )
        df = expanded.to_pandas()
        if not len(df):
            continue
        u, inv = np.unique(df["i"].to_numpy(), return_inverse=True)
        orm = np.zeros(len(u), dtype=np.uint64)
        np.bitwise_or.at(orm, inv, df["m"].to_numpy().view(np.uint64))
        # set still-unreached (node, seed) cells to r+1
        reach = (orm[:, None] >> np.arange(S, dtype=np.uint64)) & np.uint64(1)
        fresh = (reach.astype(bool)) & (dist[u] < 0)
        if fresh.any():
            sub = dist[u]
            sub[fresh] = r + 1
            dist[u] = sub

    ni, si = np.nonzero(dist >= 0)
    return pa.table(
        {
            "seed": pa.array(seeds_arr[si].tolist(), pa.string()),
            "node": pa.array(nodes[ni].tolist(), pa.string()),
            "dist": pa.array(dist[ni, si].astype(np.int64)),
        }
    )


def _multi_source_dataset(
    edges: ray.data.Dataset,
    seeds_arr: np.ndarray,
    *,
    src_col: str,
    dst_col: str,
    k: int,
) -> pa.Table:
    """Dataset-labels regime for multi-source BFS: the same
    static-partition Pregel engine as :func:`_khop_dataset` (directed
    arcs deduped, bucketed by source once), with the per-bucket state
    widened from one distance vector to an (n_bucket × S) int16 matrix
    and the round message widened from candidate names to
    (names, uint64 frontier bitmask) — the MS-BFS compression carried
    into the exchange: messages stay node-scale regardless of S."""
    from ntto_ray.stages.exchange import shuffle_parallelism

    nparts = max(2, shuffle_parallelism())
    S = len(seeds_arr)
    out_schema = pa.schema(
        [("seed", pa.string()), ("node", pa.string()), ("dist", pa.int64())]
    )
    _split_fn, _build_fn = _directed_pregel_fns(nparts, src_col, dst_col)

    def _init_fn(pack):
        n = len(pack["nodes"])
        dist = np.full((n, S), -1, dtype=np.int16)
        if n and S:
            idx = np.searchsorted(pack["nodes"], seeds_arr)
            ok = (idx < n) & (pack["nodes"][np.minimum(idx, n - 1)] == seeds_arr)
            dist[idx[ok], np.flatnonzero(ok)] = 0
        return dist

    def _push_fn(pack, dist, r):
        b = pack["bounds"]
        fm = np.zeros(len(pack["nodes"]), dtype=np.uint64)
        rows, cols = np.nonzero(dist == r)
        if len(rows):
            np.bitwise_or.at(fm, rows, np.uint64(1) << cols.astype(np.uint64))
        hit = np.zeros(len(pack["ud"]), dtype=np.uint64)
        if len(pack["src_idx"]):
            em = fm[pack["src_idx"]] != 0
            if em.any():
                np.bitwise_or.at(
                    hit, pack["dinv"][em], fm[pack["src_idx"][em]]
                )
        out = []
        for i in range(nparts):
            s, e = b[i], b[i + 1]
            mm = hit[s:e] != 0
            out.append((pack["ud"][s:e][mm], hit[s:e][mm]))
        return tuple(out)

    def _apply_fn(pack, dist, r, *messages):
        newly = 0
        for names, masks in messages:
            if len(names):
                idx = np.searchsorted(pack["nodes"], names)
                reach = (
                    (masks[:, None] >> np.arange(S, dtype=np.uint64))
                    & np.uint64(1)
                ).astype(bool)
                fresh = reach & (dist[idx] < 0)
                if fresh.any():
                    if newly == 0:
                        dist = dist.copy()
                    sub = dist[idx]
                    sub[fresh] = r + 1
                    dist[idx] = sub
                    newly += int(fresh.sum())
        return dist, newly

    def _emit_fn(pack, dist):
        ni, si = np.nonzero(dist >= 0)
        return pa.table(
            {
                "seed": pa.array(seeds_arr[si].tolist(), pa.string()),
                "node": pa.array(pack["nodes"][ni].tolist(), pa.string()),
                "dist": pa.array(dist[ni, si].astype(np.int64)),
            }
        )

    return _run_pregel(
        edges,
        nparts=nparts,
        split_fn=_split_fn,
        build_fn=_build_fn,
        init_fn=_init_fn,
        push_fn=_push_fn,
        apply_fn=_apply_fn,
        emit_fn=_emit_fn,
        rounds=k,
        empty_result=out_schema.empty_table(),
        sort_by=[("seed", "ascending"), ("node", "ascending")],
        round_arg=True,
        convergence="apply",
    )


def first_subjects(
    edges: ray.data.Dataset, n: int, *, col: str = "subj"
) -> np.ndarray:
    """The repo's deterministic seed rule: the ``n`` lexicographically-
    first distinct values of ``col`` (per-block unique partials → one
    distinct fold → driver sort of the bounded result). Shared by every
    seeded graph query so the SQL mirrors' seed CTEs stay byte-identical
    across operators."""

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("s", pa.string())]).empty_table()
        return pa.table(
            {"s": np.unique(t[col].to_numpy(zero_copy_only=False))}
        )

    vals = edges.map_batches(emit, batch_format="pyarrow").unique("s") or []
    return np.array(sorted(vals)[:n])
