"""Edge-case tests for the round-2 operators: as-of join, connected
components, SimHash banded pairs, exact quantiles — cases the synthetic
sf tables don't exercise (chain graphs needing multiple propagation
rounds, left rows with no match, the pigeonhole exactness bound)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_asof_join_edges(ray_session):
    import ray.data

    from ntto_ray.stages.joins import asof_join_latest

    # key 1: event at t=10 → latest of orders {5, 10} is ts=10 (at-or-before
    # is inclusive); among two orders at ts=10, max id wins.
    # key 2: event before every order → dropped (inner).
    # key 3: no orders at all → dropped.
    left = ray.data.from_arrow(
        pa.table(
            {
                "eid": pa.array([100, 101, 102], type=pa.int64()),
                "k": pa.array([1, 2, 3], type=pa.int64()),
                "ts": pa.array([10, 1, 10], type=pa.timestamp("us")),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "oid": pa.array([7, 8, 9, 20], type=pa.int64()),
                "k": pa.array([1, 1, 1, 2], type=pa.int64()),
                "ots": pa.array([5, 10, 10, 50], type=pa.timestamp("us")),
            }
        )
    )
    out = asof_join_latest(
        left,
        right,
        left_key="k",
        right_key="k",
        left_ts="ts",
        right_ts="ots",
        left_id="eid",
        right_id="oid",
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["left_id"] == 100
    assert out.iloc[0]["right_id"] == 9  # max id among the two ts=10 orders


def test_connected_components_chain_needs_rounds(ray_session):
    """A 9-node path graph has diameter 8 — min-label propagation must
    iterate several rounds; every node must still end at component 0."""
    import ray.data

    from ntto_ray.stages.graph import connected_components

    n = 9
    pairs = pa.table(
        {
            "doc_a": pa.array(list(range(n - 1)), type=pa.int64()),
            "doc_b": pa.array(list(range(1, n)), type=pa.int64()),
        }
    )
    # force the DISTRIBUTED min-label path (threshold 0) — the chain
    # is exactly the diameter case the rounds must handle
    out = connected_components(
        ray.data.from_arrow(pairs), small_edge_threshold=0
    ).to_pandas()
    assert len(out) == n
    assert set(out["component"]) == {0}

    # two disjoint components keep distinct labels
    pairs2 = pa.table(
        {
            "doc_a": pa.array([1, 2, 10, 11], type=pa.int64()),
            "doc_b": pa.array([2, 3, 11, 12], type=pa.int64()),
        }
    )
    out2 = connected_components(
        ray.data.from_arrow(pairs2), small_edge_threshold=0
    ).to_pandas()
    comp = dict(zip(out2["doc_id"], out2["component"]))
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == comp[12] == 10


def test_simhash_banding_exact_at_bound(ray_session):
    """Pigeonhole guarantee: with 4 bands, every pair at hamming exactly
    3 (the max) must be found — construct fingerprints differing in 3
    bits spread over 3 different bands, the adversarial layout."""
    import ray.data

    from ntto_ray.stages.dedup import _hamming64, simhash_pairs

    base = np.uint64(0x0123456789ABCDEF)
    # flip one bit in each of bands 0, 1, 2 (bits 3, 19, 35)
    other = base ^ np.uint64((1 << 3) | (1 << 19) | (1 << 35))
    assert _hamming64(np.array([base]), np.array([other]))[0] == 3

    # monkeypatch-free: feed fingerprints through the banding path by
    # stubbing docs whose SimHasher output we control is complex; instead
    # test the internal banding directly via a fake fingerprint table.
    fps = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "simhash": pa.array(
                    np.array([base, other, base ^ np.uint64(0xFF)], dtype=np.uint64)
                ),
            }
        )
    )
    # reuse the pipeline internals after the fingerprint stage
    import ntto_ray.stages.dedup as d

    orig = d.simhash_fingerprints
    d.simhash_fingerprints = lambda docs: fps
    try:
        out = simhash_pairs(
            ray.data.from_items([{"doc_id": 0, "text": "x"}]), max_hamming=3, bands=4
        ).to_pandas()
    finally:
        d.simhash_fingerprints = orig
    # (1,2) at hamming 3 found; (1,3)/(2,3) at hamming 8/11 excluded
    assert len(out) == 1
    assert (out.iloc[0]["doc_a"], out.iloc[0]["doc_b"]) == (1, 2)
    assert out.iloc[0]["hamming"] == 3


def test_quantile_disc_semantics(ray_session, duck):
    """The distributed quantile picks index ceil(q*n)-1 — cross-check the
    whole query against DuckDB's quantile_disc on sf0.001 with an awkward
    n (handled by the parametrized oracle test) plus a direct tiny case."""
    from ntto_ray import registry

    got = (
        registry.queries()["rel_group_quantiles"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(registry.oracle_sql()["rel_group_quantiles"])
        .df()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_simhash_banding_matches_bruteforce_random(ray_session):
    """Property check: on 300 random fingerprints, banded pair discovery
    equals brute-force all-pairs Hamming<=3 exactly (not just recall)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    import ntto_ray.stages.dedup as d
    from ntto_ray.stages.dedup import _hamming64, simhash_pairs

    rng = np.random.RandomState(123)
    n = 300
    fps = rng.randint(0, 1 << 62, size=n).astype(np.uint64)
    # plant near-dup pairs: clones of earlier fps with 0-3 flipped bits
    for i in range(0, 60, 2):
        flips = rng.choice(64, size=rng.randint(0, 4), replace=False)
        v = fps[i]
        for b in flips:
            v ^= np.uint64(1) << np.uint64(b)
        fps[i + 1] = v
    ids = np.arange(1, n + 1, dtype=np.int64)

    a, b = np.triu_indices(n, k=1)
    h = _hamming64(fps[a], fps[b])
    want = sorted(
        (int(ids[x]), int(ids[y]), int(hh))
        for x, y, hh in zip(a[h <= 3], b[h <= 3], h[h <= 3])
    )

    fake = ray.data.from_arrow(
        pa.table({"doc_id": ids, "simhash": pa.array(fps)})
    )
    orig = d.simhash_fingerprints
    d.simhash_fingerprints = lambda docs: fake
    try:
        out = simhash_pairs(
            ray.data.from_items([{"doc_id": 0, "text": "x"}]), max_hamming=3, bands=4
        ).to_pandas()
    finally:
        d.simhash_fingerprints = orig
    got = sorted(
        (int(r.doc_a), int(r.doc_b), int(r.hamming)) for r in out.itertuples()
    )
    assert got == want


def test_asof_join_matches_bruteforce_random(ray_session):
    """500 random events x 200 random orders across 20 keys: the
    distributed as-of join equals a brute-force per-row scan."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ntto_ray.stages.joins import asof_join_latest

    rng = np.random.RandomState(7)
    ne, no, nk = 500, 200, 20
    l_key = rng.randint(1, nk + 1, ne).astype(np.int64)
    l_ts = rng.randint(0, 1000, ne).astype(np.int64)
    l_id = np.arange(1, ne + 1, dtype=np.int64)
    r_key = rng.randint(1, nk + 1, no).astype(np.int64)
    r_ts = rng.randint(0, 1000, no).astype(np.int64)
    r_id = np.arange(1, no + 1, dtype=np.int64)

    want = []
    for i in range(ne):
        m = (r_key == l_key[i]) & (r_ts <= l_ts[i])
        if m.any():
            cand = np.flatnonzero(m)
            best = cand[np.lexsort((r_id[cand], r_ts[cand]))[-1]]
            want.append((int(l_id[i]), int(l_key[i]), int(r_id[best])))
    want.sort()

    left = ray.data.from_arrow(
        pa.table(
            {"eid": l_id, "k": l_key, "ts": pa.array(l_ts, type=pa.timestamp("us"))}
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {"oid": r_id, "k": r_key, "ots": pa.array(r_ts, type=pa.timestamp("us"))}
        )
    )
    out = asof_join_latest(
        left, right, left_key="k", right_key="k",
        left_ts="ts", right_ts="ots", left_id="eid", right_id="oid",
    ).to_pandas()
    got = sorted(
        (int(r.left_id), int(r.key), int(r.right_id)) for r in out.itertuples()
    )
    assert got == want


def test_triangle_count_handles_loops_parallels_and_direction(ray_session):
    """K4 minus one edge = 2 triangles; self-loops, reverse duplicates
    and parallel edges must not change the count."""
    import ray.data

    from ntto_ray.queries_graph_ext import triangle_count

    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("b", "a"),          # reverse duplicate of a-b
        ("a", "b"),          # parallel duplicate
        ("c", "c"),          # self-loop
    ]
    t = pa.table(
        {
            "subj": pa.array([e[0] for e in edges]),
            "obj": pa.array([e[1] for e in edges]),
        }
    )
    got = triangle_count(ray.data.from_arrow(t)).to_pandas()
    assert int(got["triangles"].iloc[0]) == 2


def test_triangle_count_empty_graph(ray_session):
    import ray.data

    from ntto_ray.queries_graph_ext import triangle_count

    t = pa.table({"subj": pa.array([], pa.string()), "obj": pa.array([], pa.string())})
    got = triangle_count(ray.data.from_arrow(t)).to_pandas()
    assert int(got["triangles"].iloc[0]) == 0


def test_funnel_strict_ordering_and_window(ray_session, tmp_path):
    """Equal-ts steps must NOT chain (strict >); >24h windows must not
    convert; a valid chain converts at its earliest completing purchase."""
    import pyarrow.parquet as pq

    from ntto_ray.registry import queries

    H = 3_600_000_000  # 1h in µs
    rows = [
        # user 1: view@0, click@1h, purchase@2h → converts at 2h
        (1, 0 * H, "view"), (1, 1 * H, "click"), (1, 2 * H, "purchase"),
        # user 2: click at SAME ts as view → chain broken, no conversion
        (2, 0 * H, "view"), (2, 0 * H, "click"), (2, 1 * H, "purchase"),
        # user 3: purchase 25h after view → outside window
        (3, 0 * H, "view"), (3, 1 * H, "click"), (3, 25 * H, "purchase"),
        # user 4: purchase at same ts as click → strict > fails
        (4, 0 * H, "view"), (4, 1 * H, "click"), (4, 1 * H, "purchase"),
        # user 5: two completions → min purchase ts wins
        (5, 0 * H, "view"), (5, 1 * H, "click"),
        (5, 3 * H, "purchase"), (5, 2 * H, "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = queries()["rel_funnel_conversions"](str(tmp_path)).to_pandas()
    got = got.sort_values("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == [1, 5]
    assert got["first_conv"].astype("int64").tolist() == [2 * H, 2 * H]


def test_triangle_count_matches_bruteforce_random(ray_session):
    """Random multigraphs (dupes, loops, both directions) vs an O(n^3)
    brute force over the simple undirected projection."""
    import itertools

    import ray.data

    from ntto_ray.queries_graph_ext import triangle_count

    rng = np.random.RandomState(11)
    for trial in range(3):
        nn = int(rng.randint(4, 16))
        ne = int(rng.randint(5, 60))
        a = rng.randint(0, nn, ne)
        b = rng.randint(0, nn, ne)
        names = np.array([f"n{i}" for i in range(nn)])
        adj = np.zeros((nn, nn), dtype=bool)
        adj[a, b] = True
        adj |= adj.T
        np.fill_diagonal(adj, False)
        want = sum(
            1
            for x, y, z in itertools.combinations(range(nn), 3)
            if adj[x, y] and adj[x, z] and adj[y, z]
        )
        t = pa.table({"subj": pa.array(names[a]), "obj": pa.array(names[b])})
        got = triangle_count(ray.data.from_arrow(t)).to_pandas()
        assert int(got["triangles"].iloc[0]) == want, f"trial {trial}"


def test_funnel_matches_bruteforce_random(ray_session, tmp_path):
    """Random event streams vs a brute-force triple loop implementing
    the oracle's strict inequalities and inclusive 24h window."""
    import pyarrow.parquet as pq

    from ntto_ray.registry import queries

    rng = np.random.RandomState(23)
    H = 3_600_000_000
    n = 400
    users = rng.randint(1, 13, n)
    # coarse ts grid deliberately FORCES equal-ts collisions
    ts = rng.randint(0, 50, n) * H
    kinds = np.array(["view", "click", "purchase", "error"])[rng.randint(0, 4, n)]
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(kinds),
            "value": pa.array([0.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    want = {}
    W = 24 * H
    for u in np.unique(users):
        m = users == u
        vt = ts[m & (kinds == "view")]
        ct = ts[m & (kinds == "click")]
        pt = ts[m & (kinds == "purchase")]
        best = None
        for v in vt:
            for c in ct[(ct > v) & (ct <= v + W)]:
                ok = pt[(pt > c) & (pt <= v + W)]
                if len(ok):
                    cand = int(ok.min())
                    best = cand if best is None else min(best, cand)
        if best is not None:
            want[int(u)] = best

    got = queries()["rel_funnel_conversions"](str(tmp_path)).to_pandas()
    got_map = dict(
        zip(
            got["user_id"].astype(int),
            got["first_conv"].astype("int64").astype(int),
        )
    )
    assert got_map == want


def test_khop_distances_matches_bruteforce_random(ray_session):
    """Random directed graphs vs brute-force BFS over the same seeds."""
    from collections import deque

    import ray.data

    from ntto_ray.stages.graph import khop_distances

    rng = np.random.RandomState(31)
    for trial in range(3):
        nn = int(rng.randint(5, 20))
        ne = int(rng.randint(5, 80))
        a = rng.randint(0, nn, ne)
        b = rng.randint(0, nn, ne)
        names = np.array([f"v{i:02d}" for i in range(nn)])
        seeds = np.array(sorted({f"v{i:02d}" for i in a[:3]}))
        k = 3

        adj = {}
        for x, y in zip(a, b):
            adj.setdefault(f"v{x:02d}", set()).add(f"v{y:02d}")
        dist = {s: 0 for s in seeds}
        q = deque(seeds)
        while q:
            u = q.popleft()
            if dist[u] >= k:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        t = pa.table({"subj": pa.array(names[a]), "obj": pa.array(names[b])})
        got = khop_distances(
            ray.data.from_arrow(t), seeds, k=k
        ).to_pandas()
        got_map = dict(zip(got["node"], got["dist"].astype(int)))
        assert got_map == dist, f"trial {trial}"


def test_kcore_peel_matches_bruteforce_random(ray_session):
    """Random multigraphs vs scalar peeling on the simple projection."""
    import ray.data

    from ntto_ray.stages.graph import kcore_peel

    rng = np.random.RandomState(41)
    for trial in range(3):
        nn = int(rng.randint(5, 18))
        ne = int(rng.randint(8, 70))
        a = rng.randint(0, nn, ne)
        b = rng.randint(0, nn, ne)
        names = np.array([f"n{i:02d}" for i in range(nn)])
        k, rounds = 3, 6

        adj = np.zeros((nn, nn), dtype=bool)
        adj[a, b] = True
        adj |= adj.T
        np.fill_diagonal(adj, False)
        alive = np.ones(nn, dtype=bool)
        for _ in range(rounds):
            deg = (adj[alive][:, alive]).sum(axis=1)
            new = alive.copy()
            new[np.flatnonzero(alive)[deg < k]] = False
            if np.array_equal(new, alive):
                break
            alive = new
        want = set(names[alive])

        t = pa.table({"subj": pa.array(names[a]), "obj": pa.array(names[b])})
        got = kcore_peel(
            ray.data.from_arrow(t), k=k, rounds=rounds
        )["node"].to_pylist()
        assert set(got) == want, f"trial {trial}"


def test_event_transitions_matches_bruteforce(ray_session, tmp_path):
    """Random event streams with ts collisions vs a scalar reference of
    the (ts, event_id)-ordered adjacent-pair counts."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ntto_ray.registry import queries

    rng = np.random.RandomState(37)
    n = 500
    users = rng.randint(1, 10, n)
    ts = rng.randint(0, 40, n).astype("int64") * 3_600_000_000
    kinds = np.array(["view", "click", "purchase"])[rng.randint(0, 3, n)]
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(kinds),
            "value": pa.array([0.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    want = Counter()
    for u in np.unique(users):
        idx = np.flatnonzero(users == u)
        idx = idx[np.lexsort((idx, ts[idx]))]
        for a, b in zip(idx[:-1], idx[1:]):
            want[(kinds[a], kinds[b])] += 1

    got = queries()["rel_event_transitions"](str(tmp_path)).to_pandas()
    got_map = {
        (r.from_type, r.to_type): int(r.cnt) for r in got.itertuples()
    }
    assert got_map == dict(want)


def test_connected_components_unionfind_matches_distributed(ray_session):
    """Random pair graphs: the small-graph union-find fast path and the
    distributed min-label rounds must produce identical labelings."""
    import ray.data

    from ntto_ray.stages.graph import connected_components

    rng = np.random.RandomState(43)
    for trial in range(3):
        ne = int(rng.randint(5, 60))
        a = rng.randint(0, 40, ne).astype(np.int64)
        b = rng.randint(0, 40, ne).astype(np.int64)
        pairs = pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})
        fast = (
            connected_components(ray.data.from_arrow(pairs))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        dist = (
            connected_components(
                ray.data.from_arrow(pairs), small_edge_threshold=0
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert fast.equals(dist), f"trial {trial}"


def test_khop_dead_end_frontier(ray_session):
    """A frontier whose nodes have no out-edges must not crash the next
    round (empty expansion → unique() returns None)."""
    import ray.data

    from ntto_ray.stages.graph import khop_distances

    t = pa.table({"subj": pa.array(["a"]), "obj": pa.array(["b"])})
    got = khop_distances(
        ray.data.from_arrow(t), np.array(["a"]), k=3
    ).to_pandas()
    m = dict(zip(got["node"], got["dist"].astype(int)))
    assert m == {"a": 0, "b": 1}
