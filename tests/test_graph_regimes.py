"""Regime-equality tests for stages/graph.py: the fold (driver-fold),
driver-vector (grouped aggregate) and dataset-resident (tag-union
exchange) execution paths of every iterative graph operator must produce
identical results on the same input — the thresholds only pick a plan,
never an answer."""

import numpy as np
import pyarrow as pa

import ray.data

from ntto_ray.stages.graph import (
    connected_components,
    kcore_peel,
    khop_distances,
    pagerank_int,
)


def _string_edge_ds(seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 60, 240)
    b = rng.integers(0, 60, 240)
    t = pa.table(
        {
            "subj": pa.array([f"n{x:03d}" for x in a], pa.string()),
            "obj": pa.array([f"n{x:03d}" for x in b], pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(5)


def _sorted_df(t: pa.Table):
    df = t.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_pagerank_three_paths_identical(ray_session):
    ds = _string_edge_ds(1)
    fold = pagerank_int(ds, iterations=4)  # 240 edges → fold path
    vec = pagerank_int(ds, iterations=4, fold_edges=0)  # driver vectors
    dset = pagerank_int(
        ds, iterations=4, fold_edges=0, max_driver_nodes=0
    )  # dataset-resident ranks
    assert _sorted_df(fold).equals(_sorted_df(vec))
    assert _sorted_df(fold).equals(_sorted_df(dset))


def test_khop_three_paths_identical(ray_session):
    ds = _string_edge_ds(2)
    seeds = np.array(["n000", "n001", "n002", "zzz-not-in-graph"])
    fold = khop_distances(ds, seeds, k=3)
    vec = khop_distances(ds, seeds, k=3, fold_edges=0)
    dset = khop_distances(ds, seeds, k=3, fold_edges=0, max_driver_nodes=0)
    assert _sorted_df(fold).equals(_sorted_df(vec))
    assert _sorted_df(fold).equals(_sorted_df(dset))


def test_kcore_three_paths_identical(ray_session):
    ds = _string_edge_ds(3)
    fold = kcore_peel(ds, k=3, rounds=6)
    vec = kcore_peel(ds, k=3, rounds=6, fold_edges=0)
    dset = kcore_peel(ds, k=3, rounds=6, fold_edges=0, max_driver_nodes=0)
    assert _sorted_df(fold).equals(_sorted_df(vec))
    assert _sorted_df(fold).equals(_sorted_df(dset))


def test_components_four_paths_identical(ray_session):
    rng = np.random.default_rng(4)
    a = rng.integers(0, 500, 400).astype(np.int64)
    b = rng.integers(0, 500, 400).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})
    ).repartition(5)
    uf = connected_components(ds)  # union-find fast path
    fold = connected_components(ds, small_edge_threshold=0)  # driver fold
    vec = connected_components(
        ds, small_edge_threshold=0, fold_edges=0
    )  # driver vectors + grouped min
    dset = connected_components(
        ds, small_edge_threshold=0, fold_edges=0, max_driver_nodes=0
    )  # dataset-resident labels
    assert _sorted_df(uf).equals(_sorted_df(fold))
    assert _sorted_df(uf).equals(_sorted_df(vec))
    assert _sorted_df(uf).equals(_sorted_df(dset))


def test_pagerank_values_match_reference_loop(ray_session):
    """Spot-check the actual numbers against a scalar reference."""
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    t = pa.table(
        {
            "subj": pa.array([e[0] for e in edges]),
            "obj": pa.array([e[1] for e in edges]),
        }
    )
    ds = ray.data.from_arrow(t)
    out = pagerank_int(ds, iterations=3).to_pandas().set_index("node")["pr"]

    scale, d = 10**9, 85
    base = (100 - d) * scale // 100
    nodes = ["a", "b", "c", "d"]
    od = {"a": 2, "b": 1, "c": 1, "d": 1}
    pr = {n: scale for n in nodes}
    for _ in range(3):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += pr[u] // od[u]
        pr = {n: base + d * s[n] // 100 for n in nodes}
    for n in nodes:
        assert out[n] == pr[n], n


def test_lpa_two_paths_identical_and_reference(ray_session):
    """LPA fold vs grouped-Sum regimes agree, and both match a local
    synchronous reference loop (mode label, ties to smallest)."""
    from ntto_ray.stages.graph import lpa_communities

    ds = _string_edge_ds(7)
    fold = lpa_communities(ds, rounds=3)  # 240 edges → fold path
    dist = lpa_communities(ds, rounds=3, fold_edges=0)  # grouped Sum
    assert _sorted_df(fold).equals(_sorted_df(dist))

    # local synchronous reference
    t = ds.to_pandas()
    nodes = np.unique(np.concatenate([t["subj"].to_numpy(), t["obj"].to_numpy()]))
    idx = {v: i for i, v in enumerate(nodes)}
    src = t["subj"].map(idx).to_numpy()
    dst = t["obj"].map(idx).to_numpy()
    lab = np.arange(len(nodes))
    for _ in range(3):
        votes = {}
        for u, v in zip(np.concatenate([src, dst]), np.concatenate([dst, src])):
            votes.setdefault(u, {}).setdefault(lab[v], 0)
            votes[u][lab[v]] += 1
        new = lab.copy()
        for u, d in votes.items():
            best = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[u] = best
        lab = new
    want = (
        pa.table(
            {
                "node": pa.array(nodes.tolist(), pa.string()),
                "community": pa.array(nodes[lab].tolist(), pa.string()),
            }
        )
    )
    assert _sorted_df(fold).equals(_sorted_df(want))


def test_env_regime_override_matches_auto(ray_session, monkeypatch):
    """NTTO_GRAPH_REGIME=dataset must force the dataset-resident-labels
    plan (the bench/sweep knob) and produce the identical result the
    auto-chosen plan gives on the same input."""
    ds = _string_edge_ds(7)
    auto = pagerank_int(ds, iterations=3)
    monkeypatch.setenv("NTTO_GRAPH_REGIME", "dataset")
    forced = pagerank_int(ds, iterations=3)
    assert _sorted_df(auto).equals(_sorted_df(forced))

    pairs = ray.data.from_arrow(
        pa.table({"doc_a": [1, 2, 5, 9], "doc_b": [2, 3, 6, 9]})
    ).repartition(2)
    monkeypatch.delenv("NTTO_GRAPH_REGIME")
    auto_cc = connected_components(pairs)
    monkeypatch.setenv("NTTO_GRAPH_REGIME", "dataset")
    forced_cc = connected_components(pairs)
    assert _sorted_df(auto_cc).equals(_sorted_df(forced_cc))


def test_multi_source_matches_per_seed_khop(ray_session):
    """MS-BFS bitmask path (fold and exchange variants) must agree with
    S independent khop_distances sweeps — per-seed distances are the
    contract, the bitmask is only compression."""
    from ntto_ray.stages.graph import multi_source_distances

    ds = _string_edge_ds(7)
    seeds = np.array(["n000", "n007", "n013", "zzz-not-in-graph"])
    fold = multi_source_distances(ds, seeds, k=3)
    vec = multi_source_distances(ds, seeds, k=3, fold_edges=0)
    dset = multi_source_distances(
        ds, seeds, k=3, fold_edges=0, max_driver_nodes=0
    )
    assert _sorted_df(fold).equals(_sorted_df(vec))
    assert _sorted_df(fold).equals(_sorted_df(dset))

    got = fold.to_pandas()
    for s in seeds:
        one = khop_distances(ds, np.array([s]), k=3).to_pandas()
        mine = (
            got[got["seed"] == s][["node", "dist"]]
            .sort_values("node")
            .reset_index(drop=True)
        )
        want = one.sort_values("node").reset_index(drop=True)
        assert mine.equals(want), f"seed {s} disagrees with khop"


def test_personalized_pagerank_three_paths_identical(ray_session):
    ds = _string_edge_ds(11)
    seeds = np.array(["n000", "n005", "zzz-not-in-graph"])
    fold = pagerank_int(ds, iterations=4, teleport_to=seeds)
    vec = pagerank_int(ds, iterations=4, fold_edges=0, teleport_to=seeds)
    dset = pagerank_int(
        ds, iterations=4, fold_edges=0, max_driver_nodes=0, teleport_to=seeds
    )
    assert _sorted_df(fold).equals(_sorted_df(vec))
    assert _sorted_df(fold).equals(_sorted_df(dset))
    # seeds hold mass; a node unreachable from any seed has rank 0
    df = fold.to_pandas().set_index("node")["pr"]
    assert df.loc["n000"] > 0
