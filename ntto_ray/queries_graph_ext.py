"""Extra graph analytics over the canonical KG (engine surface on top of
the reference's triple model, cmd/ntto/ntto.go:36-50 — the reference has
no graph operators at all, SURVEY §2.2).

kg_triangles counts triangles in the undirected projection of the
canonical subj→obj graph with the degree-ordered node-iterator algorithm
(Schank & Wagner 2005, "Finding, Counting and Listing All Triangles in
Large Graphs"): orient every edge from its lower-(degree, id)-rank
endpoint to the higher one, emit the out-neighbor pairs of each node as
candidate closing edges, and count the candidates that are edges. Total
wedge volume is O(m^1.5) regardless of degree skew — the property that
makes the operator survive hub nodes at 100 TB, where the naive
group-by-node pair expansion is quadratic in the hub degree."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ntto_ray.registry import register


def triangle_count(
    edges_ds: ray.data.Dataset,
    *,
    src_col: str = "subj",
    dst_col: str = "obj",
) -> pa.Table:
    """Exact triangle count of the undirected simple graph induced by the
    (string-node) edge dataset; self-loops dropped, parallel edges
    collapsed.

    Plan — exactly TWO all-to-all exchanges on the data-scale path
    (node-scale vectors live on the driver, the same bounded budget as
    stages/graph.pagerank_int):
      1. one distributed pass emits per-block (node, count) partials;
         a node-scale grouped Sum gives the sorted node vector AND
         multigraph degrees → rank = lexsort(deg, id), ``ray.put``.
         (Degree rank is a heuristic total order — ANY total order is
         correct; degree order gives the O(m^1.5) wedge bound.)
      2. edges map to int ids, orient low-rank→high-rank, drop
         self-loops → hash exchange on ``src``. Because every copy of
         an edge shares its src, a per-block ``np.unique`` IS the
         global parallel-edge collapse — no separate distinct exchange.
         The same kernel then expands each rank-sorted out-neighborhood
         into wedge partials (triangular-index trick, no Python pair
         loop) and emits the distinct oriented edges alongside.
      3. hash exchange on the packed pair key co-locates wedges with
         their would-be closing edge; a per-block fold sums wedge
         counts of runs that contain an edge row → one tiny partial per
         block, summed on the driver.
    """
    from ray.data.aggregate import Sum

    from ntto_ray.stages.exchange import (
        NO_FUSE_ARGS,
        adaptive_parallelism,
        hash_grouped,
        runs,
    )

    edges = edges_ds.select_columns([src_col, dst_col]).materialize()
    nparts = adaptive_parallelism(edges.count())
    edges.context.default_hash_shuffle_parallelism = nparts

    _NODE = pa.schema([("node", pa.string()), ("c", pa.int64())])

    def node_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _NODE.empty_table()
        a = t[src_col].to_numpy(zero_copy_only=False)
        b = t[dst_col].to_numpy(zero_copy_only=False)
        u, c = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table({"node": pa.array(u.tolist(), pa.string()), "c": c})

    degp = (
        edges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    if not len(degp):
        return pa.table({"triangles": pa.array([0], pa.int64())})
    degp = degp.sort_values("node").reset_index(drop=True)
    nodes = degp["node"].to_numpy(dtype=np.str_)  # unicode → searchsorted in C
    deg = degp["c"].to_numpy(dtype=np.int64)
    n = len(nodes)
    rank = np.empty(n, dtype=np.int64)
    rank[np.lexsort((np.arange(n), deg))] = np.arange(n, dtype=np.int64)
    nodes_ref = ray.put(nodes)
    rank_ref = ray.put(rank)

    _OR = pa.schema([("src", pa.int64()), ("okey", pa.int64())])

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OR.empty_table()
        nd, rk = ray.get(nodes_ref), ray.get(rank_ref)
        a = np.searchsorted(nd, t[src_col].to_numpy(zero_copy_only=False))
        b = np.searchsorted(nd, t[dst_col].to_numpy(zero_copy_only=False))
        keep = a != b  # drop self-loops
        a, b = a[keep], b[keep]
        fwd = rk[a] < rk[b]
        src = np.where(fwd, a, b)
        dst = np.where(fwd, b, a)
        return pa.table({"src": src, "okey": src * n + dst})

    _W = pa.schema([("key", pa.int64()), ("cnt", pa.int64()), ("edge", pa.int64())])

    def wedges_and_edges(t: pa.Table) -> pa.Table:
        """Block holds EVERY copy of each of its src's edges: unique =
        global parallel-edge collapse. Then per src-run, rank-sort the
        out-neighborhood and expand all ordered pairs with the
        triangular-index trick; emit packed wedge partial counts plus
        the distinct oriented edges themselves (edge=1 rows)."""
        if t.num_rows == 0:
            return _W.empty_table()
        rk = ray.get(rank_ref)
        okey = np.unique(t["okey"].to_numpy())  # sorted → src-major runs
        src, dst = okey // n, okey % n
        e_rows = pa.table(
            {
                "key": okey,
                "cnt": np.zeros(len(okey), dtype=np.int64),
                "edge": np.ones(len(okey), dtype=np.int64),
            }
        )
        starts, ends = runs(src)
        # rank-sort neighbors within each run (stable on the src grouping)
        order = np.lexsort((rk[dst], src))
        d_sorted = dst[order]
        idx = np.arange(len(d_sorted), dtype=np.int64)
        cnt_el = np.repeat(ends, ends - starts) - idx - 1  # pairs anchored at idx
        total = int(cnt_el.sum())
        if total == 0:
            return e_rows
        off = np.concatenate(([0], np.cumsum(cnt_el)[:-1]))
        a_idx = np.repeat(idx, cnt_el)
        b_idx = a_idx + 1 + (np.arange(total, dtype=np.int64) - np.repeat(off, cnt_el))
        wkey = d_sorted[a_idx] * n + d_sorted[b_idx]
        u, c = np.unique(wkey, return_counts=True)
        w_rows = pa.table(
            {
                "key": u.astype(np.int64),
                "cnt": c.astype(np.int64),
                "edge": np.zeros(len(u), dtype=np.int64),
            }
        )
        return pa.concat_tables([w_rows, e_rows])

    tagged = hash_grouped(
        edges.map_batches(orient, batch_format="pyarrow"),
        ["src"],
        parallelism=nparts,
        sort=False,  # the kernel sorts via np.unique; ALSO: a sort=True
        # exchange crashes on partitions that receive zero blocks (the
        # aggregator finalizes a schema-less table and sort_by fails) —
        # tiny graphs leave partitions empty
    ).map_batches(
        wedges_and_edges, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )

    _PART = pa.schema([("t", pa.int64())])

    def close_partial(t: pa.Table) -> pa.Table:
        """Key-grouped block (sorted here): a pair key closes iff its run contains an
        edge row; the block's triangle partial is the wedge-count sum of
        closing runs."""
        if t.num_rows == 0:
            return _PART.empty_table()
        order = np.argsort(t["key"].to_numpy(), kind="stable")
        k = t["key"].to_numpy()[order]
        cnt = t["cnt"].to_numpy()[order]
        edge = t["edge"].to_numpy()[order]
        starts, ends = runs(k)
        csum = np.concatenate(([0], np.cumsum(cnt)))
        esum = np.concatenate(([0], np.cumsum(edge)))
        has_edge = (esum[ends] - esum[starts]) > 0
        tri = int((csum[ends] - csum[starts])[has_edge].sum())
        return pa.table({"t": pa.array([tri], pa.int64())})

    parts = (
        hash_grouped(tagged, ["key"], parallelism=nparts, sort=False)
        .map_batches(close_partial, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS)
        .to_pandas()
    )
    total = int(parts["t"].sum()) if len(parts) else 0
    return pa.table({"triangles": pa.array([total], pa.int64())})


@register("kg_triangles", oracle=None)  # oracle filled by _late_oracle below
def kg_triangles(sf_dir: str):
    from ntto_ray.pipelines.kg import run_kg_pipeline

    return triangle_count(run_kg_pipeline(sf_dir).select_columns(["subj", "obj"]))


_KHOP_SEEDS = 10
_KHOP_K = 4


@register("kg_khop_reach", oracle=None)  # oracle filled by _late_oracle below
def kg_khop_reach(sf_dir: str):
    """K-hop BFS reachability over the canonical KG: hop distance
    (≤ {_KHOP_K}) from the {_KHOP_SEEDS} lexicographically-first subject
    entities, via BSP frontier expansion (stages/graph.khop_distances —
    one vectorized edge-scan per round, node-scale exchanges). The seed
    rule is deterministic so the whole query is bit-exactly mirrorable
    as an unrolled min-dist CTE chain. Reference has no graph operators
    (engine surface on the ntto.go:36-50 triple model, SURVEY §2.2)."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.graph import khop_distances

    edges = run_kg_pipeline(sf_dir).select_columns(["subj", "obj"]).materialize()

    def emit_src(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("s", pa.string())]).empty_table()
        return pa.table(
            {"s": np.unique(t["subj"].to_numpy(zero_copy_only=False))}
        )

    srcs = sorted(
        edges.map_batches(emit_src, batch_format="pyarrow").unique("s") or []
    )
    seeds = np.array(srcs[:_KHOP_SEEDS])
    return khop_distances(edges, seeds, k=_KHOP_K)


_KCORE_K = 3
_KCORE_ROUNDS = 6


@register("kg_kcore", oracle=None)  # oracle filled by _late_oracle below
def kg_kcore(sf_dir: str):
    """{_KCORE_K}-core of the canonical KG's undirected simple
    projection via {_KCORE_ROUNDS} bounded peeling rounds
    (stages/graph.kcore_peel) — fixed rounds make the iterative
    distributed algorithm definitionally identical to the unrolled SQL
    mirror; near-clique KGs converge in 2-3 rounds and the fixpoint
    early-break is identity on both sides."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.graph import kcore_peel

    return kcore_peel(
        run_kg_pipeline(sf_dir).select_columns(["subj", "obj"]),
        k=_KCORE_K,
        rounds=_KCORE_ROUNDS,
    )


def _late_oracle():
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules
    from ntto_ray.registry import _ORACLES

    canon = K.triples_canonical_sql(pipeline_rules())

    # MATERIALIZED is load-bearing: `und` is referenced 2×rounds times
    # and each alive{r} twice — plain CTEs re-evaluate per reference
    # (re-reading the parquet through `canon` until the process runs out
    # of file handles).
    kcore_cte = [
        f"canon AS MATERIALIZED ({canon})",
        "und AS MATERIALIZED (SELECT DISTINCT least(subj, obj) AS a,"
        " greatest(subj, obj) AS b FROM canon WHERE subj <> obj)",
        "alive0 AS MATERIALIZED"
        " (SELECT a AS node FROM und UNION SELECT b FROM und)",
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        kcore_cte.append(f"""deg{r} AS (
  SELECT node, count(*) AS c FROM (
    SELECT u.a AS node FROM und u
      JOIN alive{r - 1} x ON x.node = u.a
      JOIN alive{r - 1} y ON y.node = u.b
    UNION ALL
    SELECT u.b AS node FROM und u
      JOIN alive{r - 1} x ON x.node = u.a
      JOIN alive{r - 1} y ON y.node = u.b
  ) GROUP BY node
),
alive{r} AS MATERIALIZED (SELECT node FROM deg{r} WHERE c >= {_KCORE_K})""")
    _ORACLES["kg_kcore"] = (
        "WITH "
        + ",\n".join(kcore_cte)
        + f"\nSELECT node FROM alive{_KCORE_ROUNDS}"
    )

    khop_cte = [
        f"canon AS MATERIALIZED ({canon})",
        "edges AS MATERIALIZED"
        " (SELECT DISTINCT subj AS src, obj AS dst FROM canon)",
        f"seeds AS (SELECT DISTINCT src AS node FROM edges"
        f" ORDER BY node LIMIT {_KHOP_SEEDS})",
        "d0 AS (SELECT node, 0 AS dist FROM seeds)",
    ]
    for r in range(1, _KHOP_K + 1):
        khop_cte.append(f"""d{r} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{r - 1}
    UNION ALL
    SELECT e.dst AS node, p.dist + 1 AS dist
    FROM d{r - 1} p JOIN edges e ON e.src = p.node
  ) GROUP BY node
)""")
    _ORACLES["kg_khop_reach"] = (
        "WITH "
        + ",\n".join(khop_cte)
        + f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM d{_KHOP_K}"
    )

    _ORACLES["kg_triangles"] = f"""
WITH canon AS ({canon}),
und AS (
  SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
  FROM canon WHERE subj <> obj
)
SELECT CAST(count(*) AS BIGINT) AS triangles
FROM und e1
JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
""".strip()


_late_oracle()


_LPA_ROUNDS = 3


@register("kg_lpa_communities", oracle=None)  # oracle filled below
def kg_lpa_communities(sf_dir: str):
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007) over the canonical KG's undirected multigraph:
    {_LPA_ROUNDS} fixed rounds, most-frequent-neighbor-label updates with
    ties to the lexicographically smallest label — the deterministic LPA
    variant, so the distributed rounds (stages/graph.lpa_communities:
    per-block vote partials + grouped Sum or driver fold, label vector
    broadcast per round) are bit-identical to the unrolled SQL mirror."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.graph import lpa_communities

    return lpa_communities(
        run_kg_pipeline(sf_dir).select_columns(["subj", "obj"]),
        rounds=_LPA_ROUNDS,
    )


def _late_oracle_lpa():
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules
    from ntto_ray.registry import _ORACLES

    canon = K.triples_canonical_sql(pipeline_rules())
    # multigraph votes: one row per canonical triple per direction (a
    # self-loop therefore votes its own label twice) — matches the Ray
    # side's concat(sid,did) exactly. MATERIALIZED: und is referenced
    # once per round; labels l{r} twice.
    cte = [
        f"canon AS MATERIALIZED ({canon})",
        "und AS MATERIALIZED (SELECT subj AS a, obj AS b FROM canon"
        " UNION ALL SELECT obj AS a, subj AS b FROM canon)",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM und)",
    ]
    for r in range(1, _LPA_ROUNDS + 1):
        cte.append(f"""l{r} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT u.a AS node, p.label, count(*) AS c,
           row_number() OVER (
             PARTITION BY u.a ORDER BY count(*) DESC, p.label ASC
           ) AS rn
    FROM und u JOIN l{r - 1} p ON p.node = u.b
    GROUP BY u.a, p.label
  ) WHERE rn = 1
)""")
    _ORACLES["kg_lpa_communities"] = (
        "WITH "
        + ",\n".join(cte)
        + f"\nSELECT node, label AS community FROM l{_LPA_ROUNDS}"
    )


_late_oracle_lpa()


# --- deterministic random walks (DeepWalk-style walk generation) -----------

_WALK_SEEDS = 20   # walks start at the lexicographically-first subjects
_WALKS_PER = 2     # walk ids per seed
_WALK_LEN = 4      # steps per walk
_WALK_C1 = 0x9E3779B97F4A7C15  # walk-id mix constant
_WALK_C2 = 0xC2B2AE3D27D4EB4F  # step mix constant


def _md5u64_py(s: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


@register("kg_random_walks", oracle=None)  # oracle filled below
def kg_random_walks(sf_dir: str):
    """Walk generation for graph embeddings (DeepWalk — Perozzi et al.
    KDD 2014): {_WALKS_PER} walks of length {_WALK_LEN} from each of the
    {_WALK_SEEDS} lexicographically-first subjects, where step t from
    node v picks sorted-neighbor index
    splitmix64(md5u64(v) XOR walk*C1 XOR t*C2) mod deg(v) — the
    hash-derandomized pick makes the walks bit-reproducible and exactly
    SQL-mirrorable (classic DeepWalk draws from an RNG). Walks traverse
    the UNDIRECTED graph (DeepWalk's convention; directed walks on this
    KG would die at step 2 — most objects never appear as subjects), so
    every step succeeds and all walks have full length.

    Scale shape: the distinct-sorted adjacency (subj, idx, deg, obj)
    builds once via the same subject-keyed exchange as characteristic
    sets and STAYS distributed; the frontier is walk-scale (seeds ×
    walks) by construction, so each step broadcasts the tiny frontier
    and runs one vectorized pass over adjacency blocks — L passes, zero
    additional exchanges, nothing node-scale on the driver."""
    import pandas as pd

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs
    from ntto_ray.stages.sketch import splitmix64

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "obj"])

    _PAIRS = pa.schema([("subj", pa.string()), ("obj", pa.string())])
    _ADJ = pa.schema(
        [
            ("subj", pa.string()),
            ("idx", pa.int64()),
            ("deg", pa.int64()),
            ("obj", pa.string()),
        ]
    )

    def pair_distinct(t: pa.Table) -> pa.Table:
        # UNDIRECTED edges (DeepWalk's convention — and on this KG most
        # objects never appear as subjects, so directed walks would die
        # at step 2): emit both orientations, then block-local distinct.
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _PAIRS.empty_table()
        both = pa.concat_tables(
            [
                t.select(["subj", "obj"]),
                t.select(["obj", "subj"]).rename_columns(["subj", "obj"]),
            ]
        )
        return both.group_by(["subj", "obj"]).aggregate([])

    def adj_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _ADJ.empty_table()
        d = t.group_by(["subj", "obj"]).aggregate([])  # whole subjects/block
        d = d.sort_by([("subj", "ascending"), ("obj", "ascending")])
        subj = d["subj"].to_numpy(zero_copy_only=False)
        starts, ends = runs(subj)
        n = len(subj)
        deg = np.zeros(n, dtype=np.int64)
        idx = np.arange(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            deg[s:e] = e - s
            idx[s:e] -= s
        return pa.table(
            {
                "subj": d["subj"],
                "idx": pa.array(idx),
                "deg": pa.array(deg),
                "obj": d["obj"],
            }
        )

    adj = (
        hash_grouped(
            canon.map_batches(pair_distinct, batch_format="pyarrow"), ["subj"]
        )
        .map_batches(
            adj_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
        )
        .materialize()
    )

    def emit_subj(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return pa.schema([("s", pa.string())]).empty_table()
        return pa.table(
            {"s": np.unique(t["subj"].to_numpy(zero_copy_only=False))}
        )

    seeds = sorted(
        adj.map_batches(emit_subj, batch_format="pyarrow").unique("s") or []
    )[:_WALK_SEEDS]

    frontier = pd.DataFrame(
        [
            {"walk": w, "seed": s, "cur": s}
            for s in seeds
            for w in range(_WALKS_PER)
        ]
    )
    out = [frontier.assign(step=0)[["walk", "seed", "step", "cur"]]]

    _STEP = pa.schema(
        [("walk", pa.int64()), ("seed", pa.string()), ("cur", pa.string())]
    )

    for t_step in range(1, _WALK_LEN + 1):
        if not len(frontier):
            break
        pre = np.array(
            [
                (_md5u64_py(c) ^ (w * _WALK_C1) ^ (t_step * _WALK_C2))
                & ((1 << 64) - 1)
                for w, c in zip(frontier["walk"], frontier["cur"])
            ],
            dtype=np.uint64,
        )
        fr = pa.table(
            {
                "walk": pa.array(frontier["walk"].to_numpy(), pa.int64()),
                "seed": pa.array(frontier["seed"], pa.string()),
                "cur": pa.array(frontier["cur"], pa.string()),
                "pick_h": pa.array(splitmix64(pre), pa.uint64()),
            }
        )
        import ray as _ray

        fref = _ray.put(fr)

        def step(t: pa.Table, *, ref=fref) -> pa.Table:
            if t.num_rows == 0 or "subj" not in t.column_names:
                return _STEP.empty_table()
            f = _ray.get(ref)
            subj = t["subj"].to_numpy(zero_copy_only=False)
            mask = np.isin(f["cur"].to_numpy(zero_copy_only=False), subj)
            if not mask.any():
                return _STEP.empty_table()
            idx_col = t["idx"].to_numpy()
            deg_col = t["deg"].to_numpy()
            obj = t["obj"].to_numpy(zero_copy_only=False)
            order = np.argsort(subj, kind="stable")
            walks, seeds_o, nexts = [], [], []
            fc = f["cur"].to_numpy(zero_copy_only=False)
            fw = f["walk"].to_numpy()
            fs = f["seed"].to_numpy(zero_copy_only=False)
            fh = f["pick_h"].to_numpy()
            for i in np.flatnonzero(mask):
                lo = np.searchsorted(subj[order], fc[i], side="left")
                if lo >= len(order) or subj[order[lo]] != fc[i]:
                    continue
                row0 = order[lo]
                # rows of this subject are contiguous in the sorted view
                deg = int(deg_col[row0])
                pick = int(fh[i] % np.uint64(deg))
                j = order[lo + (pick - int(idx_col[row0]))]
                walks.append(int(fw[i]))
                seeds_o.append(fs[i])
                nexts.append(obj[j])
            return pa.table(
                {
                    "walk": pa.array(walks, pa.int64()),
                    "seed": pa.array(seeds_o, pa.string()),
                    "cur": pa.array(nexts, pa.string()),
                }
            )

        frontier = adj.map_batches(
            step, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
        ).to_pandas()
        out.append(frontier.assign(step=t_step)[["walk", "seed", "step", "cur"]])

    res = pd.concat(out, ignore_index=True).rename(columns={"cur": "node"})
    return res.reset_index(drop=True)


def _late_oracle_walks():
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules
    from ntto_ray.registry import _ORACLES
    from ntto_ray.stages.sketch import splitmix64_sql

    canon = K.triples_canonical_sql(pipeline_rules())
    hexp = "'0123456789abcdef'"
    md5u64 = "CAST(" + " + ".join(
        f"CAST(((strpos({hexp}, substr(mh, {2 * j + 1}, 1)) - 1) * 16"
        f" + (strpos({hexp}, substr(mh, {2 * j + 2}, 1)) - 1)) AS HUGEINT)"
        f" * {256 ** j}" for j in range(8)
    ) + " AS UBIGINT)"
    # per-walk XOR constants carried as literals (wmix = walk * C1 for
    # the enumerated walk ids — no UBIGINT multiply needed in SQL)
    walk_rows = ",".join(
        f"({w}, CAST({(w * _WALK_C1) & ((1 << 64) - 1)} AS UBIGINT))"
        for w in range(_WALKS_PER)
    )
    cte = [
        f"canon AS MATERIALIZED ({canon})",
        """adj AS MATERIALIZED (
  SELECT subj, obj,
         row_number() OVER (PARTITION BY subj ORDER BY obj) - 1 AS idx,
         count(*) OVER (PARTITION BY subj) AS deg
  FROM (SELECT DISTINCT subj, obj FROM (
    SELECT subj, obj FROM canon
    UNION ALL SELECT obj AS subj, subj AS obj FROM canon))
)""",
        f"""seeds AS (SELECT subj AS node FROM (SELECT DISTINCT subj FROM adj)
  ORDER BY node LIMIT {_WALK_SEEDS})""",
        f"""w0 AS MATERIALIZED (
  SELECT w.walk, w.wmix, s.node AS seed, s.node AS cur
  FROM seeds s CROSS JOIN (VALUES {walk_rows}) w(walk, wmix)
)""",
    ]
    for t in range(1, _WALK_LEN + 1):
        tc2 = (t * _WALK_C2) & ((1 << 64) - 1)
        pick = splitmix64_sql(
            f"xor(xor({md5u64}, p.wmix), CAST({tc2} AS UBIGINT))"
        )
        cte.append(f"""w{t} AS MATERIALIZED (
  SELECT p.walk, p.wmix, p.seed, a.obj AS cur
  FROM (SELECT walk, wmix, seed, cur, md5(cur) AS mh FROM w{t - 1}) p
  JOIN adj a ON a.subj = p.cur
  WHERE a.idx = CAST({pick} % CAST(a.deg AS UBIGINT) AS BIGINT)
)""")
    sel = "\nUNION ALL ".join(
        f"SELECT walk, seed, CAST({t} AS BIGINT) AS step, cur AS node FROM w{t}"
        for t in range(_WALK_LEN + 1)
    )
    _ORACLES["kg_random_walks"] = "WITH " + ",\n".join(cte) + "\n" + sel


_late_oracle_walks()
