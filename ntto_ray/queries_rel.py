"""Relational engine operators over the TPC-H-ish tables, each a
Ray-Data-first implementation with an exact DuckDB oracle.

Exactness discipline: monetary doubles are converted to integer cents
(``round(x*100)`` — the source data is exact 2-decimal) BEFORE summing,
so aggregates are order-independent integers and value-hash comparison
cannot be broken by floating-point summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ntto_ray.registry import register
from ntto_ray.stages.exchange import join_parallelism


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0))), pa.int64())


# --- filter + project + computed column -----------------------------------

@register(
    "rel_filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
         AS revenue_c4
FROM lineitem
WHERE l_quantity > 45 AND l_returnflag = 'R'
""",
)
def rel_filter_project(sf_dir: str):
    """Vectorized predicate + projection inside one map_batches (no
    per-row ds.filter)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater(t["l_quantity"], 45), pc.equal(t["l_returnflag"], "R")
        )
        t = t.filter(mask)
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents_pct(t["l_discount"])),
        )
        return pa.Table.from_arrays(
            [t["l_orderkey"], t["l_linenumber"], t["l_quantity"], rev],
            names=["l_orderkey", "l_linenumber", "l_quantity", "revenue_c4"],
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _cents_pct(arr) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0))), pa.int64())


# --- grouped aggregate (TPC-H Q1 shape) -----------------------------------

@register(
    "rel_q1_pricing",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT)                          AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_c4,
       CAST(count(*) AS BIGINT)                                 AS cnt
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def rel_q1_pricing(sf_dir: str):
    """Pricing summary: map-side cents conversion, then one grouped
    aggregate shuffle (Sum/Count) on the 2-key group."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-01", "us")))
        )
        base = _cents(t["l_extendedprice"])
        disc = pc.multiply(
            base, pc.subtract(pa.scalar(100, pa.int64()), _cents_pct(t["l_discount"]))
        )
        return pa.Table.from_arrays(
            [
                t["l_returnflag"],
                t["l_linestatus"],
                pc.cast(t["l_quantity"], pa.int64()),
                base,
                disc,
            ],
            names=["l_returnflag", "l_linestatus", "qty", "base_c", "disc_c4"],
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_c", alias_name="sum_base_c"),
            Sum("disc_c4", alias_name="sum_disc_c4"),
            Count(alias_name="cnt"),
        )
    )


# --- broadcast hash join (small dim side) ---------------------------------

@register(
    "rel_segment_sales",
    oracle="""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS num_orders,
       CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def rel_segment_sales(sf_dir: str):
    """Broadcast join: the customer dimension is ray.put once and mapped
    into each orders batch via a numpy searchsorted lookup — no shuffle
    join for a small side."""
    import ray
    from ray.data.aggregate import Count, Sum

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .to_pandas()
        .sort_values("c_custkey")
    )
    ref = ray.put((cust["c_custkey"].to_numpy(), cust["c_mktsegment"].to_numpy()))

    class JoinSegment:
        def __init__(self, ref):
            self.keys, self.segs = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t["o_custkey"].to_numpy()
            idx = np.searchsorted(self.keys, ck)
            # inner-join semantics: drop unmatched
            ok = (idx < len(self.keys)) & (self.keys[np.minimum(idx, len(self.keys) - 1)] == ck)
            t = t.filter(pa.array(ok))
            seg = self.segs[idx[ok]]
            return pa.Table.from_arrays(
                [pa.array(seg, type=pa.string()), _cents(t["o_totalprice"])],
                names=["c_mktsegment", "total_c"],
            )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = orders.map_batches(
        JoinSegment,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"ref": ref},
    )
    return joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="num_orders"), Sum("total_c", alias_name="total_c")
    )


# --- multi-way broadcast join + filter (Q3 shape) -------------------------

@register(
    "rel_nation_revenue",
    oracle="""
SELECT n.n_name,
       CAST(sum(CAST(round(s.s_acctbal*100) AS BIGINT)) AS BIGINT) AS acct_c,
       CAST(count(*) AS BIGINT) AS num_suppliers
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def rel_nation_revenue(sf_dir: str):
    """Two-table broadcast join on tiny dims (supplier × nation):
    sorted-key searchsorted lookup (the JoinSegment pattern) — one
    vectorized probe per batch, INNER-join semantics (unmatched nation
    keys are dropped, matching the oracle's JOIN)."""
    import ray
    from ray.data.aggregate import Count, Sum

    nation = (
        _read(sf_dir, "nation", ["n_nationkey", "n_name"])
        .to_pandas()
        .sort_values("n_nationkey")
    )
    ref = ray.put((nation["n_nationkey"].to_numpy(), nation["n_name"].to_numpy()))

    class JoinNation:
        def __init__(self, ref):
            self.keys, self.names = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            nk = t["s_nationkey"].to_numpy()
            idx = np.searchsorted(self.keys, nk)
            ok = (idx < len(self.keys)) & (
                self.keys[np.minimum(idx, len(self.keys) - 1)] == nk
            )
            t = t.filter(pa.array(ok))
            names = self.names[idx[ok]]
            return pa.Table.from_arrays(
                [pa.array(names, type=pa.string()), _cents(t["s_acctbal"])],
                names=["n_name", "acct_c"],
            )

    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    return (
        sup.map_batches(
            JoinNation,
            batch_format="pyarrow",
            concurrency=(1, 4),
            fn_constructor_kwargs={"ref": ref},
        )
        .groupby("n_name")
        .aggregate(Sum("acct_c", alias_name="acct_c"), Count(alias_name="num_suppliers"))
    )


# --- sort + top-k ---------------------------------------------------------

@register(
    "rel_topk_orders",
    oracle="""
SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS total_c
FROM orders
ORDER BY total_c DESC, o_orderkey ASC
LIMIT 20
""",
)
def rel_topk_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["o_orderkey"], _cents(t["o_totalprice"])],
            names=["o_orderkey", "total_c"],
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .sort(["total_c", "o_orderkey"], descending=[True, False])
        .limit(20)
    )


# --- distinct -------------------------------------------------------------

@register(
    "rel_distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def rel_distinct_segments(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment") or [])
    return pa.table({"c_mktsegment": vals})


# --- temporal groupby (date_trunc) ----------------------------------------

@register(
    "rel_orders_by_month",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS month, CAST(count(*) AS BIGINT) AS cnt
FROM orders GROUP BY 1
""",
)
def rel_orders_by_month(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.strftime(t["o_orderdate"], format="%Y-%m")], names=["month"]
        )

    return ds.map_batches(prep, batch_format="pyarrow").groupby("month").aggregate(
        Count(alias_name="cnt")
    )


# --- tumbling window over the event stream --------------------------------

@register(
    "rel_events_hourly",
    oracle="""
SELECT event_type, strftime(ts, '%Y-%m-%d %H') AS hour,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
FROM events GROUP BY 1, 2
""",
)
def rel_events_hourly(sf_dir: str):
    """Tumbling 1h window per event_type: vectorized bucket derivation +
    grouped aggregate (the streaming-window pattern for a batch log)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t["event_type"],
                pc.strftime(t["ts"], format="%Y-%m-%d %H"),
                _cents(t["value"]),
            ],
            names=["event_type", "hour", "value_c"],
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="cnt"), Sum("value_c", alias_name="value_c"))
    )


# --- sessionization (stateful per-key ordered window) ---------------------

@register(
    "rel_user_sessions",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS num_sessions,
       CAST(count(*) AS BIGINT) AS num_events
FROM ordered GROUP BY user_id
""",
)
def rel_user_sessions(sf_dir: str):
    """Session windows (30 min gap) per user — the per-key ordered-state
    pattern, fully vectorized (VERDICT r03 #2; the old per-group pandas
    ``map_groups`` paid one Python call + one 1-row DataFrame per user).
    Plan: ONE user-keyed hash exchange → per-block sort by
    (user, ts, event_id) → vectorized session-break mask over
    consecutive rows → prefix-sum reduceat per contiguous user run.
    Mirrors the ``rel_lag_delta`` kernel (queries_llm_ext.py)."""
    import numpy as np

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("num_sessions", pa.int64()),
            ("num_events", pa.int64()),
        ]
    )
    _GAP_US = 30 * 60 * 1_000_000  # strict > 30 min, like the SQL lag()

    def sess_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by(
            [
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        user = d["user_id"].to_numpy(zero_copy_only=False)
        ts_us = pc.cast(d["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gs, ge = runs(user)
        n_events = (ge - gs).astype(np.int64)
        if len(user) > 1:
            # brk[j] = 1 iff rows j and j+1 are the same user AND the
            # gap exceeds the session window; per-run break counts fall
            # out of an exclusive prefix sum over the boundary mask.
            brk = (
                (user[1:] == user[:-1]) & (ts_us[1:] - ts_us[:-1] > _GAP_US)
            ).astype(np.int64)
            cb = np.concatenate([np.zeros(1, np.int64), np.cumsum(brk)])
            n_sessions = 1 + (cb[ge - 1] - cb[gs])
        else:
            n_sessions = np.ones(len(gs), np.int64)
        return pa.table(
            {
                "user_id": pa.array(user[gs], pa.int64()),
                "num_sessions": pa.array(n_sessions, pa.int64()),
                "num_events": pa.array(n_events),
            }
        )

    grouped = hash_grouped(ds, ["user_id"])
    return grouped.map_batches(
        sess_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- union ----------------------------------------------------------------

@register(
    "rel_union_priority",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt FROM (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
) GROUP BY o_orderpriority
""",
)
def rel_union_priority(sf_dir: str):
    from ray.data.aggregate import Count

    base = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    o = base.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")).select(["o_orderpriority"]),
        batch_format="pyarrow",
    )
    f = base.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(["o_orderpriority"]),
        batch_format="pyarrow",
    )
    return o.union(f).groupby("o_orderpriority").aggregate(Count(alias_name="cnt"))


# --- distributed hash join (two large sides) -------------------------------

@register(
    "rel_hash_join_revenue",
    oracle="""
SELECT o.o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def rel_hash_join_revenue(sf_dir: str):
    """Distributed hash join (``Dataset.join``) of two large sides:
    lineitem ⋈ orders on the order key, then revenue per order priority.
    This is the shuffle-join path; the broadcast path for small dims is
    rel_segment_sales / rel_nation_revenue. Inputs are materialized
    before the join (JoinOperator aggregators deadlock small sessions
    when competing with upstream operators for CPU slots)."""
    from ray.data.aggregate import Count, Sum

    from ntto_ray.stages.canonicalize import _shuffle_parallelism

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue_c": _cents(t["l_extendedprice"]),
            }
        )

    li = li.map_batches(prep, batch_format="pyarrow").materialize()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).materialize()
    joined = li.join(
        orders,
        "inner",
        num_partitions=join_parallelism(li, orders),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return (
        joined.map_batches(
            lambda t: pa.table(
                {"priority": t["o_orderpriority"], "revenue_c": t["revenue_c"]}
            ),
            batch_format="pyarrow",
        )
        .groupby("priority")
        .aggregate(Count(alias_name="n_lines"), Sum("revenue_c", alias_name="revenue_c"))
    )
