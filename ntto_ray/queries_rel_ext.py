"""Extended relational operators (round 2): as-of join, sliding window,
anti join, top-k per group, exact distributed quantiles — each
Ray-Data-first with an exact DuckDB oracle. Same exactness discipline as
queries_rel.py (monetary doubles → integer cents before any aggregate)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ntto_ray.queries_rel import _cents, _read
from ntto_ray.registry import register
from ntto_ray.stages.exchange import join_parallelism


# --- as-of join (event → latest order at-or-before) -----------------------

@register(
    "rel_asof_join",
    oracle="""
WITH cand AS (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, o_orderkey FROM cand WHERE rn = 1
""",
)
def rel_asof_join(sf_dir: str):
    """As-of join: each event matched to the latest order (by
    o_orderdate, ties to max o_orderkey) of the same user at-or-before
    the event timestamp — the custom operator Ray Data lacks, built as
    one tag-union hash exchange + per-key binary search
    (stages/joins.py)."""
    from ntto_ray.stages.joins import asof_join_latest

    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    joined = asof_join_latest(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        left_id="event_id",
        right_id="o_orderkey",
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "event_id": t["left_id"],
                "user_id": t["key"],
                "o_orderkey": t["right_id"],
            }
        ),
        batch_format="pyarrow",
    )


# --- sliding window (1 h length, 15 min slide) ----------------------------

_SLIDE_US = 15 * 60 * 1_000_000
_WINDOWS_PER_EVENT = 4  # 60 min / 15 min


@register(
    "rel_sliding_window",
    oracle=f"""
SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts) - to_minutes(15*j.j),
                '%Y-%m-%d %H:%M') AS window_start,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
FROM events
CROSS JOIN (SELECT unnest(generate_series(0, {_WINDOWS_PER_EVENT - 1})) AS j) j
GROUP BY 1
""",
)
def rel_sliding_window(sf_dir: str):
    """Sliding 60-minute window advancing every 15 minutes over the event
    stream: each event expands to its 4 covering window starts inside
    map_batches (vectorized int64 arithmetic — no self-join), then one
    grouped aggregate. The overlap factor (4×) is the map-side fan-out;
    the shuffle moves window-scale partials only."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "value"])

    def expand(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        base = ts - (ts % _SLIDE_US)
        starts = (
            base[None, :] - (np.arange(_WINDOWS_PER_EVENT, dtype=np.int64) * _SLIDE_US)[:, None]
        ).ravel()
        val = np.tile(_cents(t["value"]).to_numpy(), _WINDOWS_PER_EVENT)
        win = pc.strftime(
            pa.array(starts, type=pa.int64()).cast(pa.timestamp("us")),
            format="%Y-%m-%d %H:%M",
        )
        return pa.table({"window_start": win, "value_c": val})

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(alias_name="cnt"), Sum("value_c", alias_name="value_c"))
    )


# --- anti join (native Dataset.join left_anti) -----------------------------

@register(
    "rel_anti_join",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
)
def rel_anti_join(sf_dir: str):
    """Customers with no URGENT order — Ray's native distributed
    ``Dataset.join(left_anti)`` (hash-shuffle on both sides). The right
    side is pre-filtered and projected to its key column at the read, so
    the shuffle moves keys only."""
    from ntto_ray.stages.exchange import shuffle_parallelism

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).materialize()
    urgent = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": t.filter(
                        pc.equal(t["o_orderpriority"], "1-URGENT")
                    )["o_custkey"]
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    return cust.join(
        urgent,
        "left_anti",
        num_partitions=join_parallelism(cust, urgent),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )


# --- top-k per group (combiner + final reduce) -----------------------------

_TOPK_K = 3


@register(
    "rel_topk_per_group",
    oracle=f"""
WITH t AS (
  SELECT o_orderpriority AS priority, o_orderkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS total_c,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY round(o_totalprice*100) DESC, o_orderkey ASC
         ) AS rank
  FROM orders
)
SELECT priority, o_orderkey, total_c, CAST(rank AS BIGINT) AS rank
FROM t WHERE rank <= {_TOPK_K}
""",
)
def rel_topk_per_group(sf_dir: str):
    """Top-3 orders by price per priority: per-batch vectorized partial
    top-k (map-side combiner bounds shuffle volume at k × groups ×
    blocks), then a tiny per-group final reduce on a group-safe
    hash exchange (hash_grouped + runs — not map_groups, whose
    sort-shuffle range partitioning can split a key across blocks,
    see stages/exchange.py)."""
    from ntto_ray.stages.exchange import hash_grouped, runs

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])

    def partial_topk(t: pa.Table) -> pa.Table:
        pri = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        okey = t["o_orderkey"].to_numpy()
        total = _cents(t["o_totalprice"]).to_numpy()
        codes, inv = np.unique(pri, return_inverse=True)
        order = np.lexsort((okey, -total, inv))
        inv_s = inv[order]
        starts = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])
        rank = np.arange(len(inv_s)) - np.repeat(starts, np.diff(np.r_[starts, len(inv_s)]))
        keep = order[rank < _TOPK_K]
        return pa.table(
            {
                "priority": pa.array(pri[keep], type=pa.string()),
                "o_orderkey": okey[keep],
                "total_c": total[keep],
            }
        )

    out_schema = pa.schema(
        [
            ("priority", pa.string()),
            ("o_orderkey", pa.int64()),
            ("total_c", pa.int64()),
            ("rank", pa.int64()),
        ]
    )

    def final_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "priority" not in t.column_names:
            return out_schema.empty_table()
        pri = t["priority"].to_numpy(zero_copy_only=False)
        okey = t["o_orderkey"].to_numpy()
        total = t["total_c"].to_numpy()
        cols = {k: [] for k in out_schema.names}
        starts, ends = runs(pri)
        for s, e in zip(starts, ends):
            order = np.lexsort((okey[s:e], -total[s:e]))[:_TOPK_K]
            k = len(order)
            cols["priority"].append(np.repeat(pri[s], k))
            cols["o_orderkey"].append(okey[s:e][order])
            cols["total_c"].append(total[s:e][order])
            cols["rank"].append(np.arange(1, k + 1, dtype=np.int64))
        if not cols["priority"]:
            return out_schema.empty_table()
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(cols["priority"]), type=pa.string()),
                pa.array(np.concatenate(cols["o_orderkey"]), type=pa.int64()),
                pa.array(np.concatenate(cols["total_c"]), type=pa.int64()),
                pa.array(np.concatenate(cols["rank"]), type=pa.int64()),
            ],
            schema=out_schema,
        )

    partial = ds.map_batches(partial_topk, batch_format="pyarrow")
    grouped = hash_grouped(partial, ["priority"], sort=True)
    return grouped.map_batches(final_topk, batch_size=None, batch_format="pyarrow")


# --- exact distributed quantiles (value-count exchange) --------------------

_QUANTILES = (0.5, 0.9)


@register(
    "rel_group_quantiles",
    oracle="""
SELECT l_returnflag,
       quantile_disc(CAST(round(l_extendedprice*100) AS BIGINT), 0.5) AS p50_c,
       quantile_disc(CAST(round(l_extendedprice*100) AS BIGINT), 0.9) AS p90_c,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1
""",
)
def rel_group_quantiles(sf_dir: str):
    """EXACT per-group quantiles without sorting the data: map-side
    value-count compression (C++ group_by per batch), one hash exchange
    keyed on the group, then per-group quantile from the cumulative
    value counts. Shuffle volume is distinct (group, value) pairs —
    bounded by the value domain, not the row count. quantile_disc
    semantics: element at index ceil(q*n) - 1 of the sorted values."""
    from ntto_ray.stages.exchange import hash_grouped, runs

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def value_counts(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {"l_returnflag": t["l_returnflag"], "v": _cents(t["l_extendedprice"])}
        )
        g = t2.group_by(["l_returnflag", "v"]).aggregate([([], "count_all")])
        return g.select(["l_returnflag", "v", "count_all"]).rename_columns(
            ["l_returnflag", "v", "cnt"]
        )

    out_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("p50_c", pa.int64()),
            ("p90_c", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def quantiles(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_returnflag" not in t.column_names:
            return out_schema.empty_table()
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy()
        cnt = t["cnt"].to_numpy()
        flags, p50s, p90s, ns = [], [], [], []
        starts, ends = runs(flag)
        for s, e in zip(starts, ends):
            order = np.argsort(v[s:e], kind="mergesort")
            vv, cc = v[s:e][order], cnt[s:e][order]
            # merge duplicate values arriving from different blocks
            firsts = np.r_[True, vv[1:] != vv[:-1]]
            vv2 = vv[firsts]
            cc2 = np.add.reduceat(cc, np.flatnonzero(firsts))
            cum = np.cumsum(cc2)
            n = int(cum[-1])
            qi = [int(np.ceil(q * n)) - 1 for q in _QUANTILES]
            picks = [int(vv2[np.searchsorted(cum, i + 1)]) for i in qi]
            flags.append(flag[s])
            p50s.append(picks[0])
            p90s.append(picks[1])
            ns.append(n)
        return pa.Table.from_arrays(
            [
                pa.array(flags, type=pa.string()),
                pa.array(p50s, type=pa.int64()),
                pa.array(p90s, type=pa.int64()),
                pa.array(ns, type=pa.int64()),
            ],
            schema=out_schema,
        )

    partial = ds.map_batches(value_counts, batch_format="pyarrow")
    grouped = hash_grouped(partial, ["l_returnflag"], sort=True)
    return grouped.map_batches(quantiles, batch_size=None, batch_format="pyarrow")


# --- semi-structured extraction (JSON props column) ------------------------

@register(
    "rel_json_extract",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY 1
""",
)
def rel_json_extract(sf_dir: str):
    """Semi-structured column extraction: pull the integer field ``k``
    out of the JSON ``props`` string with ONE vectorized
    ``extract_regex`` kernel (the props schema is fixed '{"k": N}' —
    a general parser would be a per-row json.loads fallback, the
    sources/ndjson.py pattern), then a grouped aggregate."""
    from ray.data.aggregate import Count, Max, Sum

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            t["props"].combine_chunks(), pattern=r'"k":\s*(?P<k>-?\d+)'
        )
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    return (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="cnt"),
            Sum("k", alias_name="sum_k"),
            Max("k", alias_name="max_k"),
        )
    )


# --- interval self-join (trailing-window rate count) -----------------------

@register(
    "rel_range_join",
    oracle="""
SELECT a.event_id, a.user_id,
       CAST(count(b.event_id) AS BIGINT) AS n_prev_hour
FROM events a LEFT JOIN events b
  ON b.user_id = a.user_id AND b.ts <= a.ts
 AND b.ts > a.ts - INTERVAL 1 HOUR AND b.event_id != a.event_id
GROUP BY 1, 2
""",
)
def rel_range_join(sf_dir: str):
    """Trailing-window rate count (events per user in the preceding
    hour) — an interval self-join expressed as one key exchange + two
    binary searches per row (stages/joins.py interval_count_self)."""
    from ntto_ray.stages.joins import interval_count_self

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    out = interval_count_self(
        ds, key="user_id", ts="ts", id_col="event_id", window_us=3600 * 1_000_000
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_id": t["rid"],
                "user_id": t["key"],
                "n_prev_hour": t["n_window"],
            }
        ),
        batch_format="pyarrow",
    )


# --- full outer join (native Dataset.join full_outer) ----------------------

@register(
    "rel_outer_join",
    oracle="""
SELECT COALESCE(c.c_custkey, u.o_custkey) AS custkey,
       COALESCE(c.c_mktsegment, '') AS segment,
       COALESCE(u.urgent_cnt, 0) AS urgent_cnt
FROM (SELECT c_custkey, c_mktsegment FROM customer
      WHERE c_mktsegment = 'BUILDING') c
FULL OUTER JOIN (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS urgent_cnt
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_custkey) u
  ON u.o_custkey = c.c_custkey
""",
)
def rel_outer_join(sf_dir: str):
    """BUILDING customers FULL OUTER JOIN urgent-order counts — Ray's
    native distributed ``Dataset.join(full_outer)`` (hash-shuffle both
    sides). Both inputs are filtered/pre-aggregated before the shuffle
    (the right side inside one map_batches partial + small grouped
    aggregate), so unmatched rows exist on BOTH sides and the exchange
    moves key-scale rows only. Nulls from the outer extension are
    coalesced to sentinel values in a final stateless map_batches."""
    from ray.data.aggregate import Sum

    from ntto_ray.stages.exchange import shuffle_parallelism

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def urgent_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return g.select(["o_custkey", "o_custkey_count"]).rename_columns(
            ["o_custkey", "urgent_cnt"]
        )

    urgent = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(urgent_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("urgent_cnt", alias_name="urgent_cnt"))
        .materialize()
    )

    joined = cust.join(
        urgent,
        "full_outer",
        num_partitions=join_parallelism(cust, urgent),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        # Ray's full_outer join already coalesces left/right keys into
        # the LEFT key column and drops the right one.
        return pa.table(
            {
                "custkey": pc.cast(t["c_custkey"], pa.int64()),
                "segment": pc.coalesce(t["c_mktsegment"], pa.scalar("")),
                "urgent_cnt": pc.coalesce(
                    pc.cast(t["urgent_cnt"], pa.int64()), pa.scalar(0, pa.int64())
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


# --- conversion funnel (ordered multi-step event sequence) -------------------

@register(
    "rel_funnel_conversions",
    oracle="""
SELECT v.user_id, min(p.ts) AS first_conv
FROM events v
JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
             AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
             AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
WHERE v.event_type = 'view'
GROUP BY v.user_id
""",
)
def rel_funnel_conversions(sf_dir: str):
    """Funnel analysis: per user, the earliest purchase completing the
    ordered sequence view → click → purchase with every step strictly
    later than the previous and the whole window within 24 h of the
    view. ONE hash exchange on user_id; the per-block kernel is fully
    vectorized ACROSS users (pandas groupby cummax/min — C kernels, no
    per-user Python):

      lv(click)   = latest view before the click   (grouped cummax)
      m(purchase) = max lv over clicks before it   (grouped cummax)
      converts    ⇔ m ≥ purchase_ts − 24 h;  answer = grouped min.

    The scan is exact under ties too: rows sort (user, ts, kind) with
    kind ordered purchase < click < view, so an equal-ts view/click is
    NOT visible to the scan — matching the oracle's strict
    inequalities. The window inequality itself is inclusive (<=), like
    the SQL."""
    import pandas as pd

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    _KIND = {"purchase": 0, "click": 1, "view": 2}
    _OUT = pa.schema([("user_id", pa.int64()), ("first_conv", pa.timestamp("us"))])

    def keep_funnel(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array(list(_KIND)))
        return t.filter(m)

    def funnel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(),
                "ts": t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "k": pd.Series(t["event_type"].to_numpy(zero_copy_only=False)).map(_KIND).to_numpy(),
            }
        )
        df = df.sort_values(["u", "ts", "k"], kind="stable").reset_index(drop=True)
        # latest view so far (at a click row: views strictly before it)
        u = df["u"]
        # cummax leaves NaN at NaN inputs — grouped ffill carries the
        # running max forward to the rows that need to read it
        view_ts = df["ts"].where(df["k"] == 2, other=np.nan)
        lv = view_ts.groupby(u, sort=False).cummax().groupby(u, sort=False).ffill()
        # best lv over clicks so far (at a purchase row: clicks strictly before)
        lv_click = lv.where(df["k"] == 1, other=np.nan)
        m = lv_click.groupby(u, sort=False).cummax().groupby(u, sort=False).ffill()
        is_p = df["k"] == 0
        conv = is_p & (m >= df["ts"] - 86_400_000_000)  # 24 h in µs
        hits = df[conv]
        if not len(hits):
            return _OUT.empty_table()
        first = hits.groupby("u", sort=False)["ts"].min()
        return pa.table(
            {
                "user_id": first.index.to_numpy(dtype=np.int64),
                "first_conv": first.to_numpy(dtype=np.int64).view("datetime64[us]"),
            }
        ).cast(_OUT)

    grouped = hash_grouped(
        ds.map_batches(keep_funnel, batch_format="pyarrow"), ["user_id"], sort=False
    )
    return grouped.map_batches(
        funnel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- correlated subquery (orders above their customer's average) ------------

@register(
    "rel_above_avg_orders",
    oracle="""
WITH ca AS (
  SELECT o_custkey, count(*) AS cnt,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s
  FROM orders GROUP BY 1
)
SELECT o.o_orderkey
FROM orders o JOIN ca ON ca.o_custkey = o.o_custkey
WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * ca.cnt > ca.s
""",
)
def rel_above_avg_orders(sf_dir: str):
    """Correlated subquery (TPC-H Q17 shape): orders strictly above
    their customer's average order value. ONE hash exchange co-locates
    each customer's orders; the comparison is cross-multiplied integer
    cents (price·cnt > sum) so no float division ever happens — exact
    under any distribution, and the whole block kernel is two pandas
    grouped transforms (C kernels, no per-customer Python)."""
    import pandas as pd

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "cents": _cents(t["o_totalprice"]),
            }
        )

    _OUT = pa.schema([("o_orderkey", pa.int64())])

    def above_avg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        ck = t["o_custkey"].to_numpy()
        cents = t["cents"].to_numpy()
        grp = pd.Series(cents).groupby(pd.Series(ck), sort=False)
        cnt = grp.transform("size").to_numpy()
        s = grp.transform("sum").to_numpy()
        keep = cents * cnt > s
        return pa.table({"o_orderkey": t["o_orderkey"].to_numpy()[keep]})

    grouped = hash_grouped(ds.map_batches(prep, batch_format="pyarrow"), ["o_custkey"], sort=False)
    return grouped.map_batches(
        above_avg, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- cohort retention --------------------------------------------------------

@register(
    "rel_cohort_retention",
    oracle="""
WITH w AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
c AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY 1)
SELECT c.cohort, w.wk, CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
FROM w JOIN c USING (user_id)
GROUP BY 1, 2
""",
)
def rel_cohort_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by their first-activity
    week (cohort), counted distinct in every week they return. ONE hash
    exchange on user_id makes per-user state block-local (each user's
    cohort AND distinct weeks live in one block), so the wide step after
    it only moves (cohort, week) partial counts — cell-scale, not
    user-scale. Week truncation is integer day arithmetic mirroring
    DuckDB's Monday-based date_trunc('week')."""
    from ray.data.aggregate import Sum

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    _OUT = pa.schema(
        [("cohort", pa.timestamp("us")), ("wk", pa.timestamp("us")), ("c", pa.int64())]
    )
    _US_PER_DAY = 86_400_000_000

    def retention_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        u = t["user_id"].to_numpy()
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # epoch day 0 = Thursday; +3 aligns Mondays to week boundaries
        wk = (ts // _US_PER_DAY + 3) // 7
        order = np.argsort(u, kind="stable")
        u, wk = u[order], wk[order]
        starts, ends = runs(u)
        sizes = ends - starts
        cohort = np.repeat(np.minimum.reduceat(wk, starts), sizes)
        # distinct (user, week) pairs → per-(cohort, week) block-local
        # distinct-user counts (each user is whole in this block)
        base = wk.min()
        span = int(wk.max() - base) + 1
        uw = np.unique(
            np.repeat(np.arange(len(starts), dtype=np.int64), sizes) * span
            + (wk - base)
        )
        cohort_first = np.minimum.reduceat(wk, starts)  # per local user id
        cw = np.unique(
            (cohort_first[uw // span] - base) * span + (uw % span),
            return_counts=True,
        )
        keys, cnts = cw
        to_us = lambda w: ((w * 7 - 3) * _US_PER_DAY).astype("datetime64[us]")
        return pa.table(
            {
                "cohort": to_us(keys // span + base),
                "wk": to_us(keys % span + base),
                "c": cnts.astype(np.int64),
            }
        ).cast(_OUT)

    grouped = hash_grouped(ds, ["user_id"], sort=False)
    out = (
        grouped.map_batches(
            retention_partial, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
        )
        .groupby(["cohort", "wk"])
        .aggregate(Sum("c", alias_name="n_users"))
    )
    return out


# --- deterministic grouped mode ----------------------------------------------

@register(
    "rel_grouped_mode",
    oracle="""
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
  FROM orders GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority ASC
  ) AS rn FROM c
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, CAST(cnt AS BIGINT) AS cnt
FROM r WHERE rn = 1
""",
)
def rel_grouped_mode(sf_dir: str):
    """Deterministic grouped mode (most frequent value, ties broken by
    value order): per-batch C++ partial counts → one grouped Sum over
    (group, value) — key-pair-scale, tiny — → driver argmax. The
    shuffle moves counts, never rows."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.group_by(["o_orderstatus", "o_orderpriority"])
            .aggregate([([], "count_all")])
        )
        return g.select(
            ["o_orderstatus", "o_orderpriority", "count_all"]
        ).rename_columns(["o_orderstatus", "o_orderpriority", "cnt"])

    cnts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    cnts = cnts.sort_values(
        ["o_orderstatus", "cnt", "o_orderpriority"],
        ascending=[True, False, True],
        kind="stable",
    )
    top = cnts.groupby("o_orderstatus", sort=True).head(1).reset_index(drop=True)
    top = top.rename(columns={"o_orderpriority": "mode_priority"})
    return top[["o_orderstatus", "mode_priority", "cnt"]]


# --- per-user event-type transition counts (Markov bigrams) ----------------

@register(
    "rel_event_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
)
SELECT event_type AS from_type, nxt AS to_type,
       CAST(count(*) AS BIGINT) AS cnt
FROM s WHERE nxt IS NOT NULL
GROUP BY 1, 2
""",
)
def rel_event_transitions(sf_dir: str):
    """First-order behavioral transition matrix: counts of consecutive
    (event_type → next event_type) pairs per user, ordered by (ts,
    event_id). One user-keyed group-safe exchange makes each user's
    sequence block-local; the per-block kernel lexsorts, pairs
    adjacent rows within user runs, and folds to per-block (from, to)
    partials via one Arrow grouped count — the global aggregate then
    moves transition-matrix-scale rows (|types|², not events)."""
    from ray.data.aggregate import Sum

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
                "event_type": t["event_type"],
            }
        )

    _OUT = pa.schema(
        [
            ("from_type", pa.string()),
            ("to_type", pa.string()),
            ("cnt", pa.int64()),
        ]
    )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _OUT.empty_table()
        uid = t["user_id"].to_numpy()
        ts = t["ts_us"].to_numpy()
        eid = t["event_id"].to_numpy()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        same = uid[1:] == uid[:-1]
        if not same.any():
            return _OUT.empty_table()
        g = (
            pa.table(
                {
                    "from_type": pa.array(et[:-1][same], pa.string()),
                    "to_type": pa.array(et[1:][same], pa.string()),
                }
            )
            .group_by(["from_type", "to_type"])
            .aggregate([([], "count_all")])
        )
        return g.select(["from_type", "to_type", "count_all"]).rename_columns(
            ["from_type", "to_type", "cnt"]
        )

    grouped = hash_grouped(
        ds.map_batches(prep, batch_format="pyarrow"), ["user_id"]
    )
    partials = grouped.map_batches(
        pairs, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    return partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("cnt", alias_name="cnt")
    )
