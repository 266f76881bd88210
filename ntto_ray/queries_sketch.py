"""Sketch-based operators (round 2): heavy hitters, distinct-count and
Bloom semi-join — each a mergeable O(k)-state streaming sketch
(stages/sketch.py) wrapped so the final answer is EXACT and therefore
checkable against a DuckDB oracle. The reference has no aggregation
surface at all (ntto.go:162-206); these are engine additions mandated by
the large-scale-pipeline brief."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ntto_ray.queries_rel import _read
from ntto_ray.registry import register
from ntto_ray.stages import sketch as sk

# --- heavy hitters --------------------------------------------------------

_MG_K = 2048  # candidate capacity; exactness needs k >= N/threshold
_HH_DIV = 1250  # threshold = max(1, N // _HH_DIV) i.e. 0.08% of events


@register(
    "sketch_heavy_hitters",
    oracle=f"""
SELECT user_id, count(*) AS cnt
FROM events
GROUP BY user_id
HAVING count(*) >= greatest(1, (SELECT count(*) FROM events) // {_HH_DIV})
""",
)
def sketch_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Exact heavy hitters in two bounded passes: (1) per-block
    Misra-Gries summaries (O(k) rows each) merged on the driver into a
    candidate set that provably contains every key with count >=
    N/(k+1); (2) exact counts for the bounded candidate set only
    (broadcast membership filter + map-side value_counts + tiny driver
    merge). With k = {_MG_K} >= N/threshold the candidate superset
    guarantee covers the {1/_HH_DIV:.2%} threshold, so the output equals
    the exact GROUP BY/HAVING answer at any corpus size."""
    ev = _read(sf_dir, "events", ["user_id"])
    parts = ev.map_batches(
        lambda t: sk.mg_partial(t, "user_id", _MG_K),
        batch_format="pyarrow",
    ).to_pandas()
    keys, _, n_total = sk.mg_merge(pa.Table.from_pandas(parts), _MG_K)
    thresh = max(1, n_total // _HH_DIV)

    import ray

    cand_ref = ray.put(pa.array(np.sort(keys), pa.int64()))

    def exact_counts(t: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        kept = t.filter(pc.is_in(t["user_id"], value_set=cand))
        p = sk.mg_partial(kept, "user_id", len(cand) + 1)
        return p.select(["key", "cnt"]).rename_columns(["user_id", "cnt"])

    counts = ev.map_batches(exact_counts, batch_format="pyarrow").to_pandas()
    merged = counts.groupby("user_id", as_index=False)["cnt"].sum()
    return merged[merged["cnt"] >= thresh].reset_index(drop=True)


# --- KMV distinct count ---------------------------------------------------

_KMV_K = 64


@register(
    "sketch_distinct_kmv",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT {sk.splitmix64_sql("user_id")} AS h FROM events
),
o AS (SELECT h FROM h ORDER BY h LIMIT {_KMV_K}),
s AS (SELECT count(*) AS c, max(h) AS hk FROM o)
SELECT CAST(CASE WHEN c < {_KMV_K} THEN c
            ELSE CAST((CAST({_KMV_K - 1} AS UHUGEINT) * 18446744073709551616)
                      // hk AS BIGINT) END AS BIGINT) AS est,
       CAST(CASE WHEN c < {_KMV_K} THEN c ELSE {_KMV_K} END AS BIGINT)
         AS k_used
FROM s
""",
)
def sketch_distinct_kmv(sf_dir: str) -> pd.DataFrame:
    """Distinct users via a k-minimum-values sketch: per-block k
    smallest distinct splitmix64 hashes (O(k) rows shipped per block),
    driver merge, estimate (k-1)*2^64 // h_k. The hash chain and the
    integer estimator are mirrored bit-for-bit in DuckDB UHUGEINT
    arithmetic, so this probabilistic operator still has an EXACT
    oracle. Below k distinct values the sketch is the distinct set
    itself and the count is exact."""
    ev = _read(sf_dir, "events", ["user_id"])
    parts = ev.map_batches(
        lambda t: sk.kmv_partial(t, "user_id", _KMV_K),
        batch_format="pyarrow",
    ).to_pandas()
    est, k_used = sk.kmv_estimate(
        pa.table({"h": pa.array(parts["h"].to_numpy(), pa.uint64())}), _KMV_K
    )
    return pd.DataFrame({"est": [est], "k_used": [k_used]})


# --- HyperLogLog registers ------------------------------------------------

_HLL_P = 6  # 2^6 = 64 registers


@register(
    "sketch_hll_registers",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT {sk.splitmix64_sql("user_id")} AS h FROM events
),
r AS (
  SELECT CAST(h >> {64 - _HLL_P} AS BIGINT) AS bucket,
         CAST((CAST(h AS UHUGEINT) * {1 << _HLL_P})
              & CAST(18446744073709551615 AS UHUGEINT) AS UBIGINT) AS rest
  FROM h
),
rho AS (
  SELECT bucket,
         CASE WHEN rest = 0 THEN {64 - _HLL_P + 1}
              ELSE strpos(lpad(bin(rest), 64, '0'), '1') END AS rho
  FROM r
)
SELECT b.bucket, CAST(COALESCE(max(rho.rho), 0) AS BIGINT) AS register
FROM (SELECT unnest(generate_series(0, {(1 << _HLL_P) - 1})) AS bucket) b
LEFT JOIN rho ON rho.bucket = b.bucket
GROUP BY b.bucket
""",
)
def sketch_hll_registers(sf_dir: str):
    """HyperLogLog register vector over event users (Flajolet et al.
    2007): splitmix64 hash → top-{_HLL_P}-bit bucket → max
    leading-zero-rank per bucket. Per-block partials are the full
    2^{_HLL_P}-row register vector (mergeable-summary contract: O(2^p)
    per block, never O(rows)), merged by one tiny grouped Max — the
    sketch union operation, which is also exactly how multi-day /
    multi-shard HLLs compose at 100 TB. The hash chain and the exact
    bit-level rho are mirrored in SQL (bin() string scan), so even this
    probabilistic sketch has an exact oracle; the cardinality estimate
    is the standard alpha_m * m^2 / sum(2^-register) over the output."""
    from ray.data.aggregate import Max

    ev = _read(sf_dir, "events", ["user_id"])
    parts = ev.map_batches(
        lambda t: sk.hll_partial(t, "user_id", _HLL_P),
        batch_format="pyarrow",
    )
    return parts.groupby("bucket").aggregate(
        Max("register", alias_name="register")
    )


# --- Bloom semi-join ------------------------------------------------------

_BLOOM_SEGMENT = "BUILDING"


@register(
    "sketch_bloom_semijoin",
    oracle=f"""
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{_BLOOM_SEGMENT}'
)
""",
)
def sketch_bloom_semijoin(sf_dir: str):
    """Semi-join via broadcast Bloom prefilter + exact verify: the
    {_BLOOM_SEGMENT}-segment customer keys (bounded dim table) become an
    m-bit filter ray.put ONCE and read per actor in __init__; each
    orders batch is prefiltered vectorized (4 splitmix64 probes) and
    survivors exact-checked with pc.is_in so false positives never
    escape. One broadcast, zero shuffles."""
    import ray

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .filter(expr=f"c_mktsegment == '{_BLOOM_SEGMENT}'")
        .select_columns(["c_custkey"])
        .to_pandas()
    )
    keys = cust["c_custkey"].to_numpy().astype(np.int64)
    m_bits = 1 << max(17, int(np.ceil(np.log2(16 * max(1, len(keys))))))
    bloom_ref = ray.put(sk.bloom_build(keys, m_bits))
    keyset_ref = ray.put(pa.array(np.sort(keys), pa.int64()))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    return orders.map_batches(
        sk.BloomProbe,
        fn_constructor_kwargs={
            "bloom_ref": bloom_ref,
            "keyset_ref": keyset_ref,
            "key": "o_custkey",
            "m_bits": m_bits,
            "out_cols": ["o_orderkey", "o_custkey"],
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# --- Count-Min sketch point estimates --------------------------------------

_CM_W = 4096  # counters per hash row; overestimate < 2eN/_CM_W w.h.p.
_CM_QMOD = 89  # deterministic probe-key subset: user_id % _CM_QMOD == 0


def _cm_hash_sql(col: str, seed: int) -> str:
    """SQL mirror of stages.sketch.cm_hash — same XOR-seeded splitmix64
    chain (UHUGEINT products mod 2^64), reduced mod the sketch width."""
    mixed = sk.splitmix64_sql(
        f"xor(CAST({col} AS UBIGINT), CAST({seed} AS UBIGINT))"
    )
    return f"CAST({mixed} % {_CM_W} AS BIGINT)"


def _cm_oracle() -> str:
    cell_scan = "\n    UNION ALL ".join(
        f"SELECT {r} AS r, {_cm_hash_sql('user_id', seed)} AS cell FROM events"
        for r, seed in enumerate(sk._CM_SEEDS)
    )
    probe_scan = "\n    UNION ALL ".join(
        f"SELECT user_id, {r} AS r, {_cm_hash_sql('user_id', seed)} AS cell FROM qk"
        for r, seed in enumerate(sk._CM_SEEDS)
    )
    return f"""
WITH cells AS (
  SELECT r, cell, count(*) AS cnt FROM (
    {cell_scan}
  ) GROUP BY r, cell
),
qk AS (SELECT DISTINCT user_id FROM events WHERE user_id % {_CM_QMOD} = 0),
probe AS (
    {probe_scan}
)
SELECT p.user_id, CAST(min(c.cnt) AS BIGINT) AS cm_est
FROM probe p JOIN cells c ON c.r = p.r AND c.cell = p.cell
GROUP BY p.user_id
""".strip()


@register("sketch_countmin", oracle=_cm_oracle())
def sketch_countmin(sf_dir: str):
    """Count-Min point estimates (Cormode & Muthukrishnan 2005) for a
    deterministic probe-key subset: per-block sparse (row, cell, cnt)
    partials → ONE grouped Sum over sketch-scale rows (<= d*w per block,
    never data-scale) → the merged d x w counter matrix is bounded
    driver state broadcast once → probe keys (block-local distinct →
    one hash exchange → exact distinct) read min-over-rows vectorized.
    The XOR-seeded splitmix64 row hashes are mirrored bit-for-bit in
    DuckDB UHUGEINT arithmetic, so the probabilistic estimator has an
    EXACT oracle (same sketch → same estimates)."""
    import ray
    from ray.data.aggregate import Sum

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    ev = _read(sf_dir, "events", ["user_id"])
    merged = (
        ev.map_batches(
            lambda t: sk.cm_partial(t, "user_id", _CM_W),
            batch_format="pyarrow",
        )
        .groupby(["r", "cell"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    counters = sk.cm_counters(pa.Table.from_pandas(merged), _CM_W)
    cref = ray.put(counters)

    _EMPTY = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "cm_est": pa.array([], pa.int64()),
        }
    )

    def block_distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.table({"user_id": pa.array([], pa.int64())})
        u = np.unique(t["user_id"].to_numpy())
        u = u[u % _CM_QMOD == 0]
        return pa.table({"user_id": pa.array(u.astype(np.int64))})

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _EMPTY
        u = np.unique(t["user_id"].to_numpy())
        est = sk.cm_query(ray.get(cref), u, _CM_W)
        return pa.table(
            {"user_id": pa.array(u.astype(np.int64)), "cm_est": pa.array(est)}
        )

    keys = ev.map_batches(block_distinct, batch_format="pyarrow")
    grouped = hash_grouped(keys, ["user_id"])
    return grouped.map_batches(
        probe, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- KMV theta-style set intersection --------------------------------------

_KI_K = 64
_KI_VAL = 90  # cohort B: purchase events with value >= this


def _ki_oracle() -> str:
    hsql = sk.splitmix64_sql("user_id")
    maxu = "CAST(18446744073709551615 AS UBIGINT)"
    return f"""
WITH ha AS (SELECT DISTINCT {hsql} AS h FROM events WHERE event_type = 'click'),
oa AS (SELECT h FROM ha ORDER BY h LIMIT {_KI_K}),
sa AS (SELECT count(*) AS c, max(h) AS hk FROM oa),
hb AS (SELECT DISTINCT {hsql} AS h FROM events
       WHERE event_type = 'purchase' AND value >= {_KI_VAL}),
ob AS (SELECT h FROM hb ORDER BY h LIMIT {_KI_K}),
sb AS (SELECT count(*) AS c, max(h) AS hk FROM ob),
th AS (
  SELECT least(CASE WHEN sa.c < {_KI_K} THEN {maxu} ELSE sa.hk END,
               CASE WHEN sb.c < {_KI_K} THEN {maxu} ELSE sb.hk END) AS theta
  FROM sa, sb
),
i AS (
  SELECT count(*) AS m FROM oa JOIN ob USING (h), th WHERE oa.h <= th.theta
)
SELECT CAST((CAST(i.m AS UHUGEINT) * 18446744073709551616)
            // CAST(th.theta AS UHUGEINT) AS BIGINT) AS est,
       CAST(i.m AS BIGINT) AS common_k
FROM i, th
""".strip()


@register("sketch_kmv_intersection", oracle=_ki_oracle())
def sketch_kmv_intersection(sf_dir: str) -> pd.DataFrame:
    """Distinct-user overlap of two cohorts (click users x high-value
    purchasers) via KMV/theta-sketch set intersection (Beyer et al.
    SIGMOD'07 / the Datasketches theta family): each side keeps its k
    smallest distinct splitmix64 hashes (one streaming pass, O(k) rows
    per block per side, zero shuffles); theta = min over sides of the
    k-th min (2^64-1 when a side is under k, i.e. exact); the matches
    at-or-below theta scale by 2^64/theta — pure integer math mirrored
    bit-for-bit in UHUGEINT SQL, so the probabilistic set-op estimator
    has an EXACT oracle. One formula serves both regimes: with both
    sides exact, floor(m*2^64/(2^64-1)) = m."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    _PART = pa.schema([("side", pa.string()), ("h", pa.uint64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _PART.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy()
        val = t["value"].to_numpy()
        sides, hs = [], []
        for side, mask in (
            ("a", et == "click"),
            ("b", (et == "purchase") & (val >= _KI_VAL)),
        ):
            u = np.unique(uid[mask])
            if not len(u):
                continue
            h = np.sort(sk.splitmix64(u.astype(np.int64).view(np.uint64)))
            h = h[:_KI_K]
            sides.append(np.full(len(h), side, dtype=object))
            hs.append(h)
        if not hs:
            return _PART.empty_table()
        return pa.table(
            {
                "side": pa.array(np.concatenate(sides), pa.string()),
                "h": pa.array(np.concatenate(hs), pa.uint64()),
            }
        )

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    MAXU = (1 << 64) - 1

    def kmin(side: str) -> tuple[np.ndarray, int]:
        h = np.unique(parts.loc[parts["side"] == side, "h"].to_numpy())[:_KI_K]
        theta = MAXU if len(h) < _KI_K else int(h[-1])
        return h, theta

    ka, th_a = kmin("a")
    kb, th_b = kmin("b")
    theta = min(th_a, th_b)
    common = np.intersect1d(ka, kb)
    m = int((common <= np.uint64(theta)).sum())
    est = m * (1 << 64) // theta
    return pd.DataFrame({"est": [est], "common_k": [m]})


# --- HLL registers per group ----------------------------------------------


def _hll_group_oracle() -> str:
    hsql = sk.splitmix64_sql("user_id")
    p = _HLL_P
    return f"""
WITH h AS (
  SELECT DISTINCT event_type, {hsql} AS h FROM events
),
r AS (
  SELECT event_type, CAST(h >> {64 - p} AS BIGINT) AS bucket,
         CAST((CAST(h AS UHUGEINT) * {1 << p})
              & CAST(18446744073709551615 AS UHUGEINT) AS UBIGINT) AS rest
  FROM h
),
rho AS (
  SELECT event_type, bucket,
         CASE WHEN rest = 0 THEN {64 - p + 1}
              ELSE strpos(lpad(bin(rest), 64, '0'), '1') END AS rho
  FROM r
),
t AS (SELECT DISTINCT event_type FROM events),
b AS (SELECT unnest(generate_series(0, {(1 << p) - 1})) AS bucket)
SELECT t.event_type, b.bucket,
       CAST(COALESCE(max(rho.rho), 0) AS BIGINT) AS register
FROM t CROSS JOIN b
LEFT JOIN rho ON rho.event_type = t.event_type AND rho.bucket = b.bucket
GROUP BY t.event_type, b.bucket
""".strip()


@register("sketch_hll_by_group", oracle=_hll_group_oracle())
def sketch_hll_by_group(sf_dir: str):
    """Per-event-type HLL register vectors — the grouped form of
    sketch_hll_registers and the realistic per-domain cardinality
    monitor at 100 TB (one mergeable 2^p-row summary per group; a day x
    domain matrix of these unions with a plain grouped Max). Per block:
    one register vector per event type PRESENT in the block (partial
    volume = types_in_block x 2^p, never O(rows)); merge is a single
    grouped Max keyed on (event_type, bucket)."""
    from ray.data.aggregate import Max

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    _PART = pa.schema(
        [
            ("event_type", pa.string()),
            ("bucket", pa.int64()),
            ("register", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return _PART.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        out = []
        for ty in np.unique(et):
            sub = pa.table({"user_id": t["user_id"].filter(pa.array(et == ty))})
            regs = sk.hll_partial(sub, "user_id", _HLL_P)
            out.append(
                regs.append_column(
                    "event_type",
                    pa.array(np.full(regs.num_rows, ty, dtype=object), pa.string()),
                )
            )
        return pa.concat_tables(out).select(
            ["event_type", "bucket", "register"]
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Max("register", alias_name="register"))
    )
