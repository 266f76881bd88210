"""Round-3 continuation operators (batch 2): multi-objective skyline,
frame-based window aggregates, KG symmetry profiling, temperature-scaled
mixture sampling, and Gopher-style quality gating.

Engine surface beyond the reference's triple model (SURVEY §2.2 — the
reference, cmd/ntto/ntto.go, has no analytics operators at all); every
query carries an exact DuckDB oracle. Monetary doubles follow the repo's
integer-cents discipline (queries_rel.py:4-8); every "random" choice is a
deterministic splitmix64 hash mirrored bit-for-bit in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ntto_ray.registry import register


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0))), pa.int64())


def _day_int(ts) -> pa.Array:
    """timestamp → yyyymmdd BIGINT (the calendar key used across rel_*)."""
    return pc.cast(
        pc.add(
            pc.add(
                pc.multiply(pc.year(ts), pa.scalar(10000)),
                pc.multiply(pc.month(ts), pa.scalar(100)),
            ),
            pc.day(ts),
        ),
        pa.int64(),
    )


# --- Pareto skyline ---------------------------------------------------------

_SKY_ORACLE = """
WITH o AS (
  SELECT o_orderkey,
         CAST(year(o_orderdate)*10000 + month(o_orderdate)*100
              + day(o_orderdate) AS BIGINT) AS day,
         CAST(round(o_totalprice*100) AS BIGINT) AS total_c
  FROM orders
),
s AS (
  SELECT o_orderkey, day, total_c,
         -- min day among STRICTLY higher prices (integer cents, so the
         -- RANGE offset 1 is exact strictness)
         min(day) OVER (ORDER BY total_c DESC
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS excl_min,
         min(day) OVER (PARTITION BY total_c) AS grp_min
  FROM o
)
SELECT o_orderkey, day, total_c
FROM s
WHERE (excl_min IS NULL OR excl_min > day) AND day = grp_min
""".strip()


@register("rel_skyline", oracle=_SKY_ORACLE)
def rel_skyline(sf_dir: str):
    """Pareto skyline over orders (maximize total price, minimize order
    date): an order is kept iff no other order is at least as good on
    both dimensions and strictly better on one (Borzsony, Kossmann &
    Stocker, ICDE 2001). Plan: per-block LOCAL skyline (sort by price
    desc, vectorized prefix-min dominance mask — candidates shrink to
    ~O(log n) of the block on non-adversarial data) → union of local
    skylines is result-scale → one single-block final pass with the same
    kernel. The quadratic NOT EXISTS never runs anywhere; both passes
    are O(n log n)."""
    _SKY = pa.schema(
        [("o_orderkey", pa.int64()), ("day", pa.int64()),
         ("total_c", pa.int64())]
    )

    def sky_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "total_c" not in t.column_names:
            return _SKY.empty_table()
        from ntto_ray.stages.exchange import runs

        d = t.sort_by(
            [("total_c", "descending"), ("day", "ascending"),
             ("o_orderkey", "ascending")]
        )
        tc = d["total_c"].to_numpy(zero_copy_only=False)
        day = d["day"].to_numpy(zero_copy_only=False)
        starts, ends = runs(tc)
        gmin = day[starts]  # min day within each equal-price group
        excl = np.empty(len(starts), np.int64)
        excl[0] = np.iinfo(np.int64).max
        if len(starts) > 1:
            excl[1:] = np.minimum.accumulate(gmin)[:-1]
        gid = np.repeat(np.arange(len(starts)), ends - starts)
        dominated = (excl[gid] <= day) | (day > gmin[gid])
        return d.filter(pa.array(~dominated))

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return _SKY.empty_table()
        tbl = pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "day": _day_int(t["o_orderdate"]),
                "total_c": _cents(t["o_totalprice"]),
            }
        )
        return sky_kernel(tbl)

    from ntto_ray.stages.exchange import NO_FUSE_ARGS

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])
    cand = ds.map_batches(prep, batch_format="pyarrow")
    return cand.repartition(1).map_batches(
        sky_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- ROWS-frame moving window -----------------------------------------------

_MW_ORACLE = """
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) OVER w AS BIGINT) AS frame_n,
       CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT)
         AS frame_sum_c
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""".strip()


@register("rel_moving_window", oracle=_MW_ORACLE)
def rel_moving_window(sf_dir: str):
    """ROWS-frame window aggregate: per-user moving sum/count over the
    last 4 events (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) — the
    frame-based window shape rel_sliding_window (time buckets) and
    rel_window_cumsum (unbounded frame) don't cover. ONE user-keyed hash
    exchange, then a fully vectorized in-block kernel: cumsum differences
    with per-run frame clamping (no per-row loop)."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    _P = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts_us", pa.int64()), ("value_c", pa.int64())]
    )
    _OUT = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("frame_n", pa.int64()), ("frame_sum_c", pa.int64())]
    )

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return _P.empty_table()
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "value_c": _cents(t["value"]),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by(
            [("user_id", "ascending"), ("ts_us", "ascending"),
             ("event_id", "ascending")]
        )
        u = d["user_id"].to_numpy(zero_copy_only=False)
        v = d["value_c"].to_numpy(zero_copy_only=False)
        starts, ends = runs(u)
        n = len(u)
        idx = np.arange(n)
        rstart = np.repeat(starts, ends - starts)
        lo = np.maximum(rstart, idx - 3)
        cs = np.cumsum(v)
        base = np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        return pa.table(
            {
                "event_id": d["event_id"],
                "user_id": d["user_id"],
                "frame_n": pa.array(idx - lo + 1, pa.int64()),
                "frame_sum_c": pa.array(cs - base, pa.int64()),
            }
        )

    grouped = hash_grouped(
        ev.map_batches(prep, batch_format="pyarrow"), ["user_id"]
    )
    return grouped.map_batches(
        kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- predicate symmetry profile ----------------------------------------------


def _sym_oracle() -> str:
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules

    canon = K.triples_canonical_sql(pipeline_rules())
    return f"""
WITH canon AS MATERIALIZED ({canon}),
e AS (
  SELECT pred,
         CASE WHEN subj <= obj THEN subj ELSE obj END AS lo,
         CASE WHEN subj <= obj THEN obj ELSE subj END AS hi,
         max(CASE WHEN subj < obj THEN 1 ELSE 0 END) AS has_f,
         max(CASE WHEN subj > obj THEN 1 ELSE 0 END) AS has_b,
         max(CASE WHEN subj = obj THEN 1 ELSE 0 END) AS has_s
  FROM canon
  GROUP BY pred, lo, hi
)
SELECT pred,
       CAST(sum(CASE WHEN has_f + has_b > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs,
       CAST(sum(CASE WHEN has_f = 1 AND has_b = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_recip,
       CAST(sum(has_s) AS BIGINT) AS n_self
FROM e GROUP BY pred
""".strip()


@register("kg_symmetric_predicates", oracle=_sym_oracle())
def kg_symmetric_predicates(sf_dir: str):
    """Predicate symmetry profile over the canonical KG: per predicate,
    the number of distinct unordered entity pairs, how many of them have
    BOTH directions asserted (reciprocal edges — the signal for declaring
    a relation symmetric in ontology induction), and self-loop count.
    Plan: block-local (pred, lo, hi, dir-flag) partial dedup → ONE hash
    exchange on the unordered pair key (pair-scale, never node-keyed, so
    hub entities don't skew) → per-run flag merge + per-pred partial
    counts → predicate-vocabulary-scale Sum."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    _PAIR = pa.schema(
        [("pred", pa.string()), ("lo", pa.string()), ("hi", pa.string()),
         ("has_f", pa.int64()), ("has_b", pa.int64()), ("has_s", pa.int64())]
    )
    _CNT = pa.schema(
        [("pred", pa.string()), ("n_pairs", pa.int64()),
         ("n_recip", pa.int64()), ("n_self", pa.int64())]
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _PAIR.empty_table()
        s, o = t["subj"], t["obj"]
        le = pc.less_equal(s, o)
        tbl = pa.table(
            {
                "pred": t["pred"],
                "lo": pc.if_else(le, s, o),
                "hi": pc.if_else(le, o, s),
                "has_f": pc.cast(pc.less(s, o), pa.int64()),
                "has_b": pc.cast(pc.greater(s, o), pa.int64()),
                "has_s": pc.cast(pc.equal(s, o), pa.int64()),
            }
        )
        g = tbl.group_by(["pred", "lo", "hi"]).aggregate(
            [("has_f", "max"), ("has_b", "max"), ("has_s", "max")]
        )
        g = g.select(
            ["pred", "lo", "hi", "has_f_max", "has_b_max", "has_s_max"]
        )
        return g.rename_columns(
            ["pred", "lo", "hi", "has_f", "has_b", "has_s"]
        )

    def pred_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pred" not in t.column_names:
            return _CNT.empty_table()
        # rows of one (pred, lo, hi) key arrive whole in this block but
        # possibly as several partial rows — re-merge flags first.
        g = t.group_by(["pred", "lo", "hi"]).aggregate(
            [("has_f", "max"), ("has_b", "max"), ("has_s", "max")]
        )
        f = g["has_f_max"].to_numpy(zero_copy_only=False)
        b = g["has_b_max"].to_numpy(zero_copy_only=False)
        sflag = g["has_s_max"].to_numpy(zero_copy_only=False)
        tbl = pa.table(
            {
                "pred": g["pred"],
                "n_pairs": pa.array(((f + b) > 0).astype(np.int64)),
                "n_recip": pa.array(((f == 1) & (b == 1)).astype(np.int64)),
                "n_self": pa.array(sflag.astype(np.int64)),
            }
        )
        out = tbl.group_by("pred").aggregate(
            [("n_pairs", "sum"), ("n_recip", "sum"), ("n_self", "sum")]
        )
        return out.select(
            ["pred", "n_pairs_sum", "n_recip_sum", "n_self_sum"]
        ).rename_columns(["pred", "n_pairs", "n_recip", "n_self"])

    partials = canon.map_batches(pair_partial, batch_format="pyarrow")
    grouped = hash_grouped(partials, ["pred", "lo", "hi"])
    per_pred = grouped.map_batches(
        pred_partial, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    return per_pred.groupby("pred").aggregate(
        Sum("n_pairs", alias_name="n_pairs"),
        Sum("n_recip", alias_name="n_recip"),
        Sum("n_self", alias_name="n_self"),
    )


# --- temperature-scaled mixture sampling --------------------------------------

_MIX_BUDGET = 120  # docs across all sources


def _mix_oracle() -> str:
    from ntto_ray.stages.sketch import splitmix64_sql

    h = splitmix64_sql("CAST(doc_id AS UBIGINT)")
    return f"""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY source),
w0 AS (SELECT source, n,
              CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0
       FROM c),
-- exact integer sqrt: correct the float estimate by at most ±1
w AS (SELECT source, n,
             s0 - CASE WHEN s0*s0 > n THEN 1 ELSE 0 END
                + CASE WHEN (s0+1)*(s0+1) <= n THEN 1 ELSE 0 END AS wt
      FROM w0),
q AS (SELECT source,
             ({_MIX_BUDGET} * wt)
               // (SELECT CAST(sum(wt) AS BIGINT) FROM w) AS quota
      FROM w),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {h}, doc_id) AS rn
      FROM documents)
SELECT r.doc_id, r.source FROM r JOIN q USING (source) WHERE rn <= quota
""".strip()


@register("corpus_mixture_temperature", oracle=_mix_oracle())
def corpus_mixture_temperature(sf_dir: str):
    """Temperature-scaled training-mixture sampling (the alpha=0.5
    source re-weighting of multilingual/multi-source LM recipes — big
    sources are down-weighted by sqrt, unlike corpus_token_budget's
    equal quotas or corpus_cap_per_source's hard cap): per-source doc
    counts reduce to source-scale, exact-integer-sqrt weights turn the
    {budget}-doc budget into per-source quotas driver-side (bounded by
    the source vocabulary), quotas broadcast into ONE source-keyed
    exchange that keeps each source's quota smallest-splitmix64(doc_id)
    docs (budget = _MIX_BUDGET = 120 docs across all sources).
    Deterministic and bit-mirrored in SQL."""
    import math

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs
    from ntto_ray.stages.sketch import splitmix64

    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    _C = pa.schema([("source", pa.string()), ("n", pa.int64())])

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return _C.empty_table()
        g = t.select(["source"]).group_by("source").aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"source": g["source"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    from ray.data.aggregate import Sum

    counts = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    weights = {
        r.source: math.isqrt(int(r.n)) for r in counts.itertuples()
    }
    total_w = sum(weights.values()) or 1
    quota = {
        s: (_MIX_BUDGET * w) // total_w for s, w in weights.items()
    }

    _OUT = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])
    _H = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()), ("h", pa.uint64())]
    )

    def hash_col(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return _H.empty_table()
        h = splitmix64(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
                "h": pa.array(h),
            }
        )

    def take_quota(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by(
            [("source", "ascending"), ("h", "ascending"),
             ("doc_id", "ascending")]
        )
        src = d["source"].to_numpy(zero_copy_only=False)
        starts, ends = runs(src)
        rank = np.arange(len(src)) - np.repeat(starts, ends - starts)
        caps = np.array(
            [quota.get(s, 0) for s in src[starts]], dtype=np.int64
        )
        keep = rank < np.repeat(caps, ends - starts)
        kept = d.filter(pa.array(keep))
        return pa.table({"doc_id": kept["doc_id"], "source": kept["source"]})

    grouped = hash_grouped(
        docs.map_batches(hash_col, batch_format="pyarrow"), ["source"]
    )
    return grouped.map_batches(
        take_quota, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- Gopher-style quality gate -------------------------------------------------

_GOPHER_ORACLE = """
WITH s AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         list_aggregate(list_transform(string_split(text, ' '),
                                       x -> length(x)), 'sum') AS sum_len,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ('the', 'a'))) AS n_stop
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 1 ELSE 0 END
            AS BIGINT) AS ok_nwords,
       CAST(CASE WHEN 3*n_tokens <= sum_len AND sum_len <= 10*n_tokens
            THEN 1 ELSE 0 END AS BIGINT) AS ok_wordlen,
       CAST(CASE WHEN n_stop >= 1 THEN 1 ELSE 0 END AS BIGINT) AS ok_stop,
       CAST(CASE WHEN 10*n_distinct >= 3*n_tokens THEN 1 ELSE 0 END
            AS BIGINT) AS ok_distinct,
       CAST(CASE WHEN n_tokens BETWEEN 5 AND 1000
                  AND 3*n_tokens <= sum_len AND sum_len <= 10*n_tokens
                  AND n_stop >= 1
                  AND 10*n_distinct >= 3*n_tokens
            THEN 1 ELSE 0 END AS BIGINT) AS keep_doc
FROM s
""".strip()


@register("text_gopher_rules", oracle=_GOPHER_ORACLE)
def text_gopher_rules(sf_dir: str):
    """Gopher-style repetition/quality rule gate (Rae et al. 2021 §A1.1,
    the multi-rule document filter every LLM corpus recipe applies):
    word-count bounds, mean-word-length bounds, stopword presence, and
    distinct-token ratio — each emitted as its own flag (so downstream
    reporting can attribute drops to rules) plus the conjunctive
    keep_doc. All-integer arithmetic (ratios are cross-multiplied), one
    streaming map_batches, zero shuffles."""
    import pandas as pd

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    _OUT = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("ok_nwords", pa.int64()), ("ok_wordlen", pa.int64()),
         ("ok_stop", pa.int64()), ("ok_distinct", pa.int64()),
         ("keep_doc", pa.int64())]
    )

    def gate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return _OUT.empty_table()
        toks = pc.split_pattern(t["text"].combine_chunks(), pattern=" ")
        n_tok = pc.list_value_length(toks).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        sum_len = np.bincount(
            parent, weights=tlen, minlength=t.num_rows
        ).astype(np.int64)
        is_stop = pc.is_in(
            flat, value_set=pa.array(["the", "a"])
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            parent, weights=is_stop, minlength=t.num_rows
        ).astype(np.int64)
        nd = (
            pd.DataFrame(
                {"parent": parent, "tok": flat.to_numpy(zero_copy_only=False)}
            )
            .groupby("parent", sort=True)["tok"]
            .nunique()
            .reindex(range(t.num_rows), fill_value=0)
            .to_numpy()
            .astype(np.int64)
        )
        ok_n = ((n_tok >= 5) & (n_tok <= 1000)).astype(np.int64)
        ok_w = ((3 * n_tok <= sum_len) & (sum_len <= 10 * n_tok)).astype(
            np.int64
        )
        ok_s = (n_stop >= 1).astype(np.int64)
        ok_d = (10 * nd >= 3 * n_tok).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pa.array(n_tok),
                "ok_nwords": pa.array(ok_n),
                "ok_wordlen": pa.array(ok_w),
                "ok_stop": pa.array(ok_s),
                "ok_distinct": pa.array(ok_d),
                "keep_doc": pa.array(ok_n * ok_w * ok_s * ok_d),
            }
        )

    return docs.map_batches(gate, batch_format="pyarrow")
