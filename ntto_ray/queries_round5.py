"""Round-5 additions: operators a 100-TB training-data pipeline wants
that no existing family covered —

* ``ann_sq8_topk`` — int8 scalar-quantized similarity search (Faiss's
  ScalarQuantizer QT_8bit shape): 4× smaller index bytes, integer-dot
  scoring, per-dim min/max "codebook" trained in one streaming pass.
* ``ann_ivfsq8_topk`` — IVF + SQ8 composed, completing the engine's
  IVF × {flat, PQ, SQ8} layout matrix.
* ``dedup_containment_pairs`` — ASYMMETRIC near-dup detection: token-set
  containment |A∩B| / |A| ≥ τ, which catches subset duplicates (quoted
  e-mails, boilerplate-wrapped reposts) that symmetric Jaccard misses.
  Exact, via the asymmetric prefix filter (Chaudhuri et al., ICDE'06):
  the probe side emits its (1−τ)·|A|+1 smallest token hashes, the index
  side emits ALL tokens, so every qualifying pair shares an emitted
  token; candidates verify against packed full-signature blobs in ONE
  grouped exchange (the jaccard_pairs plan, asymmetric thresholds).
* ``dedup_containment_keep`` — the decision layer over those pairs:
  map every contained doc to its best container.
* ``rel_q3_shipping`` — TPC-H Q3 (filter → two distributed hash joins
  → grouped sum → k-scale top-10).
* ``rel_q5_local_volume`` — TPC-H Q5 (the 6-table local-supplier
  chain: constant dims folded map-side, three fact-scale joins).

Every query has an exact DuckDB oracle (integer scores / integer counts
— no float-tie risk anywhere; Q3's revenue is 4-decimal integer cents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ntto_ray.queries_text import _ANN_QUERY_IDS, _emb, _query_matrix
from ntto_ray.registry import register

_SQ8_ORACLE = f"""
WITH v AS (
  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings
),
st AS (SELECT d, min(x) AS mn, max(x) AS mx FROM v GROUP BY d),
qz AS (
  SELECT v.vec_id, v.d,
         CASE WHEN st.mx > st.mn THEN
           LEAST(GREATEST(CAST(floor((v.x - st.mn) / (st.mx - st.mn) * 255 + 0.5)
                          AS BIGINT), 0), 255) - 128
         ELSE 0 END AS q
  FROM v JOIN st USING (d)
),
qd AS (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         sum(a.q * b.q) AS dot
  FROM qz a JOIN qz b USING (d)
  WHERE a.vec_id IN {_ANN_QUERY_IDS} AND b.vec_id != a.vec_id
  GROUP BY 1, 2
),
r AS (
  SELECT qid, vec_id, dot,
         row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC)
           AS rank
  FROM qd
)
SELECT qid, vec_id, CAST(rank AS BIGINT) AS rank, CAST(dot AS BIGINT) AS qdot
FROM r WHERE rank <= 10
"""


@register("ann_sq8_topk", oracle=_SQ8_ORACLE)
def ann_sq8_topk(sf_dir: str):
    """Scalar-quantized (SQ8) top-10: per-dim min/max trained in one
    pass, every vector coded to [-128, 127] ints, ranking by integer
    dot product (bit-deterministic — ties broken by vec_id like every
    ANN mirror here). The honest memory-bound layout between float
    brute force and PQ: ¼ the bytes, no codebook training loop."""
    from ntto_ray.stages.ann import sq8_topk

    ids, m = _query_matrix(sf_dir)
    return sq8_topk(_emb(sf_dir), ids, m, k=10)


_CONT_THR = 80

_CONT_ORACLE = f"""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.toks, b.toks)) * 100 // len(a.toks)
            AS BIGINT) AS containment_pct
FROM d a JOIN d b ON a.doc_id != b.doc_id
WHERE len(list_intersect(a.toks, b.toks)) * 100 >= {_CONT_THR} * len(a.toks)
"""


@register("dedup_containment_pairs", oracle=_CONT_ORACLE)
def dedup_containment_pairs(sf_dir: str):
    """Directed token-set containment pairs (|A∩B|/|A| ≥ 80%): the
    asymmetric near-dup join — catches a short doc embedded in a longer
    one, which every symmetric Jaccard/MinHash threshold misses. One
    token-keyed exchange with emit-once ownership; see
    stages/dedup.py:containment_pairs for the asymmetric-prefix-filter
    plan and its honest full-df group-size cost."""
    from ntto_ray.queries_text import _docs
    from ntto_ray.stages.dedup import containment_pairs

    return containment_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold_pct=_CONT_THR
    )


def _ivfsq8_oracle() -> str:
    """Exact SQL mirror of the composed IVF + SQ8 chain: the shared
    deterministic k-means / cell-assignment CTEs (queries_text's
    ``_km_eassign_ctes``) pick each query's probed cells; the SQ8 CTEs
    (the ann_sq8_topk chain over the ``e`` raw-value CTE) rank the
    probed candidates by integer dot."""
    from ntto_ray.queries_text import _km_eassign_ctes

    nlist, nprobe, iters, train, k = 16, 4, 10, 4096, 10
    ctes = _km_eassign_ctes(nlist=nlist, iters=iters, train=train, dim=64)
    return f"""
WITH {ctes},
vv AS (
  SELECT vec_id, unnest(raw) AS x, generate_subscripts(raw, 1) AS d FROM e
),
st AS (SELECT d, min(x) AS mn, max(x) AS mx FROM vv GROUP BY d),
qz AS (
  SELECT vv.vec_id, vv.d,
         CASE WHEN st.mx > st.mn THEN
           LEAST(GREATEST(CAST(floor((vv.x - st.mn) / (st.mx - st.mn) * 255 + 0.5)
                          AS BIGINT), 0), 255) - 128
         ELSE 0 END AS q
  FROM vv JOIN st USING (d)
),
q AS (SELECT vec_id AS qid, v AS qv FROM en WHERE vec_id IN {_ANN_QUERY_IDS}),
probes AS (
  SELECT qid, c FROM (
    SELECT q.qid, f.c,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY list_dot_product(q.qv, f.cv) DESC, f.c ASC
           ) AS rn
    FROM q CROSS JOIN cent{iters} f
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.qid, ea.vec_id
  FROM probes p JOIN eassign ea ON ea.c = p.c
  WHERE ea.vec_id != p.qid
),
qd AS (
  SELECT c.qid, c.vec_id, sum(a.q * b.q) AS dot
  FROM cand c
  JOIN qz a ON a.vec_id = c.qid
  JOIN qz b ON b.vec_id = c.vec_id AND b.d = a.d
  GROUP BY 1, 2
),
r AS (
  SELECT qid, vec_id, dot,
         row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC)
           AS rank
  FROM qd
)
SELECT qid, vec_id, CAST(rank AS BIGINT) AS rank, CAST(dot AS BIGINT) AS qdot
FROM r WHERE rank <= {k}
"""


@register("ann_ivfsq8_topk", oracle=None)  # bound below (lazy CTE import)
def ann_ivfsq8_topk(sf_dir: str):
    """IVF + SQ8 composed top-10 — completes the IVF × {flat, PQ, SQ8}
    layout matrix: probed inverted lists bound WHICH vectors are
    touched, int8 scalar codes bound the BYTES per touched vector (¼ of
    float32) with NO codebook training loop (vs PQ). Coarse assignment
    on the shared deterministic spherical k-means; in-list ranking by
    bit-deterministic integer dots; the full composed chain is mirrored
    in ONE oracle."""
    from ntto_ray.stages.ann import ivf_sq8_topk

    ids, m = _query_matrix(sf_dir)
    return ivf_sq8_topk(_emb(sf_dir), ids, m, k=10, nlist=16, nprobe=4)


from ntto_ray import registry as _registry  # noqa: E402

_registry._ORACLES["ann_ivfsq8_topk"] = _ivfsq8_oracle()


# --- TPC-H Q3: shipping-priority top orders -----------------------------------

_Q3_CUT = "1998-03-15"

_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_c4,
       strftime(o.o_orderdate, '%Y-%m-%d') AS odate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q3_CUT}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_CUT}'
GROUP BY 1, 3, 4
ORDER BY revenue_c4 DESC, odate ASC, l_orderkey ASC
LIMIT 10
"""


@register("rel_q3_shipping", oracle=_Q3_ORACLE)
def rel_q3_shipping(sf_dir: str):
    """TPC-H Q3 (shipping priority): top-10 unshipped-revenue orders for
    one market segment — the classic filter → two hash joins → grouped
    sum → top-k chain. Scale shape: both joins are
    ``copartition_inner_join`` (customer and orders grow with the fact
    table — the fact-scale-dim rule); lineitem revenue pre-folds to one
    (orderkey, rev) partial per block BEFORE its join; the final top-10
    is a per-block partial top-k folded on the driver (k-scale, never
    orders-scale). Revenue is exact 4-decimal integer cents; ties break
    (odate, orderkey) ascending exactly like the SQL mirror."""
    from datetime import datetime

    import ray
    from ray.data.aggregate import Sum

    from ntto_ray.queries_rel import _cents, _read
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, join_parallelism
    from ntto_ray.stages.joins import copartition_inner_join

    cut = datetime.fromisoformat(_Q3_CUT)

    def cust_prep(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["c_mktsegment"], "BUILDING")
        return pa.table({"c_custkey": pc.filter(t["c_custkey"], keep)})

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(cust_prep, batch_format="pyarrow")
        .materialize()
    )

    def ord_prep(t: pa.Table) -> pa.Table:
        keep = pc.less(t["o_orderdate"], pa.scalar(cut))
        t = t.filter(keep)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "odate": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    orders = (
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        )
        .map_batches(ord_prep, batch_format="pyarrow")
        .materialize()
    )

    def li_prep(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["l_shipdate"], pa.scalar(cut))
        t = t.filter(keep)
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(
                pa.scalar(100, pa.int64()),
                pc.cast(
                    pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
                ),
            ),
        )
        # per-block fold: one (orderkey, rev) partial per distinct key
        k = t["l_orderkey"].to_numpy()
        r = rev.to_numpy() if not isinstance(rev, pa.ChunkedArray) else rev.combine_chunks().to_numpy()
        u, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, r)
        return pa.table({"l_orderkey": u, "rev": s})

    li = (
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(li_prep, batch_format="pyarrow")
        .materialize()
    )

    j1 = copartition_inner_join(
        orders,
        cust,
        on="o_custkey",
        right_on="c_custkey",
        parallelism=join_parallelism(orders, cust),
    ).materialize()
    j2 = copartition_inner_join(
        li,
        j1,
        on="l_orderkey",
        right_on="o_orderkey",
        parallelism=join_parallelism(li, j1),
    )

    agg = j2.groupby(["l_orderkey", "odate", "o_orderpriority"]).aggregate(
        Sum("rev", alias_name="revenue_c4")
    )

    out_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("revenue_c4", pa.int64()),
            ("odate", pa.string()),
            ("o_orderpriority", pa.string()),
        ]
    )

    def block_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "revenue_c4" not in t.column_names:
            return out_schema.empty_table()
        t = t.select(["l_orderkey", "revenue_c4", "odate", "o_orderpriority"])
        idx = pa.compute.sort_indices(
            t,
            sort_keys=[
                ("revenue_c4", "descending"),
                ("odate", "ascending"),
                ("l_orderkey", "ascending"),
            ],
        )[:10]
        return t.take(idx).cast(out_schema)

    parts = agg.map_batches(
        block_top, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    ).to_pandas()  # ≤10 rows per aggregate partition — k-scale
    if not len(parts):
        return out_schema.empty_table()
    parts = parts.sort_values(
        ["revenue_c4", "odate", "l_orderkey"],
        ascending=[False, True, True],
        kind="mergesort",
    ).head(10)
    return pa.Table.from_pandas(parts, schema=out_schema, preserve_index=False)


_CONT_KEEP_ORACLE = f"""
WITH p AS ({_CONT_ORACLE}),
r AS (
  SELECT doc_a, doc_b, containment_pct,
         row_number() OVER (
           PARTITION BY doc_a ORDER BY containment_pct DESC, doc_b ASC
         ) AS rn
  FROM p
)
SELECT doc_a, doc_b AS keep_doc, containment_pct FROM r WHERE rn = 1
"""


@register("dedup_containment_keep", oracle=_CONT_KEEP_ORACLE)
def dedup_containment_keep(sf_dir: str):
    """Containment-dedup DECISION layer: every doc that is ≥80%
    contained in another doc maps to its best container (highest
    containment, ties to the lowest container id) — the "drop the
    quoted copy, keep the superset" rule a curation pipeline applies
    after the asymmetric join. The argmax folds TWICE: once per block
    BEFORE the exchange (the shuffle ships one candidate per (block,
    doc) instead of the full dup-rate-scale pair set) and once after
    the doc_a-keyed group-safe exchange; nothing beyond the decision
    table reaches the driver."""
    from ntto_ray.queries_text import _docs
    from ntto_ray.stages.dedup import containment_pairs
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    pairs = containment_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold_pct=_CONT_THR
    )
    out_schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("keep_doc", pa.int64()),
            ("containment_pct", pa.int64()),
        ]
    )

    def pick(t: pa.Table, b_col: str) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return out_schema.empty_table()
        a = t["doc_a"].to_numpy()
        b = t[b_col].to_numpy()
        p = t["containment_pct"].to_numpy()
        order = np.lexsort((b, -p, a))
        a, b, p = a[order], b[order], p[order]
        first = np.r_[True, a[1:] != a[:-1]]
        return pa.table(
            {"doc_a": a[first], "keep_doc": b[first], "containment_pct": p[first]}
        )

    partial = pairs.map_batches(
        lambda t: pick(t, "doc_b"), batch_format="pyarrow"
    )
    return hash_grouped(partial, ["doc_a"], sort=False).map_batches(
        lambda t: pick(t, "keep_doc"),
        batch_size=None,
        batch_format="pyarrow",
        **NO_FUSE_ARGS,
    )


# --- TPC-H Q5: local supplier volume ------------------------------------------

_Q5_LO, _Q5_HI = "1996-01-01", "1997-01-01"

_Q5_ORACLE = f"""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_c4
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '{_Q5_LO}'
  AND o.o_orderdate < TIMESTAMP '{_Q5_HI}'
GROUP BY 1
"""


@register("rel_q5_local_volume", oracle=_Q5_ORACLE)
def rel_q5_local_volume(sf_dir: str):
    """TPC-H Q5 (local supplier volume): revenue per ASIA nation where
    the supplier and the customer share the nation — the 6-table chain.
    Scale shape: region⋈nation is a constant ≤25-row lookup folded
    map-side into supplier (broadcast, the small-side rule); the three
    fact-scale joins (lineitem⋈supplier, ⋈orders, ⋈customer) are
    ``copartition_inner_join``s with the date filter pushed into the
    orders scan and the local-supplier predicate applied the moment
    both nation keys co-reside; only the ≤nations-row aggregate leaves
    the last stage. Integer-cents revenue (queries_rel exactness
    discipline)."""
    from datetime import datetime

    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from ntto_ray.queries_rel import _cents, _read
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, join_parallelism
    from ntto_ray.stages.joins import copartition_inner_join

    lo = datetime.fromisoformat(_Q5_LO)
    hi = datetime.fromisoformat(_Q5_HI)

    # constant dims: nation ⋈ region, filtered to ASIA — a ≤25-entry
    # map folded into the supplier scan (broadcast via closure capture;
    # pandas/pyarrow driver read of two tiny files, never a shuffle)
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia = set(reg[reg["r_name"] == "ASIA"]["r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(asia)]
    nkey_to_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    asia_nations = np.array(sorted(nkey_to_name), dtype=np.int64)

    def supp_prep(t: pa.Table) -> pa.Table:
        nk = pc.cast(t["s_nationkey"], pa.int64())
        keep = pc.is_in(nk, value_set=pa.array(asia_nations))
        t = t.filter(keep)
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "s_nat": pc.cast(t["s_nationkey"], pa.int64()),
            }
        )

    supp = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .map_batches(supp_prep, batch_format="pyarrow")
        .materialize()
    )

    def li_prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(
                pa.scalar(100, pa.int64()),
                pc.cast(
                    pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
                ),
            ),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "rev": rev,
            }
        )

    li = (
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(li_prep, batch_format="pyarrow")
        .materialize()
    )
    j1 = copartition_inner_join(
        li, supp, on="l_suppkey", right_on="s_suppkey",
        parallelism=join_parallelism(li, supp),
    ).materialize()

    def ord_prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)),
        )
        t = t.filter(keep)
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"]}
        )

    orders = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(ord_prep, batch_format="pyarrow")
        .materialize()
    )
    j2 = copartition_inner_join(
        j1, orders, on="l_orderkey", right_on="o_orderkey",
        parallelism=join_parallelism(j1, orders),
    ).materialize()

    def cust_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nat": pc.cast(t["c_nationkey"], pa.int64()),
            }
        )

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .map_batches(cust_prep, batch_format="pyarrow")
        .materialize()
    )
    j3 = copartition_inner_join(
        j2, cust, on="o_custkey", right_on="c_custkey",
        parallelism=join_parallelism(j2, cust),
    )

    _P = pa.schema([("n_name", pa.string()), ("rev", pa.int64())])

    def local_fold(t: pa.Table) -> pa.Table:
        """Apply the local-supplier predicate and fold to a ≤nations
        partial the moment both nation keys co-reside in the block."""
        if t.num_rows == 0 or "s_nat" not in t.column_names:
            return _P.empty_table()
        sn = t["s_nat"].to_numpy()
        cn = t["c_nat"].to_numpy()
        keep = sn == cn
        if not keep.any():
            return _P.empty_table()
        sn = sn[keep]
        rv = t["rev"].to_numpy()[keep]
        u, inv = np.unique(sn, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, rv)
        return pa.table(
            {
                "n_name": pa.array(
                    [nkey_to_name[int(k)] for k in u], pa.string()
                ),
                "rev": s,
            }
        )

    return (
        j3.map_batches(local_fold, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev", alias_name="revenue_c4"))
    )


# --- GIF decode ---------------------------------------------------------------


def _gif_oracle() -> str:
    """Pixel-statistics oracle for the GIF fixtures: the digest bytes
    are palette INDICES, and the fixture palette is arithmetic
    (i, 255−i, 7i mod 256), so each decoded channel byte is a pure SQL
    function of the tiled digest byte at pixel position p // 3."""
    from ntto_ray.queries_media import _BYTE

    ib = _BYTE.replace("p.p", "(p.p // 3)")
    return f"""
WITH img AS (
  SELECT event_id AS media_id,
         sha256(CAST(event_id AS VARCHAR)) AS dh,
         24 * (4 + event_id % 4) AS n,
         4 + event_id % 4 AS ih
  FROM events WHERE event_id % 3 = 0
),
b AS (
  SELECT media_id, n, ih, p.p AS p,
         CASE p.p % 3
           WHEN 0 THEN {ib}
           WHEN 1 THEN 255 - ({ib})
           ELSE (({ib}) * 7) % 256
         END AS byte
  FROM img CROSS JOIN (SELECT unnest(generate_series(0, 167)) AS p) p
  WHERE p.p < n
)
SELECT media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(any_value(ih) AS INTEGER) AS height,
       CAST(sum(byte) FILTER (p % 3 = 0) / (n / 3) AS FLOAT) AS f0,
       CAST(sum(byte) FILTER (p % 3 = 1) / (n / 3) AS FLOAT) AS f1,
       CAST(sum(byte) FILTER (p % 3 = 2) / (n / 3) AS FLOAT) AS f2,
       CAST(avg(byte) AS FLOAT) AS f3,
       CAST(min(byte) AS FLOAT) AS f4,
       CAST(max(byte) AS FLOAT) AS f5,
       CAST(CAST(sum(byte*byte) AS DOUBLE) / n - avg(byte)*avg(byte) AS FLOAT) AS f6,
       CAST(CAST(count(*) FILTER (byte > 127) AS DOUBLE) / n AS FLOAT) AS f7
FROM b GROUP BY media_id, n
"""


@register("media_decode_gif", oracle=_gif_oracle())
def media_decode_gif(sf_dir: str):
    """REAL GIF decode with no image library: a pure-Python GIF87a
    codec (variable-width LZW with dictionary growth, 12-bit cap and
    clear-code reset; global color table; extension blocks skipped) in
    stages/multimodal.py. The fixture payloads index an arithmetic
    palette, so the palette-expanded pixel statistics are exactly
    SQL-mirrorable — the third compressed/indexed format with an
    oracle-exact decoder (PNG, GIF; only JPEG still honestly raises)."""
    from ntto_ray.queries_media import _decode_real

    return _decode_real(sf_dir, codec="gif")
