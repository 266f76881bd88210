"""Round-3 continuation operators (batch 4): conversation-level SFT
quality gate over the transcript payload, a TPC-H Q18-style
large-volume having-semi-join, and a cross-source duplicate-overlap
matrix for corpus curation.

Engine surface beyond the reference's triple model (the reference,
cmd/ntto/ntto.go, stops at parse→abbreviate→render); every query carries
an exact DuckDB oracle. All outputs are integer/string typed (no float
hash drift).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ntto_ray.registry import register

# --- conversation-level SFT gate ----------------------------------------------

_SFT_MIN_CHARS = 560  # total chars across all turns (tuned: ~80% pass at sf0.01)
_SFT_MIN_TURNS = 6
_SFT_MIN_TOOL = 1


def _sft_oracle() -> str:
    from ntto_ray.functions import kgspec as K

    return f"""
WITH t AS ({K.transcripts_sql()}),
agg AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT)                                  AS n_turns,
         CAST(sum(CASE WHEN role = 'user' THEN length(text) ELSE 0 END) AS BIGINT)      AS user_chars,
         CAST(sum(CASE WHEN role = 'assistant' THEN length(text) ELSE 0 END) AS BIGINT) AS asst_chars,
         CAST(sum(CASE WHEN role = 'tool' THEN length(text) ELSE 0 END) AS BIGINT)      AS tool_chars,
         CAST(sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT)                    AS n_tool_calls
  FROM t GROUP BY 1
)
SELECT conv_id, n_turns, user_chars, asst_chars, tool_chars, n_tool_calls,
       CAST(CASE WHEN n_turns >= {_SFT_MIN_TURNS}
                  AND n_tool_calls >= {_SFT_MIN_TOOL}
                  AND user_chars + asst_chars + tool_chars >= {_SFT_MIN_CHARS}
             THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM agg
""".strip()


@register("kg_conv_sft_gate", oracle=None)  # oracle filled by _late_oracles
def kg_conv_sft_gate(sf_dir: str):
    """Conversation-level SFT-readiness gate over the transcript payload
    (the input_hint table itself, not the derived KG): per conversation,
    turn count, per-role character mass, tool-call count, and a keep
    decision (enough turns, at least one tool call, enough total text) —
    the admission filter an instruction-tuning data pipeline runs before
    a conversation enters the training mix. The reference has no
    conversation concept at all (one NT line = one record,
    cmd/ntto/ntto.go:162-197).

    Plan: one vectorized indicator pass (role one-hot × utf8_length, no
    Python rows) → ONE grouped-aggregate exchange keyed on conv_id
    moving 6-int partials per turn → a final vectorized keep flag.
    Integer chars only; no float drift."""
    from ray.data.aggregate import Count, Sum

    from ntto_ray.sources.transcripts import synth_transcripts

    ds = synth_transcripts(sf_dir)

    def indicators(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0 or "conv_id" not in t.column_names:
            return pa.schema(
                [
                    ("conv_id", pa.string()),
                    ("uc", pa.int64()),
                    ("ac", pa.int64()),
                    ("tc", pa.int64()),
                    ("ntool", pa.int64()),
                ]
            ).empty_table()
        chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        role = t["role"]
        zero = pa.scalar(0, pa.int64())
        uc = pc.if_else(pc.equal(role, "user"), chars, zero)
        ac = pc.if_else(pc.equal(role, "assistant"), chars, zero)
        tc = pc.if_else(pc.equal(role, "tool"), chars, zero)
        ntool = pc.cast(pc.not_equal(t["tool"], ""), pa.int64())
        return pa.table(
            {"conv_id": t["conv_id"], "uc": uc, "ac": ac, "tc": tc, "ntool": ntool}
        )

    agg = (
        ds.map_batches(indicators, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Count(alias_name="n_turns"),
            Sum("uc", alias_name="user_chars"),
            Sum("ac", alias_name="asst_chars"),
            Sum("tc", alias_name="tool_chars"),
            Sum("ntool", alias_name="n_tool_calls"),
        )
    )

    def gate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_turns" not in t.column_names:
            return pa.schema(
                [
                    ("conv_id", pa.string()),
                    ("n_turns", pa.int64()),
                    ("user_chars", pa.int64()),
                    ("asst_chars", pa.int64()),
                    ("tool_chars", pa.int64()),
                    ("n_tool_calls", pa.int64()),
                    ("keep", pa.int64()),
                ]
            ).empty_table()
        total = pc.add(
            pc.add(t["user_chars"], t["asst_chars"]), t["tool_chars"]
        )
        keep = pc.cast(
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["n_turns"], _SFT_MIN_TURNS),
                    pc.greater_equal(t["n_tool_calls"], _SFT_MIN_TOOL),
                ),
                pc.greater_equal(total, _SFT_MIN_CHARS),
            ),
            pa.int64(),
        )
        return t.append_column("keep", keep)

    return agg.map_batches(gate, batch_format="pyarrow")


# --- TPC-H Q18-style large-volume orders --------------------------------------

_Q18_QTY = 180

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > {_Q18_QTY}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_c,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""".strip()


@register("rel_q18_volume", oracle=_Q18_ORACLE)
def rel_q18_volume(sf_dir: str):
    """TPC-H Q18 (large-volume customer): orders whose total lineitem
    quantity exceeds {_Q18_QTY}, joined back to orders and customers.
    The classic HAVING-on-aggregate → semi-join-back shape.

    Plan: ONE grouped-Sum exchange on l_orderkey (per-block partials
    first via the C++ hash aggregate), filter to the surviving orders
    (result-scale), then TWO distributed hash joins (Dataset.join,
    partitions sized from known row counts) — the surviving-order side
    is tiny so each join's aggregator actors move result-scale rows;
    orders and customer both STREAM, never broadcast (the round-2
    verdict's fact-scale-dim rule)."""
    from ray.data.aggregate import Sum

    from ntto_ray.queries_rel import _cents, _read
    from ntto_ray.stages.exchange import join_parallelism

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "q": pc.cast(t["l_quantity"], pa.int64()),
            }
        )

    big = (
        li.map_batches(qty_prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("q", alias_name="sum_qty"))
        .filter(expr=f"sum_qty > {_Q18_QTY}")
        .materialize()
    )

    def ord_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "total_c": _cents(t["o_totalprice"]),
            }
        )

    orders = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(ord_prep, batch_format="pyarrow")
        .materialize()
    )
    j1 = big.join(
        orders,
        "inner",
        num_partitions=join_parallelism(big, orders),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    ).materialize()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).materialize()
    j2 = j1.join(
        cust,
        "inner",
        num_partitions=join_parallelism(j1, cust),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_name" not in t.column_names:
            return pa.schema(
                [
                    ("c_custkey", pa.int64()),
                    ("c_name", pa.string()),
                    ("o_orderkey", pa.int64()),
                    ("total_c", pa.int64()),
                    ("sum_qty", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "c_name": t["c_name"],
                "o_orderkey": t["l_orderkey"],
                "total_c": t["total_c"],
                "sum_qty": t["sum_qty"],
            }
        )

    return j2.map_batches(project, batch_format="pyarrow")


# --- cross-source duplicate overlap -------------------------------------------

_OVL_KEY_CHARS = 30

_OVL_ORACLE = f"""
WITH k AS (
  SELECT DISTINCT substr(text, 1, {_OVL_KEY_CHARS}) AS key, source
  FROM documents
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM k a JOIN k b ON a.key = b.key AND a.source < b.source
GROUP BY 1, 2
""".strip()


@register("corpus_source_overlap", oracle=_OVL_ORACLE)
def corpus_source_overlap(sf_dir: str):
    """Cross-source duplicate-overlap matrix: for every pair of corpus
    sources, how many exact-dup clusters (by the same normalized content
    key exact_dedup_keys uses — first {_OVL_KEY_CHARS} chars) they
    share. This is the mirror-detection report a corpus curator runs to
    find re-crawled / syndicated content before fixing source weights.

    Plan: vectorized (key, source) projection → block-local distinct →
    ONE hash exchange keyed on the content key (co-locates each
    cluster) → per-block vectorized pair emission (sorted runs +
    offset-shift trick, no per-cluster Python) → a tiny grouped Count
    over source pairs (pair-scale rows only)."""
    import ray.data
    from ray.data.aggregate import Count

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )

    _KS = pa.schema([("key", pa.string()), ("source", pa.string())])

    def keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return _KS.empty_table()
        key = pc.utf8_slice_codeunits(t["text"], start=0, stop=_OVL_KEY_CHARS)
        out = pa.table({"key": key, "source": t["source"]})
        # block-local distinct (clusters may span blocks; the exchange
        # finishes the job)
        return out.group_by(["key", "source"]).aggregate([])

    _PAIR = pa.schema([("src_a", pa.string()), ("src_b", pa.string())])

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key" not in t.column_names:
            return _PAIR.empty_table()
        # exchange partials may still hold within-partition duplicates
        t = t.group_by(["key", "source"]).aggregate([])
        d = t.sort_by([("key", "ascending"), ("source", "ascending")])
        key = d["key"].to_numpy(zero_copy_only=False)
        src = d["source"].to_numpy(zero_copy_only=False)
        n = len(key)
        a_parts, b_parts = [], []
        # all (i, i+off) pairs inside a key-run, one vectorized mask per
        # offset; max offset = largest cluster's source fanout (tiny)
        off = 1
        while off < n:
            m = key[:-off] == key[off:]
            if not m.any():
                break
            a_parts.append(src[:-off][m])
            b_parts.append(src[off:][m])
            off += 1
        if not a_parts:
            return _PAIR.empty_table()
        return pa.table(
            {
                "src_a": pa.array(np.concatenate(a_parts)),
                "src_b": pa.array(np.concatenate(b_parts)),
            }
        )

    grouped = hash_grouped(
        docs.map_batches(keys, batch_format="pyarrow"), ["key"], reserve_cpus=False
    )
    return (
        grouped.map_batches(
            pairs, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
        )
        .groupby(["src_a", "src_b"])
        .aggregate(Count(alias_name="n_shared"))
    )


# --- deterministic Lloyd k-means over the embedding column --------------------

_KM_K = 8
_KM_ITERS = 2
_KM_FP = 1_000_000  # fixed-point scale (ann_label_centroids discipline)
_KM_DIM = 64


def _km_fixed_point(t: pa.Table) -> np.ndarray:
    """(n, dim) int64 fixed-point matrix from the list<float> column.
    float32→double is exact, so both engines floor the identical value."""
    emb = t["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    x = np.floor(flat * _KM_FP).astype(np.int64)
    return x.reshape(len(emb), -1)


def _km_assign(x_int: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Index into cents of the nearest centroid (squared L2, ties to the
    lowest centroid id — np.argmin's first-minimum matches the oracle's
    ORDER BY dist, cid)."""
    # (n, k) distances without the (n, k, d) intermediate:
    # |x-c|^2 = |x|^2 - 2 x·c + |c|^2 ; |x|^2 is rank-constant, drop it.
    cross = x_int @ cents.T  # int64 exact: |x·c| <= d * 1e6 * 1e6 < 2^63
    cnorm = np.einsum("kd,kd->k", cents, cents)
    score = cnorm[None, :] - 2 * cross
    return np.argmin(score, axis=1)


def _km_fit(sf_dir: str):
    """Shared Lloyd fit: returns (materialized embeddings Dataset,
    cluster ids, final centroids) after _KM_ITERS deterministic
    fixed-point updates. See ann_kmeans_clusters for the plan."""
    import ray.data
    from ray.data.aggregate import Sum

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()

    import ray as _ray

    seed_t = pa.concat_tables(
        [
            _ray.get(ref)
            for ref in emb.filter(expr=f"vec_id < {_KM_K}").to_arrow_refs()
        ]
    ).sort_by("vec_id")
    cids = seed_t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cents = _km_fixed_point(seed_t)

    _PART = pa.schema(
        [
            ("cid", pa.int64()),
            ("dim", pa.int64()),
            ("s", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    for _ in range(_KM_ITERS):
        c_snap, id_snap = cents.copy(), cids.copy()

        def partial(t: pa.Table, _c=c_snap, _ids=id_snap) -> pa.Table:
            if t.num_rows == 0 or "embedding" not in t.column_names:
                return _PART.empty_table()
            x = _km_fixed_point(t)
            a = _km_assign(x, _c)
            k, d = _c.shape
            sums = np.zeros((k, d), np.int64)
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            live = cnt > 0
            kk = int(live.sum())
            return pa.table(
                {
                    "cid": pa.array(np.repeat(_ids[live], d)),
                    "dim": pa.array(
                        np.tile(np.arange(1, d + 1, dtype=np.int64), kk)
                    ),
                    "s": pa.array(sums[live].reshape(-1)),
                    "n": pa.array(np.repeat(cnt[live], d)),
                }
            )

        folded = (
            emb.map_batches(partial, batch_format="pyarrow")
            .groupby(["cid", "dim"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .to_pandas()  # k×dim rows — result-scale
        )
        new = cents.copy()
        if len(folded):
            ci = np.searchsorted(cids, folded["cid"].to_numpy())
            di = folded["dim"].to_numpy() - 1
            s = folded["s"].to_numpy()
            n = folded["n"].to_numpy()
            # truncating division toward zero == DuckDB's BIGINT //
            q = np.sign(s) * (np.abs(s) // n)
            new[ci, di] = q
        cents = new

    return emb, cids, cents


@register("ann_kmeans_clusters", oracle=None)  # oracle filled by _late_oracles
def ann_kmeans_clusters(sf_dir: str):
    """Deterministic Lloyd k-means over the embedding table — the
    clustering primitive behind IVF coarse quantizers and corpus
    topic-bucketing, made hash-exact: vectors are fixed-pointed
    (floor(v·1e6) int64), distances are exact int64, centroid updates
    are truncating integer division (DuckDB's `//`), and the seed
    centroids are the first {_KM_K} vectors by vec_id. Cluster id = the
    seed's vec_id.

    Plan: per iteration, centroids ({_KM_K}×{_KM_DIM} ints) broadcast in
    the task closure; each block computes assignments via one int64
    matmul (|x−c|² = |c|²−2x·c, no (n,k,d) intermediate) and emits
    (cid, dim, partial_sum, n) rows — the exchange moves
    k×dim-scale partials, never vectors; the driver folds the
    result-scale table into the next centroids. Final pass emits
    (vec_id, cluster). {_KM_ITERS} updates + 1 assignment, each ONE tiny
    grouped exchange."""
    emb, cids, cents = _km_fit(sf_dir)

    _OUT = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64())])

    def assign(t: pa.Table, _c=cents, _ids=cids) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.column_names:
            return _OUT.empty_table()
        a = _km_assign(_km_fixed_point(t), _c)
        return pa.table({"vec_id": t["vec_id"], "cluster": pa.array(_ids[a])})

    return emb.map_batches(assign, batch_format="pyarrow")


@register("ann_kmeans_inertia", oracle=None)  # oracle filled by _late_oracles
def ann_kmeans_inertia(sf_dir: str):
    """Per-cluster k-means evaluation: member count and EXACT int64
    inertia (sum of squared fixed-point L2 distances to the assigned
    centroid) after the same deterministic Lloyd fit as
    ann_kmeans_clusters — the convergence/quality metric an IVF trainer
    monitors. One extra vectorized pass + a k-scale grouped Sum."""
    from ray.data.aggregate import Sum

    emb, cids, cents = _km_fit(sf_dir)

    _P = pa.schema([("cluster", pa.int64()), ("n", pa.int64()), ("inertia", pa.int64())])

    def partial(t: pa.Table, _c=cents, _ids=cids) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.column_names:
            return _P.empty_table()
        x = _km_fixed_point(t)
        a = _km_assign(x, _c)
        diff = x - _c[a]
        d2 = np.einsum("nd,nd->n", diff, diff)
        k = len(_ids)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        ine = np.zeros(k, np.int64)
        np.add.at(ine, a, d2)
        live = cnt > 0
        return pa.table(
            {
                "cluster": pa.array(_ids[live]),
                "n": pa.array(cnt[live]),
                "inertia": pa.array(ine[live]),
            }
        )

    return (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n"), Sum("inertia", alias_name="inertia"))
    )


def _km_cte() -> str:
    fp = _KM_FP
    cte = [
        f"""vecs AS MATERIALIZED (
  SELECT vec_id, r.i AS dim,
         CAST(floor(CAST(embedding[CAST(r.i AS INTEGER)] AS DOUBLE) * {fp}) AS BIGINT) AS x
  FROM embeddings, range(1, {_KM_DIM + 1}) r(i))""",
        f"c0 AS (SELECT vec_id AS cid, dim, x FROM vecs WHERE vec_id < {_KM_K})",
    ]
    for it in range(_KM_ITERS):
        cte.append(
            f"""a{it} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY sum((v.x - c.x) * (v.x - c.x)), c.cid) AS rn
    FROM vecs v JOIN c{it} c USING (dim)
    GROUP BY v.vec_id, c.cid) WHERE rn = 1)""",
        )
        cte.append(
            f"""s{it} AS (
  SELECT a.cid, v.dim, sum(v.x) AS s, count(*) AS n
  FROM a{it} a JOIN vecs v USING (vec_id) GROUP BY 1, 2)""",
        )
        cte.append(
            f"""c{it + 1} AS MATERIALIZED (
  SELECT p.cid, p.dim, COALESCE(s.s // s.n, p.x) AS x
  FROM c{it} p LEFT JOIN s{it} s ON s.cid = p.cid AND s.dim = p.dim)""",
        )
    cte.append(
        f"""fin AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT v.vec_id, c.cid,
           sum((v.x - c.x) * (v.x - c.x)) AS dist,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY sum((v.x - c.x) * (v.x - c.x)), c.cid) AS rn
    FROM vecs v JOIN c{_KM_ITERS} c USING (dim)
    GROUP BY v.vec_id, c.cid) WHERE rn = 1)""",
    )
    return "WITH " + ",\n".join(cte)


def _km_oracle() -> str:
    return (
        _km_cte()
        + "\nSELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM fin"
    )


def _km_inertia_oracle() -> str:
    return _km_cte() + """
SELECT CAST(cid AS BIGINT) AS cluster,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(dist) AS BIGINT) AS inertia
FROM fin GROUP BY 1"""


# --- temporal KG growth curve --------------------------------------------------


@register("kg_growth_curve", oracle=None)  # oracle filled by _late_oracles
def kg_growth_curve(sf_dir: str):
    """KG growth curve: canonical triples bucketed by the HOUR of their
    first assertion (the transcript timestamp spec: conversation doc_id
    starts at minute doc_id, turn k at +5k seconds — functions/kgspec.py
    transcripts_sql). The monitoring view an incremental KG builder
    plots to see edge-discovery rate over ingest time.

    Plan: abbreviated triples keep (conv_id, turn_idx) lineage; the
    assertion second is derived vectorized (slice conv_id → int64,
    ×60 + 5·turn) → per-block min per (s,p,o) partial → ONE hash
    exchange on the triple key → exact min → per-block hour histogram
    partials → tiny grouped Sum (bucket-scale)."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import abbreviate, extract_triples
    from ntto_ray.sources.transcripts import synth_transcripts
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    abbrev = abbreviate(extract_triples(synth_transcripts(sf_dir)))

    _PART = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("sec", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _PART.empty_table()
        doc = pc.cast(pc.utf8_slice_codeunits(t["conv_id"], start=5), pa.int64())
        sec = pc.add(
            pc.multiply(doc, pa.scalar(60, pa.int64())),
            pc.multiply(pc.cast(t["turn_idx"], pa.int64()), pa.scalar(5, pa.int64())),
        )
        g = (
            t.select(["subj", "pred", "obj"])
            .append_column("sec", sec)
            .group_by(["subj", "pred", "obj"])
            .aggregate([("sec", "min")])
        )
        return g.select(["subj", "pred", "obj", "sec_min"]).rename_columns(
            ["subj", "pred", "obj", "sec"]
        )

    grouped = hash_grouped(
        abbrev.map_batches(partial, batch_format="pyarrow"),
        ["subj", "pred", "obj"],
        sort=False,
    )

    _H = pa.schema([("hour", pa.int64()), ("n", pa.int64())])

    def hour_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _H.empty_table()
        m = t.group_by(["subj", "pred", "obj"]).aggregate([("sec", "min")])
        hour = pc.divide(m["sec_min"], pa.scalar(3600, pa.int64()))
        vc = pa.table({"hour": hour}).group_by(["hour"]).aggregate([("hour", "count")])
        return pa.table(
            {"hour": vc["hour"], "n": pc.cast(vc["hour_count"], pa.int64())}
        )

    return (
        grouped.map_batches(
            hour_partial, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
        )
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n_triples"))
    )


# --- ER merge map: sameAs resolution over conversation entities ---------------

_MERGE_PCT = 58


@register("kg_entity_merge_map", oracle=None)  # oracle filled by _late_oracles
def kg_entity_merge_map(sf_dir: str):
    """Entity-resolution MERGE step: conversations whose discusses-profile
    Jaccard clears {_MERGE_PCT}% are declared the same underlying
    discussion (owl:sameAs-style), and the pair list is closed into
    connected components so every merged conversation maps to ONE
    canonical id (the component minimum) — the step that turns ER pair
    scores into an id-rewrite table a KG builder applies before
    canonicalization. Plan: the SAME globally-exact profile-Jaccard join
    as kg_er_profile_jaccard feeds distributed min-label propagation
    (stages/graph.connected_components — edges stay a Dataset; rounds
    bounded by component diameter). Output is merge-scale (only convs
    that merged with someone)."""
    from ntto_ray.queries_llm_ext3 import kg_er_profile_jaccard
    from ntto_ray.stages.graph import connected_components

    pairs = kg_er_profile_jaccard(sf_dir).filter(
        expr=f"jaccard_pct >= {_MERGE_PCT}"
    )
    comp = connected_components(pairs, a_col="conv_a", b_col="conv_b")
    return comp.rename_columns(["conv", "canonical"])


# --- TPC-H Q7-style nation-pair trade flow -------------------------------------

_Q7_ORACLE = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_c4
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE s.s_nationkey <> c.c_nationkey
GROUP BY 1, 2
""".strip()


@register("rel_q7_trade_flow", oracle=_Q7_ORACLE)
def rel_q7_trade_flow(sf_dir: str):
    """TPC-H Q7 (volume shipping): discounted revenue between every
    (supplier nation, customer nation) pair — the deepest join chain in
    the suite (lineitem ⋈ supplier ⋈ orders ⋈ customer + two nation
    lookups). Scale shape: THREE distributed hash joins (both sides
    stream — supplier and customer grow with the fact table, so neither
    is broadcast, per the round-2 verdict's fact-scale-dim rule); the
    constant 25-row nation dim folds in map-side; a per-block
    (orderkey, supp-nation) combiner between joins cuts the second
    join's input; only the nation×nation aggregate leaves the last
    stage. Each join is a ``copartition_inner_join`` — one tag-union
    hash exchange + per-partition acero join — because Ray's native
    join operator pays a per-join aggregator-actor spin-up that
    dominated this chain (measured 26 s → see stages/joins.py).
    Revenue is 4-decimal integer cents (queries_rel exactness
    discipline)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from ntto_ray.queries_rel import _cents, _read
    from ntto_ray.stages.exchange import join_parallelism
    from ntto_ray.stages.joins import copartition_inner_join

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )

    def li_prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(
                pa.scalar(100, pa.int64()),
                pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()),
            ),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "rev": rev,
            }
        )

    li = li.map_batches(li_prep, batch_format="pyarrow").materialize()

    def supp_prep(t: pa.Table) -> pa.Table:
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
    j1 = copartition_inner_join(
        li,
        supp,
        on="l_suppkey",
        right_on="s_suppkey",
        parallelism=join_parallelism(li, supp),
    )

    # map-side combiner: one (orderkey, supp-nation) partial per block
    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return pa.schema(
                [
                    ("l_orderkey", pa.int64()),
                    ("s_nat", pa.int64()),
                    ("rev", pa.int64()),
                ]
            ).empty_table()
        g = (
            t.select(["l_orderkey", "s_nat", "rev"])
            .group_by(["l_orderkey", "s_nat"])
            .aggregate([("rev", "sum")])
        )
        return g.select(["l_orderkey", "s_nat", "rev_sum"]).rename_columns(
            ["l_orderkey", "s_nat", "rev"]
        )

    j1 = j1.map_batches(combine, batch_format="pyarrow").materialize()

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).materialize()
    j2 = copartition_inner_join(
        j1,
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        parallelism=join_parallelism(orders),
    )
    # drop the spent orderkey before the third exchange ships the rows
    j2 = j2.select_columns(["o_custkey", "s_nat", "rev"])

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
        j2,
        cust,
        on="o_custkey",
        right_on="c_custkey",
        parallelism=join_parallelism(cust),
        # j2 is a lazy chain — hand over its (known) schema so the join
        # doesn't execute a prefix just to sniff types
        left_schema=pa.schema(
            [("o_custkey", pa.int64()), ("s_nat", pa.int64()), ("rev", pa.int64())]
        ),
    )

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nat_keys = nat["n_nationkey"].to_numpy().astype(np.int64)
    nat_names = nat["n_name"].to_numpy(zero_copy_only=False)
    lut = np.empty(int(nat_keys.max()) + 1, dtype=object)
    lut[nat_keys] = nat_names

    _OUT = pa.schema(
        [("supp_nation", pa.string()), ("cust_nation", pa.string()), ("rev", pa.int64())]
    )

    def names(t: pa.Table, _lut=lut) -> pa.Table:
        if t.num_rows == 0 or "s_nat" not in t.column_names:
            return _OUT.empty_table()
        s = t["s_nat"].to_numpy(zero_copy_only=False)
        c = t["c_nat"].to_numpy(zero_copy_only=False)
        keep = s != c
        part = pa.table(
            {
                "supp_nation": pa.array(_lut[s[keep]], pa.string()),
                "cust_nation": pa.array(_lut[c[keep]], pa.string()),
                "rev": t["rev"].filter(pa.array(keep)),
            }
        )
        g = part.group_by(["supp_nation", "cust_nation"]).aggregate([("rev", "sum")])
        return g.select(["supp_nation", "cust_nation", "rev_sum"]).rename_columns(
            ["supp_nation", "cust_nation", "rev"]
        )

    return (
        j3.map_batches(names, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation"])
        .aggregate(Sum("rev", alias_name="revenue_c4"))
    )


# --- inverse prefix expansion (abbrev → full IRI round-trip) -------------------


@register("kg_expand_roundtrip", oracle=None)  # oracle filled by _late_oracles
def kg_expand_roundtrip(sf_dir: str):
    """Inverse of the reference's core transform: expand every
    abbreviated ``shortcut:rest`` back to its full IRI (first rule wins
    when two rules share a shortcut — the rule-order discipline of
    common.go:104-127 read backwards). The ORACLE is the raw canonical
    triple set itself (DISTINCT over the pre-abbreviation extract), so
    the query proves expand∘abbreviate == identity on the whole KG — a
    property the reference never checks (it has no expand path at all).

    Plan: one stateless vectorized pass over the canonical triples: head
    = text before the first ':', binary-searched against the sorted
    shortcut table (broadcast, 226 rows), matched rows re-joined as
    prefix‖rest — no per-row Python, no extra exchange beyond the KG
    pipeline's own."""
    from ntto_ray.pipelines.kg import pipeline_rules, run_kg_pipeline

    # first occurrence wins for duplicate shortcuts (rule order)
    d: dict[str, str] = {}
    for r in pipeline_rules():
        d.setdefault(r.shortcut, r.prefix)
    sc = np.array(sorted(d))
    px = np.array([d[s] for s in sc], dtype=object)

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    def expand_col(col: pa.ChunkedArray | pa.Array) -> pa.Array:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern(col, pattern=":", max_splits=1)
        head = pc.list_element(parts, 0).to_numpy(zero_copy_only=False)
        # rows with no ':' have a 1-element list → rest is null
        rest = pc.if_else(
            pc.equal(pc.list_value_length(parts), 2),
            pc.list_element(parts, 1),
            pa.scalar(None, pa.string()),
        )
        idx = np.searchsorted(sc, head)
        idx_c = np.clip(idx, 0, len(sc) - 1)
        found = (sc[idx_c] == head) & ~pc.is_null(rest).to_numpy(
            zero_copy_only=False
        )
        prefix = np.where(found, px[idx_c], "")
        joined = pc.binary_join_element_wise(
            pa.array(prefix, pa.string()), pc.fill_null(rest, ""), ""
        )
        return pc.if_else(pa.array(found), joined, col)

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return pa.schema(
                [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
            ).empty_table()
        return pa.table(
            {
                "subj": expand_col(t["subj"]),
                "pred": expand_col(t["pred"]),
                "obj": expand_col(t["obj"]),
            }
        )

    return canon.map_batches(expand, batch_format="pyarrow")


# --- content-defined chunking (CDC) dedup --------------------------------------

_CDC_M = 257  # same base as the poly content hash (stages/dedup.py)
_CDC_W = 8  # rolling-window width (chars)
_CDC_D = 16  # boundary divisor → expected chunk length ~16 chars
_U64 = 18446744073709551616  # 2^64


@register("dedup_cdc_chunks", oracle=None)  # oracle filled by _late_oracles
def dedup_cdc_chunks(sf_dir: str):
    """Content-defined chunking dedup report (Rabin-style CDC — the
    storage-dedup primitive LLM corpus pipelines borrow for
    shift-resistant sub-document dedup; Muthitacharoen et al. LBFS
    SOSP'01): a rolling {_CDC_W}-char polynomial hash cuts a chunk
    boundary wherever H % {_CDC_D} == 0, so an insertion early in a
    document only re-chunks its neighborhood (fixed-size chunking would
    shift every later chunk — compare dedup_chunks). Output: one row of
    corpus totals — chunk instances, distinct chunks, duplicate
    instances, total chars, and chars after chunk-level dedup.

    Plan: chunking is ONE stateless vectorized pass per block (zero-copy
    view of the Arrow string buffer → {_CDC_W} shifted uint64 adds for
    the rolling hash, cut mask, np.add.reduceat segment hashes — no
    per-row Python); the only exchange is a grouped Count keyed on
    (chunk_hash, len); the final fold moves one partial row per block.
    ASCII contract (same as poly_content_hashes)."""
    import ray.data
    from ray.data.aggregate import Count

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    _CH = pa.schema([("h", pa.int64()), ("len", pa.int64())])

    def chunk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return _CH.empty_table()
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        odt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
        off = np.frombuffer(texts.buffers()[1], dtype=odt)[
            texts.offset : texts.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
        flat = data[off[0] : off[-1]].astype(np.uint64)
        starts = off[:-1] - off[0]
        ends = off[1:] - off[0]
        lens = ends - starts
        total = len(flat)
        if total == 0:
            return _CH.empty_table()
        max_len = int(lens.max())
        pw = np.ones(max(max_len, _CDC_W), dtype=np.uint64)
        np.multiply.accumulate(
            np.full(len(pw) - 1, _CDC_M, dtype=np.uint64), out=pw[1:]
        )
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        doc_len = np.repeat(lens, lens)
        # rolling window hash at flat p: Σ c[p+k]·M^k (uint64 wraps mod 2^64)
        H = np.zeros(total, dtype=np.uint64)
        for k in range(min(_CDC_W, total)):
            if k:
                H[:-k] += flat[k:] * pw[k]
            else:
                H += flat * pw[0]
        valid = pos <= doc_len - _CDC_W
        cut = valid & (H % np.uint64(_CDC_D) == 0)
        # cut AFTER char p+W-1 → next chunk starts at p+W
        B = np.zeros(total, dtype=bool)
        B[starts[lens > 0]] = True
        nxt = np.flatnonzero(cut) + _CDC_W
        B[nxt[nxt < total]] = True
        cstarts = np.flatnonzero(B)
        cid = np.cumsum(B) - 1
        e = np.arange(total, dtype=np.int64) - cstarts[cid]
        contrib = flat * pw[e]
        h = np.add.reduceat(contrib, cstarts)  # uint64 wrap-exact
        clen = np.diff(np.append(cstarts, total))
        return pa.table(
            {
                "h": pa.array((h ^ np.uint64(1 << 63)).view(np.int64)),
                "len": pa.array(clen.astype(np.int64)),
            }
        )

    grouped = (
        docs.map_batches(chunk, batch_format="pyarrow")
        .groupby(["h", "len"])
        .aggregate(Count(alias_name="cnt"))
    )

    _OUT = pa.schema(
        [
            ("n_chunks", pa.int64()),
            ("n_distinct_chunks", pa.int64()),
            ("dup_chunk_instances", pa.int64()),
            ("chars_total", pa.int64()),
            ("chars_dedup", pa.int64()),
        ]
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cnt" not in t.column_names:
            return _OUT.empty_table()
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        ln = t["len"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_chunks": pa.array([int(cnt.sum())], pa.int64()),
                "n_distinct_chunks": pa.array([len(cnt)], pa.int64()),
                "dup_chunk_instances": pa.array(
                    [int(cnt.sum()) - len(cnt)], pa.int64()
                ),
                "chars_total": pa.array([int((cnt * ln).sum())], pa.int64()),
                "chars_dedup": pa.array([int(ln.sum())], pa.int64()),
            }
        )

    parts = grouped.map_batches(fold, batch_format="pyarrow").to_pandas()
    one = pa.table(
        {c: pa.array([int(parts[c].sum())], pa.int64()) for c in parts.columns}
    )
    return one


def _cdc_oracle() -> str:
    return f"""
WITH RECURSIVE docs AS MATERIALIZED (
  SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) > 0),
mx AS (SELECT max(n) AS m FROM docs),
pw AS (
  SELECT 0 AS k, CAST(1 AS UHUGEINT) AS p
  UNION ALL
  SELECT k + 1, (p * {_CDC_M}) % {_U64} FROM pw, mx WHERE k < mx.m),
pos AS MATERIALIZED (
  SELECT d.doc_id, u.i AS i,
         CAST(ascii(substr(d.text, CAST(u.i AS INTEGER), 1)) AS HUGEINT) AS c
  FROM docs d, unnest(range(1, d.n + 1)) AS u(i)),
wh AS (
  SELECT a.doc_id, a.i AS j,
         sum(b.c * CAST(pw.p AS HUGEINT)) % {_U64} AS h
  FROM pos a
  JOIN pos b ON b.doc_id = a.doc_id AND b.i BETWEEN a.i AND a.i + {_CDC_W - 1}
  JOIN pw ON pw.k = b.i - a.i
  GROUP BY 1, 2 HAVING count(*) = {_CDC_W}),
cuts AS (SELECT doc_id, j + {_CDC_W - 1} AS cutpos FROM wh WHERE h % {_CDC_D} = 0),
flag AS (
  SELECT p.doc_id, p.i, p.c,
         CASE WHEN c2.cutpos IS NOT NULL THEN 1 ELSE 0 END AS isc
  FROM pos p LEFT JOIN cuts c2 ON c2.doc_id = p.doc_id AND c2.cutpos = p.i),
chk AS (
  SELECT doc_id, i, c,
         COALESCE(sum(isc) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ci
  FROM flag),
cspan AS (SELECT doc_id, ci, min(i) AS s, count(*) AS len FROM chk GROUP BY 1, 2),
ch AS (
  SELECT k.doc_id, k.ci, k.len,
         CAST(sum(x.c * CAST(pw.p AS HUGEINT)) % {_U64}
              - 9223372036854775808 AS BIGINT) AS h
  FROM chk x
  JOIN cspan k USING (doc_id, ci)
  JOIN pw ON pw.k = x.i - k.s
  GROUP BY 1, 2, 3),
g AS (SELECT h, len, count(*) AS cnt FROM ch GROUP BY 1, 2)
SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_distinct_chunks,
       CAST(sum(cnt) - count(*) AS BIGINT) AS dup_chunk_instances,
       CAST(sum(cnt * len) AS BIGINT) AS chars_total,
       CAST(sum(len) AS BIGINT) AS chars_dedup
FROM g
""".strip()


# --- Turtle-style grouped-subject render ---------------------------------------


@register("kg_turtle_blocks", oracle=None)  # oracle filled by _late_oracles
def kg_turtle_blocks(sf_dir: str):
    """Turtle-style grouped-subject serialization of the canonical KG:
    one text block per subject, predicate-object pairs sorted and joined
    with ``;`` (W3C Turtle's predicateObjectList) — the prefixed RDF
    sink the reference's NDJSON/NT outputs (ntto.go:36-50, 132-160)
    never had, built on the same abbreviated namespaces. Deterministic
    bytes: pairs sort (pred, obj) ascending inside each block.

    Plan: ONE subj-keyed hash exchange → per-block vectorized render
    (sorted runs → ListArray over the pair strings → pc.binary_join —
    no per-subject Python string building)."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])
    grouped = hash_grouped(canon, ["subj"], sort=False)

    _OUT = pa.schema([("subj", pa.string()), ("turtle", pa.string())])

    def render(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by(
            [("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")]
        )
        pair = pc.binary_join_element_wise(d["pred"], d["obj"], " ")
        if isinstance(pair, pa.ChunkedArray):
            pair = pair.combine_chunks()
        subj = d["subj"].to_numpy(zero_copy_only=False)
        starts, _ends = runs(subj)
        offsets = np.concatenate([starts, [len(subj)]]).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pair)
        body = pc.binary_join(la, " ; ")
        head = d["subj"].take(pa.array(starts, pa.int64()))
        turtle = pc.binary_join_element_wise(
            head, body, pa.scalar("."), " "
        )
        return pa.table({"subj": head, "turtle": turtle})

    return grouped.map_batches(
        render, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- VoID dataset-statistics descriptor ----------------------------------------


@register("kg_void_stats", oracle=None)  # oracle filled by _late_oracles
def kg_void_stats(sf_dir: str):
    """W3C VoID dataset descriptor of the canonical KG: triple count,
    distinct subjects / predicates / objects, and class count (distinct
    rdf:type objects) — the one-row statistical summary a published
    dataset carries (void:triples, void:distinctSubjects, …).

    Plan: one vectorized pass tags each triple's role values →
    block-local distinct → ONE hash exchange keyed on (role, val) →
    exact per-role distinct counts as per-block partials → tiny grouped
    Sum; the triple count rides the same emit pass as a 4th-role
    per-block counter (no second scan)."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    _RV = pa.schema([("role", pa.int8()), ("val", pa.string()), ("w", pa.int64())])

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _RV.empty_table()
        parts = []
        for role, col in ((0, t["subj"]), (1, t["pred"]), (2, t["obj"])):
            u = np.unique(col.to_numpy(zero_copy_only=False))
            parts.append((np.full(len(u), role, np.int8), u))
        cls = t.filter(pc.equal(t["pred"], "rdf:type"))["obj"]
        u = np.unique(cls.to_numpy(zero_copy_only=False))
        parts.append((np.full(len(u), 3, np.int8), u))
        role = np.concatenate([p[0] for p in parts])
        val = np.concatenate([p[1] for p in parts])
        w = np.zeros(len(role), np.int64)
        out = pa.table(
            {"role": pa.array(role), "val": pa.array(val), "w": pa.array(w)}
        )
        # 5th role: block triple count (no distinct semantics — summed)
        marker = pa.table(
            {
                "role": pa.array([np.int8(4)]),
                "val": pa.array([""]),
                "w": pa.array([t.num_rows], pa.int64()),
            }
        )
        return pa.concat_tables([out, marker])

    grouped = hash_grouped(
        canon.map_batches(emit, batch_format="pyarrow"), ["role", "val"],
        reserve_cpus=False,
    )

    _P = pa.schema([("role", pa.int8()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "role" not in t.column_names:
            return _P.empty_table()
        role = t["role"].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        rows, counts = [], []
        for r in range(4):
            m = role == r
            if m.any():
                rows.append(np.int8(r))
                counts.append(len(np.unique(val[m])))
        if (role == 4).any():
            rows.append(np.int8(4))
            counts.append(int(w[role == 4].sum()))
        return pa.table(
            {"role": pa.array(rows, pa.int8()), "n": pa.array(counts, pa.int64())}
        )

    folded = (
        grouped.map_batches(
            partial, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
        )
        .groupby("role")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # 5 rows
    )
    by = {int(r): int(n) for r, n in zip(folded["role"], folded["n"])}
    return pa.table(
        {
            "n_triples": pa.array([by.get(4, 0)], pa.int64()),
            "n_subjects": pa.array([by.get(0, 0)], pa.int64()),
            "n_predicates": pa.array([by.get(1, 0)], pa.int64()),
            "n_objects": pa.array([by.get(2, 0)], pa.int64()),
            "n_classes": pa.array([by.get(3, 0)], pa.int64()),
        }
    )


# --- oracles -----------------------------------------------------------------


def _late_oracles():
    # a Ray worker unpickling one of this module's closures imports THIS
    # module alone — pull in llm_ext3 first so the kg_er_profile_jaccard
    # oracle this module builds on is registered there too
    from ntto_ray import queries_llm_ext3  # noqa: F401
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules
    from ntto_ray.registry import _ORACLES

    _ORACLES["kg_conv_sft_gate"] = _sft_oracle()
    _ORACLES["ann_kmeans_clusters"] = _km_oracle()
    _ORACLES["ann_kmeans_inertia"] = _km_inertia_oracle()

    abbrev = K.triples_abbrev_sql(pipeline_rules())
    _ORACLES["kg_growth_curve"] = f"""
WITH abbrev AS ({abbrev}),
f AS (
  SELECT subj, pred, obj,
         min(CAST(substr(conv_id, 6) AS BIGINT) * 60 + turn_idx * 5) AS sec
  FROM abbrev GROUP BY 1, 2, 3
)
SELECT CAST(sec // 3600 AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_triples
FROM f GROUP BY 1
""".strip()

    er = _ORACLES["kg_er_profile_jaccard"]
    _ORACLES["kg_entity_merge_map"] = f"""
WITH RECURSIVE er AS MATERIALIZED ({er}),
p AS (SELECT conv_a AS a, conv_b AS b FROM er WHERE jaccard_pct >= {_MERGE_PCT}),
edges AS MATERIALIZED (SELECT a, b FROM p UNION SELECT b, a FROM p),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b != r.a
)
SELECT CAST(a AS BIGINT) AS conv, CAST(least(a, min(b)) AS BIGINT) AS canonical
FROM reach GROUP BY a
""".strip()

    # round-trip identity: expanding the abbreviated canonical KG must
    # reproduce the DISTINCT raw (pre-abbreviation) triples exactly
    _ORACLES["kg_expand_roundtrip"] = f"""
SELECT DISTINCT subj, pred, obj FROM ({K.triples_raw_sql()})
""".strip()

    _ORACLES["dedup_cdc_chunks"] = _cdc_oracle()

    canon = K.triples_canonical_sql(pipeline_rules())
    _ORACLES["kg_void_stats"] = f"""
WITH canon AS MATERIALIZED ({canon})
SELECT CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT subj) AS BIGINT) AS n_subjects,
       CAST(count(DISTINCT pred) AS BIGINT) AS n_predicates,
       CAST(count(DISTINCT obj) AS BIGINT) AS n_objects,
       CAST(count(DISTINCT CASE WHEN pred = 'rdf:type' THEN obj END) AS BIGINT)
         AS n_classes
FROM canon
""".strip()
    _ORACLES["kg_turtle_blocks"] = f"""
WITH canon AS MATERIALIZED ({canon})
SELECT subj,
       subj || ' ' || string_agg(pred || ' ' || obj, ' ; ' ORDER BY pred, obj)
            || ' .' AS turtle
FROM canon GROUP BY subj
""".strip()


_late_oracles()
