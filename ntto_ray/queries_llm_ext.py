"""Round-3 extension operators: KG export/statistics surfaces and
LLM-training-data curation ops the earlier suites don't cover —
two-hop predicate-path statistics (SPARQL cardinality estimation),
per-entity serialized cards (KG→text export for LM training),
LAG-window inter-arrival gaps, incremental batch-vs-corpus dedup, and
duplicated-substring span detection (Lee et al., ACL 2022,
"Deduplicating Training Data Makes Language Models Better").

Engine surface on top of the reference's triple model
(cmd/ntto/ntto.go:36-50 — the reference has no analytics operators at
all, SURVEY §2.2); every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ntto_ray.registry import _ORACLES, register


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --- two-hop predicate-path statistics --------------------------------------


@register("kg_pred_paths", oracle=None)  # oracle filled by _late_oracles below
def kg_pred_paths(sf_dir: str):
    """Two-hop predicate-path histogram over the canonical KG: for every
    pair of predicates (p, q), the number of length-2 paths s -p-> m -q-> o
    — the path-pattern statistic SPARQL optimizers estimate join
    cardinalities from (Neumann & Weikum, VLDB 2010 RDF-3X selectivity
    model) and KG-quality monitors watch for schema drift.

    Plan: cached canonical → block-local (node, side, pred) count
    partials (side 0 = node appears as obj / incoming, side 1 = node
    appears as subj / outgoing) → ONE node-keyed hash exchange of the
    partials (never the triples) → per-node outer product of in-pred ×
    out-pred count vectors, emitted as (pred_a, pred_b, n) block partials
    — the join NEVER expands s×o pairs, so a hub with 10^6 in- and
    out-edges contributes |P_in|·|P_out| rows (predicate-vocabulary
    scale), not 10^12 — → tiny groupby Sum at P² result scale."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    _PART = pa.schema(
        [("node", pa.string()), ("side", pa.int8()), ("pred", pa.string()),
         ("cnt", pa.int64())]
    )
    _OUT = pa.schema(
        [("pred_a", pa.string()), ("pred_b", pa.string()), ("n", pa.int64())]
    )

    def side_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _PART.empty_table()
        inc = (
            t.select(["obj", "pred"])
            .group_by(["obj", "pred"])
            .aggregate([([], "count_all")])
            .select(["obj", "pred", "count_all"])
            .rename_columns(["node", "pred", "cnt"])
        )
        out = (
            t.select(["subj", "pred"])
            .group_by(["subj", "pred"])
            .aggregate([([], "count_all")])
            .select(["subj", "pred", "count_all"])
            .rename_columns(["node", "pred", "cnt"])
        )
        side = pa.concat_arrays(
            [
                pa.nulls(inc.num_rows, pa.int8()).fill_null(0),
                pa.nulls(out.num_rows, pa.int8()).fill_null(1),
            ]
        )
        both = pa.concat_tables([inc, out])
        return pa.table(
            {
                "node": both["node"],
                "side": side,
                "pred": both["pred"],
                "cnt": pc.cast(both["cnt"], pa.int64()),
            }
        )

    def path_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return _OUT.empty_table()
        # rows of one node may arrive from several upstream blocks —
        # re-sum, then sort so each node is one contiguous run split
        # into its side-0 (incoming) and side-1 (outgoing) halves.
        d = t.group_by(["node", "side", "pred"]).aggregate([("cnt", "sum")])
        d = d.sort_by(
            [("node", "ascending"), ("side", "ascending"), ("pred", "ascending")]
        )
        node = d["node"].to_numpy(zero_copy_only=False)
        sidec = d["side"].to_numpy(zero_copy_only=False)
        cnt = d["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts, ends = runs(node)
        if len(starts) == 0:
            return _OUT.empty_table()
        # per-node boundary between side 0 and side 1 rows (runs tile
        # the sorted array, so reduceat segments == node runs)
        mids = starts + np.add.reduceat((sidec == 0).astype(np.int64), starts)
        n_in = mids - starts
        n_out = ends - mids
        pairs = n_in * n_out
        total = int(pairs.sum())
        if total == 0:
            return _OUT.empty_table()
        # ragged cross product: for node i emit every (in-row, out-row)
        # index pair — vectorized with cumsum arithmetic, no Python loop.
        node_of_pair = np.repeat(np.arange(len(starts)), pairs)
        off = np.concatenate([[0], np.cumsum(pairs)[:-1]])
        local = np.arange(total) - off[node_of_pair]
        no = n_out[node_of_pair]
        a_idx = starts[node_of_pair] + local // no
        b_idx = mids[node_of_pair] + local % no
        pred = d["pred"].combine_chunks()
        part = pa.table(
            {
                "pred_a": pred.take(pa.array(a_idx, pa.int64())),
                "pred_b": pred.take(pa.array(b_idx, pa.int64())),
                "n": pa.array(cnt[a_idx] * cnt[b_idx], pa.int64()),
            }
        )
        g = part.group_by(["pred_a", "pred_b"]).aggregate([("n", "sum")])
        return g.select(["pred_a", "pred_b", "n_sum"]).rename_columns(
            ["pred_a", "pred_b", "n"]
        )

    partials = canon.map_batches(side_partial, batch_format="pyarrow")
    grouped = hash_grouped(partials, ["node"])
    paths = grouped.map_batches(
        path_partial, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    return paths.groupby(["pred_a", "pred_b"]).aggregate(
        Sum("n", alias_name="n_paths")
    )


# --- per-entity serialized cards --------------------------------------------


@register("kg_entity_cards", oracle=None)  # oracle filled by _late_oracles
def kg_entity_cards(sf_dir: str):
    """Per-entity 'card' materialization: one summary row per subject —
    triple count, distinct-predicate count, the sorted predicate set and
    the lexicographic min/max object — the KG→flat-record export used to
    serialize entities into LM training text (and the per-entity variant
    of kg_characteristic_sets' histogram).

    Plan: cached canonical → ONE subject-keyed hash exchange (whole
    subjects per block) → vectorized per-run kernel (sorted runs +
    ListArray + binary_join for the predicate set, grouped min/max/count
    for the rest; no per-subject Python loop). Result is entity-scale by
    construction — the export IS the output."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    _OUT = pa.schema(
        [
            ("subj", pa.string()),
            ("n_triples", pa.int64()),
            ("n_preds", pa.int64()),
            ("pred_set", pa.string()),
            ("min_obj", pa.string()),
            ("max_obj", pa.string()),
        ]
    )

    def card_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _OUT.empty_table()
        base = (
            t.group_by("subj")
            .aggregate([("pred", "count"), ("obj", "min"), ("obj", "max")])
            .sort_by([("subj", "ascending")])
        )
        dp = (
            t.select(["subj", "pred"])
            .group_by(["subj", "pred"])
            .aggregate([])
            .sort_by([("subj", "ascending"), ("pred", "ascending")])
        )
        subj = dp["subj"].to_numpy(zero_copy_only=False)
        starts, _ends = runs(subj)
        offsets = np.concatenate([starts, [len(subj)]]).astype(np.int32)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), dp["pred"].combine_chunks()
        )
        # base and the run table are both sorted by subj → rows align
        return pa.table(
            {
                "subj": base["subj"],
                "n_triples": pc.cast(base["pred_count"], pa.int64()),
                "n_preds": pa.array(
                    (offsets[1:] - offsets[:-1]).astype(np.int64)
                ),
                "pred_set": pc.binary_join(la, "|"),
                "min_obj": base["obj_min"],
                "max_obj": base["obj_max"],
            }
        )

    grouped = hash_grouped(canon, ["subj"])
    return grouped.map_batches(
        card_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


def _late_oracles_kg():
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules

    canon = K.triples_canonical_sql(pipeline_rules())
    _ORACLES["kg_pred_paths"] = f"""
WITH canon AS MATERIALIZED ({canon})
SELECT t1.pred AS pred_a, t2.pred AS pred_b,
       CAST(count(*) AS BIGINT) AS n_paths
FROM canon t1 JOIN canon t2 ON t1.obj = t2.subj
GROUP BY 1, 2
""".strip()
    _ORACLES["kg_entity_cards"] = f"""
WITH canon AS MATERIALIZED ({canon})
SELECT subj,
       CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT pred) AS BIGINT) AS n_preds,
       string_agg(DISTINCT pred, '|' ORDER BY pred) AS pred_set,
       min(obj) AS min_obj,
       max(obj) AS max_obj
FROM canon GROUP BY subj
""".strip()


_late_oracles_kg()


# --- LAG-window inter-arrival gaps ------------------------------------------

_LAG_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS d
  FROM events
)
SELECT user_id,
       CAST(count(d) AS BIGINT) AS n_gaps,
       CAST(min(d) AS BIGINT) AS min_gap_us,
       CAST(max(d) AS BIGINT) AS max_gap_us,
       CAST(sum(d) AS BIGINT) AS sum_gap_us
FROM g GROUP BY user_id HAVING count(d) > 0
""".strip()


@register("rel_lag_delta", oracle=_LAG_ORACLE)
def rel_lag_delta(sf_dir: str):
    """Per-user inter-arrival gaps — the LAG window function: delta of
    consecutive event timestamps per user (ties broken by event_id),
    aggregated to exact integer microsecond stats. Plan: ONE user-keyed
    hash exchange → per-block sort by (user, ts, event_id) → vectorized
    diff with run-boundary masking → reduceat min/max/sum per user."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_gaps", pa.int64()),
            ("min_gap_us", pa.int64()),
            ("max_gap_us", pa.int64()),
            ("sum_gap_us", pa.int64()),
        ]
    )

    def gap_kernel(t: pa.Table) -> pa.Table:
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
        if len(user) < 2:
            return _OUT.empty_table()
        # a gap at index j (between rows j and j+1) is valid iff both
        # rows belong to the same user; compact to the valid gaps, whose
        # user labels are still sorted → reduceat per contiguous run.
        valid = np.flatnonzero(user[1:] == user[:-1])
        if len(valid) == 0:
            return _OUT.empty_table()
        deltas = ts_us[valid + 1] - ts_us[valid]
        gap_user = user[valid]
        gs, ge = runs(gap_user)
        return pa.table(
            {
                "user_id": pa.array(gap_user[gs], pa.int64()),
                "n_gaps": pa.array((ge - gs).astype(np.int64)),
                "min_gap_us": pa.array(np.minimum.reduceat(deltas, gs)),
                "max_gap_us": pa.array(np.maximum.reduceat(deltas, gs)),
                "sum_gap_us": pa.array(np.add.reduceat(deltas, gs)),
            }
        )

    grouped = hash_grouped(ev, ["user_id"])
    return grouped.map_batches(
        gap_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- incremental batch-vs-corpus dedup ---------------------------------------

_INC_KEY_SQL = (
    "array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')"
)

_INC_ORACLE = f"""
WITH k AS (
  SELECT doc_id, {_INC_KEY_SQL} AS kk FROM documents
)
SELECT n.doc_id AS doc_id, CAST(min(e.doc_id) AS BIGINT) AS dup_of
FROM k n JOIN k e ON e.kk = n.kk AND e.doc_id % 10 < 8
WHERE n.doc_id % 10 >= 8
GROUP BY n.doc_id
""".strip()


@register("dedup_incremental", oracle=_INC_ORACLE)
def dedup_incremental(sf_dir: str):
    """Incremental dedup of a NEW document batch against an EXISTING
    corpus — the production shape where yesterday's corpus is fixed and
    only today's crawl must be checked. Membership key: the sorted
    distinct token set (bag-of-words identity — catches reordered /
    shuffled near-copies exact hashing misses). Split rule: doc_id%10
    >= 8 is the new batch.

    Plan: block-local vectorized key build (flat split → distinct
    (doc, token) pairs → sorted runs + ListArray + binary_join, the
    characteristic-sets kernel) → ONE key-keyed hash exchange of
    (key, doc_id, is_new) rows — the corpus is NEVER broadcast, both
    sides co-locate by key — → per-run min-existing-doc match. At 100 TB
    the key string would ship as a 128-bit hash; test scale keeps the
    string so the oracle is a plain SQL join."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    _KEYED = pa.schema(
        [("key", pa.string()), ("doc_id", pa.int64()), ("is_new", pa.bool_())]
    )
    _OUT = pa.schema([("doc_id", pa.int64()), ("dup_of", pa.int64())])

    def key_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return _KEYED.empty_table()
        la = pc.split_pattern(t["text"], " ").combine_chunks()
        offs = la.offsets.to_numpy().astype(np.int64)
        doc_idx = np.repeat(np.arange(len(la)), np.diff(offs))
        pairs = (
            pa.table({"i": doc_idx, "tok": la.flatten()})
            .group_by(["i", "tok"])
            .aggregate([])
            .sort_by([("i", "ascending"), ("tok", "ascending")])
        )
        i = pairs["i"].to_numpy()
        starts, _ends = runs(i)
        offsets = np.concatenate([starts, [len(i)]]).astype(np.int32)
        keys = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pairs["tok"].combine_chunks()
            ),
            " ",
        )
        doc = t["doc_id"].to_numpy(zero_copy_only=False)[i[starts]]
        return pa.table(
            {
                "key": keys,
                "doc_id": pa.array(doc, pa.int64()),
                "is_new": pa.array(doc % 10 >= 8),
            }
        )

    def match_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by([("key", "ascending"), ("doc_id", "ascending")])
        key = d["key"].to_numpy(zero_copy_only=False)
        doc = d["doc_id"].to_numpy(zero_copy_only=False)
        new = d["is_new"].to_numpy(zero_copy_only=False)
        starts, ends = runs(key)
        sentinel = np.iinfo(np.int64).max
        min_exist = np.minimum.reduceat(np.where(new, sentinel, doc), starts)
        dup_of = min_exist[np.repeat(np.arange(len(starts)), ends - starts)]
        mask = new & (dup_of != sentinel)
        return pa.table(
            {
                "doc_id": pa.array(doc[mask], pa.int64()),
                "dup_of": pa.array(dup_of[mask], pa.int64()),
            }
        )

    keyed = docs.map_batches(key_partial, batch_format="pyarrow")
    grouped = hash_grouped(keyed, ["key"])
    return grouped.map_batches(
        match_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- duplicated-substring span detection -------------------------------------

_SPAN_N = 8  # tokens per gram — spans shorter than this are not flagged


def _gram_hashes(text_col, n: int, cache: dict):
    """Rolling n-token gram hashes over a text column: md5[:8]-LE token
    hashes (computed once per unique token, ``cache`` is actor-lifetime
    state) → mul-xor fold → splitmix64 finalizer → top-63-bit int64 keys.
    Returns (g, row_index, pos_in_row) numpy arrays; grams never cross
    row boundaries. Identical chain to the MinHash shingle hashes
    (stages/dedup.py:587), mirrored in SQL by _span_oracle."""
    import hashlib

    from ntto_ray.stages.dedup import _SHINGLE_PRIME, _U, _mix64

    la = pc.split_pattern(text_col, " ").combine_chunks()
    offs = la.offsets.to_numpy().astype(np.int64)
    flat = la.flatten().to_numpy(zero_copy_only=False)
    T = len(flat)
    empty = np.empty(0, np.int64)
    if T < n:
        return empty, empty, empty
    uniq, inv = np.unique(flat, return_inverse=True)
    uh = np.empty(len(uniq), dtype=_U)
    for i, tk in enumerate(uniq):
        h = cache.get(tk)
        if h is None:
            h = int.from_bytes(hashlib.md5(tk.encode()).digest()[:8], "little")
            cache[tk] = h
        uh[i] = h
    h = uh[inv]
    s = h[: T - n + 1].copy()
    for j in range(1, n):
        s = s * _SHINGLE_PRIME ^ h[j : T - n + 1 + j]
    doc_of = np.repeat(np.arange(len(la)), np.diff(offs))
    vs = np.flatnonzero(doc_of[: T - n + 1] == doc_of[n - 1 :])
    if len(vs) == 0:
        return empty, empty, empty
    g = (_mix64(s[vs]) >> _U(1)).astype(np.int64)
    d_idx = doc_of[vs]
    return g, d_idx, vs - offs[d_idx]


def _gram_cte(n: int) -> str:
    """SQL CTE chain ``tok → vh → th → hl → raws → gh`` mirroring
    :func:`_gram_hashes` for n-token grams: md5[:8]-LE token hashes →
    rolling mul-xor fold (the MinHash shingle chain,
    stages/dedup.py:587) → splitmix64 finalizer → 63-bit BIGINT gram
    keys ``gh(doc_id, pos, g)``. Returned WITHOUT the leading WITH so
    callers append their own aggregation CTEs."""
    from ntto_ray.stages.dedup import _SHINGLE_PRIME

    M = f"CAST({(1 << 64) - 1} AS UHUGEINT)"
    P = int(_SHINGLE_PRIME)
    C1 = 0xBF58476D1CE4E5B9
    C2 = 0x94D049BB133111EB

    def mul(e: str, c) -> str:
        return f"CAST((CAST(({e}) AS UHUGEINT) * {c}) & {M} AS UBIGINT)"

    step = f"xor({mul('x', P)}, y)"

    def mix64(e: str) -> str:
        t0 = f"xor({e}, ({e}) >> 30)"
        t1 = mul(t0, C1)
        t2 = f"xor({t1}, ({t1}) >> 27)"
        t3 = mul(t2, C2)
        return f"xor(({t3}), ({t3}) >> 31)"

    hexp = "'0123456789abcdef'"
    md5u64 = "CAST(" + " + ".join(
        f"CAST(((strpos({hexp}, substr(mh, {2 * j + 1}, 1)) - 1) * 16"
        f" + (strpos({hexp}, substr(mh, {2 * j + 2}, 1)) - 1)) AS HUGEINT)"
        f" * {256 ** j}" for j in range(8)
    ) + " AS UBIGINT)"

    return f"""tok AS (
  SELECT doc_id, unnest(l) AS tok, unnest(generate_series(1, len(l))) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
),
vh AS MATERIALIZED (
  SELECT tok, {md5u64} AS h
  FROM (SELECT tok, md5(tok) AS mh FROM (SELECT DISTINCT tok FROM tok))
),
th AS (SELECT doc_id, pos, v.h FROM tok JOIN vh v USING (tok)),
hl AS (SELECT doc_id, list(h ORDER BY pos) AS hl FROM th GROUP BY doc_id),
raws AS (
  SELECT doc_id,
    unnest(CASE WHEN len(hl) >= {n} THEN
      [list_reduce(hl[i:i+{n - 1}], (x, y) -> {step})
       for i in generate_series(1, len(hl) - {n - 1})]
      ELSE CAST([] AS UBIGINT[]) END) AS r,
    unnest(CASE WHEN len(hl) >= {n} THEN
      [CAST(i - 1 AS BIGINT) for i in generate_series(1, len(hl) - {n - 1})]
      ELSE CAST([] AS BIGINT[]) END) AS pos
  FROM hl
),
gh AS (SELECT doc_id, pos, CAST({mix64('r')} >> 1 AS BIGINT) AS g FROM raws)"""


def _span_oracle() -> str:
    """Bit-exact DuckDB mirror of dedup_substring_spans: the n-gram
    hash chain of :func:`_gram_cte` → grams in ≥2 distinct docs →
    per-doc gaps-and-islands span merge."""
    N = _SPAN_N
    return f"""
WITH {_gram_cte(N)},
dup AS (SELECT g FROM gh GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
hit AS (SELECT doc_id, pos FROM gh JOIN dup USING (g)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {N} THEN 0 ELSE 1 END AS brk
  FROM hit
),
grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl_id
  FROM isl
)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_pos,
       CAST(max(pos) + {N - 1} AS BIGINT) AS end_pos
FROM grp GROUP BY doc_id, isl_id
""".strip()


@register("dedup_substring_spans", oracle=_span_oracle())
def dedup_substring_spans(sf_dir: str):
    """Duplicated-substring span detection (Lee et al., ACL 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    every maximal token span of length ≥ {_SPAN_N} that occurs in ≥ 2
    distinct documents — the spans that paper CUTS from LM training
    text. The distributed shape is a positional n-gram inverted index
    (the suffix array of the single-node original doesn't shard), the
    standard web-scale substitute:

      1. per-block vectorized gram emit — md5 token hashes (unique-token
         cache in actor state, MinHash convention) → 8-token rolling
         mul-xor fold + splitmix64 finalizer → (gram_hash, doc, pos);
         the 64-bit hash ships instead of the 8-token string (~8× byte
         amplification avoided; the oracle mirrors the hash chain
         bit-for-bit, so collisions — if any — match too);
      2. ONE gram-keyed hash exchange → runs with ≥ 2 distinct docs emit
         their (doc, pos) rows;
      3. ONE doc-keyed exchange (reserve_cpus=False — chained-exchange
         deadlock, stages/exchange.py) → per-doc sorted gaps-and-islands
         merge: positions ≤ {_SPAN_N} apart fuse into one maximal span.
    """
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    N = _SPAN_N
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    _GRAMS = pa.schema(
        [("g", pa.int64()), ("doc_id", pa.int64()), ("pos", pa.int64())]
    )
    _HITS = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])
    _OUT = pa.schema(
        [("doc_id", pa.int64()), ("start_pos", pa.int64()),
         ("end_pos", pa.int64())]
    )

    class GramEmitter:
        def __init__(self):
            self._cache: dict[str, int] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "text" not in t.column_names:
                return _GRAMS.empty_table()
            g, d_idx, pos = _gram_hashes(t["text"], N, self._cache)
            if len(g) == 0:
                return _GRAMS.empty_table()
            doc = t["doc_id"].to_numpy(zero_copy_only=False)[d_idx]
            return pa.table(
                {
                    "g": pa.array(g),
                    "doc_id": pa.array(doc, pa.int64()),
                    "pos": pa.array(pos, pa.int64()),
                }
            )

    def dup_hits(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "g" not in t.column_names:
            return _HITS.empty_table()
        d = t.sort_by([("g", "ascending"), ("doc_id", "ascending")])
        g = d["g"].to_numpy(zero_copy_only=False)
        doc = d["doc_id"].to_numpy(zero_copy_only=False)
        starts, ends = runs(g)
        first = np.ones(len(g), dtype=np.int64)
        first[1:] = (doc[1:] != doc[:-1]) | (g[1:] != g[:-1])
        n_docs = np.add.reduceat(first, starts)
        row_mask = (n_docs >= 2)[np.repeat(np.arange(len(starts)), ends - starts)]
        return pa.table(
            {
                "doc_id": pa.array(doc[row_mask], pa.int64()),
                "pos": d["pos"].combine_chunks().filter(
                    pa.array(row_mask)
                ),
            }
        )

    def merge_spans(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by([("doc_id", "ascending"), ("pos", "ascending")])
        doc = d["doc_id"].to_numpy(zero_copy_only=False)
        pos = d["pos"].to_numpy(zero_copy_only=False)
        brk = np.ones(len(doc), dtype=bool)
        brk[1:] = (doc[1:] != doc[:-1]) | (pos[1:] - pos[:-1] > N)
        isl = np.flatnonzero(brk)
        isl_end = np.concatenate([isl[1:], [len(doc)]])
        return pa.table(
            {
                "doc_id": pa.array(doc[isl], pa.int64()),
                "start_pos": pa.array(pos[isl], pa.int64()),
                "end_pos": pa.array(pos[isl_end - 1] + N - 1, pa.int64()),
            }
        )

    grams = docs.map_batches(
        GramEmitter, batch_format="pyarrow", concurrency=(1, 4)
    )
    hits = hash_grouped(grams, ["g"]).map_batches(
        dup_hits, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    spans = hash_grouped(hits, ["doc_id"], reserve_cpus=False).map_batches(
        merge_spans, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    return spans


# --- ANN recall evaluation ----------------------------------------------------


def _recall_oracle() -> str:
    # registers the two source oracles — REQUIRED when this module is
    # imported standalone (e.g. cloudpickle re-import on a Ray worker)
    # rather than via registry._load's ordered walk
    from ntto_ray import queries_text  # noqa: F401

    ex = _ORACLES["ann_bruteforce_topk"].strip()
    ap = _ORACLES["ann_lsh_topk"].strip()
    return f"""
WITH ex AS MATERIALIZED ({ex}),
ap AS MATERIALIZED ({ap}),
hits AS (
  SELECT ex.qid, count(*) AS n
  FROM ex JOIN ap ON ap.qid = ex.qid AND ap.vec_id = ex.vec_id
  GROUP BY ex.qid
)
SELECT q.qid, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n, 0) * 10 AS BIGINT) AS recall_pct
FROM (SELECT DISTINCT qid FROM ex) q LEFT JOIN hits h USING (qid)
""".strip()


@register("ann_recall_eval", oracle=_recall_oracle())
def ann_recall_eval(sf_dir: str):
    """Retrieval-quality evaluation: recall@10 of the hyperplane-LSH
    index against exact brute-force cosine top-10, per query — the
    metric every ANN deployment tunes nbits/nprobe against. Runs both
    engine paths (broadcast queries, batch-local top-k) and intersects
    the two result-scale top-k sets driver-side (n_queries × k rows —
    bounded by construction, not data-scale)."""
    import pandas as pd

    from ntto_ray.queries_text import _emb, _query_matrix
    from ntto_ray.stages.ann import brute_force_topk, lsh_topk

    ids, m = _query_matrix(sf_dir)
    exact = brute_force_topk(_emb(sf_dir), ids, m, k=10).to_pandas()
    approx = lsh_topk(_emb(sf_dir), ids, m, k=10, dim=m.shape[1]).to_pandas()
    inter = exact.merge(approx, on=["qid", "vec_id"])
    n = inter.groupby("qid").size()
    qids = sorted(exact["qid"].unique())
    n_hits = pd.Series(n, index=qids).fillna(0).astype("int64")
    return pd.DataFrame(
        {
            "qid": qids,
            "n_hits": n_hits.to_numpy(),
            "recall_pct": (n_hits * 10).to_numpy(),
        }
    )


# --- cross-source contamination matrix ---------------------------------------


def _contam_oracle() -> str:
    """Same gram-hash chain as _span_oracle, aggregated to the
    source-pair level: distinct shared 8-gram hashes per source pair."""
    body = _span_oracle()
    # reuse everything up to and including the gh CTE (ends "...),"),
    # then re-aggregate at the source-pair level instead of dup/hit/span
    head, _, _ = body.partition("\ndup AS")
    return f"""{head}
gs AS (
  SELECT DISTINCT d.source, g.g
  FROM gh g JOIN documents d USING (doc_id)
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS shared_grams
FROM gs a JOIN gs b ON a.g = b.g AND a.source < b.source
GROUP BY 1, 2
""".strip()


@register("text_contamination_matrix", oracle=_contam_oracle())
def text_contamination_matrix(sf_dir: str):
    """Cross-source contamination matrix: for every pair of corpus
    sources, the number of DISTINCT 8-token grams occurring in both —
    the report a curation team reads before mixing crawls (which feeds
    overlap which benchmark?). Plan: block-local distinct (gram-hash,
    source) pairs (the gram never ships as a string) → ONE gram-keyed
    exchange → per-run sorted-distinct sources expand to C(s,2) pair
    partials (bounded by the SOURCE vocabulary, not doc count) →
    source²-scale Sum."""
    from ray.data.aggregate import Sum

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    _GS = pa.schema([("g", pa.int64()), ("source", pa.string())])
    _PAIRS = pa.schema(
        [("source_a", pa.string()), ("source_b", pa.string()),
         ("n", pa.int64())]
    )

    class GramSources:
        def __init__(self):
            self._cache: dict[str, int] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "text" not in t.column_names:
                return _GS.empty_table()
            g, d_idx, _pos = _gram_hashes(t["text"], _SPAN_N, self._cache)
            if len(g) == 0:
                return _GS.empty_table()
            src = t["source"].combine_chunks().take(pa.array(d_idx, pa.int64()))
            return (
                pa.table({"g": pa.array(g), "source": src})
                .group_by(["g", "source"])
                .aggregate([])
            )

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "g" not in t.column_names:
            return _PAIRS.empty_table()
        # rows of one gram may arrive from several blocks — re-distinct,
        # then expand each gram's sorted source set into ordered pairs.
        d = (
            t.group_by(["g", "source"])
            .aggregate([])
            .sort_by([("g", "ascending"), ("source", "ascending")])
        )
        g = d["g"].to_numpy(zero_copy_only=False)
        starts, ends = runs(g)
        cnt = ends - starts
        pairs = cnt * (cnt - 1) // 2
        total = int(pairs.sum())
        if total == 0:
            return _PAIRS.empty_table()
        run_of = np.repeat(np.arange(len(starts)), pairs)
        off = np.concatenate([[0], np.cumsum(pairs)[:-1]])
        local = np.arange(total) - off[run_of]
        # triangular index: local -> (i, j) with i < j in the run
        c = cnt[run_of].astype(np.float64)
        i = np.floor(
            c - 0.5 - np.sqrt((c - 0.5) ** 2 - 2.0 * local - 1e-9)
        ).astype(np.int64)
        j = (local - (i * (2 * cnt[run_of] - i - 1)) // 2 + i + 1).astype(
            np.int64
        )
        src = d["source"].combine_chunks()
        part = pa.table(
            {
                "source_a": src.take(pa.array(starts[run_of] + i)),
                "source_b": src.take(pa.array(starts[run_of] + j)),
                "n": pa.array(np.ones(total, np.int64)),
            }
        )
        gp = part.group_by(["source_a", "source_b"]).aggregate([("n", "sum")])
        return gp.select(["source_a", "source_b", "n_sum"]).rename_columns(
            ["source_a", "source_b", "n"]
        )

    gs = docs.map_batches(GramSources, batch_format="pyarrow", concurrency=(1, 4))
    grouped = hash_grouped(gs, ["g"])
    partials = grouped.map_batches(
        pair_partial, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    return partials.groupby(["source_a", "source_b"]).aggregate(
        Sum("n", alias_name="shared_grams")
    )


# --- training-shard packing plan (distributed prefix sum) --------------------

_SHARD_TOKENS = 4096


_SHARD_ORACLE = f"""
WITH n AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM n
)
SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
       CAST((cum - n_tokens) // {_SHARD_TOKENS} AS BIGINT) AS shard_id
FROM c
""".strip()


@register("corpus_shard_plan", oracle=_SHARD_ORACLE)
def corpus_shard_plan(sf_dir: str, *, bucket_docs: int = 4096):
    """Training-shard packing plan: assign every document (in doc_id
    order) to a contiguous ~{_SHARD_TOKENS}-token shard — the layout
    step before writing packed LM training sequences. The primitive is
    a DISTRIBUTED PREFIX SUM (scan), which Ray Data has no operator
    for: pass 1 computes per-bucket token totals (one tiny grouped Sum
    at bucket scale), the driver prefix-sums the bucket totals (bucket
    count = ceil(n_docs / _SHARD_BUCKET) — bounded driver state,
    same budget as SUBJ_BUCKETS) and broadcasts the offsets; pass 2 is
    ONE bucket-keyed exchange + per-bucket sorted cumsum + offset."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    _SHARD_BUCKET = bucket_docs  # docs per scan bucket

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    _TOK = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("bucket", pa.int64())]
    )
    _OUT = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("cum_tokens", pa.int64()), ("shard_id", pa.int64())]
    )

    def tok_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return _TOK.empty_table()
        la = pc.split_pattern(t["text"], " ").combine_chunks()
        n = np.diff(la.offsets.to_numpy().astype(np.int64))
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "n_tokens": pa.array(n),
                "bucket": pa.array(doc // _SHARD_BUCKET, pa.int64()),
            }
        )

    toks = docs.map_batches(tok_counts, batch_format="pyarrow").materialize()

    # pass 1: bucket totals → driver prefix sum (bucket-scale state)
    from ray.data.aggregate import Sum

    btot = (
        toks.groupby("bucket")
        .aggregate(Sum("n_tokens", alias_name="tot"))
        .to_pandas()
        .sort_values("bucket")
    )
    buckets = btot["bucket"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(btot["tot"].to_numpy())[:-1]])
    off_ref = ray.put(
        {int(b): int(o) for b, o in zip(buckets, offsets)}
    )

    def scan_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return _OUT.empty_table()
        offs = ray.get(off_ref)
        d = t.sort_by([("bucket", "ascending"), ("doc_id", "ascending")])
        bkt = d["bucket"].to_numpy(zero_copy_only=False)
        n = d["n_tokens"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(n)
        # restart the cumsum at each bucket boundary (subtract the
        # running total just before the run), add the bucket's global
        # offset from pass 1
        from ntto_ray.stages.exchange import runs as _runs

        starts, ends = _runs(bkt)
        run_of = np.repeat(np.arange(len(starts)), ends - starts)
        prev = np.where(starts > 0, cum[starts - 1], 0)
        local = cum - prev[run_of]
        goff = np.array([offs[int(b)] for b in bkt[starts]], np.int64)[run_of]
        cumg = local + goff
        return pa.table(
            {
                "doc_id": d["doc_id"],
                "n_tokens": d["n_tokens"],
                "cum_tokens": pa.array(cumg, pa.int64()),
                "shard_id": pa.array((cumg - n) // _SHARD_TOKENS, pa.int64()),
            }
        )

    grouped = hash_grouped(toks, ["bucket"], reserve_cpus=False)
    return grouped.map_batches(
        scan_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- NTILE window function ----------------------------------------------------

_NTILE_K = 4

_NTILE_ORACLE = f"""
SELECT c_custkey,
       CAST(c_nationkey AS BIGINT) AS nation,
       CAST(ntile({_NTILE_K}) OVER (
         PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
       ) AS BIGINT) AS quartile
FROM customer
""".strip()


@register("rel_ntile", oracle=_NTILE_ORACLE)
def rel_ntile(sf_dir: str):
    """NTILE({_NTILE_K}) window function: account-balance quartiles of
    customers within each nation. ONE nation-keyed exchange → per-group
    sort → vectorized NTILE bucket formula (first n%k buckets take the
    extra row, exactly DuckDB's semantics). Per-group state is the
    group's rank vector; a group too large for one block would use the
    corpus_shard_plan two-pass rank (bucket counts → offset broadcast)
    — documented trade-off, nations are bounded here."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    )

    _OUT = pa.schema(
        [("c_custkey", pa.int64()), ("nation", pa.int64()),
         ("quartile", pa.int64())]
    )

    def ntile_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_custkey" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by(
            [
                ("c_nationkey", "ascending"),
                ("c_acctbal", "ascending"),
                ("c_custkey", "ascending"),
            ]
        )
        nat = d["c_nationkey"].to_numpy(zero_copy_only=False)
        starts, ends = runs(nat)
        n = ends - starts
        r = np.arange(len(nat)) - starts[
            np.repeat(np.arange(len(starts)), n)
        ]  # rank within group
        nn = n[np.repeat(np.arange(len(starts)), n)]
        size, rem = nn // _NTILE_K, nn % _NTILE_K
        big = rem * (size + 1)
        q = np.where(
            r < big, r // np.maximum(size + 1, 1),
            rem + (r - big) // np.maximum(size, 1),
        )
        return pa.table(
            {
                "c_custkey": pc.cast(d["c_custkey"], pa.int64()),
                "nation": pa.array(nat.astype(np.int64)),
                "quartile": pa.array((q + 1).astype(np.int64)),
            }
        )

    grouped = hash_grouped(cust, ["c_nationkey"])
    return grouped.map_batches(
        ntile_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- windowed streaming event dedup -------------------------------------------

_EVDD_WINDOW_US = 300_000_000  # 5 minutes

_EVDD_ORACLE = f"""
WITH g AS (
  SELECT event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS d
  FROM events
)
SELECT event_id FROM g WHERE d IS NULL OR d > {_EVDD_WINDOW_US}
""".strip()


@register("rel_event_dedup_window", oracle=_EVDD_ORACLE)
def rel_event_dedup_window(sf_dir: str):
    """Windowed event dedup — the streaming-ingest dedup shape: drop an
    event when the SAME (user, event_type) fired within the previous
    5 minutes (lag-window variant: gap measured to the previous event,
    kept or not). ONE (user, type)-keyed exchange → per-block sort →
    vectorized gap mask. Output is the kept event ids."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    _OUT = pa.schema([("event_id", pa.int64())])

    def dedup_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by(
            [
                ("user_id", "ascending"),
                ("event_type", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        user = d["user_id"].to_numpy(zero_copy_only=False)
        typ = d["event_type"].to_numpy(zero_copy_only=False)
        ts_us = pc.cast(d["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = np.ones(len(user), dtype=bool)
        if len(user) > 1:
            same = (user[1:] == user[:-1]) & (typ[1:] == typ[:-1])
            keep[1:] = ~same | (ts_us[1:] - ts_us[:-1] > _EVDD_WINDOW_US)
        return pa.table(
            {
                "event_id": pc.cast(d["event_id"], pa.int64()).filter(
                    pa.array(keep)
                )
            }
        )

    grouped = hash_grouped(ev, ["user_id", "event_type"])
    return grouped.map_batches(
        dedup_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- star join over part / supplier / nation / region ------------------------

_PRR_ORACLE = """
SELECT r.r_name AS region, p.p_brand AS brand,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_c4
FROM lineitem
JOIN part p     ON l_partkey = p.p_partkey
JOIN supplier s ON l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""".strip()


@register("rel_part_region_revenue", oracle=_PRR_ORACLE)
def rel_part_region_revenue(sf_dir: str):
    """TPC-H Q9-flavored star join: revenue per (supplier region, part
    brand) through lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ region. Scale
    shape: lineitem is pre-aggregated map-side to distinct (partkey,
    suppkey) partials BEFORE the first shuffle; part and supplier — the
    two SF-scaling dims — join as hash exchanges (never broadcast, the
    round-2 verdict's dim-broadcast lesson); only the CONSTANT-size
    nation (25) and region (5) tables fold in map-side; the second join
    input is already (brand × suppkey)-scale."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ntto_ray.stages.exchange import conform, join_parallelism

    def cents(arr) -> pa.Array:
        return pc.cast(
            pc.round(pc.multiply(arr, pa.scalar(100.0))), pa.int64()
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, type=pa.int64()), cents(t["l_discount"])),
        )
        g = (
            pa.table(
                {
                    "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                    "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                    "rev_c4": rev,
                }
            )
            .group_by(["l_partkey", "l_suppkey"])
            .aggregate([("rev_c4", "sum")])
        )
        return g.select(["l_partkey", "l_suppkey", "rev_c4_sum"]).rename_columns(
            ["l_partkey", "l_suppkey", "rev_c4"]
        )

    part = (
        _read(sf_dir, "part", ["p_partkey", "p_brand"])
        .map_batches(
            lambda t: pa.table(
                {
                    "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                    "p_brand": t["p_brand"],
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    li_agg = li.map_batches(li_partial, batch_format="pyarrow").materialize()
    j1 = li_agg.join(
        part,
        "inner",
        num_partitions=join_parallelism(li_agg, part),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )
    j1_schema = pa.schema(
        [("l_suppkey", pa.int64()), ("p_brand", pa.string()),
         ("rev_c4", pa.int64())]
    )

    def brand_partial(t: pa.Table) -> pa.Table:
        t = conform(t, j1_schema)
        if t.num_rows == 0:
            return j1_schema.empty_table()
        g = t.group_by(["l_suppkey", "p_brand"]).aggregate([("rev_c4", "sum")])
        return g.select(["l_suppkey", "p_brand", "rev_c4_sum"]).rename_columns(
            ["l_suppkey", "p_brand", "rev_c4"]
        )

    j1 = j1.map_batches(brand_partial, batch_format="pyarrow").materialize()

    # constant-size dims fold into the supplier scan map-side
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    nk = nat["n_nationkey"].cast(pa.int64())
    nreg = nat["n_regionkey"].cast(pa.int64())
    rk = reg["r_regionkey"].cast(pa.int64())
    rname = reg["r_name"]

    def supp_region(t: pa.Table) -> pa.Table:
        snat = pc.cast(t["s_nationkey"], pa.int64())
        r_of_n = pc.take(nreg, pc.index_in(snat, nk))
        return pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "region": pc.take(rname, pc.index_in(r_of_n, rk)),
            }
        )

    supp = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .map_batches(supp_region, batch_format="pyarrow")
        .materialize()
    )
    j2 = j1.join(
        supp,
        "inner",
        num_partitions=join_parallelism(j1, supp),
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )
    j2_schema = pa.schema(
        [("region", pa.string()), ("p_brand", pa.string()),
         ("rev_c4", pa.int64())]
    )
    return (
        j2.map_batches(
            lambda t: conform(
                t.select(["region", "p_brand", "rev_c4"])
                if t.num_rows
                else t,
                j2_schema,
            ),
            batch_format="pyarrow",
        )
        .groupby(["region", "p_brand"])
        .aggregate(Sum("rev_c4", alias_name="revenue_c4"))
        .map_batches(
            lambda t: t.select(
                ["region", "p_brand", "revenue_c4"]
            ).rename_columns(["region", "brand", "revenue_c4"]),
            batch_format="pyarrow",
        )
    )


# --- AMS F2 (second frequency moment) sketch ----------------------------------

_AMS_SEEDS = (0x1B873593, 0xCC9E2D51, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F)


def _ams_oracle() -> str:
    from ntto_ray.stages.sketch import splitmix64_sql

    scans = "\n  UNION ALL ".join(
        f"SELECT {r} AS r, CASE WHEN ("
        + splitmix64_sql(f"xor(CAST(user_id AS UBIGINT), CAST({seed} AS UBIGINT))")
        + ") & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM events"
        for r, seed in enumerate(_AMS_SEEDS)
    )
    return f"""
WITH s AS (
  SELECT r, CAST(sum(sgn) AS BIGINT) AS s FROM (
  {scans}
  ) GROUP BY r
)
SELECT r, s, CAST(s * s AS BIGINT) AS f2_est FROM s
""".strip()


@register("sketch_ams_f2", oracle=_ams_oracle())
def sketch_ams_f2(sf_dir: str):
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy,
    STOC'96): d = {len} ±1-hash estimators of F2 = Σ f_k² over event
    user_ids — the self-join-size / skew estimator every shuffle planner
    wants before picking a partitioning. Per-block partials are d
    integers (sign-sum per estimator row), ONE d-row grouped Sum merges
    them; the ±1 hash is the low bit of XOR-seeded splitmix64, mirrored
    bit-for-bit in UHUGEINT SQL — the estimator is deterministic and
    has an EXACT oracle. Output is the d (row, sign-sum, estimate)
    rows; median-of-rows is the textbook F2 read."""
    from ray.data.aggregate import Sum

    from ntto_ray.stages.sketch import splitmix64

    ev = _read(sf_dir, "events", ["user_id"])

    _P = pa.schema([("r", pa.int64()), ("s", pa.int64())])

    def ams_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _P.empty_table()
        keys = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rows, sums = [], []
        for r, seed in enumerate(_AMS_SEEDS):
            h = splitmix64(keys ^ np.uint64(seed))
            sgn = np.where(h & np.uint64(1) == 1, 1, -1)
            rows.append(r)
            sums.append(int(sgn.sum()))
        return pa.table(
            {"r": pa.array(rows, pa.int64()), "s": pa.array(sums, pa.int64())}
        )

    merged = (
        ev.map_batches(ams_partial, batch_format="pyarrow")
        .groupby("r")
        .aggregate(Sum("s", alias_name="s"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("r", pa.int64()), ("s", pa.int64()), ("f2_est", pa.int64())]
            ).empty_table()
        s = t["s"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "r": pc.cast(t["r"], pa.int64()),
                "s": pc.cast(t["s"], pa.int64()),
                "f2_est": pa.array(s * s, pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# --- first/last-touch attribution ----------------------------------------------

_FT_ORACLE = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn_first,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM events
)
SELECT f.user_id,
       f.event_type AS first_type,
       l.event_type AS last_type,
       CAST(n.n AS BIGINT) AS n_events
FROM (SELECT user_id, event_type FROM o WHERE rn_first = 1) f
JOIN (SELECT user_id, event_type FROM o WHERE rn_last = 1) l USING (user_id)
JOIN (SELECT user_id, count(*) AS n FROM events GROUP BY user_id) n
  USING (user_id)
""".strip()


@register("rel_first_touch", oracle=_FT_ORACLE)
def rel_first_touch(sf_dir: str):
    """First/last-touch attribution — the FIRST_VALUE / LAST_VALUE
    window pair: each user's first and last event type (by ts,
    event_id) plus their event count. ONE user-keyed exchange →
    per-block sort → run starts/ends ARE the answer (no per-user
    loop)."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("first_type", pa.string()),
            ("last_type", pa.string()),
            ("n_events", pa.int64()),
        ]
    )

    def touch_kernel(t: pa.Table) -> pa.Table:
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
        starts, ends = runs(user)
        typ = d["event_type"].combine_chunks()
        return pa.table(
            {
                "user_id": pa.array(user[starts], pa.int64()),
                "first_type": typ.take(pa.array(starts, pa.int64())),
                "last_type": typ.take(pa.array(ends - 1, pa.int64())),
                "n_events": pa.array((ends - starts).astype(np.int64)),
            }
        )

    grouped = hash_grouped(ev, ["user_id"])
    return grouped.map_batches(
        touch_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- degree moments / assortativity sums --------------------------------------


def _degmom_oracle() -> str:
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules

    canon = K.triples_canonical_sql(pipeline_rules())
    return f"""
WITH canon AS MATERIALIZED ({canon}),
und AS MATERIALIZED (
  SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
  FROM canon WHERE subj <> obj
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
)
SELECT CAST((SELECT count(*) FROM und) AS BIGINT) AS m,
       CAST((SELECT sum(d) FROM deg) AS BIGINT) AS sum_d,
       CAST((SELECT sum(d * d) FROM deg) AS BIGINT) AS sum_d2,
       CAST((SELECT sum(d * d * d) FROM deg) AS BIGINT) AS sum_d3,
       CAST((SELECT sum(da.d * db.d)
             FROM und u JOIN deg da ON da.node = u.a
                        JOIN deg db ON db.node = u.b) AS BIGINT) AS sum_dadb
""".strip()


@register("kg_degree_moments", oracle=_degmom_oracle())
def kg_degree_moments(sf_dir: str):
    """Degree moments of the canonical KG's undirected simple
    projection: m, Σd, Σd², Σd³ and Σ(d_a·d_b) over edges — the exact
    integer numerators of degree assortativity (Newman 2002) and the
    friendship paradox; a KG-health dashboard computes the float
    coefficient from these five numbers. Plan: ONE endpoint-keyed
    exchange dedups edges and yields degrees (node-scale moments are
    grouped-Sum partials); Σ(d_a·d_b) attaches each endpoint's degree
    to its edge stubs on the SAME exchange layout, then ONE edge-keyed
    exchange pairs the two stub degrees — no degree table is ever
    broadcast, no node-scale driver state."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "obj"])

    _E = pa.schema([("a", pa.string()), ("b", pa.string())])
    _STUB = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("side", pa.int8()),
         ("d", pa.int64())]
    )

    def und_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _E.empty_table()
        s = t["subj"].to_numpy(zero_copy_only=False)
        o = t["obj"].to_numpy(zero_copy_only=False)
        keep = s != o
        s, o = s[keep], o[keep]
        a = np.minimum(s, o)
        b = np.maximum(s, o)
        return (
            pa.table({"a": pa.array(a), "b": pa.array(b)})
            .group_by(["a", "b"])
            .aggregate([])
        )

    # ONE exchange on the lower endpoint co-locates every copy of an
    # edge -> per-block distinct IS the global edge dedup
    edges = hash_grouped(
        canon.map_batches(und_prep, batch_format="pyarrow"), ["a"]
    ).map_batches(
        lambda t: t.group_by(["a", "b"]).aggregate([])
        if t.num_rows
        else _E.empty_table(),
        batch_size=None,
        batch_format="pyarrow",
        **NO_FUSE_ARGS,
    ).materialize()

    def stub_emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.schema(
                [("node", pa.string()), ("a", pa.string()),
                 ("b", pa.string()), ("side", pa.int8())]
            ).empty_table()
        n = t.num_rows
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "a": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["a"].combine_chunks()]
                ),
                "b": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int8), np.ones(n, np.int8)]
                    )
                ),
            }
        )

    def attach_deg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return _STUB.empty_table()
        d = t.sort_by([("node", "ascending")])
        node = d["node"].to_numpy(zero_copy_only=False)
        starts, ends = runs(node)
        deg = (ends - starts).astype(np.int64)
        return pa.table(
            {
                "a": d["a"],
                "b": d["b"],
                "side": d["side"],
                "d": pa.array(
                    deg[np.repeat(np.arange(len(starts)), ends - starts)]
                ),
            }
        )

    # materialized: consumed twice (node moments + the edge-pair
    # exchange), and materialization breaks the exchange chain so the
    # next hash shuffle starts clean
    stubs = (
        hash_grouped(
            edges.map_batches(stub_emit, batch_format="pyarrow"), ["node"]
        )
        .map_batches(
            attach_deg, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
        )
        .materialize()
    )

    _M = pa.schema(
        [("m", pa.int64()), ("sum_d", pa.int64()), ("sum_d2", pa.int64()),
         ("sum_d3", pa.int64()), ("sum_dadb", pa.int64())]
    )

    def node_moments(t: pa.Table) -> pa.Table:
        # per-block moment partials from the node-keyed layout: each
        # node's degree appears once per incident stub; take it once.
        if t.num_rows == 0 or "d" not in t.column_names:
            return _M.empty_table()
        # attach_deg output is sorted by node within the block; a
        # node's stubs are contiguous and share d
        dd = t["d"].to_numpy(zero_copy_only=False)
        # stub count per node == its degree, so summing d over stubs
        # gives sum d^2 directly; d per node once gives sum d
        # reconstruct node runs from equal consecutive (d) alone is
        # unsafe — recompute from stub counts: every node contributes
        # exactly d stubs, so per-node terms are sums over stubs / d.
        # Simpler and exact: sum over stubs of 1 = sum_d (2m),
        # sum over stubs of d = sum_d2, sum of d^2 = sum_d3.
        return pa.table(
            {
                "m": pa.array([0], pa.int64()),
                "sum_d": pa.array([len(dd)], pa.int64()),
                "sum_d2": pa.array([int(dd.sum())], pa.int64()),
                "sum_d3": pa.array([int((dd * dd).sum())], pa.int64()),
                "sum_dadb": pa.array([0], pa.int64()),
            }
        )

    def pair_partial(t: pa.Table) -> pa.Table:
        # edge-keyed layout: the two stubs of an edge are adjacent after
        # a sort; multiply their degrees.
        if t.num_rows == 0 or "a" not in t.column_names:
            return _M.empty_table()
        d = t.sort_by(
            [("a", "ascending"), ("b", "ascending"), ("side", "ascending")]
        )
        dd = d["d"].to_numpy(zero_copy_only=False)
        da, db = dd[0::2], dd[1::2]
        return pa.table(
            {
                "m": pa.array([len(da)], pa.int64()),
                "sum_d": pa.array([0], pa.int64()),
                "sum_d2": pa.array([0], pa.int64()),
                "sum_d3": pa.array([0], pa.int64()),
                "sum_dadb": pa.array([int((da * db).sum())], pa.int64()),
            }
        )

    moments = stubs.map_batches(
        node_moments, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    paired = hash_grouped(
        stubs, ["a", "b"], reserve_cpus=False
    ).map_batches(
        pair_partial, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    both = moments.union(paired)

    import pandas as pd

    tot = both.to_pandas().sum()
    return pd.DataFrame(
        {
            "m": [int(tot["m"])],
            "sum_d": [int(tot["sum_d"])],
            "sum_d2": [int(tot["sum_d2"])],
            "sum_d3": [int(tot["sum_d3"])],
            "sum_dadb": [int(tot["sum_dadb"])],
        }
    )


# --- rdf:type histogram --------------------------------------------------------


def _type_hist_oracle() -> str:
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules

    canon = K.triples_canonical_sql(pipeline_rules())
    return f"""
WITH canon AS MATERIALIZED ({canon})
SELECT obj AS type, CAST(count(*) AS BIGINT) AS n_entities
FROM canon WHERE pred = 'rdf:type'
GROUP BY obj
""".strip()


@register("kg_type_histogram", oracle=_type_hist_oracle())
def kg_type_histogram(sf_dir: str):
    """Entity-type histogram: count of rdf:type assertions per type
    object — the first chart on any KG dashboard. Plan: cached
    canonical → predicate filter pushed into the scan batch → per-block
    count partials → one type-vocabulary-scale grouped Sum (canonical
    triples are distinct, so counts are entity counts)."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline

    canon = run_kg_pipeline(sf_dir).select_columns(["pred", "obj"])

    _H = pa.schema([("type", pa.string()), ("n", pa.int64())])

    def type_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pred" not in t.column_names:
            return _H.empty_table()
        f = t.filter(pc.equal(t["pred"], "rdf:type"))
        if f.num_rows == 0:
            return _H.empty_table()
        g = f.select(["obj"]).group_by("obj").aggregate([([], "count_all")])
        return pa.table(
            {"type": g["obj"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    return (
        canon.map_batches(type_partial, batch_format="pyarrow")
        .groupby("type")
        .aggregate(Sum("n", alias_name="n_entities"))
    )


# --- exact daily active users ---------------------------------------------------

_DAU_ORACLE = """
SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS dau,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
""".strip()


@register("rel_daily_active", oracle=_DAU_ORACLE)
def rel_daily_active(sf_dir: str):
    """Exact daily active users — the grouped COUNT(DISTINCT) shape:
    block-local distinct (day, user) pairs with piggybacked event
    counts (map-side combine) → ONE day-keyed hash exchange of the
    pair-distinct rows (never the events) → per-day distinct count +
    count merge."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    _P = pa.schema(
        [("day", pa.int64()), ("user_id", pa.int64()), ("cnt", pa.int64())]
    )
    _OUT = pa.schema(
        [("day", pa.int64()), ("dau", pa.int64()), ("n_events", pa.int64())]
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _P.empty_table()
        ts = t["ts"]
        day = pc.cast(
            pc.add(
                pc.add(
                    pc.multiply(pc.year(ts), pa.scalar(10000)),
                    pc.multiply(pc.month(ts), pa.scalar(100)),
                ),
                pc.day(ts),
            ),
            pa.int64(),
        )
        g = (
            pa.table({"day": day, "user_id": t["user_id"]})
            .group_by(["day", "user_id"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "day": g["day"],
                "user_id": pc.cast(g["user_id"], pa.int64()),
                "cnt": pc.cast(g["count_all"], pa.int64()),
            }
        )

    def day_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "day" not in t.column_names:
            return _OUT.empty_table()
        d = (
            t.group_by(["day", "user_id"])
            .aggregate([("cnt", "sum")])
            .sort_by([("day", "ascending")])
        )
        day = d["day"].to_numpy(zero_copy_only=False)
        cnt = d["cnt_sum"].to_numpy(zero_copy_only=False)
        starts, ends = runs(day)
        return pa.table(
            {
                "day": d["day"].take(pa.array(starts, pa.int64())),
                "dau": pa.array((ends - starts).astype(np.int64)),
                "n_events": pa.array(np.add.reduceat(cnt, starts), pa.int64()),
            }
        )

    pairs = ev.map_batches(pair_partial, batch_format="pyarrow")
    grouped = hash_grouped(pairs, ["day"])
    return grouped.map_batches(
        day_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- month-over-month revenue delta ---------------------------------------------

_MOM_ORACLE = """
WITH m AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_c
  FROM orders GROUP BY 1
)
SELECT ym, revenue_c,
       CAST(coalesce(lag(revenue_c) OVER (ORDER BY ym), 0) AS BIGINT)
         AS prev_c,
       CAST(revenue_c - coalesce(lag(revenue_c) OVER (ORDER BY ym), 0)
         AS BIGINT) AS delta_c
FROM m
""".strip()


@register("rel_month_over_month", oracle=_MOM_ORACLE)
def rel_month_over_month(sf_dir: str):
    """Month-over-month revenue delta — the window-on-aggregate shape:
    the fact table reduces distributed (per-block month partials → one
    month-scale Sum), then the LAG runs on the RESULT-scale series
    driver-side (months are bounded by the calendar, not the data)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    _P = pa.schema([("ym", pa.int64()), ("rev", pa.int64())])

    def month_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderdate" not in t.column_names:
            return _P.empty_table()
        ym = pc.add(
            pc.multiply(pc.year(t["o_orderdate"]), pa.scalar(100)),
            pc.month(t["o_orderdate"]),
        )
        rev = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        g = (
            pa.table({"ym": pc.cast(ym, pa.int64()), "rev": rev})
            .group_by("ym")
            .aggregate([("rev", "sum")])
        )
        return g.select(["ym", "rev_sum"]).rename_columns(["ym", "rev"])

    series = (
        orders.map_batches(month_partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("rev", alias_name="revenue_c"))
        .to_pandas()
        .sort_values("ym")
        .reset_index(drop=True)
    )
    prev = series["revenue_c"].shift(1).fillna(0).astype("int64")
    return pd.DataFrame(
        {
            "ym": series["ym"].astype("int64"),
            "revenue_c": series["revenue_c"].astype("int64"),
            "prev_c": prev,
            "delta_c": series["revenue_c"].astype("int64") - prev,
        }
    )


# --- MinHash-LSH precision / calibration eval -----------------------------------


def _dedup_prec_oracle() -> str:
    from ntto_ray import queries_text  # ensures the source oracle exists

    lsh = _ORACLES["dedup_minhash_lsh"].strip()
    return f"""
WITH lsh AS MATERIALIZED ({lsh}),
d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents
)
SELECT l.doc_a, l.doc_b, l.est_jaccard_pct,
       CAST((len(list_intersect(a.toks, b.toks)) * 100)
            // (len(a.toks) + len(b.toks)
                - len(list_intersect(a.toks, b.toks))) AS BIGINT)
         AS exact_jaccard_pct
FROM lsh l JOIN d a ON a.doc_id = l.doc_a JOIN d b ON b.doc_id = l.doc_b
""".strip()


@register("dedup_precision_eval", oracle=_dedup_prec_oracle())
def dedup_precision_eval(sf_dir: str):
    """MinHash-LSH calibration report: every LSH candidate pair with its
    signature-estimated AND exact token-set Jaccard — the precision /
    estimator-bias read a dedup deployment tunes bands/threshold
    against (the recall twin of ann_recall_eval). The pair set is
    result-scale, so the exact verification fetches ONLY the involved
    docs (semi-join via broadcast id set, never a corpus self-join)."""
    import pandas as pd

    from ntto_ray.stages.dedup import minhash_lsh_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs).to_pandas()
    if len(pairs) == 0:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "est_jaccard_pct": pd.Series([], dtype="int64"),
                "exact_jaccard_pct": pd.Series([], dtype="int64"),
            }
        )
    ids = np.unique(
        np.concatenate([pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()])
    )
    def fetch(t: pa.Table) -> pa.Table:
        keep = pa.array(
            np.isin(
                t["doc_id"].to_numpy(zero_copy_only=False), ids
            )
        )
        return t.filter(keep)

    sub = docs.map_batches(fetch, batch_format="pyarrow").to_pandas()
    toks = {
        int(r.doc_id): set(r.text.split(" ")) for r in sub.itertuples()
    }  # result-scale dict (involved docs only)
    inter = np.array(
        [
            len(toks[a] & toks[b])
            for a, b in zip(pairs["doc_a"], pairs["doc_b"])
        ],
        np.int64,
    )
    union = np.array(
        [
            len(toks[a]) + len(toks[b])
            for a, b in zip(pairs["doc_a"], pairs["doc_b"])
        ],
        np.int64,
    ) - inter
    return pd.DataFrame(
        {
            "doc_a": pairs["doc_a"].astype("int64"),
            "doc_b": pairs["doc_b"].astype("int64"),
            "est_jaccard_pct": pairs["est_jaccard_pct"].astype("int64"),
            "exact_jaccard_pct": (inter * 100 // union).astype("int64"),
        }
    )


# --- skip-gram pairs from random walks ------------------------------------------

_WCO_WINDOW = 2


def _walk_cooc_oracle() -> str:
    # registers the walks oracle when this module loads standalone
    from ntto_ray import queries_graph_ext  # noqa: F401

    walks = _ORACLES["kg_random_walks"].strip()
    return f"""
WITH w AS MATERIALIZED ({walks})
SELECT a.node AS center, b.node AS context,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM w a JOIN w b
  ON a.walk = b.walk AND a.seed = b.seed
 AND abs(a.step - b.step) BETWEEN 1 AND {_WCO_WINDOW}
GROUP BY 1, 2
""".strip()


@register("kg_walk_cooccurrence", oracle=_walk_cooc_oracle())
def kg_walk_cooccurrence(sf_dir: str):
    """Skip-gram (center, context) pair counts within a ±{_WCO_WINDOW}
    window over the derandomized DeepWalk walks — the training-pair
    extraction step between walk generation and embedding training
    (word2vec over walks, Perozzi et al. KDD 2014 §4.2). The walk set
    is walk-scale by construction (seeds × walks × length), so the
    window expansion runs on the result of the distributed walk
    generation; at a 10^9-seed production run the same window join is
    one (walk, seed)-keyed exchange over walk rows."""
    import pandas as pd

    from ntto_ray.queries_graph_ext import kg_random_walks

    w = kg_random_walks(sf_dir)
    w = w.to_pandas() if not isinstance(w, pd.DataFrame) else w
    w = w.sort_values(["walk", "seed", "step"]).reset_index(drop=True)
    walk = w["walk"].to_numpy()
    seed = w["seed"].to_numpy()
    node = w["node"].to_numpy()
    centers, contexts = [], []
    for off in range(1, _WCO_WINDOW + 1):
        if len(walk) <= off:
            break
        same = (walk[:-off] == walk[off:]) & (seed[:-off] == seed[off:])
        a, b = node[:-off][same], node[off:][same]
        centers.extend([a, b])  # symmetric window
        contexts.extend([b, a])
    if not centers:
        return pd.DataFrame(
            {
                "center": pd.Series([], dtype=object),
                "context": pd.Series([], dtype=object),
                "n_pairs": pd.Series([], dtype="int64"),
            }
        )
    df = pd.DataFrame(
        {
            "center": np.concatenate(centers),
            "context": np.concatenate(contexts),
        }
    )
    g = (
        df.groupby(["center", "context"], sort=True)
        .size()
        .rename("n_pairs")
        .reset_index()
    )
    g["n_pairs"] = g["n_pairs"].astype("int64")
    return g


# --- partitioned Parquet sink round-trip ----------------------------------------

_PPR_ORACLE = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang IN ('en', 'de')
GROUP BY 1, 2
""".strip()


@register("parquet_partitioned_roundtrip", oracle=_PPR_ORACLE)
def parquet_partitioned_roundtrip(sf_dir: str):
    """Partitioned-sink round-trip — the resumable-output surface the
    100 TB brief requires: write documents as lang-partitioned Parquet
    (one directory per partition key, so a failed run skips finished
    partitions), then re-read ONLY the en/de partitions (directory
    pruning — the other partitions' files are never opened) and
    aggregate. The oracle reads the ORIGINAL table, so the round-trip
    is value-checked end-to-end."""
    import os
    import tempfile

    from ray.data.aggregate import Count, Sum

    out = os.path.join(
        tempfile.gettempdir(), f"ntto_ppr_{os.path.basename(sf_dir)}"
    )
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    # fresh write each run: partition dirs are content-addressed by the
    # input sf_dir, so a re-run overwrites its own partitions only
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    docs.write_parquet(out, partition_cols=["lang"])

    # partition pruning by construction: only the en/de directories are
    # ever listed or opened; the partition key (a hive directory name,
    # not a file column) is re-attached as a constant per directory
    def read_part(lv: str):
        return ray.data.read_parquet(
            f"{out}/lang={lv}", columns=["source", "n_chars"]
        ).map_batches(
            lambda t, lv=lv: t.append_column(
                "lang", pa.array([lv] * t.num_rows)
            ),
            batch_format="pyarrow",
        )

    back = read_part("en").union(read_part("de"))
    agg = (
        back.groupby(["lang", "source"])
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_docs", pa.int64()),
                    ("sum_chars", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "lang": pc.cast(t["lang"], pa.string()),
                "source": t["source"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "sum_chars": pc.cast(t["sum_chars"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# --- winnowing fingerprints ------------------------------------------------------

_WINNOW_K = 4  # tokens per gram
_WINNOW_W = 5  # grams per window


def _winnow_oracle() -> str:
    K, W = _WINNOW_K, _WINNOW_W
    return f"""
WITH {_gram_cte(K)},
win AS (
  SELECT doc_id, pos AS wstart,
         min(g) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {W - 1} FOLLOWING) AS wm,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {W - 1} FOLLOWING) AS cnt
  FROM gh
),
fp AS (
  SELECT w.doc_id, max(g2.pos) AS fpos, w.wm AS h
  FROM (SELECT * FROM win WHERE cnt = {W}) w
  JOIN gh g2 ON g2.doc_id = w.doc_id
            AND g2.pos BETWEEN w.wstart AND w.wstart + {W - 1}
            AND g2.g = w.wm
  GROUP BY w.doc_id, w.wstart, w.wm
)
SELECT DISTINCT doc_id, CAST(fpos AS BIGINT) AS pos, h FROM fp
""".strip()


@register("text_winnowing", oracle=_winnow_oracle())
def text_winnowing(sf_dir: str):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): from each window of {_WINNOW_W}
    consecutive {_WINNOW_K}-token gram hashes select the minimum
    (rightmost on ties), dedup — the guaranteed-coverage fingerprint
    set plagiarism/copy detection stores instead of every gram
    (density 2/(w+1)). Per-block fully vectorized: sliding-window view
    over the flat gram-hash array, doc-boundary mask, reversed-argmin
    for the rightmost-tie rule, distinct via group_by. Embarrassingly
    parallel — ZERO shuffles; the output IS the per-doc fingerprint
    index a downstream exchange would build buckets from."""

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    K, W = _WINNOW_K, _WINNOW_W
    _OUT = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64()), ("h", pa.int64())]
    )

    class Winnow:
        def __init__(self):
            self._cache: dict[str, int] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "text" not in t.column_names:
                return _OUT.empty_table()
            g, d_idx, pos = _gram_hashes(t["text"], K, self._cache)
            if len(g) < W:
                return _OUT.empty_table()
            sw = np.lib.stride_tricks.sliding_window_view(g, W)
            valid = d_idx[: len(g) - W + 1] == d_idx[W - 1 :]
            vs = np.flatnonzero(valid)
            if len(vs) == 0:
                return _OUT.empty_table()
            wins = sw[vs]
            # rightmost argmin: argmin of the column-reversed window is
            # the FIRST minimum from the right
            sel = W - 1 - wins[:, ::-1].argmin(axis=1)
            pick = vs + sel
            doc = t["doc_id"].to_numpy(zero_copy_only=False)[d_idx[pick]]
            fp = pa.table(
                {
                    "doc_id": pa.array(doc, pa.int64()),
                    "pos": pa.array(pos[pick], pa.int64()),
                    "h": pa.array(g[pick]),
                }
            )
            return fp.group_by(["doc_id", "pos", "h"]).aggregate([])

    return docs.map_batches(Winnow, batch_format="pyarrow", concurrency=(1, 4))


# --- per-source document quota (capped deterministic sampling) -------------------

_CAP_PER_SOURCE = 15


def _cap_oracle() -> str:
    from ntto_ray.stages.sketch import splitmix64_sql

    h = splitmix64_sql("CAST(doc_id AS UBIGINT)")
    return f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {h}, doc_id) AS rn
  FROM documents
)
SELECT doc_id, source FROM r WHERE rn <= {_CAP_PER_SOURCE}
""".strip()


@register("corpus_cap_per_source", oracle=_cap_oracle())
def corpus_cap_per_source(sf_dir: str):
    """Per-source document quota — the mixture-balancing cap ('at most
    C docs per domain') every corpus recipe applies before token-budget
    sampling: keep the {_CAP_PER_SOURCE} docs with the smallest
    splitmix64(doc_id) per source (a deterministic uniform draw, ties
    by doc_id). ONE source-keyed exchange → per-run vectorized
    partial-sort top-C. The hash order makes the 'random' cap
    bit-reproducible and exactly SQL-mirrorable."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs
    from ntto_ray.stages.sketch import splitmix64

    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    _OUT = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])

    def hash_col(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.schema(
                [("doc_id", pa.int64()), ("source", pa.string()),
                 ("h", pa.uint64())]
            ).empty_table()
        h = splitmix64(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return pa.table(
            {"doc_id": t["doc_id"], "source": t["source"], "h": pa.array(h)}
        )

    def cap_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by(
            [("source", "ascending"), ("h", "ascending"),
             ("doc_id", "ascending")]
        )
        src = d["source"].to_numpy(zero_copy_only=False)
        starts, ends = runs(src)
        rank = np.arange(len(src)) - starts[
            np.repeat(np.arange(len(starts)), ends - starts)
        ]
        keep = pa.array(rank < _CAP_PER_SOURCE)
        kept = d.filter(keep)
        return pa.table(
            {
                "doc_id": pc.cast(kept["doc_id"], pa.int64()),
                "source": kept["source"],
            }
        )

    grouped = hash_grouped(
        docs.map_batches(hash_col, batch_format="pyarrow"), ["source"]
    )
    return grouped.map_batches(
        cap_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- SPARQL-style triple-pattern match --------------------------------------------


def _pattern_oracle() -> str:
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules

    canon = K.triples_canonical_sql(pipeline_rules())
    return f"""
WITH canon AS MATERIALIZED ({canon})
SELECT t1.subj AS conv, t1.obj AS turn, t2.obj AS entity
FROM canon t1 JOIN canon t2 ON t2.subj = t1.obj
WHERE t1.pred = 'exont:hasTurn' AND t2.pred = 'exont:mentionsEntity'
""".strip()


@register("kg_pattern_match", oracle=_pattern_oracle())
def kg_pattern_match(sf_dir: str):
    """Fixed two-triple SPARQL basic graph pattern over the canonical
    KG: ?conv exont:hasTurn ?turn . ?turn exont:mentionsEntity ?entity
    — the conversation→entity provenance join a KG consumer runs to
    trace which turn asserted which entity. Plan: predicate filters
    push into the scan batches (each side ships only its pattern's
    triples), then ONE tag-union hash exchange on the join variable
    ?turn with a per-run vectorized cross of the two sides (the
    ragged-cross-product kernel of kg_pred_paths)."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    _TAG = pa.schema(
        [("turn", pa.string()), ("side", pa.int8()), ("val", pa.string())]
    )
    _OUT = pa.schema(
        [("conv", pa.string()), ("turn", pa.string()),
         ("entity", pa.string())]
    )

    def tag_sides(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pred" not in t.column_names:
            return _TAG.empty_table()
        a = t.filter(pc.equal(t["pred"], "exont:hasTurn"))
        b = t.filter(pc.equal(t["pred"], "exont:mentionsEntity"))
        return pa.table(
            {
                "turn": pa.concat_arrays(
                    [a["obj"].combine_chunks(), b["subj"].combine_chunks()]
                ),
                "side": pa.array(
                    np.concatenate(
                        [
                            np.zeros(a.num_rows, np.int8),
                            np.ones(b.num_rows, np.int8),
                        ]
                    )
                ),
                "val": pa.concat_arrays(
                    [a["subj"].combine_chunks(), b["obj"].combine_chunks()]
                ),
            }
        )

    def join_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "turn" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by(
            [("turn", "ascending"), ("side", "ascending"),
             ("val", "ascending")]
        )
        turn = d["turn"].to_numpy(zero_copy_only=False)
        sidec = d["side"].to_numpy(zero_copy_only=False)
        starts, ends = runs(turn)
        mids = starts + np.add.reduceat((sidec == 0).astype(np.int64), starts)
        n_a = mids - starts
        n_b = ends - mids
        pairs = n_a * n_b
        total = int(pairs.sum())
        if total == 0:
            return _OUT.empty_table()
        run_of = np.repeat(np.arange(len(starts)), pairs)
        off = np.concatenate([[0], np.cumsum(pairs)[:-1]])
        local = np.arange(total) - off[run_of]
        nb = n_b[run_of]
        a_idx = starts[run_of] + local // nb
        b_idx = mids[run_of] + local % nb
        val = d["val"].combine_chunks()
        tv = d["turn"].combine_chunks()
        return pa.table(
            {
                "conv": val.take(pa.array(a_idx, pa.int64())),
                "turn": tv.take(pa.array(a_idx, pa.int64())),
                "entity": val.take(pa.array(b_idx, pa.int64())),
            }
        )

    tagged = canon.map_batches(tag_sides, batch_format="pyarrow")
    grouped = hash_grouped(tagged, ["turn"])
    return grouped.map_batches(
        join_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- cumulative distinct users (growth curve) --------------------------------------

_CUM_ORACLE = """
WITH f AS (
  SELECT user_id,
         CAST(year(min(ts)) * 10000 + month(min(ts)) * 100 + day(min(ts))
              AS BIGINT) AS first_day
  FROM events GROUP BY user_id
),
d AS (SELECT first_day, CAST(count(*) AS BIGINT) AS new_users
      FROM f GROUP BY first_day)
SELECT first_day AS day, new_users,
       CAST(sum(new_users) OVER (ORDER BY first_day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM d
""".strip()


@register("rel_cumulative_users", oracle=_CUM_ORACLE)
def rel_cumulative_users(sf_dir: str):
    """User growth curve — cumulative distinct users by first-seen day:
    per-block (user, min-day) partials → one user-keyed Min merge →
    day counts → running sum on the CALENDAR-bounded series
    driver-side (the same window-on-aggregate budget as
    rel_month_over_month)."""
    import pandas as pd

    from ray.data.aggregate import Min

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    _P = pa.schema([("user_id", pa.int64()), ("day", pa.int64())])

    def first_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _P.empty_table()
        ts = t["ts"]
        day = pc.cast(
            pc.add(
                pc.add(
                    pc.multiply(pc.year(ts), pa.scalar(10000)),
                    pc.multiply(pc.month(ts), pa.scalar(100)),
                ),
                pc.day(ts),
            ),
            pa.int64(),
        )
        g = (
            pa.table({"user_id": pc.cast(t["user_id"], pa.int64()), "day": day})
            .group_by("user_id")
            .aggregate([("day", "min")])
        )
        return g.select(["user_id", "day_min"]).rename_columns(["user_id", "day"])

    first = (
        ev.map_batches(first_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("day", alias_name="first_day"))
    )

    _D = pa.schema([("first_day", pa.int64()), ("new_users", pa.int64())])

    def day_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "first_day" not in t.column_names:
            return _D.empty_table()
        g = (
            t.select(["first_day"])
            .group_by("first_day")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "first_day": pc.cast(g["first_day"], pa.int64()),
                "new_users": pc.cast(g["count_all"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    days = (
        first.map_batches(day_partial, batch_format="pyarrow")
        .groupby("first_day")
        .aggregate(Sum("new_users", alias_name="new_users"))
        .to_pandas()
        .sort_values("first_day")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "day": days["first_day"].astype("int64"),
            "new_users": days["new_users"].astype("int64"),
            "cum_users": days["new_users"].astype("int64").cumsum(),
        }
    )
