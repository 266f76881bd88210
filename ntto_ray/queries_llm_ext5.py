"""Round-4 extension operators: corpus-preparation primitives a
training-data pipeline runs constantly — inverted-index build,
deterministic split assignment, per-source reservoir sampling — each
Ray-Data-first with an exact DuckDB oracle.

Determinism discipline (same as the rest of the repo): any "random"
choice routes through splitmix64 of the row id, so results are
bit-reproducible across runs/cluster sizes and exactly SQL-mirrorable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ntto_ray.registry import register


def _docs(sf_dir: str, columns):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# --- inverted index ----------------------------------------------------------

_II_MIN_DF = 2


@register(
    "text_inverted_index",
    oracle=f"""
WITH t AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
)
SELECT tok, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM t GROUP BY tok HAVING count(*) >= {_II_MIN_DF}
""",
)
def text_inverted_index(sf_dir: str):
    """Inverted-index build — the retrieval-side primitive of every
    dedup/decontamination/search pipeline: token → (document frequency,
    sorted posting list). Plan: per-batch DISTINCT (doc, tok) pairs via
    one C++ group_by (per-doc token multisets never leave the batch
    uncompressed) → ONE token-keyed exchange → per-run vectorized
    posting assembly (sort by (tok, doc), binary_join per run — no
    Python loop over tokens). At 100 TB the posting list of a stopword
    is the classic skew hazard: the min-df gate here keeps only real
    vocabulary, and a production variant would cap or shard postings
    past a length bound (the band-bucket treatment MinHash-LSH already
    uses); the exchange ships (doc_id, tok) pairs only, never text."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    docs = _docs(sf_dir, ["doc_id", "text"])

    _P = pa.schema([("doc_id", pa.int64()), ("tok", pa.string())])

    def doc_tok(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _P.empty_table()
        toks = pc.split_pattern(t["text"], pattern=" ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(t["doc_id"].to_numpy(), n)
        g = (
            pa.table({"doc_id": doc, "tok": flat})
            .group_by(["doc_id", "tok"])
            .aggregate([])
        )
        return g.select(["doc_id", "tok"])

    _OUT = pa.schema(
        [("tok", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
    )

    def assemble(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by([("tok", "ascending"), ("doc_id", "ascending")])
        tok = d["tok"].to_numpy(zero_copy_only=False)
        starts, ends = runs(tok)
        df = ends - starts
        keep = df >= _II_MIN_DF
        if not keep.any():
            return _OUT.empty_table()
        # list-wrap the sorted doc ids per kept run, then one vectorized
        # cast + join — no per-token Python string building
        ids_str = pc.cast(d["doc_id"], pa.string()).combine_chunks()
        offs = np.zeros(int(keep.sum()) + 1, dtype=np.int64)
        sel = np.flatnonzero(keep)
        lens = df[sel]
        offs[1:] = np.cumsum(lens)
        take_idx = np.concatenate(
            [np.arange(starts[i], ends[i]) for i in sel]
        ) if len(sel) else np.array([], np.int64)
        flat = ids_str.take(pa.array(take_idx, pa.int64()))
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat)
        postings = pc.binary_join(lists, ",")
        return pa.table(
            {
                "tok": pa.array(tok[starts[sel]], pa.string()),
                "df": pa.array(df[sel].astype(np.int64)),
                "postings": postings,
            }
        )

    grouped = hash_grouped(
        docs.map_batches(doc_tok, batch_format="pyarrow"), ["tok"], sort=False
    )
    return grouped.map_batches(
        assemble, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- deterministic split assignment -----------------------------------------


def _split_oracle() -> str:
    from ntto_ray.stages.sketch import splitmix64_sql

    h = splitmix64_sql("doc_id")
    return f"""
WITH s AS (
  SELECT doc_id,
         CASE WHEN {h} % 100 < 80 THEN 'train'
              WHEN {h} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         len(string_split(text, ' ')) AS ntok
  FROM documents
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS n_tokens,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM s GROUP BY split
"""


@register("corpus_split_assign", oracle=_split_oracle())
def corpus_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment — the split every
    training run needs to be reproducible across reruns AND cluster
    sizes: splitmix64(doc_id) % 100 → 80/10/10. No shuffle at all: the
    assignment is a pure map, and the audit aggregate (docs + tokens per
    split) pre-reduces per block before one split-keyed (3-row)
    exchange. Contamination-safe by construction: membership depends
    only on the id, so adding data never moves an existing doc across
    splits."""
    from ray.data.aggregate import Count, Min, Sum

    from ntto_ray.stages.sketch import splitmix64

    docs = _docs(sf_dir, ["doc_id", "text"])

    _NAMES = np.array(["train", "val", "test"], dtype=object)

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        bucket = (splitmix64(ids.astype(np.int64).view(np.uint64)) % 100).astype(
            np.int64
        )
        which = np.where(bucket < 80, 0, np.where(bucket < 90, 1, 2))
        ntok = pc.list_value_length(
            pc.split_pattern(t["text"], pattern=" ")
        ).cast(pa.int64())
        return pa.table(
            {
                "split": pa.array(_NAMES[which], pa.string()),
                "doc_id": t["doc_id"],
                "ntok": ntok,
            }
        )

    return (
        docs.map_batches(assign, batch_format="pyarrow")
        .groupby("split")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("ntok", alias_name="n_tokens"),
            Min("doc_id", alias_name="min_doc"),
        )
    )


# --- per-source reservoir sample ---------------------------------------------

_RESERVOIR_K = 25


def _reservoir_oracle() -> str:
    from ntto_ray.stages.sketch import splitmix64_sql

    return f"""
WITH r AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {splitmix64_sql("doc_id")}, doc_id
         ) AS rn
  FROM documents
)
SELECT source, doc_id, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= {_RESERVOIR_K}
"""


@register("corpus_reservoir_sample", oracle=_reservoir_oracle())
def corpus_reservoir_sample(sf_dir: str):
    """Deterministic fixed-size sample per source ({_RESERVOIR_K} docs):
    the k docs with the smallest splitmix64(doc_id) — equivalent in
    distribution to a reservoir sample but reproducible and mergeable
    (min-k of a hash is a mergeable summary, so per-block partials
    combine associatively — the KMV trick applied to sampling). Plan:
    per-block top-k partial (k rows per source per block, never the
    corpus) → ONE source-keyed exchange over k-bounded partials →
    per-run final top-k. The exchange volume is sources × k × blocks,
    independent of corpus size."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs
    from ntto_ray.stages.sketch import splitmix64

    docs = _docs(sf_dir, ["doc_id", "source"])

    _P = pa.schema(
        [("source", pa.string()), ("doc_id", pa.int64()), ("h", pa.int64())]
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _P.empty_table()
        src = t["source"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy()
        h = splitmix64(ids.astype(np.int64).view(np.uint64))
        hs = (h ^ np.uint64(1 << 63)).view(np.int64)  # unsigned order, lossless
        order = np.lexsort((ids, hs, src))
        src, ids, hs = src[order], ids[order], hs[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        lens = np.diff(np.r_[starts, len(src)])
        within = np.arange(len(src)) - np.repeat(starts, lens)
        keep = within < _RESERVOIR_K
        return pa.table(
            {
                "source": pa.array(src[keep].tolist(), pa.string()),
                "doc_id": pa.array(ids[keep]),
                "h": pa.array(hs[keep]),
            }
        )

    _OUT = pa.schema(
        [("source", pa.string()), ("doc_id", pa.int64()), ("rn", pa.int64())]
    )

    def final_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return _OUT.empty_table()
        src = t["source"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy()
        hs = t["h"].to_numpy()
        order = np.lexsort((ids, hs, src))
        src, ids = src[order], ids[order]
        gs, ge = runs(src)
        lens = ge - gs
        within = np.arange(len(src)) - np.repeat(gs, lens)
        keep = within < _RESERVOIR_K
        return pa.table(
            {
                "source": pa.array(src[keep].tolist(), pa.string()),
                "doc_id": pa.array(ids[keep]),
                "rn": pa.array((within[keep] + 1).astype(np.int64)),
            }
        )

    grouped = hash_grouped(
        docs.map_batches(partial_topk, batch_format="pyarrow"),
        ["source"],
        sort=False,
    )
    return grouped.map_batches(
        final_topk, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- IVF + PQ composed ANN ----------------------------------------------------

_IVFPQ = dict(nlist=16, nprobe=4, m=4, ksub=16, pq_iters=6, km_iters=10,
              train=4096, dim=64, k=10)


def _ivfpq_oracle_sql() -> str:
    """Exact SQL mirror of the composed IVF+PQ query: the shared coarse
    k-means + full-corpus assignment CTEs (queries_text._km_eassign_ctes
    — ends in en/eassign/cent{it}), plus per-subspace L2 sub-quantizer
    chains (the ann_pq_topk mirror, renamed p* to share the WITH), with
    candidate generation restricted to each query's nprobe probed cells
    and ranking by the left-associated ADC sum."""
    from ntto_ray.queries_text import _ANN_QUERY_IDS, _km_eassign_ctes

    p = _IVFPQ
    dsub = p["dim"] // p["m"]
    parts = [
        _km_eassign_ctes(
            nlist=p["nlist"], iters=p["km_iters"], train=p["train"], dim=p["dim"]
        )
    ]
    for s in range(p["m"]):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        parts.append(f"""
psub{s} AS MATERIALIZED (SELECT vec_id, (v)[{lo}:{hi}] AS sv FROM sn),
pc{s}_0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         list_transform(sv, x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS cv
  FROM psub{s} ORDER BY vec_id LIMIT {p["ksub"]}
)""")
        for it in range(1, p["pq_iters"] + 1):
            parts.append(f"""
pa{s}_{it} AS MATERIALIZED (
  SELECT vec_id, sv, c FROM (
    SELECT psub{s}.vec_id, psub{s}.sv, pp.c,
           row_number() OVER (
             PARTITION BY psub{s}.vec_id
             ORDER BY list_distance(psub{s}.sv, pp.cv) ASC, pp.c ASC
           ) AS rn
    FROM psub{s} CROSS JOIN pc{s}_{it - 1} pp
  ) WHERE rn = 1
),
pm{s}_{it} AS MATERIALIZED (
  SELECT c, list(avg_x ORDER BY j) AS mv FROM (
    SELECT a.c, j.j, avg(a.sv[j.j]) AS avg_x
    FROM pa{s}_{it} a CROSS JOIN (SELECT unnest(generate_series(1, {dsub})) AS j) j
    GROUP BY a.c, j.j
  ) GROUP BY c
),
pc{s}_{it} AS MATERIALIZED (
  SELECT pp.c,
         COALESCE(
           (SELECT list_transform(mm.mv, x -> CAST(CAST(x AS FLOAT) AS DOUBLE))
            FROM pm{s}_{it} mm WHERE mm.c = pp.c),
           pp.cv) AS cv
  FROM pc{s}_{it - 1} pp
)""")
        parts.append(f"""
pcode{s} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT en.vec_id, pp.c,
           row_number() OVER (
             PARTITION BY en.vec_id
             ORDER BY list_distance((en.v)[{lo}:{hi}], pp.cv) ASC, pp.c ASC
           ) AS rn
    FROM en CROSS JOIN pc{s}_{p["pq_iters"]} pp
  ) WHERE rn = 1
),
plut{s} AS MATERIALIZED (
  SELECT q.qid, pp.c, list_dot_product((q.qv)[{lo}:{hi}], pp.cv) AS d
  FROM (SELECT vec_id AS qid, v AS qv FROM en
        WHERE vec_id IN {_ANN_QUERY_IDS}) q
  CROSS JOIN pc{s}_{p["pq_iters"]} pp
)""")
    est = " + ".join(f"plut{s}.d" for s in range(p["m"]))
    code_joins = "\n".join(
        f"  JOIN pcode{s} ON pcode{s}.vec_id = ea.vec_id\n"
        f"  JOIN plut{s} ON plut{s}.qid = q.qid AND plut{s}.c = pcode{s}.c"
        for s in range(p["m"])
    )
    body = ",".join(parts)
    return f"""
WITH {body},
q AS (SELECT vec_id AS qid, v AS qv FROM en WHERE vec_id IN {_ANN_QUERY_IDS}),
probes AS (
  SELECT qid, c FROM (
    SELECT q.qid, f.c,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY list_dot_product(q.qv, f.cv) DESC, f.c ASC
           ) AS rn
    FROM q CROSS JOIN cent{p["km_iters"]} f
  ) WHERE rn <= {p["nprobe"]}
),
scored AS (
  SELECT qid, vec_id,
         row_number() OVER (
           PARTITION BY qid ORDER BY est DESC, vec_id ASC
         ) AS rank
  FROM (
    SELECT q.qid, ea.vec_id, {est} AS est
    FROM q JOIN probes pr ON pr.qid = q.qid
         JOIN eassign ea ON ea.c = pr.c
{code_joins}
    WHERE ea.vec_id != q.qid
  )
)
SELECT qid, vec_id, CAST(rank AS BIGINT) AS rank FROM scored WHERE rank <= {p["k"]}
"""


@register("ann_ivfpq_topk", oracle=_ivfpq_oracle_sql())
def ann_ivfpq_topk(sf_dir: str):
    """IVF + PQ composed ANN — the billion-scale layout (coarse inverted
    lists bound WHICH vectors a query touches, product-quantization
    codes bound the BYTES per touched vector; together ~nprobe/nlist ×
    m/(4·dim) of the raw corpus bytes per query). See
    stages/ann.ivf_pq_topk for the distribution plan; the oracle mirrors
    the full composed chain (coarse k-means, cell assignment, 4 L2
    sub-quantizers, codes, LUTs, probed-cell ADC ranking) exactly."""
    from ntto_ray.queries_text import _emb, _query_matrix
    from ntto_ray.stages.ann import ivf_pq_topk

    ids, qm = _query_matrix(sf_dir)
    return ivf_pq_topk(
        _emb(sf_dir),
        ids,
        qm,
        k=_IVFPQ["k"],
        nlist=_IVFPQ["nlist"],
        nprobe=_IVFPQ["nprobe"],
        m=_IVFPQ["m"],
        ksub=_IVFPQ["ksub"],
        pq_iters=_IVFPQ["pq_iters"],
        km_iters=_IVFPQ["km_iters"],
        train_sample=_IVFPQ["train"],
    )
