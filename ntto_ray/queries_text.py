"""Dedup / text-analysis / similarity-search queries over documents and
embeddings, plus the NT parse/render round-trip. Oracles where the
semantics are deterministic + SQL-expressible; probabilistic ops
(MinHash-LSH, SimHash, hyperplane LSH) are rows-only here and pinned by
unit tests instead."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ntto_ray.registry import register


def _docs(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


# --- dedup ----------------------------------------------------------------

@register(
    "dedup_exact_keys",
    oracle="""
SELECT substr(text, 1, 30) AS key, CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS dups
FROM documents GROUP BY 1
""",
)
def dedup_exact_keys(sf_dir: str):
    from ntto_ray.stages.dedup import exact_dedup_keys

    return exact_dedup_keys(_docs(sf_dir, ["doc_id", "text"]))


@register(
    "dedup_exact_fulltext",
    oracle="""
SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS dups
FROM documents GROUP BY 1
""",
)
def dedup_exact_fulltext(sf_dir: str):
    from ntto_ray.stages.dedup import exact_dedup_fulltext

    return exact_dedup_fulltext(_docs(sf_dir, ["doc_id", "text"]))


_JACCARD_SQL = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST((len(list_intersect(a.toks, b.toks)) * 100)
            // (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
            AS BIGINT) AS jaccard_pct
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.toks, b.toks)) * 100
      >= 90 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
"""


@register("dedup_jaccard_pairs", oracle=_JACCARD_SQL)
def dedup_jaccard_pairs(sf_dir: str):
    """Globally exact near-dup pairs (prefix-filtered similarity join —
    no blocking assumption, unlike round 1's (source, length-bucket)
    scheme whose block population grew with the corpus)."""
    from ntto_ray.stages.dedup import jaccard_pairs

    return jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold_pct=90)


@register("dedup_minhash_lsh", oracle=None)  # probabilistic — tests pin recall
def dedup_minhash_lsh(sf_dir: str):
    from ntto_ray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]))


_SIMHASH_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
th AS (
  -- token hash = md5 digest bytes [:8] little-endian, parsed from the
  -- hex string (byte j = hex pair j, weight 256^j) — exactly
  -- SimHasher._uniq_hashes (stages/dedup.py)
  SELECT doc_id,
    (SELECT CAST(sum(
        CAST((strpos('0123456789abcdef', substr(md5(tok), 2*j+1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(md5(tok), 2*j+2, 1)) - 1) AS HUGEINT)
        * CAST(power(2, 8*j) AS HUGEINT)) AS UBIGINT)
     FROM (SELECT unnest(generate_series(0, 7)) AS j)) AS h
  FROM tok
),
votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bits
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << b ELSE 0 END) AS UBIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


@register("dedup_simhash", oracle=_SIMHASH_SQL)
def dedup_simhash(sf_dir: str):
    from ntto_ray.stages.dedup import simhash_fingerprints

    return simhash_fingerprints(_docs(sf_dir, ["doc_id", "text"]))


def _simhash_pairs_oracle() -> str:
    """Self-join over the (SQL-mirrored) SimHash fingerprints with
    bit_count(xor) — exact because the banded Ray plan is exact for
    hamming <= bands - 1 (stages/dedup.py simhash_pairs)."""
    sim = _SIMHASH_SQL
    return f"""
WITH sh AS (SELECT * FROM ({sim}))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register("dedup_simhash_pairs", oracle=_simhash_pairs_oracle())
def dedup_simhash_pairs(sf_dir: str):
    from ntto_ray.stages.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3, bands=4)


_CC_SQL = f"""
WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({_JACCARD_SQL})),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b != r.a
)
SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS component
FROM reach GROUP BY a
"""


@register("dedup_connected_components", oracle=_CC_SQL)
def dedup_connected_components(sf_dir: str):
    """Near-dup clustering: exact Jaccard pairs → connected components
    (min-label propagation, stages/graph.py) — the step that turns pair
    lists into keep-one-per-group dedup decisions."""
    from ntto_ray.stages.dedup import jaccard_pairs
    from ntto_ray.stages.graph import connected_components

    pairs = jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold_pct=90)
    return connected_components(pairs)


@register(
    "dedup_cosine_pairs",
    oracle="""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4
""",
)
def dedup_cosine_pairs(sf_dir: str):
    from ntto_ray.stages.ann import cosine_pairs

    return cosine_pairs(_emb(sf_dir), threshold=0.4)


# --- text analysis --------------------------------------------------------

@register(
    "text_token_stats",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       CAST(list_aggregate(list_transform(string_split(text, ' '), x -> length(x)), 'sum') AS BIGINT)
         AS sum_token_len
FROM documents
""",
)
def text_token_stats(sf_dir: str):
    from ntto_ray.stages.text import token_stats

    return token_stats(_docs(sf_dir, ["doc_id", "text"]))


@register(
    "text_quality",
    oracle="""
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_stop AS BIGINT) AS n_stopwords,
       CAST(length(text) AS BIGINT) AS n_chars_obs,
       CAST((100 * (n_tokens - n_stop)) // greatest(n_tokens, 1) AS BIGINT) AS quality_pct
FROM (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS n_stop
  FROM documents
)
""",
)
def text_quality(sf_dir: str):
    from ntto_ray.stages.text import quality

    return quality(_docs(sf_dir, ["doc_id", "text"]))


@register(
    "text_langid",
    oracle="""
SELECT doc_id, lang,
       CASE WHEN len(list_intersect(list_distinct(string_split(text, ' ')), ['the', 'a'])) > 0
            THEN 'en' ELSE 'unk' END AS lang_guess,
       CAST(len(list_intersect(list_distinct(string_split(text, ' ')), ['the', 'a'])) AS BIGINT)
         AS marker_hits
FROM documents
""",
)
def text_langid(sf_dir: str):
    from ntto_ray.stages.text import langid

    return langid(_docs(sf_dir, ["doc_id", "text", "lang"]))


@register(
    "text_fingerprints",
    oracle="""
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text) - 7)) AS i
  FROM documents
),
w AS (
  -- per-window polynomial hash sum(byte_k * 257^k, k=0..7) mod 2^64 —
  -- exactly fingerprint_batch's uint64 arithmetic (stages/text.py)
  SELECT doc_id,
         (CAST(ascii(substr(text, i, 1)) AS HUGEINT)
          + ascii(substr(text, i+1, 1)) * CAST(257 AS HUGEINT)
          + ascii(substr(text, i+2, 1)) * CAST(66049 AS HUGEINT)
          + ascii(substr(text, i+3, 1)) * CAST(16974593 AS HUGEINT)
          + ascii(substr(text, i+4, 1)) * CAST(4362470401 AS HUGEINT)
          + ascii(substr(text, i+5, 1)) * CAST(1121154893057 AS HUGEINT)
          + ascii(substr(text, i+6, 1)) * CAST(288136807515649 AS HUGEINT)
          + ascii(substr(text, i+7, 1)) * CAST(74051159531521793 AS HUGEINT)
         ) % CAST('18446744073709551616' AS HUGEINT) AS h
  FROM pos
),
r AS (
  SELECT doc_id,
         CAST(min(h) % CAST('9223372036854775808' AS HUGEINT) AS BIGINT) AS rolling_min64
  FROM w GROUP BY doc_id
)
SELECT d.doc_id, md5(d.text) AS md5, r.rolling_min64
FROM documents d JOIN r USING (doc_id)
""",
)
def text_fingerprints(sf_dir: str):
    from ntto_ray.stages.text import fingerprints

    return fingerprints(_docs(sf_dir, ["doc_id", "text"]))


@register(
    "text_md5",
    oracle="SELECT doc_id, md5(text) AS md5 FROM documents",
)
def text_md5(sf_dir: str):
    from ntto_ray.stages.text import fingerprints

    return fingerprints(_docs(sf_dir, ["doc_id", "text"])).select_columns(
        ["doc_id", "md5"]
    )


# --- similarity search ----------------------------------------------------

_ANN_QUERY_IDS = (0, 1, 2)


def _query_matrix(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mask = np.isin(t["vec_id"].to_numpy(), _ANN_QUERY_IDS)
    sub = t.filter(pa.array(mask))
    order = np.argsort(sub["vec_id"].to_numpy())
    ids = sub["vec_id"].to_numpy()[order]
    m = np.stack(
        [np.asarray(v, dtype=np.float64) for v in sub["embedding"].to_pylist()]
    )[order]
    return ids, m


@register(
    "ann_bruteforce_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN {_ANN_QUERY_IDS}
),
scored AS (
  SELECT q.qid, e.vec_id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                    e.vec_id ASC
         ) AS rank
  FROM q, embeddings e WHERE e.vec_id != q.qid
)
SELECT qid, vec_id, CAST(rank AS BIGINT) AS rank FROM scored WHERE rank <= 10
""",
)
def ann_bruteforce_topk(sf_dir: str):
    from ntto_ray.stages.ann import brute_force_topk

    ids, m = _query_matrix(sf_dir)
    return brute_force_topk(_emb(sf_dir), ids, m, k=10)


def _lsh_oracle_sql(dim: int = 64, nbits: int = 8) -> str:
    """Exact SQL mirror of hyperplane-LSH top-k: the seeded hyperplanes
    (RandomState(7), ann.HyperplaneLSH) are INLINED as double literals
    (Python repr round-trips to the identical IEEE double in DuckDB), so
    the 'approximate' ANN is still a deterministic function of the data
    and fully oracle-checkable."""
    rng = np.random.RandomState(7)
    planes = rng.standard_normal((dim, nbits))
    plane_rows = ",".join(
        f"({j}, CAST([{','.join(repr(v) for v in planes[:, j])}] AS DOUBLE[]))"
        for j in range(nbits)
    )
    return f"""
WITH planes(j, p) AS (SELECT * FROM (VALUES {plane_rows})),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (
  SELECT e.vec_id, CAST(sum(CASE WHEN list_dot_product(e.v, p.p) > 0
                    THEN CAST(1 AS BIGINT) << p.j ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN planes p GROUP BY e.vec_id
),
q AS (
  SELECT e.vec_id AS qid, e.v AS qv, b.bucket FROM e JOIN b USING (vec_id)
  WHERE e.vec_id IN {_ANN_QUERY_IDS}
),
scored AS (
  SELECT q.qid, e.vec_id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id ASC
         ) AS rank
  FROM q JOIN b ON b.bucket = q.bucket JOIN e ON e.vec_id = b.vec_id
  WHERE e.vec_id != q.qid
)
SELECT qid, vec_id, CAST(rank AS BIGINT) AS rank FROM scored WHERE rank <= 10
"""


@register("ann_lsh_topk", oracle=_lsh_oracle_sql())
def ann_lsh_topk(sf_dir: str):
    from ntto_ray.stages.ann import lsh_topk

    ids, m = _query_matrix(sf_dir)
    return lsh_topk(_emb(sf_dir), ids, m, k=10, dim=m.shape[1])


def _ivf_oracle_sql(
    *, nlist: int = 16, nprobe: int = 4, iters: int = 10, train: int = 4096, k: int = 10, dim: int = 64
) -> str:
    """Exact SQL mirror of IVF top-k INCLUDING the spherical k-means
    coarse quantizer, unrolled as ``iters`` chained MATERIALIZED CTEs
    (non-materialized CTEs inline the previous iteration twice per level
    → exponential plan blowup). Mirrorability is engineered on the Ray
    side (stages/ann.py _kmeans): no-RNG first-k seeding, ties to lowest
    centroid id, empty clusters keep their centroid, and centroids are
    float32-quantized per iteration so numpy-vs-SQL summation-order ulp
    differences cannot drift the assignments."""
    parts = [
        f"""
s AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw
  FROM embeddings WHERE vec_id < {train}
),
sn AS MATERIALIZED (
  SELECT vec_id,
         list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw))) AS v
  FROM s
),
cent0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         list_transform(v, x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS cv
  FROM sn ORDER BY vec_id LIMIT {nlist}
)"""
    ]
    prev = "cent0"
    for it in range(1, iters + 1):
        parts.append(
            f"""
assign{it} AS MATERIALIZED (
  SELECT vec_id, v, c FROM (
    SELECT sn.vec_id, sn.v, {prev}.c,
           row_number() OVER (
             PARTITION BY sn.vec_id
             ORDER BY list_dot_product(sn.v, {prev}.cv) DESC, {prev}.c ASC
           ) AS rn
    FROM sn CROSS JOIN {prev}
  ) WHERE rn = 1
),
mean{it} AS MATERIALIZED (
  SELECT c, list(avg_x ORDER BY j) AS mv FROM (
    SELECT a.c, j.j, avg(a.v[j.j]) AS avg_x
    FROM assign{it} a CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS j) j
    GROUP BY a.c, j.j
  ) GROUP BY c
),
cent{it} AS MATERIALIZED (
  SELECT p.c,
         COALESCE(
           (SELECT list_transform(m.mv, x -> CAST(CAST(
                x / sqrt(list_dot_product(m.mv, m.mv)) AS FLOAT) AS DOUBLE))
            FROM mean{it} m WHERE m.c = p.c),
           p.cv) AS cv
  FROM {prev} p
)"""
        )
        prev = f"cent{it}"
    km = ",".join(parts)
    return f"""
WITH {km},
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
en AS MATERIALIZED (
  SELECT vec_id, list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw))) AS v
  FROM e
),
eassign AS MATERIALIZED (
  SELECT vec_id, v, c FROM (
    SELECT en.vec_id, en.v, f.c,
           row_number() OVER (
             PARTITION BY en.vec_id
             ORDER BY list_dot_product(en.v, f.cv) DESC, f.c ASC
           ) AS rn
    FROM en CROSS JOIN {prev} f
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, v AS qv FROM en WHERE vec_id IN {_ANN_QUERY_IDS}),
probes AS (
  SELECT qid, c FROM (
    SELECT q.qid, f.c,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY list_dot_product(q.qv, f.cv) DESC, f.c ASC
           ) AS rn
    FROM q CROSS JOIN {prev} f
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT q.qid, ea.vec_id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_dot_product(q.qv, ea.v) DESC, ea.vec_id ASC
         ) AS rank
  FROM q JOIN probes p ON p.qid = q.qid
         JOIN eassign ea ON ea.c = p.c
  WHERE ea.vec_id != q.qid
)
SELECT qid, vec_id, CAST(rank AS BIGINT) AS rank FROM scored WHERE rank <= {k}
"""


@register("ann_ivf_topk", oracle=_ivf_oracle_sql())
def ann_ivf_topk(sf_dir: str):
    from ntto_ray.stages.ann import ivf_topk

    ids, m = _query_matrix(sf_dir)
    return ivf_topk(_emb(sf_dir), ids, m, k=10)


# --- NT parse/render round-trip (the reference's -j surface) --------------

@register("nt_roundtrip", oracle=None)
def nt_roundtrip(sf_dir: str):
    """canonical triples → NT lines → quirky parse → (subj, pred, obj);
    identity on bracket-free IRIs, so the oracle is the canonical SQL."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.ntparse import parse_nt_batch, render_nt_batch

    canonical = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])
    lines = canonical.map_batches(render_nt_batch, batch_format="pyarrow")
    lines = lines.map_batches(
        lambda t: t.rename_columns(["text"]), batch_format="pyarrow"
    )
    return lines.map_batches(parse_nt_batch, batch_format="pyarrow")


def _late_oracles():
    from ntto_ray.functions import kgspec as K
    from ntto_ray.registry import _ORACLES

    from ntto_ray.pipelines.kg import pipeline_rules

    canon = K.triples_canonical_sql(pipeline_rules())
    _ORACLES["nt_roundtrip"] = f"WITH canon AS ({canon}) SELECT subj, pred, obj FROM canon"


_late_oracles()


# --- embedding vector aggregate (per-label centroids) ---------------------

@register(
    "ann_label_centroids",
    oracle="""
WITH e AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS v_fp
  FROM embeddings
)
SELECT label, CAST(dim AS BIGINT) AS dim,
       CAST(sum(v_fp) AS BIGINT) AS sum_fp,
       CAST(count(*) AS BIGINT) AS cnt
FROM e GROUP BY label, dim
""",
)
def ann_label_centroids(sf_dir: str):
    """Per-label centroid of the embedding column — the distributed
    VECTOR aggregate behind IVF training / class prototypes. Map-side
    partial: each block's (n, dim) float32 matrix is fixed-pointed
    (floor(v*1e6) — float32→double is exact, so both engines floor the
    identical double) and segment-summed per label with one np.add.at;
    the exchange then moves only labels × dim partial rows, never
    vectors. Sum+count are returned instead of the mean so every value
    stays an order-independent integer (queries_rel.py exactness
    discipline)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int32()),
                    "dim": pa.array([], pa.int64()),
                    "sum_fp": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        lab = t["label"].to_numpy()
        arr = t.column("embedding").combine_chunks()
        flat = np.asarray(arr.flatten(), dtype=np.float64)
        n = t.num_rows
        dim = flat.size // n
        v_fp = np.floor(flat * 1_000_000.0).astype(np.int64).reshape(n, dim)
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), dim), dtype=np.int64)
        np.add.at(sums, inv, v_fp)
        cnts = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, dim), pa.int32()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(ulab))),
                "sum_fp": pa.array(sums.reshape(-1)),
                "cnt": pa.array(np.repeat(cnts, dim)),
            }
        )

    return (
        _emb(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_fp", alias_name="sum_fp"), Sum("cnt", alias_name="cnt"))
    )
