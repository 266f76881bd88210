"""Dedup / text-analysis / similarity-search queries over documents and
embeddings, plus the NT parse/render round-trip. Every query carries an
exact DuckDB oracle — including the "probabilistic" ops (MinHash-LSH,
SimHash, hyperplane LSH), whose hash chains are deterministic functions
of the input and are mirrored bit-exactly in SQL."""

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
    oracle=None,  # filled below — needs the poly-hash SQL mirror
)
def dedup_exact_fulltext(sf_dir: str):
    from ntto_ray.stages.dedup import exact_dedup_fulltext

    return exact_dedup_fulltext(_docs(sf_dir, ["doc_id", "text"]))


def _exact_fulltext_oracle() -> str:
    from ntto_ray.registry import _ORACLES
    from ntto_ray.stages.dedup import poly_content_hash_sql

    _ORACLES["dedup_exact_fulltext"] = f"""
WITH ph AS ({poly_content_hash_sql()})
SELECT h1, h2, CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS dups
FROM ph GROUP BY 1, 2
"""


_exact_fulltext_oracle()


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


_NGRAM_JACCARD_SQL = """
WITH d AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 3)
                        for i in generate_series(1, len(text) - 2)]) AS g
  FROM documents WHERE len(text) >= 3
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST((len(list_intersect(a.g, b.g)) * 100)
            // (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
            AS BIGINT) AS jaccard_pct
FROM d a JOIN d b
  ON a.doc_id < b.doc_id
 AND least(len(a.g), len(b.g)) * 100 >= 90 * greatest(len(a.g), len(b.g))
WHERE len(list_intersect(a.g, b.g)) * 100
      >= 90 * (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
"""


@register("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_SQL)
def dedup_ngram_jaccard(sf_dir: str):
    """Char-3-gram Jaccard near-dup pairs — the shingle family that
    catches token-boundary edits (whitespace/punctuation churn) token
    Jaccard misses. Same globally-exact prefix-filtered similarity join
    as dedup_jaccard_pairs; only the shingling kernel differs (flat
    utf-32 codepoint array + vectorized k-gram rolling combine — see
    stages/dedup._char_gram_hashes). The length prefilter in the oracle
    join mirrors the verify kernel's necessary condition
    100*min >= t*max."""
    from ntto_ray.stages.dedup import jaccard_pairs

    return jaccard_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold_pct=90, char_ngram=3
    )


def _minhash_lsh_oracle(
    num_perm: int = 64, bands: int = 16, threshold: float = 0.5, k: int = 3
) -> str:
    """Bit-exact DuckDB mirror of stages/dedup.minhash_lsh_pairs —
    MinHash-LSH is probabilistic in recall, but every step is a
    deterministic function of the text, so the whole chain is
    SQL-checkable: md5[:8]-LE token hashes → k-token rolling shingles
    (mul-xor fold, splitmix64 finalizer) → wrapping-affine minhash
    signatures (the permutation table is embedded as literals from the
    same seed) → per-band splitmix64 bucket keys → bucket self-join
    candidates → matching-minhash-fraction verify. All mod-2^64
    arithmetic routes through UHUGEINT, exactly like splitmix64_sql
    (stages/sketch.py)."""
    from ntto_ray.stages.dedup import _SHINGLE_PRIME, MinHasher

    mh = MinHasher(num_perm=num_perm, shingle_k=k)
    # "& mask" ≡ mod 2^64, far cheaper than UHUGEINT % (128-bit division)
    M = f"CAST({(1 << 64) - 1} AS UHUGEINT)"
    P = int(_SHINGLE_PRIME)
    C1 = 0xBF58476D1CE4E5B9
    C2 = 0x94D049BB133111EB
    rows = num_perm // bands
    thresh = int(np.ceil(threshold * num_perm - 1e-12))

    def mul(e: str, c) -> str:
        return f"CAST((CAST(({e}) AS UHUGEINT) * {c}) & {M} AS UBIGINT)"

    def step(x: str, y: str) -> str:  # (x * P) ^ y   (mod 2^64)
        return f"xor({mul(x, P)}, {y})"

    def mix64(e: str) -> str:  # dedup._mix64 finalizer; e must be a short ref
        t0 = f"xor({e}, ({e}) >> 30)"
        t1 = mul(t0, C1)
        t2 = f"xor({t1}, ({t1}) >> 27)"
        t3 = mul(t2, C2)
        return f"xor(({t3}), ({t3}) >> 31)"

    # Band-key chain as NESTED subquery levels, one new column per level
    # — lateral aliases re-inline their definition at every reference,
    # which turns a 13-step chain into 2^13 evaluations; a projection
    # pyramid evaluates each step exactly once per row.
    levels: list[str] = []  # (expr AS name) added one per level

    def lvl(expr: str, name: str) -> str:
        levels.append(f"{expr} AS {name}")
        return name

    def mix64_lvls(tag: str, e: str) -> str:
        u = lvl(mul(f"xor({e}, {e} >> 30)", C1), f"{tag}_u")
        v = lvl(mul(f"xor({u}, {u} >> 27)", C2), f"{tag}_v")
        return lvl(f"xor({v}, {v} >> 31)", tag)

    acc = mix64_lvls(
        "acc1",
        lvl(
            # NB: the addend must be cast — UHUGEINT + INTEGER binds DOUBLE
            f"CAST((CAST(s1 AS UHUGEINT) + CAST(2*b + 1 AS UHUGEINT)) & {M} "
            "AS UBIGINT)",
            "x0",
        ),
    )
    for j in range(1, rows):
        acc = mix64_lvls(f"acc{j + 1}", lvl(step(acc, f"s{j + 1}"), f"x{j}"))
    base_cols = ", ".join(
        [f"sl[{rows}*bb.b + {j + 1}] AS s{j + 1}" for j in range(rows)]
    )
    bk_inner = f"SELECT doc_id, bb.b AS b, {base_cols} " \
        f"FROM sl CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS b) bb"
    for col in levels:
        bk_inner = f"SELECT *, {col} FROM ({bk_inner})"
    bk_sql = f"SELECT doc_id, CAST({acc} >> 1 AS BIGINT) AS bkey FROM ({bk_inner})"

    perm_vals = ",\n    ".join(
        f"({i}, {int(a)}, {int(b)})" for i, (a, b) in enumerate(zip(mh.a, mh.b))
    )
    # md5 digest bytes [:8] little-endian from the hex string, as a flat
    # sum (no per-row subquery — byte j = hex pair j, weight 256^j);
    # computed once per DISTINCT token, exactly like the actor's cache.
    hexp = "'0123456789abcdef'"
    md5u64 = "CAST(" + " + ".join(
        f"CAST(((strpos({hexp}, substr(mh, {2 * j + 1}, 1)) - 1) * 16"
        f" + (strpos({hexp}, substr(mh, {2 * j + 2}, 1)) - 1)) AS HUGEINT)"
        f" * {256 ** j}" for j in range(8)
    ) + " AS UBIGINT)"
    matches = (
        f"len(list_filter(generate_series(1, {num_perm}), i -> x.sl[i] = y.sl[i]))"
    )
    return f"""
WITH tok AS (
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
  SELECT doc_id, unnest(CASE WHEN len(hl) >= {k}
    THEN [list_reduce(hl[i:i+{k - 1}], (x,y) -> {step('x', 'y')})
          for i in generate_series(1, len(hl) - {k - 1})]
    ELSE [list_reduce(hl, (x,y) -> {step('x', 'y')})] END) AS r
  FROM hl
),
sh AS (SELECT doc_id, {mix64('r')} AS s FROM raws),
perms(i, a, b) AS (VALUES
    {perm_vals}),
sig AS (
  SELECT doc_id, p.i AS perm,
         min(CAST((CAST(s AS UHUGEINT) * CAST(p.a AS UHUGEINT)
                   + CAST(p.b AS UHUGEINT)) & {M} AS UBIGINT)) AS sv
  FROM sh CROSS JOIN perms p GROUP BY doc_id, p.i
),
sl AS MATERIALIZED (SELECT doc_id, list(sv ORDER BY perm) AS sl FROM sig GROUP BY doc_id),
bk AS MATERIALIZED ({bk_sql}),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bk a JOIN bk b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT CAST(c.doc_a AS BIGINT) AS doc_a, CAST(c.doc_b AS BIGINT) AS doc_b,
       CAST({matches} * 100 // {num_perm} AS BIGINT) AS est_jaccard_pct
FROM cand c JOIN sl x ON x.doc_id = c.doc_a JOIN sl y ON y.doc_id = c.doc_b
WHERE {matches} >= {thresh}
"""


@register("dedup_minhash_lsh", oracle=_minhash_lsh_oracle())
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
WITH RECURSIVE pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_JACCARD_SQL})),
edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
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


_RANGE_THR = 0.2


@register(
    "ann_range_search",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN {_ANN_QUERY_IDS}
)
SELECT q.qid, e.vec_id
FROM q, embeddings e
WHERE e.vec_id != q.qid
  AND list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) >= {_RANGE_THR}
""",
)
def ann_range_search(sf_dir: str):
    """Radius query: every corpus vector within cosine >= {thr} of each
    broadcast query — the retrieval sibling of top-k (recall-oriented
    candidate generation wants ALL near neighbors, not a fixed k).
    Zero-shuffle: the batched matmul's threshold survivors ARE the
    answer, so unlike top-k there is no reduce stage at all (stages/
    ann.range_search)."""
    from ntto_ray.stages.ann import range_search

    ids, m = _query_matrix(sf_dir)
    return range_search(_emb(sf_dir), ids, m, threshold=_RANGE_THR)


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


def _km_eassign_ctes(
    *, nlist: int = 16, iters: int = 10, train: int = 4096, dim: int = 64
) -> str:
    """CTE body (no WITH) mirroring the spherical k-means coarse
    quantizer + full-corpus assignment, shared by the IVF and semantic-
    dedup oracles: unrolled ``iters`` chained MATERIALIZED CTEs ending in
    ``eassign(vec_id, v, c)`` and ``en(vec_id, v)``. Mirrorability is
    engineered on the Ray side (stages/ann.py _kmeans): no-RNG first-k
    seeding, ties to lowest centroid id, empty clusters keep their
    centroid, float32-quantized per iteration."""
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
    return f"""{km},
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
)"""


def _ivf_oracle_sql(
    *, nlist: int = 16, nprobe: int = 4, iters: int = 10, train: int = 4096, k: int = 10, dim: int = 64
) -> str:
    """Exact SQL mirror of IVF top-k over the shared k-means+assignment
    CTEs (:func:`_km_eassign_ctes`)."""
    ctes = _km_eassign_ctes(nlist=nlist, iters=iters, train=train, dim=dim)
    return f"""
WITH {ctes},
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


_KNN_K = 5


@register(
    "ann_knn_join",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
en AS MATERIALIZED (
  SELECT vec_id,
         list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw))) AS v
  FROM e
),
scored AS (
  SELECT a.vec_id AS qid, b.vec_id,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_dot_product(a.v, b.v) DESC, b.vec_id ASC
         ) AS rank
  FROM en a JOIN en b ON b.vec_id != a.vec_id
)
SELECT qid, vec_id, CAST(rank AS BIGINT) AS rank
FROM scored WHERE rank <= {_KNN_K}
""",
)
def ann_knn_join(sf_dir: str):
    """Exact cosine kNN self-join — EVERY vector's global top-{k}
    neighbors (the kNN-graph precompute behind semantic curation and
    graph-ANN indexes). Distributed as deterministic vec_id//tile tiling
    → pair-keyed tile replication (corpus×T bytes, the standard
    all-pairs trade) → one exchange → per-pair matmuls → shared Arrow
    top-k reduce (stages/ann.knn_join). The ANN variants (lsh/ivf/pq)
    are the sub-quadratic scale path; this is the exact baseline."""
    from ntto_ray.stages.ann import knn_join

    return knn_join(_emb(sf_dir), k=_KNN_K)


_SEM_THR = 0.3


def _semantic_oracle_sql(
    *, nlist: int = 16, iters: int = 10, train: int = 4096, dim: int = 64
) -> str:
    """Exact SQL mirror of SemDeDup over the shared k-means+assignment
    CTEs: drop b iff some same-cluster a with a.vec_id < b.vec_id sits at
    cosine >= threshold; keep the rest."""
    ctes = _km_eassign_ctes(nlist=nlist, iters=iters, train=train, dim=dim)
    return f"""
WITH {ctes},
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM eassign a JOIN eassign b
    ON a.c = b.c AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) >= {_SEM_THR}
)
SELECT ea.vec_id, CAST(ea.c AS BIGINT) AS cluster
FROM eassign ea
WHERE ea.vec_id NOT IN (SELECT vec_id FROM dropped)
"""


@register("dedup_semantic", oracle=_semantic_oracle_sql())
def dedup_semantic(sf_dir: str):
    """SemDeDup semantic near-dup removal (Abbas et al. 2023): spherical
    k-means clusters (same mirrored quantizer as IVF) → within-cluster
    cosine >= {thr} greedy lower-id-wins drop → kept (vec_id, cluster).
    See stages/ann.semantic_dedup for the scale shape (broadcast
    centroids, one cluster-keyed exchange, bounded per-cluster verify)."""
    from ntto_ray.stages.ann import semantic_dedup

    return semantic_dedup(_emb(sf_dir), threshold=_SEM_THR)


def _pq_oracle_sql(
    *, m: int = 4, ksub: int = 16, iters: int = 6, train: int = 4096,
    k: int = 10, dim: int = 64,
) -> str:
    """Exact SQL mirror of PQ top-k INCLUDING the per-subspace L2
    k-means sub-quantizers (stages/ann._kmeans_l2 — same mirrorability
    engineering as the IVF oracle: first-k seeds, sqrt'd distances with
    ties to lowest centroid id, empty clusters keep their centroid,
    float32 quantization per iteration). The ADC score is the
    left-associated sum of per-subspace lookup dots, matching the Ray
    kernel's accumulation order so exact code ties rank identically."""
    dsub = dim // m
    parts = [
        """
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
en AS MATERIALIZED (
  SELECT vec_id, list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw))) AS v
  FROM e
),
sn AS MATERIALIZED (SELECT vec_id, v FROM en WHERE vec_id < {train})""".format(
            train=train
        )
    ]
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        parts.append(f"""
sub{s} AS MATERIALIZED (SELECT vec_id, (v)[{lo}:{hi}] AS sv FROM sn),
c{s}_0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         list_transform(sv, x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS cv
  FROM sub{s} ORDER BY vec_id LIMIT {ksub}
)""")
        for it in range(1, iters + 1):
            parts.append(f"""
a{s}_{it} AS MATERIALIZED (
  SELECT vec_id, sv, c FROM (
    SELECT sub{s}.vec_id, sub{s}.sv, p.c,
           row_number() OVER (
             PARTITION BY sub{s}.vec_id
             ORDER BY list_distance(sub{s}.sv, p.cv) ASC, p.c ASC
           ) AS rn
    FROM sub{s} CROSS JOIN c{s}_{it - 1} p
  ) WHERE rn = 1
),
m{s}_{it} AS MATERIALIZED (
  SELECT c, list(avg_x ORDER BY j) AS mv FROM (
    SELECT a.c, j.j, avg(a.sv[j.j]) AS avg_x
    FROM a{s}_{it} a CROSS JOIN (SELECT unnest(generate_series(1, {dsub})) AS j) j
    GROUP BY a.c, j.j
  ) GROUP BY c
),
c{s}_{it} AS MATERIALIZED (
  SELECT p.c,
         COALESCE(
           (SELECT list_transform(mm.mv, x -> CAST(CAST(x AS FLOAT) AS DOUBLE))
            FROM m{s}_{it} mm WHERE mm.c = p.c),
           p.cv) AS cv
  FROM c{s}_{it - 1} p
)""")
        parts.append(f"""
esub{s} AS MATERIALIZED (SELECT vec_id, (v)[{lo}:{hi}] AS sv FROM en),
code{s} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT ee.vec_id, p.c,
           row_number() OVER (
             PARTITION BY ee.vec_id
             ORDER BY list_distance(ee.sv, p.cv) ASC, p.c ASC
           ) AS rn
    FROM esub{s} ee CROSS JOIN c{s}_{iters} p
  ) WHERE rn = 1
),
lut{s} AS MATERIALIZED (
  SELECT q.qid, p.c, list_dot_product((q.qv)[{lo}:{hi}], p.cv) AS d
  FROM (SELECT vec_id AS qid, v AS qv FROM en
        WHERE vec_id IN {_ANN_QUERY_IDS}) q
  CROSS JOIN c{s}_{iters} p
)""")
    est = " + ".join(f"lut{s}.d" for s in range(m))
    code_joins = "\n".join(
        f"  JOIN code{s} ON code{s}.vec_id = en.vec_id\n"
        f"  JOIN lut{s} ON lut{s}.qid = q.qid AND lut{s}.c = code{s}.c"
        for s in range(m)
    )
    body = ",".join(parts)
    return f"""
WITH {body},
scored AS (
  SELECT qid, vec_id,
         row_number() OVER (
           PARTITION BY qid ORDER BY est DESC, vec_id ASC
         ) AS rank
  FROM (
    SELECT q.qid, en.vec_id, {est} AS est
    FROM en CROSS JOIN (SELECT vec_id AS qid FROM en
                        WHERE vec_id IN {_ANN_QUERY_IDS}) q
{code_joins}
    WHERE en.vec_id <> q.qid
  )
)
SELECT qid, vec_id, CAST(rank AS BIGINT) AS rank FROM scored WHERE rank <= {k}
"""


@register("ann_pq_topk", oracle=_pq_oracle_sql())
def ann_pq_topk(sf_dir: str):
    """Product-quantization ANN top-k (see stages/ann.pq_topk — the
    128×-compression 100 TB vector-search layout, ADC scoring)."""
    from ntto_ray.stages.ann import pq_topk

    ids, m = _query_matrix(sf_dir)
    return pq_topk(_emb(sf_dir), ids, m, k=10)


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
