"""Extended text/dedup operators (round 2): end-to-end corpus dedup
(keep one canonical doc per near-dup component), per-doc TF-IDF top
terms, and global bigram counts — each with an exact DuckDB oracle.

Exactness discipline: scoring stays in INTEGER arithmetic (scaled
integer division) so Ray-vs-SQL value hashes cannot diverge on float
ulps or log() implementations."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ntto_ray.registry import register
from ntto_ray.queries_text import _CC_SQL, _docs


# --- end-to-end corpus dedup ----------------------------------------------

@register(
    "dedup_keep_canonical",
    oracle=f"""
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM ({_CC_SQL}) WHERE component != doc_id
)
""",
)
def dedup_keep_canonical(sf_dir: str):
    """The full corpus-dedup decision: exact Jaccard pairs → connected
    components → drop every member whose component representative (min
    doc id) is another doc. The dropped-id set is result-scale
    (bounded by the dup rate), so it broadcasts via ``ray.put`` and the
    corpus filter is one vectorized ``is_in`` map — no extra shuffle."""
    import ray

    from ntto_ray.stages.dedup import jaccard_pairs
    from ntto_ray.stages.graph import connected_components

    pairs = jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold_pct=90)
    labels = connected_components(pairs)
    lab = labels.to_pandas()
    dropped = lab.loc[lab["component"] != lab["doc_id"], "doc_id"].to_numpy(
        dtype=np.int64
    )
    ref = ray.put(np.sort(dropped))

    class DropDups:
        def __init__(self, ref):
            self.dropped = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            keep = ~np.isin(ids, self.dropped)
            return pa.table({"doc_id": ids[keep]})

    # id-only read for the filter pass — the text column (the bulk of the
    # bytes) is not re-scanned just to be dropped
    return _docs(sf_dir, ["doc_id"]).map_batches(
        DropDups,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"ref": ref},
    )


# --- per-doc TF-IDF top terms ---------------------------------------------

_TFIDF_K = 3
_TFIDF_SCALE = 1000


@register(
    "text_tfidf_top_terms",
    oracle=f"""
WITH t AS (
  SELECT doc_id, tok, count(*) AS tf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  ) GROUP BY 1, 2
),
d AS (SELECT tok, count(*) AS df FROM t GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
s AS (
  SELECT t.doc_id, t.tok, t.tf, d.df,
         (t.tf * {_TFIDF_SCALE} * (SELECT n FROM n)) // d.df AS score,
         row_number() OVER (
           PARTITION BY t.doc_id
           ORDER BY (t.tf * {_TFIDF_SCALE} * (SELECT n FROM n)) // d.df DESC,
                    t.tok ASC
         ) AS rn
  FROM t JOIN d USING (tok)
)
SELECT doc_id, tok AS term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(score AS BIGINT) AS score, CAST(rn AS BIGINT) AS rank
FROM s WHERE rn <= {_TFIDF_K}
""",
)
def text_tfidf_top_terms(sf_dir: str):
    """Top-3 distinguishing terms per doc by scaled integer TF-IDF
    (``score = tf * 1000 * N // df`` — idf-monotone in 1/df, float-free
    and hash-stable). Two exchanges: (1) token-keyed, where each token
    run computes its global document frequency and stamps it on every
    (doc, token, tf) row; (2) doc-keyed, where each doc run ranks its
    terms and keeps the top 3. Per-batch (doc, token) tf partials come
    from one C++ group_by — per-doc token multisets never leave the
    batch un-compressed."""
    from ntto_ray.stages.exchange import hash_grouped, runs

    docs = _docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()

    def tf_rows(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], pattern=" ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(t["doc_id"].to_numpy(), n)
        g = (
            pa.table({"doc_id": doc, "tok": flat})
            .group_by(["doc_id", "tok"])
            .aggregate([([], "count_all")])
        )
        return g.select(["doc_id", "tok", "count_all"]).rename_columns(
            ["doc_id", "tok", "tf"]
        )

    by_tok = hash_grouped(
        docs.map_batches(tf_rows, batch_format="pyarrow"), ["tok"], sort=True
    )

    df_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("tok", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
        ]
    )

    def stamp_df(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return df_schema.empty_table()
        tok = t["tok"].to_numpy(zero_copy_only=False)
        starts, ends = runs(tok)
        # rows per token run = distinct docs containing it (tf_rows makes
        # (doc, tok) unique per doc) — one vectorized repeat, no loop
        df = np.repeat(ends - starts, ends - starts)
        return pa.Table.from_arrays(
            [t["doc_id"], t["tok"], t["tf"].cast(pa.int64()), pa.array(df)],
            schema=df_schema,
        )

    stamped = by_tok.map_batches(stamp_df, batch_size=None, batch_format="pyarrow")
    by_doc = hash_grouped(stamped, ["doc_id"], sort=True)

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("score", pa.int64()),
            ("rank", pa.int64()),
        ]
    )

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return out_schema.empty_table()
        doc = t["doc_id"].to_numpy()
        tok = t["tok"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy()
        df = t["df"].to_numpy()
        score = (tf * _TFIDF_SCALE * n_docs) // df
        cols = {k: [] for k in out_schema.names}
        starts, ends = runs(doc)
        for s, e in zip(starts, ends):
            order = np.lexsort((tok[s:e], -score[s:e]))[:_TFIDF_K]
            k = len(order)
            cols["doc_id"].append(np.full(k, doc[s]))
            cols["term"].append(tok[s:e][order])
            cols["tf"].append(tf[s:e][order])
            cols["df"].append(df[s:e][order])
            cols["score"].append(score[s:e][order])
            cols["rank"].append(np.arange(1, k + 1, dtype=np.int64))
        if not cols["doc_id"]:
            return out_schema.empty_table()
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(cols["doc_id"]), type=pa.int64()),
                pa.array(np.concatenate(cols["term"]), type=pa.string()),
                pa.array(np.concatenate(cols["tf"]), type=pa.int64()),
                pa.array(np.concatenate(cols["df"]), type=pa.int64()),
                pa.array(np.concatenate(cols["score"]), type=pa.int64()),
                pa.array(np.concatenate(cols["rank"]), type=pa.int64()),
            ],
            schema=out_schema,
        )

    return by_doc.map_batches(topk, batch_size=None, batch_format="pyarrow")


# --- global bigram counts --------------------------------------------------

_BIGRAM_K = 50


@register(
    "text_bigram_counts",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
b AS (
  SELECT t[i] || ' ' || t[i+1] AS bigram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
)
SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY 1
ORDER BY cnt DESC, bigram ASC
LIMIT {_BIGRAM_K}
""",
)
def text_bigram_counts(sf_dir: str):
    """Global top-50 bigrams: per-batch vectorized bigram join (one Arrow
    binary_join over the shifted flat token array) + C++ partial counts,
    one grouped aggregate, sort + limit. The n-gram vocabulary pass every
    tokenizer-training pipeline starts with."""
    from ray.data.aggregate import Sum

    from ntto_ray.stages.dedup import _tokenize

    docs = _docs(sf_dir, ["doc_id", "text"])

    def bigram_counts(t: pa.Table) -> pa.Table:
        flat, offsets = _tokenize(t["text"].combine_chunks())
        if len(flat) < 2:
            return pa.table(
                {"bigram": pa.array([], type=pa.string()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        parent = np.repeat(
            np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
        )
        mask = parent[:-1] == parent[1:]
        big = pc.binary_join_element_wise(
            pa.array(flat[:-1][mask], type=pa.string()),
            pa.array(flat[1:][mask], type=pa.string()),
            " ",
        )
        g = pa.table({"bigram": big}).group_by("bigram").aggregate([([], "count_all")])
        return g.select(["bigram", "count_all"]).rename_columns(["bigram", "cnt"])

    return (
        docs.map_batches(bigram_counts, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "bigram"], descending=[True, False])
        .limit(_BIGRAM_K)
    )


# --- PII scrubbing (regex redaction) ----------------------------------------

# RE2 patterns — identical semantics in pyarrow (count/replace_substring_regex)
# and DuckDB (regexp_extract_all/regexp_replace): both engines are RE2.
_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RX = r"https?://[^ ]+"

# The synthetic corpus contains no PII, so the query plants a
# deterministic fixture first (mirrored byte-for-byte in the oracle):
# every doc gains one email + one URL derived from its id, and docs with
# id % 5 == 0 gain a second email. The operator under test is the
# scrub itself: count occurrences, redact, fingerprint the redacted text.
_PII_SQL = """
SELECT doc_id,
       text || ' contact user' || doc_id || '@example.com see https://ex.org/d/'
            || doc_id
            || CASE WHEN doc_id % 5 = 0
                    THEN ' cc admin' || doc_id || '@ex.net' ELSE '' END
         AS ptext
FROM documents
"""


@register(
    "text_pii_scrub",
    oracle=f"""
WITH p AS ({_PII_SQL})
SELECT doc_id,
       CAST(len(regexp_extract_all(ptext, '{_EMAIL_RX}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(ptext, '{_URL_RX}')) AS BIGINT) AS n_urls,
       md5(regexp_replace(regexp_replace(ptext, '{_EMAIL_RX}', '<EMAIL>', 'g'),
                          '{_URL_RX}', '<URL>', 'g')) AS scrub_md5
FROM p
""",
)
def text_pii_scrub(sf_dir: str):
    """PII redaction over the document stream: count + scrub emails and
    URLs with compiled RE2 kernels (pyarrow count/replace_substring_regex
    — one C++ pass per pattern, no per-row Python except the md5
    fingerprint of the scrubbed text). The deterministic PII fixture is
    injected in the same batch (the corpus itself is PII-free)."""
    import hashlib

    docs = _docs(sf_dir, ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        ids_s = pc.cast(ids, pa.string())
        extra = pc.if_else(
            pc.equal(pc.subtract(ids, pc.multiply(pc.divide(ids, 5), 5)), 0),
            pc.binary_join_element_wise(" cc admin", ids_s, "@ex.net", ""),
            "",
        )
        ptext = pc.binary_join_element_wise(
            t["text"],
            " contact user",
            ids_s,
            "@example.com see https://ex.org/d/",
            ids_s,
            extra,
            "",
        )
        n_emails = pc.count_substring_regex(ptext, _EMAIL_RX).cast(pa.int64())
        n_urls = pc.count_substring_regex(ptext, _URL_RX).cast(pa.int64())
        scrubbed = pc.replace_substring_regex(
            pc.replace_substring_regex(ptext, _EMAIL_RX, "<EMAIL>"),
            _URL_RX,
            "<URL>",
        )
        md5s = [
            hashlib.md5(x.encode()).hexdigest()
            for x in scrubbed.to_pylist()
        ]
        return pa.table(
            {
                "doc_id": ids,
                "n_emails": n_emails,
                "n_urls": n_urls,
                "scrub_md5": pa.array(md5s, type=pa.string()),
            }
        )

    return docs.map_batches(scrub, batch_format="pyarrow")


# --- repetition signals (Gopher-style quality) ------------------------------

@register(
    "text_repetition",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
tcnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
tagg AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_tok_cnt,
                CAST(sum(c) AS BIGINT) AS n_tokens
         FROM tcnt GROUP BY 1),
big AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
),
bcnt AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2),
bagg AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_cnt FROM bcnt GROUP BY 1)
SELECT t.doc_id, t.n_tokens, t.top_tok_cnt,
       CAST(COALESCE(b.top_bigram_cnt, 0) AS BIGINT) AS top_bigram_cnt
FROM tagg t LEFT JOIN bagg b USING (doc_id)
""",
)
def text_repetition(sf_dir: str):
    """Per-document repetition signals (the Gopher/MassiveText quality
    rules): count of the most frequent token and of the most frequent
    bigram. Document-local by construction — each doc is one row, so
    the whole operator is a single map_batches with vectorized
    tokenize + two grouped max-counts; no shuffle at any scale."""
    import pandas as pd

    from ntto_ray.stages.dedup import _tokenize

    docs = _docs(sf_dir, ["doc_id", "text"])

    def repetition(t: pa.Table) -> pa.Table:
        flat, offsets = _tokenize(t["text"].combine_chunks())
        n = t.num_rows
        parent = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        df = pd.DataFrame({"p": parent, "tok": flat})
        per_tok = df.groupby(["p", "tok"], sort=False).size()
        top_tok = per_tok.groupby(level=0).max()
        n_tokens = np.diff(offsets)
        top_big = np.zeros(n, dtype=np.int64)
        if len(flat) >= 2:
            mask = parent[:-1] == parent[1:]
            if mask.any():
                bg = pc.binary_join_element_wise(
                    pa.array(flat[:-1][mask], type=pa.string()),
                    pa.array(flat[1:][mask], type=pa.string()),
                    " ",
                )
                bdf = pd.DataFrame(
                    {"p": parent[:-1][mask], "bg": bg.to_numpy(zero_copy_only=False)}
                )
                per_bg = bdf.groupby(["p", "bg"], sort=False).size()
                tb = per_bg.groupby(level=0).max()
                top_big[tb.index.to_numpy()] = tb.to_numpy()
        out_top = np.zeros(n, dtype=np.int64)
        out_top[top_tok.index.to_numpy()] = top_tok.to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "top_tok_cnt": out_top,
                "top_bigram_cnt": top_big,
            }
        )

    return docs.map_batches(repetition, batch_format="pyarrow")


# --- text normalization ----------------------------------------------------

@register(
    "text_normalize",
    oracle=r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g')))
         AS norm_md5,
       CAST(length(trim(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g')))
         AS BIGINT) AS norm_len
FROM documents
""",
)
def text_normalize(sf_dir: str):
    """Standard training-corpus text normalization — lowercase, collapse
    whitespace runs to one space, trim — as one stateless vectorized
    map_batches (Arrow utf8_lower + one RE2 replace; both engines run
    the identical explicit class ``[ \\t\\n\\r\\f]+``, sidestepping the
    unicode-\\s divergence between Python re and RE2). The md5 content
    key is what a downstream exact-dedup would shuffle on."""
    import hashlib

    def fn(t: pa.Table) -> pa.Table:
        norm = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(t["text"]), "[ \t\n\r\f]+", " "
            ),
            " ",
        )
        md5s = pa.array(
            [hashlib.md5(s.encode()).hexdigest() for s in norm.to_pylist()],
            pa.string(),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_md5": md5s,
                "norm_len": pc.cast(pc.utf8_length(norm), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


# --- composed corpus-cleaning flagship -------------------------------------

_CLEAN_MIN_QUALITY = 50
_CLEAN_MIN_TOKENS = 10

_CLEAN_SQL = f"""
WITH RECURSIVE g AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS n_stop
  FROM documents
),
f AS MATERIALIZED (
  SELECT doc_id, text, n_tokens,
         (100 * (n_tokens - n_stop)) // greatest(n_tokens, 1) AS quality_pct
  FROM g
  WHERE n_stop > 0
    AND (100 * (n_tokens - n_stop)) // greatest(n_tokens, 1) >= {_CLEAN_MIN_QUALITY}
    AND n_tokens >= {_CLEAN_MIN_TOKENS}
),
d AS MATERIALIZED (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM f
),
p AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.toks, b.toks)) * 100
        >= 90 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
),
edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p
          UNION SELECT doc_b, doc_a FROM p),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b != r.a
),
dropped AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING least(a, min(b)) != a)
SELECT f.doc_id, CAST(f.n_tokens AS BIGINT) AS n_tokens,
       CAST(f.quality_pct AS BIGINT) AS quality_pct
FROM f WHERE f.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


@register("corpus_clean_pipeline", oracle=_CLEAN_SQL)
def corpus_clean_pipeline(sf_dir: str):
    """End-to-end LLM training-data prep composed from the suite's
    operators: language/quality gate (contains a marker stopword,
    integer quality >= 50, >= 10 tokens — one vectorized Arrow pass) →
    exact near-dup removal over the SURVIVING corpus only
    (prefix-filtered Jaccard join at 90 + min-label connected
    components, keep the min-id doc per component) → per-doc stats of
    the retained corpus.

    Scale notes: the gate runs twice (once feeding the pair join, once
    feeding the final projection) instead of materializing the filtered
    corpus — a stateless re-scan streams, a corpus-scale
    ``materialize()`` would not. The dropped-id set is result-scale
    (bounded by the dup rate) and broadcasts via ``ray.put``."""
    import ray

    from ntto_ray.stages.dedup import jaccard_pairs
    from ntto_ray.stages.graph import connected_components
    from ntto_ray.stages.text import STOPWORDS

    _GATE_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("n_tokens", pa.int64()),
            ("quality_pct", pa.int64()),
        ]
    )

    def gate(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), pattern=" ")
        n_tokens = (
            pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(parent, weights=is_stop, minlength=t.num_rows).astype(
            np.int64
        )
        quality = (100 * (n_tokens - n_stop)) // np.maximum(n_tokens, 1)
        keep = (
            (n_stop > 0)
            & (quality >= _CLEAN_MIN_QUALITY)
            & (n_tokens >= _CLEAN_MIN_TOKENS)
        )
        idx = pa.array(np.flatnonzero(keep))
        return pa.Table.from_arrays(
            [
                t["doc_id"].combine_chunks().take(idx),
                t["text"].combine_chunks().take(idx),
                pa.array(n_tokens[keep]),
                pa.array(quality[keep]),
            ],
            schema=_GATE_SCHEMA,
        )

    filtered = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        gate, batch_format="pyarrow"
    )
    pairs = jaccard_pairs(
        filtered.select_columns(["doc_id", "text"]), threshold_pct=90
    )
    lab = connected_components(pairs).to_pandas()
    dropped = lab.loc[lab["component"] != lab["doc_id"], "doc_id"].to_numpy(
        dtype=np.int64
    )
    ref = ray.put(np.sort(dropped))

    class KeepCanonical:
        def __init__(self, ref):
            self.dropped = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            keep = ~np.isin(ids, self.dropped)
            idx = pa.array(np.flatnonzero(keep))
            return pa.Table.from_arrays(
                [
                    t["doc_id"].combine_chunks().take(idx),
                    t["n_tokens"].combine_chunks().take(idx),
                    t["quality_pct"].combine_chunks().take(idx),
                ],
                names=["doc_id", "n_tokens", "quality_pct"],
            )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(gate, batch_format="pyarrow")
        .map_batches(
            KeepCanonical,
            batch_format="pyarrow",
            concurrency=(1, 4),
            fn_constructor_kwargs={"ref": ref},
        )
    )


# --- benchmark decontamination ----------------------------------------------

_DECON_MOD = 97  # docs with doc_id % 97 == 0 play the held-out benchmark set


@register(
    "text_decontaminate",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tri AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS tri
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) g
),
bench AS (SELECT DISTINCT tri FROM tri WHERE doc_id % {_DECON_MOD} = 0)
SELECT t.doc_id, CAST(count(DISTINCT t.tri) AS BIGINT) AS n_hits
FROM tri t JOIN bench b ON t.tri = b.tri
WHERE t.doc_id % {_DECON_MOD} <> 0
GROUP BY t.doc_id
""",
)
def text_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag every training document sharing a
    3-token shingle with the held-out benchmark slice (here: docs with
    ``doc_id % 97 == 0`` stand in for the eval set), reporting the count
    of DISTINCT overlapping shingles per contaminated doc.

    Scale shape: eval benchmarks are tiny relative to a 100 TB corpus,
    so the benchmark shingle set is collected once (distributed distinct
    → driver, bounded by benchmark size) and broadcast via ``ray.put``;
    the corpus side is ONE streaming pass — per batch, trigrams are
    built with two Arrow join kernels over the shifted flat token array
    and membership is a single C++ hash probe (``pc.index_in``), no
    shuffle at all. Per-doc distinct-hit counting is a packed
    ``np.unique`` over (doc, benchmark-slot) codes."""
    import ray

    from ntto_ray.stages.dedup import _tokenize

    def trigrams(t: pa.Table):
        """(doc_idx ndarray, trigram StringArray) for all 3-token windows."""
        flat, offsets = _tokenize(t["text"].combine_chunks())
        if len(flat) < 3:
            return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())
        parent = np.repeat(
            np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
        )
        mask = parent[:-2] == parent[2:]
        tri = pc.binary_join_element_wise(
            pa.array(flat[:-2][mask], type=pa.string()),
            pa.array(flat[1:-1][mask], type=pa.string()),
            pa.array(flat[2:][mask], type=pa.string()),
            " ",
        )
        return parent[:-2][mask], tri

    def bench_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        keep = pa.array(ids % _DECON_MOD == 0)
        sub = t.filter(keep)
        if sub.num_rows == 0:
            return pa.table({"tri": pa.array([], type=pa.string())})
        _, tri = trigrams(sub)
        return pa.table({"tri": pc.unique(tri)})

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench = pa.array(
        sorted(
            docs.map_batches(bench_partial, batch_format="pyarrow").unique("tri")
            or []
        ),
        type=pa.string(),
    )
    bench_ref = ray.put(bench)

    _OUT = pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())])

    class Decontaminate:
        def __init__(self, ref):
            self.bench = ray.get(ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            didx, tri = trigrams(t)
            if len(didx) == 0:
                return _OUT.empty_table()
            slot = pc.index_in(tri, value_set=self.bench)
            hit = pc.is_valid(slot).to_numpy(zero_copy_only=False)
            # benchmark docs are the eval set, not training data — skip
            hit &= ids[didx] % _DECON_MOD != 0
            if not hit.any():
                return _OUT.empty_table()
            slot_np = slot.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
            packed = didx[hit] * len(self.bench) + slot_np
            u = np.unique(packed)
            du, c = np.unique(u // len(self.bench), return_counts=True)
            return pa.table(
                {"doc_id": ids[du], "n_hits": c.astype(np.int64)}
            )

    return docs.map_batches(
        Decontaminate,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={"ref": bench_ref},
    )


# --- token-budget mixture sampling ----------------------------------------

_BUDGET_TOKENS = 20_000


def _budget_oracle() -> str:
    from ntto_ray.stages.sketch import splitmix64_sql

    return f"""
WITH d AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS ntok FROM documents
),
ns AS (SELECT count(DISTINCT source) AS n FROM d),
r AS (
  SELECT doc_id, source, ntok,
         sum(ntok) OVER (
           PARTITION BY source
           ORDER BY {splitmix64_sql("doc_id")}, doc_id
         ) AS cum
  FROM d
)
SELECT source, doc_id, CAST(ntok AS BIGINT) AS ntok,
       CAST(cum AS BIGINT) AS cum_tok
FROM r, ns WHERE cum <= {_BUDGET_TOKENS} // ns.n
"""


_BP = pa.schema(
    [
        ("source", pa.string()),
        ("doc_id", pa.int64()),
        ("ntok", pa.int64()),
        ("h", pa.int64()),
    ]
)


def _budget_prep(t: pa.Table, dropped_ref=None) -> pa.Table:
    """Per-batch (source, doc_id, ntok, hash-order) prep for the budget
    fill; ``dropped_ref`` (``ray.put`` of sorted int64 ids — broadcast
    once, object-store-local per worker) filters docs out first."""
    import ray

    from ntto_ray.stages.sketch import splitmix64

    if t.num_rows == 0:
        return _BP.empty_table()
    if dropped_ref is not None:
        dropped = ray.get(dropped_ref)
        if len(dropped):
            keep = ~np.isin(t["doc_id"].to_numpy(), dropped)
            t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return _BP.empty_table()
    ntok = pc.list_value_length(
        pc.split_pattern(t["text"], pattern=" ")
    ).cast(pa.int64())
    ids = t["doc_id"].to_numpy()
    h = splitmix64(ids.astype(np.int64).view(np.uint64))
    return pa.table(
        {
            "source": t["source"],
            "doc_id": t["doc_id"],
            "ntok": ntok,
            # top-bit flip: unsigned order == signed order, LOSSLESS
            # (a >> 1 would drop the low bit and could merge two
            # hashes whose relative order the SQL mirror still sees)
            "h": pa.array((h ^ np.uint64(1 << 63)).view(np.int64)),
        }
    )


_BOUT = pa.schema(
    [
        ("source", pa.string()),
        ("doc_id", pa.int64()),
        ("ntok", pa.int64()),
        ("cum_tok", pa.int64()),
    ]
)


def _budget_fill(prepped, quota: int):
    """Source-keyed group-safe exchange + per-block lexsort/cumsum fill
    to ``quota`` tokens per source."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return _BOUT.empty_table()
        src = t["source"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy()
        ntok = t["ntok"].to_numpy()
        h = t["h"].to_numpy()
        order = np.lexsort((ids, h, src))
        src, ids, ntok, h = src[order], ids[order], ntok[order], h[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        lens = np.diff(np.r_[starts, len(src)])
        c = np.cumsum(ntok)
        cum = c - np.repeat(c[starts] - ntok[starts], lens)
        keep = cum <= quota
        return pa.table(
            {
                "source": pa.array(src[keep].tolist(), pa.string()),
                "doc_id": ids[keep],
                "ntok": ntok[keep],
                "cum_tok": cum[keep],
            }
        )

    grouped = hash_grouped(prepped, ["source"])
    return grouped.map_batches(
        fill, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


@register("corpus_token_budget", oracle=_budget_oracle())
def corpus_token_budget(sf_dir: str):
    """Training-mixture sampling under a token budget: each source gets
    an equal share of {_BUDGET_TOKENS} tokens, filled by documents in
    deterministic pseudo-random order (splitmix64 of doc_id — an
    engine-reproducible shuffle, no RNG state) until the share is
    exhausted. ONE streaming pass computes per-doc token counts + hash
    order; one source-keyed group-safe exchange makes each source's
    running total block-local (sources are few — the blocking key is
    the mixture dimension, not the corpus); the budget scan is a
    lexsort + cumsum per block. The 100 TB variant keeps the same plan:
    per-source quota is a driver constant, the exchange moves (id,
    ntok, hash) triples only — never text."""
    ds = _docs(sf_dir, ["doc_id", "source", "text"])
    prepped = ds.map_batches(_budget_prep, batch_format="pyarrow")
    n_sources = len(ds.select_columns(["source"]).unique("source") or [])
    return _budget_fill(prepped, _BUDGET_TOKENS // max(1, n_sources))


def _curate_oracle() -> str:
    from ntto_ray.stages.sketch import splitmix64_sql

    return f"""
WITH surv AS MATERIALIZED (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
),
d AS MATERIALIZED (
  SELECT doc_id, source, len(string_split(text, ' ')) AS ntok
  FROM documents WHERE doc_id IN (SELECT doc_id FROM surv)
),
ns AS (SELECT count(DISTINCT source) AS n FROM d),
r AS (
  SELECT doc_id, source, ntok,
         sum(ntok) OVER (
           PARTITION BY source
           ORDER BY {splitmix64_sql("doc_id")}, doc_id
         ) AS cum
  FROM d
)
SELECT source, doc_id, CAST(ntok AS BIGINT) AS ntok,
       CAST(cum AS BIGINT) AS cum_tok
FROM r, ns WHERE cum <= {_BUDGET_TOKENS} // ns.n
"""


@register("corpus_curate_pipeline", oracle=_curate_oracle())
def corpus_curate_pipeline(sf_dir: str):
    """Composed curation pipeline #2: exact full-text dedup (keep the
    min-id doc per md5) → token-budget mixture sampling over the
    SURVIVING corpus. The dropped-id set is result-scale (bounded by
    the dup rate) and broadcasts into the budget prep's filter — the
    corpus itself is never materialized between stages, just re-scanned
    (the same stateless-re-scan trade corpus_clean_pipeline documents).
    One md5-keyed exchange for the dedup decision, one source-keyed
    exchange for the fill; text never enters either.

    The drop-list and surviving-source-count kernels are SHARED with
    the checkpointed variant (pipelines/curate.py) — one copy, so the
    two registered queries cannot silently diverge from their common
    oracle."""
    import ray

    from ntto_ray.pipelines.curate import (
        _surviving_source_count,
        dropped_duplicate_ids,
    )

    ds = _docs(sf_dir, ["doc_id", "source", "text"])
    ref = ray.put(dropped_duplicate_ids(sf_dir))

    prepped = ds.map_batches(
        _budget_prep, batch_format="pyarrow", fn_kwargs={"dropped_ref": ref}
    )
    n_sources = _surviving_source_count(sf_dir, ref)
    return _budget_fill(prepped, _BUDGET_TOKENS // max(1, n_sources))


@register("corpus_curate_resumable", oracle=_curate_oracle())
def corpus_curate_resumable(sf_dir: str):
    """The SAME composed curation pipeline, run through the
    checkpoint/resume harness (pipelines/curate.py): stage A (dedup drop
    list + quota) commits to a manifest, stage B (per-source budget
    fill) runs as source-hash partitions with atomic part commits — a
    killed run resumes from the last committed unit
    (tests/test_state_and_sinks.py kills after dedup and mid-fill). The
    oracle is identical to corpus_curate_pipeline: checkpointing must
    not change a single row."""
    import shutil
    import tempfile

    from ntto_ray.pipelines.curate import curate_checkpointed, read_curated

    out = tempfile.mkdtemp(prefix="ntto_ray_curate_")
    try:
        curate_checkpointed(sf_dir, out, num_partitions=4)
        return read_curated(out)
    finally:
        shutil.rmtree(out, ignore_errors=True)


# --- trigram-LM quality score ---------------------------------------------

_LM_TOP_K = 20_000


@register(
    "text_lm_score",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tri AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS tri
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) g
),
cnt AS (SELECT tri, count(*) AS c FROM tri GROUP BY tri),
top AS (SELECT tri, c FROM cnt ORDER BY c DESC, tri ASC LIMIT {_LM_TOP_K}),
s AS (
  SELECT t.doc_id, sum(COALESCE(tp.c, 0)) AS tri_total, count(*) AS tri_n
  FROM tri t LEFT JOIN top tp ON tp.tri = t.tri
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(tri_total AS BIGINT) AS tri_total,
       CAST(tri_n AS BIGINT) AS tri_n
FROM s
""",
)
def text_lm_score(sf_dir: str):
    """Statistical-LM quality score for curation (the importance-
    sampling signal): per doc, the sum of corpus-wide frequencies of
    its token trigrams under a top-{_LM_TOP_K} trigram model (OOV
    counts 0), plus the trigram count — avg frequency = total/n derives
    downstream, keeping the output integer-exact. Two passes: (1)
    trigram counts via per-batch Arrow group partials + one grouped
    Sum, then per-block partial top-K → driver merge (global top-K ⊆
    union of per-block top-Ks since counts are already global) → the
    MODEL broadcast via ray.put — the top-K cap is what makes the
    broadcast scale-independent; (2) one streaming scoring pass —
    trigrams of a doc expand inside its own row, so per-doc totals are
    final without any aggregate. Trigram strings are built with the
    Arrow binary_join_element_wise kernel, no Python string loop."""
    import ray
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["doc_id", "text"])

    def _tri_arrays(t: pa.Table):
        toks = pc.split_pattern(t["text"], pattern=" ")
        flat = pc.list_flatten(toks).combine_chunks()
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        row_off = np.concatenate([[0], np.cumsum(n)])
        c3 = np.maximum(n - 2, 0)
        total = int(c3.sum())
        if total == 0:
            return None, None
        reps = c3
        row_idx = np.repeat(np.arange(len(n), dtype=np.int64), reps)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
        )
        i0 = row_off[:-1][row_idx] + within
        idx = pa.array(i0, pa.int64())
        tri = pc.binary_join_element_wise(
            flat.take(idx),
            flat.take(pa.array(i0 + 1, pa.int64())),
            flat.take(pa.array(i0 + 2, pa.int64())),
            " ",
        )
        return tri, row_idx

    _C = pa.schema([("tri", pa.string()), ("c", pa.int64())])

    def tri_counts(t: pa.Table) -> pa.Table:
        tri, _ = _tri_arrays(t)
        if tri is None:
            return _C.empty_table()
        g = pa.table({"tri": tri}).group_by("tri").aggregate([([], "count_all")])
        return g.select(["tri", "count_all"]).rename_columns(["tri", "c"])

    counts = (
        docs.map_batches(tri_counts, batch_format="pyarrow")
        .groupby("tri")
        .aggregate(Sum("c", alias_name="c"))
    )

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tri" not in t.column_names:
            return _C.empty_table()
        tri = t["tri"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy()
        order = np.lexsort((tri, -c))[:_LM_TOP_K]
        return pa.table(
            {"tri": pa.array(tri[order].tolist(), pa.string()), "c": c[order]}
        )

    merged = (
        counts.map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["c", "tri"], ascending=[False, True], kind="mergesort")
        .head(_LM_TOP_K)
    )
    model_tri = merged["tri"].to_numpy(dtype=np.str_)
    model_c = merged["c"].to_numpy()
    order = np.argsort(model_tri)
    ref = ray.put((model_tri[order], model_c[order]))

    _OUT = pa.schema(
        [("doc_id", pa.int64()), ("tri_total", pa.int64()), ("tri_n", pa.int64())]
    )

    def score(t: pa.Table, *, ref=ref) -> pa.Table:
        tri, row_idx = _tri_arrays(t)
        if tri is None:
            return _OUT.empty_table()
        mt, mc = ray.get(ref)
        tn = tri.to_numpy(zero_copy_only=False).astype(np.str_)
        if len(mt):
            pos = np.searchsorted(mt, tn)
            hit = (pos < len(mt)) & (mt[np.minimum(pos, len(mt) - 1)] == tn)
            cvals = np.where(hit, mc[np.minimum(pos, len(mt) - 1)], 0)
        else:
            cvals = np.zeros(len(tn), dtype=np.int64)
        k = int(row_idx.max()) + 1
        tot = np.zeros(k, dtype=np.int64)
        np.add.at(tot, row_idx, cvals)
        ntri = np.bincount(row_idx, minlength=k).astype(np.int64)
        ids = t["doc_id"].to_numpy()[:k]
        keep = ntri > 0
        return pa.table(
            {
                "doc_id": ids[keep],
                "tri_total": tot[keep],
                "tri_n": ntri[keep],
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# --- training-chunk planning (fixed token windows with overlap) -----------

_CHUNK = 64
_OVERLAP = 8


@register(
    "text_chunking",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
m AS (SELECT doc_id, t, len(t) AS n FROM toks),
c AS (
  SELECT doc_id, t, n,
         1 + greatest(0, (n - {_CHUNK} + {_CHUNK - _OVERLAP - 1})
                         // {_CHUNK - _OVERLAP}) AS nc
  FROM m
),
ch AS (
  SELECT doc_id, t, n, unnest(generate_series(0, nc - 1)) AS i FROM c
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {_CHUNK - _OVERLAP} AS BIGINT) AS start_tok,
       CAST(least({_CHUNK}, n - i * {_CHUNK - _OVERLAP}) AS BIGINT) AS n_tok,
       t[i * {_CHUNK - _OVERLAP} + 1] AS first_tok,
       t[i * {_CHUNK - _OVERLAP}
         + least({_CHUNK}, n - i * {_CHUNK - _OVERLAP})] AS last_tok
FROM ch
""",
)
def text_chunking(sf_dir: str):
    """Training-chunk planning — the sequence-packing step of an LLM
    data pipeline: each doc splits into {_CHUNK}-token windows sliding
    by {_CHUNK}-{_OVERLAP} (so consecutive chunks share {_OVERLAP}
    tokens); the final window keeps whatever remains (≥ {_OVERLAP}+1
    tokens by construction). Pure row expansion inside each doc's own
    row — zero shuffles, one streaming pass; chunk boundaries plus
    first/last boundary tokens come out vectorized (repeat/cumsum
    index arithmetic + two Arrow takes). A real chunker swaps the
    whitespace tokens for BPE ids in the same kernel shape."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    step = _CHUNK - _OVERLAP

    _OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_idx", pa.int64()),
            ("start_tok", pa.int64()),
            ("n_tok", pa.int64()),
            ("first_tok", pa.string()),
            ("last_tok", pa.string()),
        ]
    )

    def chunks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        toks = pc.split_pattern(t["text"], pattern=" ")
        flat = pc.list_flatten(toks).combine_chunks()
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        row_off = np.concatenate([[0], np.cumsum(n)])
        nc = 1 + np.maximum(0, (n - _CHUNK + step - 1) // step)
        total = int(nc.sum())
        row_idx = np.repeat(np.arange(len(n), dtype=np.int64), nc)
        ci = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(nc)[:-1]]), nc
        )
        start = ci * step
        n_tok = np.minimum(_CHUNK, n[row_idx] - start)
        first_i = row_off[:-1][row_idx] + start
        last_i = first_i + n_tok - 1
        return pa.table(
            {
                "doc_id": t["doc_id"].to_numpy()[row_idx],
                "chunk_idx": ci,
                "start_tok": start,
                "n_tok": n_tok,
                "first_tok": flat.take(pa.array(first_i, pa.int64())),
                "last_tok": flat.take(pa.array(last_i, pa.int64())),
            }
        )

    return docs.map_batches(chunks, batch_format="pyarrow")


# --- passage-level exact dedup (CCNet-style sub-document dedup) ------------

_DC_W = 32  # tokens per non-overlapping passage


@register(
    "dedup_chunks",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
m AS (SELECT doc_id, tk, len(tk) AS n FROM toks),
ch AS (
  SELECT doc_id, tk, unnest(generate_series(0, (n + {_DC_W - 1}) // {_DC_W} - 1)) AS i
  FROM m
),
chunks AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         array_to_string(tk[i * {_DC_W} + 1 : (i + 1) * {_DC_W}], ' ') AS chunk
  FROM ch
),
ranked AS (
  SELECT doc_id, chunk_idx,
         row_number() OVER (PARTITION BY chunk
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
)
SELECT doc_id, chunk_idx FROM ranked WHERE rn > 1
""",
)
def dedup_chunks(sf_dir: str):
    """Passage-level exact dedup (the sub-document pass of CCNet /
    RefinedWeb-style pipelines): each doc splits into non-overlapping
    {W}-token passages; any passage whose exact text already appeared at
    a lower (doc_id, chunk_idx) is reported dropped. Plan: vectorized
    passage build (the text_chunking index arithmetic + ListArray slices
    + binary_join — no Python loop) → ONE passage-keyed hash exchange
    (the passage string is the shuffle key, so verify is block-local) →
    keep-first-drop-rest per group, vectorized via sorted runs. Dropped
    rows are result-scale; the corpus streams through exactly one
    all-to-all."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    _CH = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_idx", pa.int64()),
            ("chunk", pa.string()),
        ]
    )
    _OUT = pa.schema([("doc_id", pa.int64()), ("chunk_idx", pa.int64())])

    def passages(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return _CH.empty_table()
        toks = pc.split_pattern(t["text"], pattern=" ")
        flat = pc.list_flatten(toks).combine_chunks()
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        row_off = np.concatenate([[0], np.cumsum(n)])
        nc = (n + _DC_W - 1) // _DC_W  # empty text → n=1 ([""]) → 1 chunk
        total = int(nc.sum())
        row_idx = np.repeat(np.arange(len(n), dtype=np.int64), nc)
        ci = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(nc)[:-1]]), nc
        )
        start = row_off[row_idx] + ci * _DC_W
        # passages tile the flattened token array exactly (consecutive
        # within a doc, docs consecutive), so starts + final end form a
        # valid monotone offset vector.
        offsets = np.concatenate([start, [row_off[-1]]]).astype(np.int64)
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), flat
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(row_idx, pa.int64())),
                "chunk_idx": pa.array(ci),
                "chunk": pc.binary_join(la, " "),
            }
        )

    def drop_rest(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "chunk" not in t.column_names:
            return _OUT.empty_table()
        from ntto_ray.stages.exchange import runs

        s = t.sort_by(
            [
                ("chunk", "ascending"),
                ("doc_id", "ascending"),
                ("chunk_idx", "ascending"),
            ]
        )
        key = s["chunk"].to_numpy(zero_copy_only=False)
        starts, _ = runs(key)
        keep_first = np.zeros(len(key), dtype=bool)
        keep_first[starts] = True
        dropped = pa.array(~keep_first)
        return pa.table(
            {
                "doc_id": s["doc_id"].filter(dropped),
                "chunk_idx": s["chunk_idx"].filter(dropped),
            }
        )

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    ch = docs.map_batches(passages, batch_format="pyarrow")
    grouped = hash_grouped(ch, ["chunk"])
    return grouped.map_batches(
        drop_rest, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
