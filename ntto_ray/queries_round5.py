"""Round-5 additions: operators a 100-TB training-data pipeline wants
that no existing family covered —

* ``ann_sq8_topk`` — int8 scalar-quantized similarity search (Faiss's
  ScalarQuantizer QT_8bit shape): 4× smaller index bytes, integer-dot
  scoring, per-dim min/max "codebook" trained in one streaming pass.
* ``dedup_containment_pairs`` — ASYMMETRIC near-dup detection: token-set
  containment |A∩B| / |A| ≥ τ, which catches subset duplicates (quoted
  e-mails, boilerplate-wrapped reposts) that symmetric Jaccard misses.
  Exact, via the asymmetric prefix filter (Chaudhuri et al., ICDE'06):
  the probe side emits its (1−τ)·|A|+1 smallest token hashes, the index
  side emits ALL tokens, so every qualifying pair shares an emitted
  token; candidates verify against packed full-signature blobs in ONE
  grouped exchange (the jaccard_pairs plan, asymmetric thresholds).

Every query has an exact DuckDB oracle (integer scores / integer counts
— no float-tie risk anywhere).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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
