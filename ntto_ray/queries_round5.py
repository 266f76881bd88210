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
