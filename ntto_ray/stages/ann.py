"""Similarity search over an embedding column (``list<float>``).

- Brute-force cosine top-k: the baseline. Query matrix is broadcast once
  (``ray.put``); every batch computes a float64 matmul against it and
  emits per-batch top-k candidates; a final per-query reduction keeps the
  global top-k. Streaming — the corpus is never materialized.
- LSH-bucketed variant (random hyperplanes): the scale path — candidates
  only from matching hash buckets, recall measured against brute force in
  tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _emb_matrix(t: pa.Table) -> np.ndarray:
    col = t["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // t.num_rows
    return flat.reshape(t.num_rows, dim).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """Per-batch scoring stage: cosine of every corpus row in the batch
    against the broadcast query matrix; emits (qid, vec_id, sim) for the
    batch-local top-k only (k × nq rows per batch, not n × nq)."""

    def __init__(self, queries_ref, k: int):
        self.qids, qm = ray.get(queries_ref)
        self.qm = _normalize(qm)  # (nq, d)
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(t))  # (n, d)
        vec_ids = t["vec_id"].to_numpy()
        sims = self.qm @ m.T  # (nq, n)
        # exclude self-matches
        out_q, out_v, out_s = [], [], []
        k = min(self.k + 1, sims.shape[1])
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k]
            for j in top:
                if vec_ids[j] != qid:
                    out_q.append(qid)
                    out_v.append(int(vec_ids[j]))
                    out_s.append(float(row[j]))
        return pa.Table.from_arrays(
            [
                pa.array(np.array(out_q, dtype=np.int64)),
                pa.array(np.array(out_v, dtype=np.int64)),
                pa.array(np.array(out_s, dtype=np.float64)),
            ],
            names=["qid", "vec_id", "sim"],
        )


def brute_force_topk(
    embeddings: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    with_sim: bool = False,
) -> ray.data.Dataset:
    """Global top-k neighbors per query: batch-local top-k (map) → per-qid
    reduction (one small shuffle over k×nq×nbatches candidate rows).
    Output: qid, vec_id, rank (sim included when ``with_sim``)."""
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix)))
    cands = embeddings.map_batches(
        BruteForceTopK,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={"queries_ref": ref, "k": k},
    )

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        cols = ["qid", "vec_id", "rank"] + (["sim"] if with_sim else [])
        return g[cols]

    return cands.groupby("qid").map_groups(reduce_group, batch_format="pandas")


class HyperplaneLSH:
    """Random-hyperplane signatures: sign pattern of ``nbits`` fixed
    hyperplanes (seeded) → integer bucket. Stage emits (vec_id, bucket)."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, nbits))

    def bucket(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes) > 0
        weights = (1 << np.arange(signs.shape[1])).astype(np.int64)
        return (signs * weights).sum(axis=1).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        return t.append_column("bucket", pa.array(self.bucket(m)))


def lsh_topk(
    embeddings: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    dim: int = 64,
    nbits: int = 8,
) -> ray.data.Dataset:
    """Approximate top-k: only corpus rows in a query's hyperplane bucket
    are scored (bucket pruning via a vectorized in-batch mask). Same
    output shape as brute force; recall < 1 by design."""
    lsh = HyperplaneLSH(dim=dim, nbits=nbits)
    qb = lsh.bucket(np.asarray(query_matrix))
    ref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix), qb)
    )

    class BucketScore:
        def __init__(self, queries_ref, k, dim, nbits):
            self.qids, qm, self.qb = ray.get(queries_ref)
            self.qm = _normalize(qm)
            self.k = k
            self.lsh = HyperplaneLSH(dim=dim, nbits=nbits)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _emb_matrix(t)
            buckets = self.lsh.bucket(m)
            nm = _normalize(m)
            vec_ids = t["vec_id"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = buckets == self.qb[qi]
                if not mask.any():
                    continue
                row = nm[mask] @ self.qm[qi]
                vids = vec_ids[mask]
                k = min(self.k + 1, len(row))
                top = np.argpartition(-row, k - 1)[:k]
                for j in top:
                    if vids[j] != qid:
                        out_q.append(qid)
                        out_v.append(int(vids[j]))
                        out_s.append(float(row[j]))
            return pa.Table.from_arrays(
                [
                    pa.array(np.array(out_q, dtype=np.int64)),
                    pa.array(np.array(out_v, dtype=np.int64)),
                    pa.array(np.array(out_s, dtype=np.float64)),
                ],
                names=["qid", "vec_id", "sim"],
            )

    cands = embeddings.map_batches(
        BucketScore,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={
            "queries_ref": ref,
            "k": k,
            "dim": dim,
            "nbits": nbits,
        },
    )

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "vec_id", "rank"]]

    return cands.groupby("qid").map_groups(reduce_group, batch_format="pandas")


def _kmeans(sample: np.ndarray, k: int, *, iters: int = 10, seed: int = 3) -> np.ndarray:
    """Tiny deterministic k-means (cosine/spherical): trains the IVF
    coarse quantizer on a driver-side sample. The sample is small by
    design (≤ a few thousand rows); the full corpus never leaves the
    cluster."""
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    embeddings: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
) -> ray.data.Dataset:
    """IVF-style approximate top-k: a coarse quantizer (spherical k-means
    over a driver-side sample) partitions the corpus into ``nlist``
    inverted lists; each query scores only vectors whose nearest centroid
    is among its ``nprobe`` closest centroids. Centroids are broadcast
    once (``ray.put``); assignment + scoring are batch matmuls. Same
    output shape as :func:`brute_force_topk`; recall < 1 by design
    (pinned vs brute force in tests).

    Scale path: nlist grows ~sqrt(corpus); the map side emits only
    batch-local top-k candidates per query, so the final per-qid
    reduction stays tiny regardless of corpus size."""
    sample = embeddings.limit(train_sample).to_pandas()
    sm = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    cent = _kmeans(sm, nlist)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    # per-query probed centroid sets
    order = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), qm, cent, order)
    )

    class IVFScore:
        def __init__(self, ref, k):
            self.qids, self.qm, self.cent, self.probe = ray.get(ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(t))
            assign = np.argmax(m @ self.cent.T, axis=1)
            vec_ids = t["vec_id"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(assign, self.probe[qi])
                if not mask.any():
                    continue
                row = m[mask] @ self.qm[qi]
                vids = vec_ids[mask]
                kk = min(self.k + 1, len(row))
                top = np.argpartition(-row, kk - 1)[:kk]
                for j in top:
                    if vids[j] != qid:
                        out_q.append(qid)
                        out_v.append(int(vids[j]))
                        out_s.append(float(row[j]))
            return pa.Table.from_arrays(
                [
                    pa.array(np.array(out_q, dtype=np.int64)),
                    pa.array(np.array(out_v, dtype=np.int64)),
                    pa.array(np.array(out_s, dtype=np.float64)),
                ],
                names=["qid", "vec_id", "sim"],
            )

    cands = embeddings.map_batches(
        IVFScore,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={"ref": ref, "k": k},
    )

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "vec_id", "rank"]]

    return cands.groupby("qid").map_groups(reduce_group, batch_format="pandas")


def cosine_pairs(
    embeddings: ray.data.Dataset, *, threshold: float = 0.4
) -> ray.data.Dataset:
    """Embedding near-dup pairs: cosine ≥ threshold among vectors sharing
    a ``label`` block (the blocking assumption — near-dups share label).
    In-block all-pairs matmul per group."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        m = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        sims = m @ m.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = sims[a, b] >= threshold
        return pd.DataFrame(
            {
                "vec_a": pd.Series(ids[a[keep]], dtype="int64"),
                "vec_b": pd.Series(ids[b[keep]], dtype="int64"),
            }
        )

    return embeddings.groupby("label").map_groups(pairs, batch_format="pandas")
