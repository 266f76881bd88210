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
import pyarrow as pa

import ray
import ray.data


def _topk_reduce(
    cands: ray.data.Dataset,
    k: int,
    *,
    with_sim: bool = False,
    reserve_cpus: bool = True,
) -> ray.data.Dataset:
    """Global per-qid top-k over the batch-local candidates: one small
    qid-keyed exchange (candidate volume is k × nq × nbatches, never
    corpus-scale) + a vectorized run kernel — the final reduce stays on
    the Arrow path instead of hopping through pandas map_groups.
    Ordering matches the SQL mirror's row_number: sim DESC, vec_id ASC."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS
    from ntto_ray.stages.exchange import hash_grouped as _hash_grouped
    from ntto_ray.stages.exchange import runs as _runs

    names = ["qid", "vec_id", "rank"] + (["sim"] if with_sim else [])
    types = {
        "qid": pa.int64(),
        "vec_id": pa.int64(),
        "rank": pa.int64(),
        "sim": pa.float64(),
    }
    schema = pa.schema([(n, types[n]) for n in names])

    def kern(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "qid" not in t.column_names:
            return schema.empty_table()
        qid = t["qid"].to_numpy()
        vid = t["vec_id"].to_numpy()
        sim = t["sim"].to_numpy()
        order = np.lexsort((vid, -sim, qid))
        qid, vid, sim = qid[order], vid[order], sim[order]
        starts, ends = _runs(qid)
        lens = np.minimum(ends - starts, k)
        within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        )
        idx = np.repeat(starts, lens) + within
        cols = {
            "qid": pa.array(qid[idx]),
            "vec_id": pa.array(vid[idx]),
            "rank": pa.array(within + 1),
            "sim": None if not with_sim else pa.array(sim[idx]),
        }
        return pa.Table.from_arrays([cols[n] for n in names], schema=schema)

    # candidates are tiny — a narrow 8-way exchange bounds fixed overhead
    grouped = _hash_grouped(
        cands, ["qid"], parallelism=8, sort=False, reserve_cpus=reserve_cpus
    )
    return grouped.map_batches(
        kern, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


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

    return _topk_reduce(cands, k, with_sim=with_sim)


class RangeSearch:
    """Per-batch range-search stage: every corpus row in the batch whose
    cosine similarity to any broadcast query meets ``threshold`` is
    emitted as (qid, vec_id). Zero shuffle — the output IS the answer
    (no reduce needed: range search has no cross-batch ranking), so the
    stage streams at corpus scale with per-task memory bounded by one
    batch × nq floats."""

    def __init__(self, queries_ref, threshold: float):
        self.qids, qm = ray.get(queries_ref)
        self.qm = _normalize(qm)  # (nq, d)
        self.thr = float(threshold)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "vec_id" not in t.column_names:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                }
            )
        m = _normalize(_emb_matrix(t))  # (n, d)
        vec_ids = t["vec_id"].to_numpy()
        sims = self.qm @ m.T  # (nq, n)
        qi, ci = np.nonzero(sims >= self.thr)
        qids = self.qids[qi]
        vids = vec_ids[ci].astype(np.int64)
        keep = qids != vids  # exclude self-matches
        return pa.table(
            {
                "qid": pa.array(qids[keep]),
                "vec_id": pa.array(vids[keep]),
            }
        )


def range_search(
    embeddings: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    threshold: float,
) -> ray.data.Dataset:
    """All corpus vectors within cosine ``threshold`` of each query —
    the radius-query sibling of :func:`brute_force_topk` (same broadcast
    + batched-matmul shape, but no top-k reduce at all)."""
    ref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix))
    )
    return embeddings.map_batches(
        RangeSearch,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={"queries_ref": ref, "threshold": threshold},
    )


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

    return _topk_reduce(cands, k)


def _kmeans(sample: np.ndarray, k: int, *, iters: int = 10) -> np.ndarray:
    """Tiny deterministic k-means (cosine/spherical): trains the IVF
    coarse quantizer on a driver-side sample. The sample is small by
    design (≤ a few thousand rows); the full corpus never leaves the
    cluster.

    Every step is chosen to be SQL-MIRRORABLE so the whole IVF query has
    an exact DuckDB oracle: seeds are the first k sample rows (no RNG),
    assignment ties break to the LOWEST centroid id, empty clusters keep
    their previous centroid, and centroids are QUANTIZED to float32
    after each normalize — the quantum (~6e-8 relative) absorbs the
    last-ulp summation-order differences between numpy's pairwise sums
    and SQL's sequential aggregates that would otherwise let assignments
    drift chaotically between the two implementations."""
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    cent = sample[: min(k, len(sample))].copy()
    cent = cent.astype(np.float32).astype(np.float64)
    for _ in range(iters):
        sims = sample @ cent.T
        assign = np.argmax(sims, axis=1)  # first max = lowest centroid id
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent).astype(np.float32).astype(np.float64)
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
    # deterministic sample rule (vec_id < train_sample, ascending) — a
    # SQL-expressible predicate, unlike limit()'s read-order dependence
    sample = (
        embeddings.filter(expr=f"vec_id < {int(train_sample)}")
        .to_pandas()
        .sort_values("vec_id")
    )
    sm = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    cent = _kmeans(sm, nlist)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    # per-query probed centroid sets; stable sort → ties to lowest id
    order = np.argsort(-(qm @ cent.T), axis=1, kind="stable")[:, :nprobe]
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

    return _topk_reduce(cands, k)


def semantic_dedup(
    embeddings: ray.data.Dataset,
    *,
    nlist: int = 16,
    threshold: float = 0.3,
    train_sample: int = 4096,
) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the corpus with the spherical k-means coarse
    quantizer, then WITHIN each cluster drop every vector that has a
    lower-vec_id neighbor at cosine >= ``threshold``. Returns the KEPT
    rows as (vec_id, cluster).

    Scale shape: centroids broadcast once; assignment is a zero-shuffle
    batch matmul; ONE cluster-keyed hash exchange co-locates each cluster
    whole; the O(|cluster|^2 d) pairwise verify is the SemDeDup
    trade-off — nlist must grow ~N/target_cluster_size so per-task work
    stays bounded (the paper uses 50k clusters for LAION-440M). The
    greedy lower-id-wins rule (not transitive-closure canonical) is the
    paper's semantics and is exactly SQL-mirrorable."""
    sample = (
        embeddings.filter(expr=f"vec_id < {int(train_sample)}")
        .to_pandas()
        .sort_values("vec_id")
    )
    sm = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    cent = _kmeans(sm, nlist)
    cref = ray.put(cent)

    _ASSIGNED = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("c", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
        ]
    )

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "vec_id" not in t.column_names:
            return _ASSIGNED.empty_table()
        m = _normalize(_emb_matrix(t))
        c = np.argmax(m @ ray.get(cref).T, axis=1)  # ties → lowest id
        return pa.table(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "c": pa.array(c.astype(np.int64)),
                "embedding": t["embedding"].cast(pa.list_(pa.float32())),
            }
        )

    _KEPT = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64())])

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c" not in t.column_names:
            return _KEPT.empty_table()
        from ntto_ray.stages.exchange import runs

        c = t["c"].to_numpy()
        vid = t["vec_id"].to_numpy()
        m = _normalize(_emb_matrix(t))
        keep = np.ones(len(vid), dtype=bool)
        starts, ends = runs(c)  # block sorted by c → contiguous clusters
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            idx = np.argsort(vid[s:e], kind="stable") + s
            sims = m[idx] @ m[idx].T
            # drop j if ANY lower-vec_id i in the cluster has sim >= thr
            dropped = np.triu(sims >= threshold, k=1).any(axis=0)
            keep[idx[dropped]] = False
        return pa.table(
            {
                "vec_id": pa.array(vid[keep].astype(np.int64)),
                "cluster": pa.array(c[keep].astype(np.int64)),
            }
        )

    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    assigned = embeddings.map_batches(assign, batch_format="pyarrow")
    grouped = hash_grouped(assigned, ["c"])
    return grouped.map_batches(
        verify, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


def _kmeans_l2(sample: np.ndarray, k: int, *, iters: int = 6) -> np.ndarray:
    """Plain-L2 k-means for PQ sub-quantizer training, engineered
    SQL-MIRRORABLE with the same tricks as :func:`_kmeans`: first-k
    seeding (no RNG), argmin over sqrt'd distances with ties to the
    LOWEST centroid id (sqrt matters: two distinct squared distances can
    round to the same sqrt, which the SQL mirror — ``list_distance`` —
    would tie-break by id), empty clusters keep their previous centroid,
    and centroids are float32-quantized after every mean update so
    numpy-vs-SQL summation-order ulps cannot drift assignments."""
    sample = np.asarray(sample, dtype=np.float64)
    cent = sample[: min(k, len(sample))].astype(np.float32).astype(np.float64)
    for _ in range(iters):
        d = np.sqrt(((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2))
        assign = np.argmin(d, axis=1)  # first min = lowest centroid id
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = cent.astype(np.float32).astype(np.float64)
    return cent


def pq_topk(
    embeddings: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    m: int = 4,
    ksub: int = 16,
    iters: int = 6,
    train_sample: int = 4096,
) -> ray.data.Dataset:
    """Product-quantization approximate top-k (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"): the vector
    space splits into ``m`` subspaces; each trains a ``ksub``-centroid
    L2 sub-quantizer on a driver-side sample; every corpus vector is
    encoded as ``m`` small codes and scored against a query by summing
    per-subspace lookup-table entries (asymmetric distance computation).

    Scale story — THE 100 TB vector-search layout: codes are m bytes
    per vector (here 4 B vs 512 B raw, 128×), so a persisted PQ index
    keeps billions of vectors in memory per node and the scoring pass
    is a pure table lookup + add. This one-shot query encodes and
    scores in the same pass (no persisted index in the sandbox), but
    the codebook broadcast (``ray.put`` once), per-batch vectorized
    encode (argmin over (batch × ksub × dsub) distances), and
    batch-local top-k reduction are exactly the persisted-index
    runtime shape.

    Exactness contract: ties are COMMON in PQ (same codes → identical
    score), so batch-local selection sorts by (est DESC, vec_id ASC) —
    the same total order as the SQL mirror's ``row_number`` — instead
    of an order-unstable argpartition."""
    sample = (
        embeddings.filter(expr=f"vec_id < {int(train_sample)}")
        .to_pandas()
        .sort_values("vec_id")
    )
    sm = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    dim = sm.shape[1]
    dsub = dim // m
    cents = [
        _kmeans_l2(sm[:, s * dsub : (s + 1) * dsub], ksub, iters=iters)
        for s in range(m)
    ]
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    # per-subspace query lookup tables: lut[s][qi, c] = q_s · cent_c
    luts = [qm[:, s * dsub : (s + 1) * dsub] @ cents[s].T for s in range(m)]
    ref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), cents, luts, dsub)
    )

    class PQScore:
        def __init__(self, ref, k):
            self.qids, self.cents, self.luts, self.dsub = ray.get(ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            mnorm = _normalize(_emb_matrix(t))
            vec_ids = t["vec_id"].to_numpy()
            n = len(vec_ids)
            est = np.zeros((len(self.qids), n), dtype=np.float64)
            for s, (cent, lut) in enumerate(zip(self.cents, self.luts)):
                sub = mnorm[:, s * self.dsub : (s + 1) * self.dsub]
                d = np.sqrt(
                    ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                )
                code = np.argmin(d, axis=1)
                est += lut[:, code]
            out = []
            kk = min(self.k + 1, n)
            for qi, qid in enumerate(self.qids):
                row = est[qi]
                order = np.lexsort((vec_ids, -row))[:kk]
                for j in order:
                    if vec_ids[j] != qid:
                        out.append((qid, int(vec_ids[j]), float(row[j])))
            if not out:
                return pa.table(
                    {
                        "qid": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "qid": pa.array([r[0] for r in out], pa.int64()),
                    "vec_id": pa.array([r[1] for r in out], pa.int64()),
                    "sim": pa.array([r[2] for r in out], pa.float64()),
                }
            )

    cands = embeddings.map_batches(
        PQScore,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={"ref": ref, "k": k},
    )

    return _topk_reduce(cands, k)


def ivf_pq_topk(
    embeddings: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 4,
    ksub: int = 16,
    pq_iters: int = 6,
    km_iters: int = 10,
    train_sample: int = 4096,
) -> ray.data.Dataset:
    """IVF + PQ composed — the standard billion-scale vector-search
    layout (FAISS IVFPQ; Jégou et al. 2011): a spherical-k-means coarse
    quantizer partitions the corpus into ``nlist`` inverted lists, each
    query probes its ``nprobe`` closest lists, and within the probed
    lists scoring is PQ asymmetric-distance (per-subspace codebook
    lookup + add) over ``m``-byte codes instead of raw vectors.

    Scale story: the IVF side bounds the fraction of the corpus a query
    touches (nprobe/nlist), the PQ side bounds the bytes per touched
    vector (m bytes vs 4·dim) — together a query scans ~nprobe/nlist ×
    m/(4·dim) of the raw-corpus bytes (here 1/4 × 1/64). Codes are
    encoded from the raw normalized vector (not the cell residual — the
    residual refinement is a quality trade documented in the paper,
    orthogonal to the distribution plan). Coarse centroids, probe sets,
    PQ codebooks and query LUTs broadcast once via ``ray.put``; the
    corpus pass is one vectorized encode + lookup per batch; the final
    reduce is the shared Arrow top-k.

    Exactness contract: coarse assignment ties to lowest centroid id
    (np.argmax first-max == SQL row_number ORDER BY dot DESC, c ASC),
    PQ codes tie to lowest id over sqrt'd L2, ADC sums left-associated
    — all mirrored bit-for-bit by the composed DuckDB oracle."""
    sample = (
        embeddings.filter(expr=f"vec_id < {int(train_sample)}")
        .to_pandas()
        .sort_values("vec_id")
    )
    sm = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    dim = sm.shape[1]
    dsub = dim // m
    coarse = _kmeans(sm, nlist, iters=km_iters)
    cents = [
        _kmeans_l2(sm[:, s * dsub : (s + 1) * dsub], ksub, iters=pq_iters)
        for s in range(m)
    ]
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qm @ coarse.T), axis=1, kind="stable")[:, :nprobe]
    luts = [qm[:, s * dsub : (s + 1) * dsub] @ cents[s].T for s in range(m)]
    ref = ray.put(
        (
            np.asarray(query_ids, dtype=np.int64),
            coarse,
            probe,
            cents,
            luts,
            dsub,
        )
    )

    class IVFPQScore:
        def __init__(self, ref, k):
            (
                self.qids,
                self.coarse,
                self.probe,
                self.cents,
                self.luts,
                self.dsub,
            ) = ray.get(ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            mnorm = _normalize(_emb_matrix(t))
            vec_ids = t["vec_id"].to_numpy()
            n = len(vec_ids)
            assign = np.argmax(mnorm @ self.coarse.T, axis=1)
            est = np.zeros((len(self.qids), n), dtype=np.float64)
            for s, (cent, lut) in enumerate(zip(self.cents, self.luts)):
                sub = mnorm[:, s * self.dsub : (s + 1) * self.dsub]
                d = np.sqrt(
                    ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                )
                code = np.argmin(d, axis=1)
                est += lut[:, code]
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(assign, self.probe[qi])
                if not mask.any():
                    continue
                row = est[qi][mask]
                vids = vec_ids[mask]
                kk = min(self.k + 1, len(row))
                order = np.lexsort((vids, -row))[:kk]
                for j in order:
                    if vids[j] != qid:
                        out_q.append(qid)
                        out_v.append(int(vids[j]))
                        out_s.append(float(row[j]))
            return pa.table(
                {
                    "qid": pa.array(np.asarray(out_q, np.int64)),
                    "vec_id": pa.array(np.asarray(out_v, np.int64)),
                    "sim": pa.array(np.asarray(out_s, np.float64)),
                }
            )

    cands = embeddings.map_batches(
        IVFPQScore,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={"ref": ref, "k": k},
    )
    return _topk_reduce(cands, k)


def cosine_pairs(
    embeddings: ray.data.Dataset, *, threshold: float = 0.4, tile: int = 4096
) -> ray.data.Dataset:
    """Embedding near-dup pairs: cosine ≥ threshold among vectors sharing
    a ``label`` block (the blocking assumption — near-dups share label).

    Exact all-pairs within label, as a distributed BLOCK-NESTED-LOOP
    rather than one monolithic per-group matmul (round 1's shape, whose
    memory AND compute both sat on one task as groups grow):

    1. one hash exchange co-locates each label; rows are cut into tiles
       of ``tile`` vectors;
    2. each ordered tile pair (i ≤ j) is emitted as ONE row carrying the
       two packed float32 tile matrices (binary blobs);
    3. a stateless map_batches scores tile pairs — so per-task memory is
       bounded by 2 tiles regardless of group size, and the O(G²/tile²)
       tile-pair FLOPs spread across the cluster instead of serializing
       on the task that owns the biggest label.

    Replication cost: each tile ships to ntiles partners (the standard
    distributed all-pairs trade); per-label data on the wire grows
    G·ntiles — sub-quadratic for any fixed tile size, and exact (the
    oracle stays a plain SQL self-join)."""
    import pyarrow as pa

    from ntto_ray.stages.exchange import hash_grouped, runs as _runs

    _PAIRS = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    _TILES = pa.schema(
        [
            ("ids_a", pa.binary()),
            ("m_a", pa.binary()),
            ("ids_b", pa.binary()),
            ("m_b", pa.binary()),
            ("same", pa.bool_()),
        ]
    )

    def emit_tile_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "label" not in t.column_names:
            return _TILES.empty_table()
        lab = t["label"].to_numpy(zero_copy_only=False)
        ids_all = t["vec_id"].to_numpy()
        m_all = _normalize(_emb_matrix(t)).astype(np.float32)
        rows: dict[str, list] = {k: [] for k in _TILES.names}
        starts, ends = _runs(lab)
        for s, e in zip(starts, ends):
            order = np.argsort(ids_all[s:e], kind="stable")
            ids = ids_all[s:e][order]
            m = m_all[s:e][order]
            tiles = [
                (ids[i : i + tile], m[i : i + tile])
                for i in range(0, len(ids), tile)
            ]
            for i, (ia, ma) in enumerate(tiles):
                for j in range(i, len(tiles)):
                    ib, mb = tiles[j]
                    rows["ids_a"].append(ia.tobytes())
                    rows["m_a"].append(ma.tobytes())
                    rows["ids_b"].append(ib.tobytes())
                    rows["m_b"].append(mb.tobytes())
                    rows["same"].append(i == j)
        return pa.Table.from_arrays(
            [
                pa.array(rows["ids_a"], type=pa.binary()),
                pa.array(rows["m_a"], type=pa.binary()),
                pa.array(rows["ids_b"], type=pa.binary()),
                pa.array(rows["m_b"], type=pa.binary()),
                pa.array(rows["same"], type=pa.bool_()),
            ],
            schema=_TILES,
        )

    def score_tiles(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ids_a" not in t.column_names:
            return _PAIRS.empty_table()
        out_a, out_b = [], []
        for r in range(t.num_rows):
            ia = np.frombuffer(t["ids_a"][r].as_py(), dtype=np.int64)
            ib = np.frombuffer(t["ids_b"][r].as_py(), dtype=np.int64)
            ma = np.frombuffer(t["m_a"][r].as_py(), dtype=np.float32).reshape(
                len(ia), -1
            )
            mb = np.frombuffer(t["m_b"][r].as_py(), dtype=np.float32).reshape(
                len(ib), -1
            )
            sims = ma.astype(np.float64) @ mb.astype(np.float64).T
            if t["same"][r].as_py():
                a, b = np.triu_indices(len(ia), k=1)
                keep = sims[a, b] >= threshold
                out_a.append(ia[a[keep]])
                out_b.append(ib[b[keep]])
            else:
                a, b = np.nonzero(sims >= threshold)
                out_a.append(ia[a])
                out_b.append(ib[b])
        if not out_a:
            return _PAIRS.empty_table()
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_a)),
                pa.array(np.concatenate(out_b)),
            ],
            schema=_PAIRS,
        )

    grouped = hash_grouped(embeddings, ["label"])
    tiles = grouped.map_batches(emit_tile_pairs, batch_size=None, batch_format="pyarrow")
    # small batches: each row is ~2·tile·dim·4 bytes of matrix payload
    return tiles.map_batches(score_tiles, batch_size=8, batch_format="pyarrow")


def knn_join(
    embeddings: ray.data.Dataset, *, k: int = 5, tile: int = 2048
) -> ray.data.Dataset:
    """Exact cosine kNN SELF-join: every corpus vector's global top-k
    neighbors (the kNN-graph precompute behind SemDeDup-style curation
    and graph-based ANN indexes). Output (qid, vec_id, rank).

    Scale shape — the global generalization of :func:`cosine_pairs`'s
    block-nested loop, with NO corpus-scale broadcast:

    1. deterministic tiling by ``vec_id // tile`` (dense ids → balanced
       tiles, and the rule is SQL-expressible so the oracle stays a
       plain self-join);
    2. each block packs its rows into per-tile PARTIAL tiles (a tile
       spanning blocks just yields several partials — pairing is
       unaffected) and replicates each partial to its T partner pair
       keys — the standard all-pairs replication trade: bytes on the
       wire = corpus × T, sub-quadratic for any fixed tile size;
    3. ONE pair-keyed hash exchange co-locates every (tile_a, tile_b)
       pair; the score kernel computes both directions of the tile-pair
       matmul, per-task memory bounded by the pair's partials;
    4. batch-local per-src top-k candidates (≤ k per src per partner)
       reduce through the shared Arrow :func:`_topk_reduce`.

    O(n²/tile²) tile pairs is the exact-baseline cost; the ANN family
    (lsh/ivf/pq) is the sub-quadratic scale path when recall < 1 is
    acceptable."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    hi = embeddings.max("vec_id")
    if hi is None:
        return pa.schema(
            [("qid", pa.int64()), ("vec_id", pa.int64()), ("rank", pa.int64())]
        ).empty_table()
    T = int(hi) // tile + 1

    _TILES = pa.schema(
        [
            ("pk", pa.int64()),
            ("tid", pa.int64()),
            ("ids", pa.binary()),
            ("m", pa.binary()),
        ]
    )
    _CANDS = pa.schema(
        [("qid", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
    )

    def emit_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "vec_id" not in t.column_names:
            return _TILES.empty_table()
        ids_all = t["vec_id"].to_numpy()
        m_all = _normalize(_emb_matrix(t)).astype(np.float32)
        tid_all = ids_all // tile
        order = np.argsort(tid_all, kind="stable")
        ids_all, m_all, tid_all = ids_all[order], m_all[order], tid_all[order]
        rows = {n: [] for n in _TILES.names}
        bounds = np.flatnonzero(np.r_[True, tid_all[1:] != tid_all[:-1]])
        bounds = np.r_[bounds, len(tid_all)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            tid = int(tid_all[s])
            blob_i, blob_m = ids_all[s:e].tobytes(), m_all[s:e].tobytes()
            for partner in range(T):
                a, b = min(tid, partner), max(tid, partner)
                rows["pk"].append(a * T + b)
                rows["tid"].append(tid)
                rows["ids"].append(blob_i)
                rows["m"].append(blob_m)
        return pa.Table.from_arrays(
            [
                pa.array(rows["pk"], pa.int64()),
                pa.array(rows["tid"], pa.int64()),
                pa.array(rows["ids"], pa.binary()),
                pa.array(rows["m"], pa.binary()),
            ],
            schema=_TILES,
        )

    def _side(t: pa.Table, rows: np.ndarray):
        ids = [
            np.frombuffer(t["ids"][int(r)].as_py(), dtype=np.int64)
            for r in rows
        ]
        ms = [
            np.frombuffer(t["m"][int(r)].as_py(), dtype=np.float32)
            for r in rows
        ]
        i = np.concatenate(ids)
        return i, np.concatenate(ms).reshape(len(i), -1).astype(np.float64)

    def _local_topk(src, dst, sims, out):
        # per-src top-k (self-pairs pre-masked by the caller via -inf)
        kk = min(k, sims.shape[1])
        if kk == 0:
            return
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        r = np.repeat(src, kk)
        c = dst[part.ravel()]
        s = np.take_along_axis(sims, part, axis=1).ravel()
        good = np.isfinite(s)
        out.append((r[good], c[good], s[good]))

    def score_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pk" not in t.column_names:
            return _CANDS.empty_table()
        pk = t["pk"].to_numpy()
        tid = t["tid"].to_numpy()
        out: list = []
        from ntto_ray.stages.exchange import runs as _runs

        starts, ends = _runs(pk)  # block sorted by pk
        for s, e in zip(starts, ends):
            key = int(pk[s])
            a, b = key // T, key % T
            rows = np.arange(s, e)
            ra = rows[tid[s:e] == a]
            rb = rows[tid[s:e] == b]
            if a == b:
                if len(ra) == 0:
                    continue
                ia, ma = _side(t, ra)
                sims = ma @ ma.T
                sims[ia[:, None] == ia[None, :]] = -np.inf  # mask self
                _local_topk(ia, ia, sims, out)
            else:
                if len(ra) == 0 or len(rb) == 0:
                    continue
                ia, ma = _side(t, ra)
                ib, mb = _side(t, rb)
                sims = ma @ mb.T
                _local_topk(ia, ib, sims, out)
                _local_topk(ib, ia, sims.T.copy(), out)
        if not out:
            return _CANDS.empty_table()
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([o[0] for o in out])),
                pa.array(np.concatenate([o[1] for o in out])),
                pa.array(np.concatenate([o[2] for o in out])),
            ],
            schema=_CANDS,
        )

    partials = embeddings.map_batches(emit_partials, batch_format="pyarrow")
    # Chained-exchange topology (pair shuffle → top-k reduce shuffle):
    # BOTH exchanges run with reserve_cpus=False — a reserved second
    # aggregator pool deadlocks behind the first at >=16 CPUs (see
    # exchange.hash_grouped). Pair-key parallelism is capped by the
    # T(T+1)/2 keyspace so empty partitions don't pay finalize cost.
    from ntto_ray.stages.exchange import shuffle_parallelism

    nparts = max(1, min(shuffle_parallelism(), T * (T + 1) // 2))
    grouped = hash_grouped(
        partials, ["pk"], parallelism=nparts, reserve_cpus=False
    )
    cands = grouped.map_batches(
        score_pairs, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    return _topk_reduce(cands, k, reserve_cpus=False)


# --- scalar quantization (SQ8) ------------------------------------------------


def sq8_train(embeddings: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) over the full corpus — the SQ8
    "codebook" (Faiss's ScalarQuantizer QT_8bit training): one
    streaming pass emitting per-block dim-scale partials, folded on the
    driver (d floats, never corpus-scale)."""

    def stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.column_names:
            return pa.schema(
                [("d", pa.int64()), ("mn", pa.float64()), ("mx", pa.float64())]
            ).empty_table()
        m = _emb_matrix(t)
        d = np.arange(m.shape[1], dtype=np.int64)
        return pa.table({"d": d, "mn": m.min(axis=0), "mx": m.max(axis=0)})

    df = embeddings.map_batches(stats, batch_format="pyarrow").to_pandas()
    dim = int(df["d"].max()) + 1
    mn = np.full(dim, np.inf)
    mx = np.full(dim, -np.inf)
    np.minimum.at(mn, df["d"].to_numpy(), df["mn"].to_numpy())
    np.maximum.at(mx, df["d"].to_numpy(), df["mx"].to_numpy())
    return mn, mx


def sq8_quantize(m: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """float64 (n, d) → int8-range int64 codes in [-128, 127]:
    ``floor((x - mn) / (mx - mn) * 255 + 0.5)`` clipped to [0, 255],
    shifted by −128; constant dimensions (mx == mn) code to 0. The
    expression is evaluated in float64 in exactly the SQL mirror's
    operand order, so codes are bit-identical to the oracle's."""
    rng = mx - mn
    safe = np.where(rng > 0, rng, 1.0)
    q = np.floor((m - mn) / safe * 255.0 + 0.5)
    q = np.clip(q, 0.0, 255.0) - 128.0
    return np.where(rng > 0, q, 0.0).astype(np.int64)


class SQ8TopK:
    """Per-batch integer-dot scoring against the broadcast quantized
    query matrix: quantize the batch with the broadcast per-dim stats,
    int64 matmul, emit the batch-local top-k per query. Integer scores
    (≤ 128²·d, exact in the reduce's float64 sim column) make the
    global ranking bit-deterministic — no float-tie risk at all."""

    def __init__(self, ref, k: int):
        self.qids, self.qq, self.mn, self.mx = ray.get(ref)
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.column_names:
            return pa.schema(
                [
                    ("qid", pa.int64()),
                    ("vec_id", pa.int64()),
                    ("sim", pa.float64()),
                ]
            ).empty_table()
        codes = sq8_quantize(_emb_matrix(t), self.mn, self.mx)
        vec_ids = t["vec_id"].to_numpy()
        dots = self.qq @ codes.T  # (nq, n) int64
        out_q, out_v, out_s = [], [], []
        k = min(self.k + 1, dots.shape[1])
        for qi, qid in enumerate(self.qids):
            row = dots[qi]
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


def sq8_topk(
    embeddings: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
) -> ray.data.Dataset:
    """Scalar-quantized (int8) brute-force top-k — the 4×-smaller-index
    ANN baseline (Faiss SQ8): train per-dim min/max in one pass,
    broadcast (stats + quantized queries) once via ray.put, score with
    integer dot products per batch, one k-scale reduce. At 100 TB the
    quantized corpus is ¼ the float32 bytes and the scan stays
    vectorized int64 matmul. Output: qid, vec_id, rank, qdot."""
    mn, mx = sq8_train(embeddings)
    qq = sq8_quantize(np.asarray(query_matrix, dtype=np.float64), mn, mx)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qq, mn, mx))
    cands = embeddings.map_batches(
        SQ8TopK,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={"ref": ref, "k": k},
    )
    ranked = _topk_reduce(cands, k, with_sim=True)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("qid", pa.int64()),
                    ("vec_id", pa.int64()),
                    ("rank", pa.int64()),
                    ("qdot", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "qid": t["qid"],
                "vec_id": t["vec_id"],
                "rank": t["rank"],
                "qdot": pa.compute.cast(
                    pa.compute.round(t["sim"]), pa.int64()
                ),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


def ivf_sq8_topk(
    embeddings: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
) -> ray.data.Dataset:
    """IVF + SQ8 composed ANN — coarse inverted lists bound WHICH
    vectors a query touches (nprobe/nlist of the corpus), int8 scalar
    quantization bounds the BYTES per touched vector (¼ of float32) —
    the memory-bound middle ground of the IVF × {flat, PQ, SQ8} layout
    matrix (Faiss ``IVF…,SQ8``). Coarse assignment runs on normalized
    vectors (the shared deterministic spherical k-means,
    :func:`_kmeans`); in-list ranking is the integer dot of raw-value
    SQ8 codes (:func:`sq8_quantize`) — bit-deterministic, so the
    composed chain has an exact SQL mirror. Centroids + per-dim stats +
    quantized queries broadcast once; scan is batch matmul + masked
    integer dots; one k-scale reduce."""
    sample = (
        embeddings.filter(expr=f"vec_id < {int(train_sample)}")
        .to_pandas()
        .sort_values("vec_id")
    )
    sm = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    cent = _kmeans(sm, nlist)
    qm = np.asarray(query_matrix, dtype=np.float64)
    qn = _normalize(qm)
    order = np.argsort(-(qn @ cent.T), axis=1, kind="stable")[:, :nprobe]
    mn, mx = sq8_train(embeddings)
    qq = sq8_quantize(qm, mn, mx)
    ref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), qq, cent, order, mn, mx)
    )

    class IVFSQ8Score:
        def __init__(self, ref, k):
            (
                self.qids,
                self.qq,
                self.cent,
                self.probe,
                self.mn,
                self.mx,
            ) = ray.get(ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "embedding" not in t.column_names:
                return pa.schema(
                    [
                        ("qid", pa.int64()),
                        ("vec_id", pa.int64()),
                        ("sim", pa.float64()),
                    ]
                ).empty_table()
            raw = _emb_matrix(t)
            assign = np.argmax(_normalize(raw) @ self.cent.T, axis=1)
            codes = sq8_quantize(raw, self.mn, self.mx)
            vec_ids = t["vec_id"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(assign, self.probe[qi])
                if not mask.any():
                    continue
                dots = codes[mask] @ self.qq[qi]
                vids = vec_ids[mask]
                kk = min(self.k + 1, len(dots))
                top = np.argpartition(-dots, kk - 1)[:kk]
                for j in top:
                    if vids[j] != qid:
                        out_q.append(qid)
                        out_v.append(int(vids[j]))
                        out_s.append(float(dots[j]))
            return pa.Table.from_arrays(
                [
                    pa.array(np.array(out_q, dtype=np.int64)),
                    pa.array(np.array(out_v, dtype=np.int64)),
                    pa.array(np.array(out_s, dtype=np.float64)),
                ],
                names=["qid", "vec_id", "sim"],
            )

    cands = embeddings.map_batches(
        IVFSQ8Score,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={"ref": ref, "k": k},
    )
    ranked = _topk_reduce(cands, k, with_sim=True)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("qid", pa.int64()),
                    ("vec_id", pa.int64()),
                    ("rank", pa.int64()),
                    ("qdot", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "qid": t["qid"],
                "vec_id": t["vec_id"],
                "rank": t["rank"],
                "qdot": pa.compute.cast(pa.compute.round(t["sim"]), pa.int64()),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")
