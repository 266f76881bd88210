"""Deduplication suite over document corpora — the operators a
large-scale training-data pipeline needs, each expressed Ray-Data-first.

- exact dedup: vectorized key derivation + native grouped aggregate
  (min doc_id per key) — one hash shuffle, no Python groups.
- token-Jaccard near-dup: bucketed all-pairs verification
  (groupby(bucket).map_groups) — exact within its blocking assumption
  (near-dups share (source, length-bucket)); documented + mirrored in SQL.
- MinHash-LSH near-dup: shingle → 64-perm minhash → banded LSH →
  candidate pairs via groupby on (band, band_hash) → exact-Jaccard verify.
  Probabilistic (no SQL oracle); recall pinned by unit tests.
- SimHash: 64-bit fingerprints; near-dup = hamming ≤ k within LSH chunks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

# --- exact dedup ----------------------------------------------------------

def exact_dedup_keys(
    docs: ray.data.Dataset, *, key_chars: int = 30
) -> ray.data.Dataset:
    """Group documents by a normalized content key (here: first
    ``key_chars`` chars — stand-in for a full-text hash at scale) and keep
    the smallest doc_id per key plus the duplicate count. One shuffle."""

    def prep(t: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(t["text"], start=0, stop=key_chars)
        return pa.Table.from_arrays([t["doc_id"], key], names=["doc_id", "key"])

    return (
        docs.map_batches(prep, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="dups"))
    )


def _content_hash(texts: np.ndarray) -> np.ndarray:
    return np.array([hashlib.md5(t.encode()).hexdigest() for t in texts], dtype=object)


def exact_dedup_fulltext(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Full-text exact dedup via md5 content hash (the scale path: the
    hash, not the text, is the shuffle key)."""

    def prep(t: pa.Table) -> pa.Table:
        h = _content_hash(t["text"].to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(h, type=pa.string())], names=["doc_id", "h"]
        )

    return (
        docs.map_batches(prep, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="dups"))
    )


# --- token-set Jaccard near-dup (bucketed exact) --------------------------

def _token_set(text: str) -> set[str]:
    return set(text.split(" "))


def jaccard_pairs(
    docs: ray.data.Dataset,
    *,
    threshold_pct: int = 90,
    chars_bucket: int = 50,
) -> ray.data.Dataset:
    """All (a, b) doc pairs with token-set Jaccard ≥ threshold, blocked by
    (source, n_chars // chars_bucket). Exact within the blocking
    assumption: near-identical docs land in the same block (same source,
    |len diff| < bucket width). The in-block verify is all-pairs — block
    size is bounded by the blocking key cardinality, which grows with the
    corpus, keeping per-group work flat.

    Integer-threshold comparison (inter*100 >= t*union) so the result is
    float-free and hash-stable vs the SQL oracle."""

    def prep(t: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.floor(pc.divide(pc.cast(t["n_chars"], pa.float64()), chars_bucket)),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [t["doc_id"], t["text"], t["source"], bucket],
            names=["doc_id", "text", "source", "bucket"],
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sets = [_token_set(t) for t in g["text"]]
        sizes = np.array([len(s) for s in sets])
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            si = sets[i]
            for j in range(i + 1, len(ids)):
                inter = len(si & sets[j])
                union = sizes[i] + sizes[j] - inter
                if inter * 100 >= threshold_pct * union:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(inter * 100 // union)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
                "jaccard_pct": pd.Series(out_j, dtype="int64"),
            }
        )

    return (
        docs.map_batches(prep, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .map_groups(verify, batch_format="pandas")
    )


# --- MinHash + LSH --------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Stateful actor stage: 64-permutation MinHash over k-token shingles.
    Permutation parameters are derived from a fixed seed in ``__init__``
    (once per actor)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.k = shingle_k
        self.num_perm = num_perm

    def _shingle_hashes(self, text: str) -> np.ndarray:
        toks = text.split(" ")
        k = self.k
        if len(toks) < k:
            shingles = {" ".join(toks)}
        else:
            shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        return np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                for s in shingles
            ),
            dtype=np.uint64,
            count=len(shingles),
        )

    def signature(self, text: str) -> np.ndarray:
        h = self._shingle_hashes(text)
        # (a*h + b) mod p, min over shingles, vectorized over perms
        vals = (h[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.stack(
            [self.signature(t) for t in batch["text"].to_pylist()]
        )
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                pa.array(list(sigs.astype(np.uint64))),
            ],
            names=["doc_id", "sig"],
        )


def _band_rows(batch: pa.Table, *, bands: int, rows: int) -> pa.Table:
    """Explode signatures to (band_id, band_hash, doc_id) rows for the LSH
    groupby."""
    sig = np.stack([np.asarray(s) for s in batch["sig"].to_pylist()]).astype(np.uint64)
    n = sig.shape[0]
    doc = batch["doc_id"].to_numpy()
    out_doc, out_band, out_hash = [], [], []
    for b in range(bands):
        chunk = sig[:, b * rows : (b + 1) * rows]
        # deterministic across processes (python hash() is seed-salted)
        hs = np.array(
            [
                int.from_bytes(hashlib.blake2b(c.tobytes(), digest_size=8).digest(), "little")
                >> 1
                for c in chunk
            ],
            dtype=np.int64,
        )
        out_doc.append(doc)
        out_band.append(np.full(n, b, dtype=np.int64))
        out_hash.append(hs)
    return pa.Table.from_arrays(
        [
            pa.array(np.concatenate(out_band)),
            pa.array(np.concatenate(out_hash)),
            pa.array(np.concatenate(out_doc)),
        ],
        names=["band", "band_hash", "doc_id"],
    )


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """MinHash-LSH candidate generation + signature-Jaccard verification.

    shingle→minhash (actor pool) → band explode → groupby(band, band_hash)
    → in-bucket pairs → estimated Jaccard (matching signature fraction)
    ≥ threshold. Distinct pairs via a final groupby. Probabilistic — no
    SQL oracle; recall is pinned in tests against planted near-dups."""
    rows = num_perm // bands
    sigs = docs.map_batches(
        MinHasher,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
    )
    # keep full signature alongside for verification: carry sig through
    banded = sigs.map_batches(
        _band_rows,
        batch_format="pyarrow",
        fn_kwargs={"bands": bands, "rows": rows},
    )

    # bucket → candidate pairs (doc_a < doc_b)
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique()).astype(np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                }
            )
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = (
        banded.groupby(["band", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="nbands"))
    )

    # verify: attach each side's signature with a distributed hash join
    # (doc_a then doc_b) — no driver-side materialization, so the verify
    # scales with the candidate count, not the corpus. For tiny corpora a
    # broadcast (ray.put of all signatures) would be faster, but the join
    # is the 100 TB path.
    from ntto_ray.stages.canonicalize import _shuffle_parallelism

    nparts = _shuffle_parallelism()

    def sig_to_bin(t: pa.Table) -> pa.Table:
        # Arrow's join rejects list-typed payload columns — ship the
        # signature as one fixed-width binary blob per doc instead
        mat = np.stack([np.asarray(s) for s in t["sig"].to_pylist()]).astype(
            np.uint64
        )
        blobs = pa.array(
            [row.tobytes() for row in mat], type=pa.binary()
        )
        return pa.table({"doc_id": t["doc_id"], "sig": blobs})

    # materialize each join input and the intermediate: a JoinOperator
    # deadlocks small sessions when its aggregator actors compete with
    # upstream operators (or a second join) for CPU slots. The barriers
    # hold the candidate pairs (≪ corpus) and the fixed-width signature
    # table (~0.5 KB/doc, object-store-resident and spillable) — never
    # the documents themselves
    sigs_bin = sigs.map_batches(sig_to_bin, batch_format="pyarrow").materialize()
    cand = cand.materialize()
    with_a = cand.join(
        sigs_bin,
        "inner",
        num_partitions=nparts,
        on=("doc_a",),
        right_on=("doc_id",),
        right_suffix="_a",
    ).materialize()
    with_ab = with_a.join(
        sigs_bin,
        "inner",
        num_partitions=nparts,
        on=("doc_b",),
        right_on=("doc_id",),
        left_suffix="_l",
        right_suffix="_b",
    )

    def verify(t: pa.Table, *, threshold=threshold) -> pa.Table:
        cols = t.column_names
        sig_a_col = "sig" if "sig" in cols else ("sig_l" if "sig_l" in cols else "sig_a")
        sig_b = "sig_b" if "sig_b" in cols else "sig_r"
        da = t["doc_a"].to_numpy()
        db = t["doc_b"].to_numpy()
        if len(da) == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "est_jaccard_pct": pa.array([], type=pa.int64()),
                }
            )
        sa = np.frombuffer(
            b"".join(t[sig_a_col].to_pylist()), dtype=np.uint64
        ).reshape(len(da), -1)
        sb = np.frombuffer(
            b"".join(t[sig_b].to_pylist()), dtype=np.uint64
        ).reshape(len(db), -1)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        out = pa.table(
            {
                "doc_a": pa.array(da[keep]),
                "doc_b": pa.array(db[keep]),
                "est_jaccard_pct": pa.array((est[keep] * 100).astype(np.int64)),
            }
        )
        return out

    return with_ab.map_batches(verify, batch_format="pyarrow")


# --- SimHash --------------------------------------------------------------

class SimHasher:
    """64-bit SimHash fingerprints over tokens (deterministic md5 token
    hashes). Fingerprint equality/nearness ⇒ textual near-duplication."""

    def __init__(self, bits: int = 64):
        self.bits = bits
        self._cache: dict[str, int] = {}

    def _tok_hash(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            self._cache[tok] = h
        return h

    def fingerprint(self, text: str) -> int:
        acc = np.zeros(self.bits, dtype=np.int64)
        shifts = np.arange(self.bits, dtype=np.uint64)
        for tok in text.split(" "):
            h = np.uint64(self._tok_hash(tok))
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        fp = 0
        for i in np.flatnonzero(acc > 0):
            fp |= 1 << int(i)
        return fp

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fingerprint(t) for t in batch["text"].to_pylist()]
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(np.array(fps, dtype=np.uint64))],
            names=["doc_id", "simhash"],
        )


def simhash_fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 8))
