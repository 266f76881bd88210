"""Text-analysis stages: token statistics, quality scoring, language-ID
heuristic, document fingerprinting. All batched; the hot paths use Arrow
kernels (split/flatten) rather than per-row Python where the kernel
exists."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

STOPWORDS = ("the", "a")

# Per-language marker tokens for the (deliberately simple, deterministic)
# language-ID heuristic. Real language ID would be an n-gram model loaded
# in an actor __init__; the plumbing is identical.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a"),
}


def token_stats_batch(t: pa.Table) -> pa.Table:
    """doc_id, n_tokens, n_distinct, sum_token_len — vectorized: one
    split_pattern kernel, flatten + parent-index groupby for the
    per-document reductions."""
    toks = pc.split_pattern(t["text"].combine_chunks(), pattern=" ")
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    df = pd.DataFrame(
        {
            "parent": parent.to_numpy(zero_copy_only=False),
            "tok": flat.to_numpy(zero_copy_only=False),
            "tlen": pc.utf8_length(flat).to_numpy(zero_copy_only=False),
        }
    )
    g = df.groupby("parent", sort=True).agg(
        n_distinct=("tok", "nunique"), sum_token_len=("tlen", "sum")
    )
    # every row has >= 1 token (split of non-empty text), but guard reindex
    g = g.reindex(range(t.num_rows), fill_value=0)
    return pa.Table.from_arrays(
        [
            t["doc_id"],
            n_tokens,
            pa.array(g["n_distinct"].to_numpy(), type=pa.int64()),
            pa.array(g["sum_token_len"].to_numpy(), type=pa.int64()),
        ],
        names=["doc_id", "n_tokens", "n_distinct", "sum_token_len"],
    )


def quality_batch(t: pa.Table) -> pa.Table:
    """Quality signals: doc_id, n_tokens, n_stopwords, n_chars_obs,
    quality_pct (integer 0-100: non-stopword ratio × mean-token-length
    cap) — all integer arithmetic, hash-stable vs SQL."""
    toks = pc.split_pattern(t["text"].combine_chunks(), pattern=" ")
    n_tokens = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.bincount(parent, weights=is_stop, minlength=t.num_rows).astype(np.int64)
    n_chars = pc.utf8_length(t["text"].combine_chunks()).cast(pa.int64())
    quality = (100 * (n_tokens - n_stop)) // np.maximum(n_tokens, 1)
    return pa.Table.from_arrays(
        [
            t["doc_id"],
            pa.array(n_tokens),
            pa.array(n_stop),
            n_chars,
            pa.array(quality),
        ],
        names=["doc_id", "n_tokens", "n_stopwords", "n_chars_obs", "quality_pct"],
    )


class LangId:
    """Actor stage: marker-token language scoring. Emits the heuristic
    guess plus the marker hit count; the table's ``lang`` column rides
    along so accuracy can be audited downstream."""

    def __init__(self, markers: dict[str, tuple[str, ...]] | None = None):
        self.markers = {k: frozenset(v) for k, v in (markers or LANG_MARKERS).items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        # vectorized: one split + one is_in kernel per language over the
        # DISTINCT (row, token) pairs; per-row hit counts via bincount.
        # O(#languages) kernel calls per batch, row work all in Arrow.
        toks = pc.split_pattern(t["text"].combine_chunks(), pattern=" ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        # distinct tokens per row (marker hits count unique tokens)
        key = np.char.add(
            parent.astype("U20"),
            np.char.add("\x1f", flat.to_numpy(zero_copy_only=False).astype("U")),
        )
        _, first = np.unique(key, return_index=True)
        first = np.sort(first)
        flat_u = flat.take(pa.array(first))
        parent_u = parent[first]
        n = t.num_rows
        best_n = np.zeros(n, dtype=np.int64)
        best = np.full(n, "unk", dtype=object)
        for lang, marks in self.markers.items():
            m = pc.is_in(flat_u, value_set=pa.array(sorted(marks))).to_numpy(
                zero_copy_only=False
            )
            cnt = np.bincount(parent_u, weights=m, minlength=n).astype(np.int64)
            better = cnt > best_n
            best_n[better] = cnt[better]
            best[better] = lang
        guesses, hits = best, best_n
        return pa.Table.from_arrays(
            [
                t["doc_id"],
                t["lang"],
                pa.array(guesses, type=pa.string()),
                pa.array(hits, type=pa.int64()),
            ],
            names=["doc_id", "lang", "lang_guess", "marker_hits"],
        )


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """Content fingerprint: md5 of the full text (exact-dup key), plus a
    64-bit rolling-window min-hash (robust to small edits)."""
    texts = t["text"].to_pylist()
    md5s = [hashlib.md5(x.encode()).hexdigest() for x in texts]
    rolling = []
    for x in texts:
        # min over rolling 8-grams of a cheap polynomial hash
        data = x.encode()
        if len(data) < 8:
            rolling.append(
                int.from_bytes(hashlib.md5(data).digest()[:8], "little") >> 1
            )
            continue
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        k = 8
        # polynomial rolling hash over windows, vectorized via strides
        weights = (np.uint64(257) ** np.arange(k, dtype=np.uint64)).astype(np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(arr, k)
        hs = (windows * weights).sum(axis=1, dtype=np.uint64)
        rolling.append(int(hs.min()) & 0x7FFFFFFFFFFFFFFF)
    return pa.Table.from_arrays(
        [
            t["doc_id"],
            pa.array(md5s, type=pa.string()),
            pa.array(np.array(rolling, dtype=np.int64)),
        ],
        names=["doc_id", "md5", "rolling_min64"],
    )


def token_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(token_stats_batch, batch_format="pyarrow")


def quality(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(quality_batch, batch_format="pyarrow")


def langid(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 8))


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow")
