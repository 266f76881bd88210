"""Dedup suite: planted near-duplicates must be found (MinHash-LSH
recall), SimHash locality, exact dedup correctness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _corpus():
    base = (
        "the quick brown fox jumps over the lazy dog while the spark stream "
        "merges the hash window vector batch data line"
    )
    near = base.replace("lazy", "sleepy")  # one token changed
    far = "completely different content about databases and columns and rows galore"
    rows = [
        {"doc_id": 1, "text": base, "source": "s0", "n_chars": len(base)},
        {"doc_id": 2, "text": near, "source": "s0", "n_chars": len(near)},
        {"doc_id": 3, "text": far, "source": "s0", "n_chars": len(far)},
        {"doc_id": 4, "text": base, "source": "s0", "n_chars": len(base)},  # exact dup
    ]
    return rows


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_items(_corpus())


def test_minhash_finds_planted_neardups(docs_ds):
    from ntto_ray.stages.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 4) in found  # exact dup: estimated jaccard = 1
    assert (1, 2) in found or (2, 4) in found  # near dup
    assert (1, 3) not in found and (2, 3) not in found


def test_minhash_signature_deterministic():
    from ntto_ray.stages.dedup import MinHasher

    a = MinHasher().signature("the quick brown fox")
    b = MinHasher().signature("the quick brown fox")
    assert (a == b).all()


def test_simhash_locality():
    from ntto_ray.stages.dedup import SimHasher

    sh = SimHasher()
    base = "the quick brown fox jumps over the lazy dog " * 3
    fp1 = sh.fingerprint(base)
    fp2 = sh.fingerprint(base.replace("lazy", "sleepy"))
    fp3 = sh.fingerprint("utterly unrelated words entirely elsewhere")
    ham12 = bin(fp1 ^ fp2).count("1")
    ham13 = bin(fp1 ^ fp3).count("1")
    assert ham12 < ham13
    assert ham12 <= 16


def test_exact_dedup_fulltext(docs_ds):
    from ntto_ray.stages.dedup import exact_dedup_fulltext

    out = exact_dedup_fulltext(docs_ds).to_pandas()
    # 3 distinct texts; the duplicated one keeps doc_id 1 with dups=2
    assert len(out) == 3
    dup_row = out[out["dups"] == 2]
    assert list(dup_row["doc_id"]) == [1]


def test_jaccard_pairs_planted(docs_ds):
    from ntto_ray.stages.dedup import jaccard_pairs

    pairs = jaccard_pairs(docs_ds, threshold_pct=80).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 4) in found
    assert (1, 2) in found
    assert (1, 3) not in found


def test_jaccard_pairs_large_vocab_fallback_vs_bruteforce(ray_session):
    """Groups whose vocabulary dwarfs the group size take block_verify's
    vocab-chunked g×g path (2u > g+8192); output must equal brute force."""
    import ray.data

    from ntto_ray.stages.dedup import jaccard_pairs

    rng = np.random.default_rng(17)
    vocab = np.array([f"w{i:06d}" for i in range(100000)])
    sets, rows = [], []
    # near-dup groups land at g≈8, u≈6000 → 2u > g+8192 → fallback path
    base = rng.choice(100000, size=6000, replace=False)
    for i in range(24):
        if i % 3 == 0:
            toks = base.copy()
            mut = rng.choice(6000, size=rng.integers(0, 400), replace=False)
            toks[mut] = rng.integers(0, 100000, size=len(mut))
        else:
            toks = rng.choice(100000, size=5000, replace=False)
        toks = np.unique(toks)
        sets.append(set(toks.tolist()))
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(vocab[toks]),
                "source": "s0",
                "n_chars": 0,
            }
        )
    ds = ray.data.from_items(rows)
    got = jaccard_pairs(ds, threshold_pct=80).to_pandas()
    got_pairs = {tuple(sorted(p)) for p in zip(got["doc_a"], got["doc_b"])}
    want = set()
    for a in range(24):
        for b in range(a + 1, 24):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * 100 >= 80 * union:
                want.add((a, b))
    assert want, "test corpus must contain qualifying near-dup pairs"
    assert got_pairs == want


def test_char_gram_hashes_match_per_string():
    """Flat vectorized k-gram hashing == hashing each string alone;
    short rows emit nothing."""
    from ntto_ray.stages.dedup import _char_gram_hashes

    texts = ["abcde", "xy", "", "héllo wörld", "abc"]
    h, off = _char_gram_hashes(pa.array(texts), 3)
    assert off.tolist() == [0, 3, 3, 3, 12, 13]
    for i, s in enumerate(texts):
        solo, soff = _char_gram_hashes(pa.array([s]), 3)
        assert h[off[i] : off[i + 1]].tolist() == solo.tolist()
    # distinct grams hash distinctly here; equal grams hash equal
    ha, _ = _char_gram_hashes(pa.array(["abcabc"]), 3)
    assert ha[0] == ha[3]  # "abc" twice


def test_ngram_jaccard_vs_bruteforce_random(ray_session):
    """Random word-soup corpus: char-3-gram jaccard_pairs == brute-force
    over Python set n-grams."""
    import itertools

    import ray.data

    from ntto_ray.stages.dedup import jaccard_pairs

    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = []
    for i in range(30):
        k = rng.randint(8, 20)
        texts.append(" ".join(words[j] for j in rng.randint(0, len(words), k)))
    texts += [texts[0], texts[1][:-1]]  # exact dup + near dup
    ids = list(range(len(texts)))

    def grams(s):
        return {s[i : i + 3] for i in range(len(s) - 2)}

    want = set()
    for a, b in itertools.combinations(ids, 2):
        ga, gb = grams(texts[a]), grams(texts[b])
        if not ga and not gb:
            continue
        inter = len(ga & gb)
        union = len(ga | gb)
        if inter * 100 >= 80 * union:
            want.add((a, b))

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    got = jaccard_pairs(ds, threshold_pct=80, char_ngram=3).to_pandas()
    got_pairs = {
        tuple(sorted(p)) for p in zip(got["doc_a"].astype(int), got["doc_b"].astype(int))
    }
    assert got_pairs == want


def test_curate_pipeline_drops_exact_dups(ray_session, tmp_path):
    """Planted exact dups: curate = dedup(keep min id) -> equal-quota
    budget fill in splitmix64 order; scalar reference over the same
    rule."""
    import pyarrow.parquet as pq

    from ntto_ray.queries_text_ext import _BUDGET_TOKENS
    from ntto_ray.registry import queries
    from ntto_ray.stages.sketch import splitmix64

    rng = np.random.RandomState(17)
    texts, srcs = [], []
    base = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]
    for i in range(60):
        texts.append(base[i % 3] + f" doc{i}")
        srcs.append(f"s{i % 2}")
    # exact dups: doc 50..59 replicate doc 0..9's text
    for i in range(50, 60):
        texts[i] = texts[i - 50]
    t = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 60),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    # scalar reference
    seen, surv = {}, []
    for i, s in enumerate(texts):
        if s not in seen:
            seen[s] = i
            surv.append(i)
    h = splitmix64(np.arange(60, dtype=np.int64).view(np.uint64))
    want = {}
    n_sources = len(set(srcs[i] for i in surv))
    quota = _BUDGET_TOKENS // n_sources
    for src in sorted(set(srcs)):
        members = [i for i in surv if srcs[i] == src]
        members.sort(key=lambda i: (int(h[i]), i))
        cum = 0
        for i in members:
            ntok = len(texts[i].split(" "))
            cum += ntok
            if cum <= quota:
                want[i] = cum

    got = queries()["corpus_curate_pipeline"](str(tmp_path)).to_pandas()
    got_map = dict(zip(got["doc_id"].astype(int), got["cum_tok"].astype(int)))
    assert got_map == want
    assert not (set(range(50, 60)) & set(got_map))  # dups dropped


def test_lm_score_topk_cap_matches_bruteforce(ray_session, tmp_path, monkeypatch):
    """Small top-K forces the model cap: scores must match a scalar
    reference of the capped (count DESC, trigram ASC) model."""
    from collections import Counter

    import pyarrow.parquet as pq

    import ntto_ray.queries_text_ext as qte

    rng = np.random.RandomState(19)
    words = ["a", "b", "c", "d", "e"]
    texts = [
        " ".join(words[j] for j in rng.randint(0, len(words), rng.randint(2, 12)))
        for i in range(40)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 40),
            "source": pa.array(["s0"] * 40),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    K = 7
    monkeypatch.setattr(qte, "_LM_TOP_K", K)

    cnt = Counter()
    tris = {}
    for i, s in enumerate(texts):
        tk = s.split(" ")
        tris[i] = [" ".join(tk[j : j + 3]) for j in range(len(tk) - 2)]
        cnt.update(tris[i])
    top = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:K])
    want = {
        i: (sum(top.get(g, 0) for g in gs), len(gs))
        for i, gs in tris.items()
        if gs
    }

    got = qte.text_lm_score(str(tmp_path)).to_pandas()
    got_map = {
        int(r.doc_id): (int(r.tri_total), int(r.tri_n)) for r in got.itertuples()
    }
    assert got_map == want


def test_chunking_matches_bruteforce(ray_session, tmp_path):
    """Random doc lengths around the window boundaries vs a scalar
    chunker implementing the same sliding rule."""
    import pyarrow.parquet as pq

    from ntto_ray.queries_text_ext import _CHUNK, _OVERLAP
    from ntto_ray.registry import queries

    rng = np.random.RandomState(61)
    step = _CHUNK - _OVERLAP
    # lengths straddling the boundary cases: 1, O, O+1, C-1, C, C+1,
    # C+step, C+step+1, random
    lens = [1, _OVERLAP, _OVERLAP + 1, _CHUNK - 1, _CHUNK, _CHUNK + 1,
            _CHUNK + step, _CHUNK + step + 1] + list(rng.randint(1, 400, 20))
    texts = [" ".join(f"w{i}_{j}" for j in range(L)) for i, L in enumerate(lens)]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s0"] * len(texts)),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    want = []
    for i, L in enumerate(lens):
        toks = texts[i].split(" ")
        nc = 1 + max(0, -(-(L - _CHUNK) // step))
        for c in range(nc):
            start = c * step
            n_tok = min(_CHUNK, L - start)
            want.append(
                (i, c, start, n_tok, toks[start], toks[start + n_tok - 1])
            )

    got = queries()["text_chunking"](str(tmp_path)).to_pandas()
    got_rows = sorted(
        (int(r.doc_id), int(r.chunk_idx), int(r.start_tok), int(r.n_tok),
         r.first_tok, r.last_tok)
        for r in got.itertuples()
    )
    assert got_rows == sorted(want)


def test_poly_content_hashes_scalar_and_slices():
    """Vectorized 128-bit polynomial content key vs a scalar reference,
    including empty strings, duplicates, and sliced (offset) arrays."""
    import pyarrow as pa

    from ntto_ray.stages.dedup import poly_content_hashes

    texts = ["hello world", "", "a", "hello world", "xy" * 3000]
    arr = pa.array(texts, pa.string())
    h1, h2 = poly_content_hashes(arr)

    def ref(s, M):
        h = 0
        for k, ch in enumerate(s.encode()):
            h = (h + ch * pow(M, k, 1 << 64)) % (1 << 64)
        return h - (1 << 63)

    for i, s in enumerate(texts):
        assert h1[i] == ref(s, 257)
        assert h2[i] == ref(s, 263)
    # duplicates collide, distinct texts don't (on this input)
    assert h1[0] == h1[3] and h2[0] == h2[3]
    assert len({(a, b) for a, b in zip(h1, h2)}) == 4

    sl = arr.slice(1, 3)
    s1, s2 = poly_content_hashes(sl)
    assert list(s1) == list(h1[1:4]) and list(s2) == list(h2[1:4])


def test_emit_once_no_duplicate_pairs_identical_corpus(ray_session):
    """The max-duplication adversary for emit-once ownership: N identical
    docs share EVERY prefix token (Jaccard), every band key (MinHash) and
    every band slice (SimHash), so each pair is a candidate in the
    maximum possible number of groups. With the dedupe exchange deleted,
    global uniqueness now rests entirely on the in-group ownership rules
    — assert every family emits each of the C(N,2) pairs exactly once."""
    import ray.data

    from ntto_ray.stages.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    n = 12
    text = " ".join(f"tok{i:03d}" for i in range(40))
    rows = [{"doc_id": i, "text": text} for i in range(n)]
    # a few distinct singletons that must pair with nothing
    rows += [
        {"doc_id": 100 + i, "text": f"zzz{i} " + " ".join(f"q{i}_{j}" for j in range(40))}
        for i in range(3)
    ]
    ds = ray.data.from_items(rows)
    want = {(a, b) for a in range(n) for b in range(a + 1, n)}

    for fn, kwargs in (
        (jaccard_pairs, {"threshold_pct": 90}),
        (minhash_lsh_pairs, {"threshold": 0.9}),
        (simhash_pairs, {"max_hamming": 3, "bands": 4}),
    ):
        got = fn(ds, **kwargs).to_pandas()
        pairs = list(zip(got["doc_a"], got["doc_b"]))
        assert len(pairs) == len(set(pairs)), f"{fn.__name__} emitted duplicates"
        assert set(pairs) == want, f"{fn.__name__} pair set wrong"
