"""Round-5 kernel pins: SQ8 quantization invariants and the asymmetric
containment join against a brute-force reference."""

import numpy as np
import pyarrow as pa


def test_sq8_quantize_invariants():
    from ntto_ray.stages.ann import sq8_quantize

    rng = np.random.default_rng(11)
    m = rng.normal(size=(40, 8))
    mn, mx = m.min(axis=0), m.max(axis=0)
    q = sq8_quantize(m, mn, mx)
    assert q.dtype == np.int64
    assert q.min() >= -128 and q.max() <= 127
    # per-dim extremes map to the code range ends
    for d in range(8):
        col = q[:, d]
        assert col[np.argmin(m[:, d])] == -128
        assert col[np.argmax(m[:, d])] == 127
    # constant dimension codes to 0
    c = np.full((5, 1), 3.25)
    assert (sq8_quantize(c, c.min(0), c.max(0)) == 0).all()
    # monotone: larger input never gets a smaller code
    x = np.sort(rng.normal(size=(64, 1)), axis=0)
    qc = sq8_quantize(x, x.min(0), x.max(0))[:, 0]
    assert (np.diff(qc) >= 0).all()


def test_containment_pairs_matches_bruteforce(ray_session):
    import ray

    from ntto_ray.stages.dedup import containment_pairs

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(30):
        n = int(rng.integers(5, 25))
        toks = list(rng.choice(vocab, size=n, replace=True))
        docs.append(" ".join(toks))
    # plant subset duplicates: doc 30 ⊂ doc 31's vocabulary
    docs.append("w1 w2 w3 w4 w5")
    docs.append("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12")
    t = pa.table(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    got = (
        containment_pairs(ray.data.from_arrow(t), threshold_pct=80)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )

    sets = [set(d.split(" ")) for d in docs]
    want = []
    for a in range(len(docs)):
        for b in range(len(docs)):
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if inter * 100 >= 80 * len(sets[a]):
                want.append((a, b, inter * 100 // len(sets[a])))
    want.sort()
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    # the planted subset pair is found in the contained→container
    # direction with 100% containment
    assert (30, 31, 100) in want
