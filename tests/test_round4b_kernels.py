"""Property tests for the round-4b pure-numpy kernels — no Ray session:
the vectorized arithmetic must match a scalar walk on arbitrary inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ntto_ray.queries_round4b import _KNUTH, pack_plan_stats


@st.composite
def _docs_strategy(draw):
    k = draw(st.integers(min_value=1, max_value=60))
    ids = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=k,
            max_size=k,
            unique=True,
        )
    )
    toks = draw(
        st.lists(st.integers(min_value=1, max_value=900), min_size=k, max_size=k)
    )
    shards = draw(st.integers(min_value=1, max_value=5))
    window = draw(st.integers(min_value=1, max_value=300))
    return ids, toks, shards, window


def _scalar_pack(ids, toks, shards, window):
    """Reference: per shard, walk docs in id order, concatenate, split."""
    per = {}
    for i, n in sorted(zip(ids, toks)):
        per.setdefault(i % shards, []).append(n)
    out = {}
    for s, lens in per.items():
        pos, crossing = 0, 0
        for n in lens:
            first_bin = pos // window
            last_bin = (pos + n - 1) // window
            if last_bin > first_bin:
                crossing += 1
            pos += n
        out[s] = {
            "n_docs": len(lens),
            "total_tokens": pos,
            "n_bins": -(-pos // window),
            "n_crossing": crossing,
        }
    return out


@given(_docs_strategy())
@settings(max_examples=200, deadline=None)
def test_pack_plan_matches_scalar_walk(case):
    ids, toks, shards, window = case
    ids_a = np.array(ids, dtype=np.int64)
    got = pack_plan_stats(
        ids_a % shards,
        ids_a,
        np.array(toks, dtype=np.int64),
        window=window,
    ).to_pandas()
    want = _scalar_pack(ids, toks, shards, window)
    assert len(got) == len(want)
    for row in got.itertuples():
        w = want[row.shard]
        assert row.n_docs == w["n_docs"]
        assert row.total_tokens == w["total_tokens"]
        assert row.n_bins == w["n_bins"]
        assert row.n_crossing == w["n_crossing"]


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200)
)
@settings(max_examples=100, deadline=None)
def test_stratified_hash_matches_python_int_arithmetic(ids):
    """The Knuth-hash sampling expression must be bit-identical between
    the numpy int64 path and arbitrary-precision Python ints (what the
    oracle's HUGEINT arithmetic computes): the int64 product wraps mod
    2^64 above doc_id ≈ 3.47e9, but the following mod-2^32 absorbs the
    wrap exactly, so there is no silent divergence anywhere in the
    supported id range."""
    a = np.array(ids, dtype=np.int64)
    ours = (a * _KNUTH) % 4294967296 % 10000
    ref = [(i * _KNUTH) % 4294967296 % 10000 for i in ids]
    assert ours.tolist() == ref
