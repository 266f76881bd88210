"""Property tests for the sketch kernels (stages/sketch.py): Misra-Gries
error bound + superset guarantee, KMV accuracy + exact-below-k, Bloom
no-false-negatives, and the numpy/DuckDB splitmix64 mirror."""

import numpy as np
import pyarrow as pa
import pytest

from ntto_ray.stages import sketch as sk


def _chunked_mg(values: np.ndarray, k: int, n_blocks: int):
    parts = [
        sk.mg_partial(pa.table({"v": pa.array(c, pa.int64())}), "v", k)
        for c in np.array_split(values, n_blocks)
    ]
    return sk.mg_merge(pa.concat_tables(parts), k)


def test_mg_superset_and_error_bound():
    rng = np.random.default_rng(7)
    # zipf-ish skew: a few hot keys over a long uniform tail
    vals = np.concatenate(
        [
            np.repeat([1, 2, 3], [4000, 2500, 1200]),
            rng.integers(100, 5000, size=12000),
        ]
    )
    rng.shuffle(vals)
    k = 64
    keys, counts, n = _chunked_mg(vals, k, n_blocks=9)
    assert n == len(vals)
    exact_keys, exact_counts = np.unique(vals, return_counts=True)
    exact = dict(zip(exact_keys.tolist(), exact_counts.tolist()))
    bound = n / (k + 1)
    # superset guarantee: every key with true count > N/(k+1) survives
    guaranteed = {kk for kk, c in exact.items() if c > bound}
    assert guaranteed <= set(keys.tolist())
    # lower-bound property with bounded undercount
    for kk, c in zip(keys.tolist(), counts.tolist()):
        assert c <= exact[kk]
        assert exact[kk] - c <= bound


def test_mg_exact_when_capacity_suffices():
    vals = np.repeat(np.arange(10), np.arange(1, 11))
    keys, counts, n = _chunked_mg(vals, k=32, n_blocks=4)
    exact = dict(zip(*np.unique(vals, return_counts=True)))
    assert n == len(vals)
    assert {int(a): int(b) for a, b in zip(keys, counts)} == {
        int(a): int(b) for a, b in exact.items()
    }


def test_mg_near_uniform_block_keeps_exact_n():
    """A block with more than k distinct keys at EQUAL counts cancels
    every retained count in the truncation — the block's row count must
    survive anyway (ADVICE r02: n_total=0 made heavy-hitter thresholds
    diverge on near-uniform data)."""
    vals = np.arange(3000, dtype=np.int64)  # 3000 uniques, count 1 each
    part = sk.mg_partial(pa.table({"v": pa.array(vals)}), "v", 2048)
    keys, counts, n = sk.mg_merge(part, 2048)
    assert n == 3000
    assert (counts > 0).all()  # the sentinel never surfaces as a candidate

    # and across mixed blocks: uniform block + skewed block
    skew = np.repeat([7, 9], [500, 300]).astype(np.int64)
    parts = pa.concat_tables(
        [
            sk.mg_partial(pa.table({"v": pa.array(vals)}), "v", 2048),
            sk.mg_partial(pa.table({"v": pa.array(skew)}), "v", 2048),
        ]
    )
    _, _, n = sk.mg_merge(parts, 2048)
    assert n == 3800


def test_kmv_exact_below_k_and_estimate_above():
    rng = np.random.default_rng(11)
    small = rng.choice(40, size=500).astype(np.int64)
    parts = [
        sk.kmv_partial(pa.table({"v": pa.array(c, pa.int64())}), "v", 64)
        for c in np.array_split(small, 5)
    ]
    est, k_used = sk.kmv_estimate(pa.concat_tables(parts), 64)
    assert est == len(np.unique(small))
    assert k_used == len(np.unique(small))

    big = rng.permutation(200_000)[:5000].astype(np.int64)
    parts = [
        sk.kmv_partial(pa.table({"v": pa.array(c, pa.int64())}), "v", 64)
        for c in np.array_split(big, 13)
    ]
    est, k_used = sk.kmv_estimate(pa.concat_tables(parts), 64)
    assert k_used == 64
    true = len(np.unique(big))
    # std error ~ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    assert abs(est - true) / true < 0.51


def test_bloom_no_false_negatives_and_verify_exact():
    rng = np.random.default_rng(3)
    build = rng.permutation(100_000)[:2000].astype(np.int64)
    m = 1 << 16
    bloom = sk.bloom_build(build, m)
    probe = np.concatenate([build, rng.integers(200_000, 300_000, 5000)])
    hit = np.ones(len(probe), dtype=bool)
    pp = probe.view(np.uint64)
    for seed in sk._BLOOM_SEEDS:
        hit &= bloom[(sk.splitmix64(pp ^ np.uint64(seed)) % np.uint64(m)).astype(np.int64)]
    # every build key passes the prefilter
    assert hit[: len(build)].all()
    # prefilter actually prunes most non-members
    assert hit[len(build) :].mean() < 0.25


def test_splitmix64_sql_mirror():
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(5)
    xs = np.concatenate(
        [[0, 1, 2**62], rng.integers(0, 2**62, size=200)]
    ).astype(np.int64)
    want = sk.splitmix64(xs.view(np.uint64))
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(xs, pa.int64())}))
    got = (
        con.execute(f"SELECT {sk.splitmix64_sql('x')} AS h FROM t")
        .df()["h"]
        .to_numpy()
        .astype(np.uint64)
    )
    assert (got == want).all()


def test_hll_partial_mergeable_and_matches_scalar():
    """Register vector of the whole == elementwise max of split partials,
    and matches a scalar-python HLL over the same hash."""
    import pyarrow as pa

    from ntto_ray.stages.sketch import _U, hll_partial, splitmix64

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 10_000, 5000).astype(np.int64)
    p = 6
    t = pa.table({"k": pa.array(vals, pa.int64())})
    whole = hll_partial(t, "k", p)["register"].to_numpy()
    h1 = hll_partial(pa.table({"k": pa.array(vals[:2500], pa.int64())}), "k", p)
    h2 = hll_partial(pa.table({"k": pa.array(vals[2500:], pa.int64())}), "k", p)
    merged = np.maximum(h1["register"].to_numpy(), h2["register"].to_numpy())
    assert np.array_equal(whole, merged)

    # scalar reference
    reg = [0] * (1 << p)
    for h in splitmix64(vals.view(_U)).tolist():
        b = h >> (64 - p)
        rest = (h << p) & ((1 << 64) - 1)
        if rest == 0:
            rho = 64 - p + 1
        else:
            rho = 1
            while rest < (1 << 63):
                rest <<= 1
                rho += 1
        reg[b] = max(reg[b], rho)
    assert whole.tolist() == reg

    # estimate sanity: alpha_m * m^2 / sum(2^-reg) within 30% of truth
    m = 1 << p
    est = (0.709 * m * m) / np.sum(np.power(2.0, -whole))
    true = len(np.unique(vals))
    assert 0.7 * true < est < 1.3 * true


def test_countmin_merge_equals_single_pass_and_upper_bounds():
    """Chunked cm_partial + grouped sum == one-shot sketch; estimates
    upper-bound true counts and are exact for keys with no collisions."""
    rng = np.random.RandomState(11)
    vals = rng.zipf(1.5, size=5000)
    vals = vals[vals < 10**9].astype(np.int64)
    w = 512

    # chunked partials merged by grouped sum
    parts = pa.concat_tables(
        sk.cm_partial(pa.table({"v": pa.array(c, pa.int64())}), "v", w)
        for c in np.array_split(vals, 7)
    )
    merged = parts.group_by(["r", "cell"]).aggregate([("cnt", "sum")])
    merged = merged.rename_columns(["r", "cell", "cnt"])
    chunked = sk.cm_counters(merged, w)

    # one-shot reference
    one = sk.cm_partial(pa.table({"v": pa.array(vals, pa.int64())}), "v", w)
    whole = sk.cm_counters(one, w)
    assert np.array_equal(chunked, whole)

    keys, true = np.unique(vals, return_counts=True)
    est = sk.cm_query(whole, keys, w)
    assert np.all(est >= true)  # CM never underestimates
    # every row sums to N
    assert np.all(whole.sum(axis=1) == len(vals))
    # the heaviest key's estimate is within the CM additive bound often
    # enough to be useful: at least the top key must be near-exact here
    top = np.argmax(true)
    assert est[top] - true[top] <= len(vals) // 64


def test_countmin_sql_mirror():
    """The XOR-seeded row hash matches its DuckDB UHUGEINT mirror."""
    duckdb = pytest.importorskip("duckdb")
    from ntto_ray.queries_sketch import _CM_W, _cm_hash_sql

    keys = np.array([0, 1, 89, 12345, 2**40 + 7, 2**62], dtype=np.int64)
    for r, seed in enumerate(sk._CM_SEEDS):
        want = sk.cm_hash(keys, seed, _CM_W)
        got = (
            duckdb.sql(
                f"SELECT {_cm_hash_sql('user_id', seed)} AS h FROM "
                "(SELECT unnest($keys) AS user_id)",
                params={"keys": keys.tolist()},
            )
            .fetchnumpy()["h"]
            .astype(np.int64)
        )
        assert np.array_equal(want, got), f"row {r} mismatch"
