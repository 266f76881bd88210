"""Streaming sketch operators — mergeable per-block summaries that bound
driver-side state regardless of corpus size (no reference counterpart;
the reference has no aggregation at all, ntto.go:162-206 is a pure
line filter).

Three sketches, each with an exact-answer contract so the driver's
DuckDB oracle gate applies:

* Misra-Gries heavy hitters (``mg_partial`` / ``mg_merge``): per-block
  EXACT ``value_counts`` truncated to capacity ``k`` by the mergeable-
  summaries subtraction rule (Agarwal et al., PODS'12). Total undercount
  error is bounded by ``N/(k+1)``; sizing ``k >= N/threshold`` makes the
  candidate set a guaranteed superset of the true heavy hitters, and a
  second exact counting pass over the (bounded, broadcast) candidates
  yields the exact answer at any scale.
* KMV distinct-count (``kmv_partial`` / ``kmv_estimate``): k-minimum-
  values over a splitmix64 hash. Deterministic, and the hash chain is
  expressible in DuckDB UHUGEINT arithmetic, so the estimate itself is
  oracle-checkable bit-for-bit.
* Bloom-filter semi-join (``bloom_build`` / ``BloomProbe``): the small
  side becomes an ``m``-bit filter broadcast once via ``ray.put``; the
  probe is a vectorized prefilter followed by an exact ``pc.is_in``
  verify against the (also broadcast) key set, so false positives never
  reach the output. At scales where the exact set no longer fits a
  broadcast, drop the verify step and the operator degrades to the
  classic approximate prefilter.

All kernels are numpy/Arrow vectorized; per-block summary size is O(k)
(MG/KMV) or O(m bits) (Bloom), never O(block rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_U = np.uint64
_TWO64 = 1 << 64

# splitmix64 constants (Steele et al., public domain reference mixer)
_SM_GAMMA = _U(0x9E3779B97F4A7C15)
_SM_C1 = _U(0xBF58476D1CE4E5B9)
_SM_C2 = _U(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array. The DuckDB
    mirror (UHUGEINT products reduced mod 2^64) is built by
    :func:`splitmix64_sql`; both sides must stay bit-identical."""
    z = x.astype(_U) + _SM_GAMMA
    z = (z ^ (z >> _U(30))) * _SM_C1
    z = (z ^ (z >> _U(27))) * _SM_C2
    return z ^ (z >> _U(31))


def splitmix64_sql(expr: str) -> str:
    """The same splitmix64 chain as a DuckDB scalar expression over a
    non-negative BIGINT ``expr``. Multiplications route through UHUGEINT
    and reduce mod 2^64; xor/shift stay in UBIGINT (no overflow)."""
    m = str(_TWO64)

    def mul(e: str, c: int) -> str:
        return (
            f"CAST((CAST(({e}) AS UHUGEINT) * {c}) % {m} AS UBIGINT)"
        )

    z0 = f"CAST((CAST(({expr}) AS UHUGEINT) + {int(_SM_GAMMA)}) % {m} AS UBIGINT)"
    z1 = mul(f"xor({z0}, {z0} >> 30)", int(_SM_C1))
    z2 = mul(f"xor({z1}, {z1} >> 27)", int(_SM_C2))
    return f"xor({z2}, {z2} >> 31)"


# --- Misra-Gries heavy hitters -------------------------------------------


def mg_partial(t: pa.Table, key: str, k: int) -> pa.Table:
    """Per-block mergeable summary: exact value counts, truncated to the
    ``k`` largest by subtracting the (k+1)-th count (the Misra-Gries
    reduction). Also carries the block row count so the merged summary
    knows N without a second pass. Output is O(k) rows."""
    n = t.num_rows
    if n == 0:
        return pa.table(
            {
                "key": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
            }
        )
    vc = t[key].combine_chunks().value_counts()
    keys = vc.field("values").to_numpy(zero_copy_only=False)
    cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(keys) > k:
        order = np.argsort(cnts, kind="stable")[::-1]
        cut = cnts[order[k]]
        keep = order[:k]
        keys, cnts = keys[keep], cnts[keep] - cut
        live = cnts > 0
        keys, cnts = keys[live], cnts[live]
    # Sentinel row (cnt=0) carries the exact block row count even when the
    # truncation cancels every retained key (near-uniform blocks with more
    # than k distinct keys) — N must never depend on which keys survive.
    keys = np.concatenate([keys.astype(np.int64), np.zeros(1, np.int64)])
    cnts = np.concatenate([cnts, np.zeros(1, np.int64)])
    n_rows = np.zeros(len(keys), dtype=np.int64)
    n_rows[-1] = n
    return pa.table(
        {
            "key": pa.array(keys, pa.int64()),
            "cnt": pa.array(cnts, pa.int64()),
            "n_rows": pa.array(n_rows, pa.int64()),
        }
    )


def mg_merge(parts: pa.Table, k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Merge per-block MG summaries: groupby-sum, then one more
    subtraction reduction to size ``k``. Returns (keys, lower-bound
    counts, total N). Cumulative undercount stays <= N/(k+1)."""
    n_total = int(pc.sum(parts["n_rows"]).as_py() or 0)
    if parts.num_rows == 0:
        return np.array([], np.int64), np.array([], np.int64), n_total
    g = parts.group_by("key").aggregate([("cnt", "sum")])
    keys = g["key"].to_numpy(zero_copy_only=False)
    cnts = g["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(keys) > k:
        order = np.argsort(cnts, kind="stable")[::-1]
        cut = cnts[order[k]]
        keep = order[:k]
        keys, cnts = keys[keep], cnts[keep] - cut
    # Drop non-positive counts unconditionally: the per-block sentinel rows
    # (cnt=0) must never surface as candidates.
    live = cnts > 0
    keys, cnts = keys[live], cnts[live]
    return keys, cnts, n_total


# --- KMV distinct-count ---------------------------------------------------


def kmv_partial(t: pa.Table, key: str, k: int) -> pa.Table:
    """Per-block k smallest DISTINCT splitmix64 hashes of ``key``
    (non-negative int64). O(k) rows out."""
    if t.num_rows == 0:
        return pa.table({"h": pa.array([], pa.uint64())})
    x = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    h = np.unique(splitmix64(x.view(_U)))[:k]
    return pa.table({"h": pa.array(h, pa.uint64())})


def kmv_estimate(parts: pa.Table, k: int) -> tuple[int, int]:
    """Merge partials and produce (estimate, k_used). With fewer than
    ``k`` distinct hashes the sketch IS the distinct set (exact count);
    otherwise est = (k-1) * 2^64 // h_k — exact integer math so the
    DuckDB mirror reproduces it bit-for-bit."""
    h = np.unique(parts["h"].to_numpy(zero_copy_only=False))
    if len(h) < k:
        return len(h), len(h)
    hk = int(h[k - 1])
    return (k - 1) * _TWO64 // hk, k


# --- Count-Min sketch ------------------------------------------------------

# Row seeds: leading hex digits of pi (nothing-up-my-sleeve constants, same
# convention as the Bloom seeds above). d = len(_CM_SEEDS) hash rows.
_CM_SEEDS = (
    0x243F6A8885A308D3,
    0x13198A2E03707344,
    0xA4093822299F31D0,
    0x082EFA98EC4E6C89,
)


def cm_hash(keys: np.ndarray, seed: int, width: int) -> np.ndarray:
    """Row hash h_r(k) = splitmix64(uint64(k) XOR seed_r) mod width —
    the same XOR-seeding scheme as the Bloom probes, SQL-mirrorable via
    :func:`splitmix64_sql` (see cm_hash_sql in queries_sketch)."""
    kk = keys.astype(np.int64).view(_U)
    return (splitmix64(kk ^ _U(seed)) % _U(width)).astype(np.int64)


def cm_partial(t: pa.Table, key: str, width: int) -> pa.Table:
    """Per-block Count-Min partial: for each of the d seeded rows,
    bincount the cells the block's keys hash to; emit SPARSE
    (r, cell, cnt) rows — O(d * min(n, width)) per block. Partials merge
    with a plain grouped Sum, so the global sketch costs one exchange of
    sketch-scale (not data-scale) rows."""
    if t.num_rows == 0:
        return pa.table(
            {
                "r": pa.array([], pa.int64()),
                "cell": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    x = t[key].to_numpy(zero_copy_only=False)
    rs, cells, cnts = [], [], []
    for r, seed in enumerate(_CM_SEEDS):
        bc = np.bincount(cm_hash(x, seed, width), minlength=width)
        nz = np.flatnonzero(bc)
        rs.append(np.full(len(nz), r, np.int64))
        cells.append(nz.astype(np.int64))
        cnts.append(bc[nz].astype(np.int64))
    return pa.table(
        {
            "r": pa.array(np.concatenate(rs)),
            "cell": pa.array(np.concatenate(cells)),
            "cnt": pa.array(np.concatenate(cnts)),
        }
    )


def cm_counters(merged: pa.Table, width: int) -> np.ndarray:
    """Densify grouped-sum partials into the (d, width) counter matrix
    (bounded driver state: d*width int64 cells regardless of N)."""
    c = np.zeros((len(_CM_SEEDS), width), dtype=np.int64)
    c[merged["r"].to_numpy(), merged["cell"].to_numpy()] = merged[
        "cnt"
    ].to_numpy()
    return c


def cm_query(counters: np.ndarray, keys: np.ndarray, width: int) -> np.ndarray:
    """Point estimates: min over the d rows of each key's cell counter.
    Upper-bounds the true count; overestimate < 2eN/width w.h.p."""
    est = None
    for r, seed in enumerate(_CM_SEEDS):
        v = counters[r, cm_hash(keys, seed, width)]
        est = v if est is None else np.minimum(est, v)
    return est.astype(np.int64)


# --- Bloom-filter semi-join ----------------------------------------------

_BLOOM_SEEDS = (0, 0x5851F42D4C957F2D, 0x14057B7EF767814F, 0x27BB2EE687B0B0FD)


def bloom_build(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """Build an ``m_bits``-wide Bloom filter (bool array) over int64
    keys with ``len(_BLOOM_SEEDS)`` splitmix64-derived hash functions."""
    bloom = np.zeros(m_bits, dtype=bool)
    kk = keys.astype(np.int64).view(_U)
    for seed in _BLOOM_SEEDS:
        bloom[(splitmix64(kk ^ _U(seed)) % _U(m_bits)).astype(np.int64)] = True
    return bloom


class BloomProbe:
    """Actor-pool probe stage: Bloom prefilter then exact ``pc.is_in``
    verify, both against refs broadcast once via ``ray.put`` (read in
    ``__init__``, once per actor — never re-shipped per batch)."""

    def __init__(
        self,
        bloom_ref,
        keyset_ref,
        *,
        key: str,
        m_bits: int,
        out_cols: list[str],
    ):
        import ray

        self._bloom = ray.get(bloom_ref)
        self._keys = ray.get(keyset_ref)  # pa.Array of distinct build keys
        self._key = key
        self._m = m_bits
        self._out = out_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(self._out)
        x = t[self._key].to_numpy(zero_copy_only=False).astype(np.int64)
        xx = x.view(_U)
        hit = np.ones(len(x), dtype=bool)
        for seed in _BLOOM_SEEDS:
            np.logical_and(
                hit,
                self._bloom[
                    (splitmix64(xx ^ _U(seed)) % _U(self._m)).astype(np.int64)
                ],
                out=hit,
            )
        t = t.filter(pa.array(hit))
        # exact verify: Bloom false positives must not reach the output
        ok = pc.is_in(t[self._key], value_set=self._keys)
        return t.filter(ok).select(self._out)


# --- HyperLogLog registers -------------------------------------------------

def _clz64(v: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (binary-search shifts —
    exact, no float log2 whose 2^53 rounding would mis-rank big ints).
    clz(0) reports 64."""
    v = v.copy()
    lz = np.zeros(len(v), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v < (_U(1) << _U(64 - s))
        lz[m] += s
        v[m] <<= _U(s)
    return lz


def hll_partial(t: pa.Table, key: str, p: int) -> pa.Table:
    """Per-block HyperLogLog register partial (Flajolet et al. 2007):
    bucket = top ``p`` hash bits, rho = 1 + leading zeros of the
    remaining bits (capped at 65-p when they are all zero), per-block
    register = max rho per bucket. Always emits the full 2^p rows so the
    merge is a plain grouped Max and absent buckets stay 0. O(2^p)
    output per block regardless of block size — the mergeable-summary
    contract shared by the other sketches here."""
    m = 1 << p
    buckets = np.arange(m, dtype=np.int64)
    reg = np.zeros(m, dtype=np.int64)
    if t.num_rows:
        x = t[key].to_numpy(zero_copy_only=False).astype(np.int64).view(_U)
        h = splitmix64(x)
        b = (h >> _U(64 - p)).astype(np.int64)
        rest = h << _U(p)  # suffix bits at the top; wraps mod 2^64
        rho = np.where(rest == 0, np.int64(64 - p + 1), _clz64(rest) + 1)
        np.maximum.at(reg, b, rho)
    return pa.table({"bucket": buckets, "register": reg})
