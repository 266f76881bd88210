"""Edge-case tests for the window/pivot/sample batch: cases the sf
tables don't exercise — a partition key scattered across many input
blocks (the exchange must reunite it before the window kernel), and
stratified-sample determinism across block layouts."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_window_cumsum_key_scattered_across_blocks(ray_session, tmp_path):
    """One customer's orders spread over 8 input blocks: row_number /
    cumsum / lag must still see the partition whole (hash_grouped
    co-locates the key) and in (date, key) order."""
    import pyarrow.parquet as pq

    from ntto_ray.queries_rel_win import rel_window_cumsum

    rng = np.random.default_rng(7)
    n = 400
    cust = rng.integers(1, 6, n)  # 5 customers, heavily interleaved
    days = rng.integers(0, 1000, n)
    table = pa.table(
        {
            "o_custkey": pa.array(cust, type=pa.int64()),
            "o_orderkey": pa.array(np.arange(n), type=pa.int64()),
            "o_orderdate": pa.array(
                days * 86_400_000_000, type=pa.timestamp("us")
            ),
            "o_totalprice": pa.array(
                rng.integers(100, 10000, n) / 100.0, type=pa.float64()
            ),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(table, sf / "orders.parquet", row_group_size=50)

    got = (
        rel_window_cumsum(str(sf))
        .to_pandas()
        .sort_values(["o_custkey", "order_seq"])
        .reset_index(drop=True)
    )
    assert len(got) == n

    df = table.to_pandas()
    df["total_c"] = (df.o_totalprice * 100).round().astype(np.int64)
    df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    df["order_seq"] = df.groupby("o_custkey").cumcount() + 1
    df["cum_spend_c"] = df.groupby("o_custkey")["total_c"].cumsum()
    day = df.o_orderdate.astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    prev = day.groupby(df.o_custkey).shift(1)
    df["gap_days"] = (day - prev).fillna(-1).astype(np.int64)
    want = (
        df[["o_custkey", "o_orderkey", "order_seq", "cum_spend_c", "gap_days"]]
        .sort_values(["o_custkey", "order_seq"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_stratified_sample_block_layout_invariant(ray_session, tmp_path):
    """The bottom-k-by-hash sample must be identical whatever the input
    block layout (1 row group vs many) — the defining property of a
    deterministic sampler."""
    import pyarrow.parquet as pq

    from ntto_ray.queries_rel_win import rel_stratified_sample

    rng = np.random.default_rng(11)
    n = 300
    table = pa.table(
        {
            "c_custkey": pa.array(rng.permutation(n) + 1, type=pa.int64()),
            "c_mktsegment": pa.array(
                [f"SEG{i % 3}" for i in range(n)], type=pa.string()
            ),
        }
    )
    outs = []
    for rg in (n, 17):
        sf = tmp_path / f"sf_{rg}"
        sf.mkdir()
        pq.write_table(table, sf / "customer.parquet", row_group_size=rg)
        outs.append(
            rel_stratified_sample(str(sf))
            .to_pandas()
            .sort_values(["segment", "rank"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0].groupby("segment").size() == 20).all()


def test_anomaly_events_matches_bruteforce(ray_session, tmp_path):
    """Random per-user values vs a float-free scalar reference of the
    |x-mu| > 2*sigma_pop test."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ntto_ray.registry import queries

    rng = np.random.RandomState(5)
    n = 300
    users = rng.randint(1, 9, n)
    vals = np.round(rng.exponential(50, n), 2)
    vals[rng.choice(n, 10, replace=False)] *= 40  # genuine outliers
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    vc = np.round(vals * 100).astype(np.int64)
    want = set()
    for u in np.unique(users):
        m = users == u
        nn, s, sxx = int(m.sum()), int(vc[m].sum()), int((vc[m] ** 2).sum())
        if nn < 2:
            continue
        for eid in np.flatnonzero(m):
            dev = nn * int(vc[eid]) - s
            if dev * dev > 4 * (nn * sxx - s * s):
                want.add(int(eid))

    got = queries()["rel_anomaly_events"](str(tmp_path)).to_pandas()
    assert set(got["event_id"].astype(int)) == want and len(want) > 0


def test_median_histogram_matches_numpy(ray_session, tmp_path):
    """Random skewed prices vs direct kth-smallest selection."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ntto_ray.registry import queries

    rng = np.random.RandomState(13)
    n = 5000
    # heavy skew: most values in one narrow band + outliers
    vals = np.concatenate(
        [rng.uniform(10, 11, n - 50), rng.uniform(0, 100000, 50)]
    )
    vals = np.round(vals, 2)
    t = pa.table({"l_extendedprice": pa.array(vals, pa.float64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")

    vc = np.round(vals * 100).astype(np.int64)
    k = (n + 1) // 2
    want = int(np.partition(vc, k - 1)[k - 1])

    got = queries()["rel_median_histogram"](str(tmp_path))
    assert int(got["median_c"].iloc[0]) == want
    assert int(got["n"].iloc[0]) == n and int(got["k"].iloc[0]) == k


def test_group_p95_histogram_matches_numpy(ray_session, tmp_path):
    """Skewed per-group prices vs direct per-group kth selection."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ntto_ray.registry import queries

    rng = np.random.RandomState(29)
    n = 4000
    pri = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM"])[rng.randint(0, 3, n)]
    vals = np.round(
        np.where(rng.rand(n) < 0.9, rng.uniform(5, 6, n), rng.uniform(0, 9e4, n)),
        2,
    )
    t = pa.table(
        {
            "o_orderpriority": pa.array(pri),
            "o_totalprice": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")

    vc = np.round(vals * 100).astype(np.int64)
    want = {}
    for p in np.unique(pri):
        g = vc[pri == p]
        k = (95 * len(g) + 99) // 100
        want[p] = int(np.partition(g, k - 1)[k - 1])

    got = queries()["rel_group_p95_histogram"](str(tmp_path))
    got_map = dict(zip(got["p"], got["p95_c"].astype(int)))
    assert got_map == want
