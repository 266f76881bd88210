"""Driver-mimic: run every registered query at sf0.001 and compare to its
DuckDB oracle (row count, column names, order-insensitive values)."""

import pandas as pd
import pyarrow as pa
import pytest

from ntto_ray import registry
from tests.conftest import SF_SMALL

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()

WITH_ORACLE = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(name, ray_session, duck):
    got = _norm(_to_pandas(QUERIES[name](SF_SMALL)))
    want = _norm(duck.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_every_query_has_an_exact_oracle():
    """No rows-only queries exist: every registered query carries an
    exact DuckDB oracle (the stronger correctness contract). If this
    ever fails, add a parametrized rows-only smoke test for the new
    oracle-less queries — don't drop the assertion."""
    assert ROWS_ONLY == []


if ROWS_ONLY:  # guarded: an empty parametrize would report a skip forever

    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_rows_only_queries_run(name, ray_session):
        got = _to_pandas(QUERIES[name](SF_SMALL))
        assert got is not None
        assert len(got.columns) > 0
