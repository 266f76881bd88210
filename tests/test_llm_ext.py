"""Regime tests for the round-3 extension operators (queries_llm_ext):
paths the sf0.001 oracle sweep can't reach — the multi-bucket branch of
the distributed prefix sum, NTILE remainder arithmetic, and span-merge
boundary behavior."""

import numpy as np
import pandas as pd

from ntto_ray.queries_llm_ext import corpus_shard_plan
from tests.conftest import SF_SMALL


def test_shard_plan_multibucket_matches_single(ray_session, duck):
    """bucket_docs=16 forces ~4 buckets at sf0.001 (50 docs) — the
    bucket-offset broadcast + per-bucket cumsum restart path — and must
    produce the identical global prefix sum as the SQL window."""
    got = (
        corpus_shard_plan(SF_SMALL, bucket_docs=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duck.execute(
        """
WITH n AS (
  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM n
)
SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
       CAST((cum - n_tokens) // 4096 AS BIGINT) AS shard_id
FROM c ORDER BY doc_id
"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the forced-regime invariant: cum_tokens is globally monotone and
    # ends at the corpus token total
    assert (np.diff(got["cum_tokens"].to_numpy()) > 0).all()
    assert got["cum_tokens"].iloc[-1] == got["n_tokens"].sum()


def test_module_imports_standalone():
    """Ray workers re-import query modules OUTSIDE registry._load's
    ordered walk (cloudpickle deserialization); every oracle builder
    that reads another module's _ORACLES entry must import that module
    itself. Regression guard for the ann_recall_eval KeyError."""
    import subprocess
    import sys

    for mod in ("queries_llm_ext", "queries_graph_ext", "queries_text"):
        r = subprocess.run(
            [sys.executable, "-c", f"import ntto_ray.{mod}"],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
        assert r.returncode == 0, f"{mod}: {r.stderr[-500:]}"


def test_ntile_remainder_semantics():
    """The vectorized NTILE bucket formula must match DuckDB's: the
    first n % k buckets take one extra row."""
    import duckdb

    rng = np.random.RandomState(3)
    for n in (1, 2, 3, 7, 10, 23):
        vals = rng.permutation(n)
        want = (
            duckdb.sql(
                f"SELECT ntile(4) OVER (ORDER BY v) AS q FROM "
                f"(SELECT unnest({list(map(int, vals))}) AS v) ORDER BY v"
            )
            .df()["q"]
            .to_numpy()
        )
        # re-derive with the kernel's arithmetic (rank r in 0..n-1)
        r = np.arange(n)
        size, rem = n // 4, n % 4
        big = rem * (size + 1)
        q = np.where(
            r < big,
            r // max(size + 1, 1),
            rem + (r - big) // max(size, 1),
        ) + 1
        assert (q == want).all(), (n, q, want)


# --- CDC chunking edge regimes --------------------------------------------------


def test_cdc_chunks_edge_regimes(ray_session, tmp_path):
    """Docs shorter than the rolling window (single chunk), empty docs
    (no chunks), and exact duplicate docs (chunk-level dedup collapses
    them) — engine vs the same DuckDB oracle on a synthetic table."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ntto_ray.queries_llm_ext4 import dedup_cdc_chunks
    from ntto_ray.registry import oracle_sql

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(
                [
                    "ab",  # shorter than the 8-char window → one chunk
                    "",  # empty → zero chunks
                    "the quick brown fox jumps over the lazy dog " * 4,
                    "the quick brown fox jumps over the lazy dog " * 4,  # dup
                    "a completely different document body here ok " * 3,
                    "xyz",  # short again
                ]
            ),
        }
    )
    d = tmp_path / "cdc"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")

    got = dedup_cdc_chunks(str(d)).to_pandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(oracle_sql()["dedup_cdc_chunks"]).df()
    con.close()

    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    row = got.iloc[0]
    # the duplicate doc's chunks dedup away: strictly positive dup mass
    assert row["dup_chunk_instances"] > 0
    assert row["chars_total"] == sum(len(t) for t in docs["text"].to_pylist())
    assert row["chars_dedup"] < row["chars_total"]


def test_source_overlap_pair_emission(ray_session, tmp_path):
    """A dup cluster spanning 3 sources must emit all C(3,2) pairs once;
    same-source dups emit nothing; engine matches the oracle."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ntto_ray.queries_llm_ext4 import corpus_source_overlap
    from ntto_ray.registry import oracle_sql

    shared = "X" * 30 + " tail varies per doc "
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(
                [
                    shared + "a",
                    shared + "b",
                    shared + "c",
                    "Y" * 30 + " same source twice",
                    "Y" * 30 + " same source twice again",
                    "unique document with no dup partner at all",
                ]
            ),
            "source": pa.array(["s1", "s2", "s3", "s1", "s1", "s2"]),
        }
    )
    d = tmp_path / "ovl"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")

    got = (
        corpus_source_overlap(str(d))
        .to_pandas()
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = (
        con.execute(oracle_sql()["corpus_source_overlap"])
        .df()
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # exactly the 3 cross-source pairs of the X-cluster, once each
    assert set(map(tuple, got[["src_a", "src_b"]].values)) == {
        ("s1", "s2"),
        ("s1", "s3"),
        ("s2", "s3"),
    }
    assert (got["n_shared"] == 1).all()
