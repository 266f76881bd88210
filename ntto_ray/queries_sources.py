"""Source-format round-trips beyond Parquet/NT/NDJSON: CSV. The
reference reads only NT text lines (ntto.go:162-197); a user replacing
it with this engine also needs the tabular source formats Ray Data
ships. The round-trip (Parquet → write_csv → read_csv → aggregate,
oracled against the original Parquet) pins both directions of the CSV
codec, not just the reader."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import pyarrow as pa

from ntto_ray.queries_rel import _read
from ntto_ray.registry import register


@register(
    "csv_roundtrip",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(user_id) AS BIGINT) AS user_sum,
       CAST(min(event_id) AS BIGINT) AS min_event
FROM events
GROUP BY event_type
""",
)
def csv_roundtrip(sf_dir: str):
    """events → CSV files under /tmp (one file per block — the
    resumable-output layout) → ``ray.data.read_csv`` → grouped
    aggregate. Integer/string columns only: CSV is schema-poor, so the
    round-trip contract covers exactly the types it can carry
    losslessly."""
    import ray.data

    # per-run tempdir: concurrent invocations (bench + sweep) must not
    # race each other's part files between write and read-back.
    out = tempfile.mkdtemp(prefix="ntto_ray_csv_")
    try:
        ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])
        ev.write_csv(out)

        back = ray.data.read_csv(out)

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by("event_type").aggregate(
                [("event_id", "count"), ("user_id", "sum"), ("event_id", "min")]
            )
            # select by canonical agg names, not position: key/agg column
            # order after group_by().aggregate() has differed across
            # pyarrow majors (ADVICE r03).
            return g.select(
                ["event_type", "event_id_count", "user_id_sum", "event_id_min"]
            ).rename_columns(["event_type", "cnt", "user_sum", "min_event"])

        partials = back.map_batches(partial, batch_format="pyarrow")
        merged = (
            partials.to_pandas()
            .groupby("event_type", as_index=False)
            .agg(
                cnt=("cnt", "sum"),
                user_sum=("user_sum", "sum"),
                min_event=("min_event", "min"),
            )
        )
        return merged
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "json_roundtrip",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
       CAST(min(o_orderkey) AS BIGINT) AS min_order
FROM orders
GROUP BY o_orderpriority
""",
)
def json_roundtrip(sf_dir: str):
    """orders → NDJSON files under /tmp via ``Dataset.write_json`` (one
    file per block) → ``ray.data.read_json`` → grouped aggregate,
    oracled against the original Parquet. Pins the engine's JSON tabular
    codec both ways — the KG NDJSON sink (``kg_ndjson_lines``) pins the
    ntto byte format; this pins the generic one."""
    import ray.data

    out = tempfile.mkdtemp(prefix="ntto_ray_json_")
    try:
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderpriority"])
        orders.write_json(out)

        back = ray.data.read_json(out)

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by("o_orderpriority").aggregate(
                [("o_orderkey", "count"), ("o_custkey", "sum"), ("o_orderkey", "min")]
            )
            return g.select(
                ["o_orderpriority", "o_orderkey_count", "o_custkey_sum", "o_orderkey_min"]
            ).rename_columns(["o_orderpriority", "cnt", "cust_sum", "min_order"])

        partials = back.map_batches(partial, batch_format="pyarrow")
        merged = (
            partials.to_pandas()
            .groupby("o_orderpriority", as_index=False)
            .agg(
                cnt=("cnt", "sum"),
                cust_sum=("cust_sum", "sum"),
                min_order=("min_order", "min"),
            )
        )
        return merged
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _late_gzip_oracle():
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules
    from ntto_ray.registry import _ORACLES

    canon = K.triples_canonical_sql(pipeline_rules())
    _ORACLES["nt_gzip_roundtrip"] = (
        f"WITH canon AS ({canon}) SELECT subj, pred, obj FROM canon"
    )


@register("nt_gzip_roundtrip", oracle=None)  # oracle filled below
def nt_gzip_roundtrip(sf_dir: str):
    """Compressed text source: canonical triples → NT lines → per-block
    GZIP files under /tmp (the compressed log-shipping layout; one file
    per block keeps the write resumable and the read parallel — gzip is
    not splittable, so file-per-block IS the parallelism unit at 100 TB)
    → ``ray.data.read_text`` with a gzip codec → quirky parse back to
    (subj, pred, obj). Identity on bracket-free IRIs, so the oracle is
    the canonical SQL — the same contract as nt_roundtrip, now pinning
    the compressed codec path both directions."""
    import gzip

    import ray.data

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.ntparse import parse_nt_batch, render_nt_batch

    out = tempfile.mkdtemp(prefix="ntto_ray_ntgz_")
    try:
        canonical = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])
        lines = canonical.map_batches(render_nt_batch, batch_format="pyarrow")

        def write_gz(t: pa.Table) -> pa.Table:
            if t.num_rows:
                payload = "\n".join(t.column(0).to_pylist()) + "\n"
                h = hashlib.md5(payload.encode()).hexdigest()[:16]
                path = os.path.join(out, f"part-{h}.nt.gz")
                with gzip.open(path, "wt") as f:
                    f.write(payload)
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        # consume the write side fully before reading back
        lines.map_batches(write_gz, batch_format="pyarrow").materialize()

        back = ray.data.read_text(
            out, arrow_open_stream_args={"compression": "gzip"}
        )
        renamed = back.map_batches(
            lambda t: t.rename_columns(["text"]), batch_format="pyarrow"
        )
        # materialize (round-trip result is query-scale) so the tempdir
        # can be removed before returning the lazy-no-more dataset.
        return renamed.map_batches(parse_nt_batch, batch_format="pyarrow").materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


_late_gzip_oracle()


@register(
    "ipc_roundtrip",
    oracle="""
SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM documents GROUP BY 1, 2
""",
)
def ipc_roundtrip(sf_dir: str):
    """documents → Arrow IPC (Feather v2) files under /tmp, one file per
    block written inside map_batches (parallel, content-addressed names
    — the resumable-output layout) → ``ray.data.read_binary_files`` +
    ``pa.ipc.open_file`` decode → grouped aggregate, oracled against the
    original Parquet. IPC is the zero-copy interchange format a Ray Data
    engine hands to sibling Arrow systems (DuckDB, polars, Flight); the
    round-trip pins both directions."""
    import numpy as np
    import ray.data

    # per-run tempdir (mkdtemp), not a fixed md5(sf_dir) path: two
    # concurrent invocations against the same sf_dir (bench + a sweep)
    # must not race each other's part files between write and read-back.
    out = tempfile.mkdtemp(prefix="ntto_ray_ipc_")
    try:
        docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])

        def write_block(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema([("path", pa.string())]).empty_table()
            key = hashlib.md5(
                np.ascontiguousarray(
                    t["doc_id"].to_numpy(zero_copy_only=False)
                ).tobytes()
            ).hexdigest()[:16]
            path = os.path.join(out, f"part-{key}.arrow")
            with pa.OSFile(path, "wb") as f, pa.ipc.new_file(f, t.schema) as w:
                w.write_table(t)
            return pa.table({"path": [path]})

        # consume the write (block-scale rows) before reading back
        docs.map_batches(write_block, batch_format="pyarrow").materialize()

        back = ray.data.read_binary_files(out)

        def decode_partial(b: dict) -> pa.Table:
            parts = []
            for buf in b["bytes"]:
                parts.append(pa.ipc.open_file(pa.BufferReader(buf)).read_all())
            t = pa.concat_tables(parts) if parts else None
            if t is None or t.num_rows == 0:
                return pa.schema(
                    [
                        ("lang", pa.string()),
                        ("source", pa.string()),
                        ("cnt", pa.int64()),
                        ("chars_sum", pa.int64()),
                        ("min_doc", pa.int64()),
                    ]
                ).empty_table()
            g = t.group_by(["lang", "source"]).aggregate(
                [("doc_id", "count"), ("n_chars", "sum"), ("doc_id", "min")]
            )
            return g.select(
                ["lang", "source", "doc_id_count", "n_chars_sum", "doc_id_min"]
            ).rename_columns(["lang", "source", "cnt", "chars_sum", "min_doc"])

        partials = back.map_batches(decode_partial, batch_format="numpy")
        merged = (
            partials.to_pandas()
            .groupby(["lang", "source"], as_index=False)
            .agg(
                cnt=("cnt", "sum"),
                chars_sum=("chars_sum", "sum"),
                min_doc=("min_doc", "min"),
            )
        )
        return merged
    finally:
        shutil.rmtree(out, ignore_errors=True)
