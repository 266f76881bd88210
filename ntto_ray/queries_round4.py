"""Round-4 additions: the ORC columnar codec round-trip, a CDC-style
MERGE/upsert (the Delta-Lake/Hudi pattern an incremental 100-TB corpus
build needs), and DSIR importance weighting (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") —
the standard target-distribution re-weighting step of LM data curation.

All three register AFTER the driver's 50-row window (registry tail):
they get the judge-sweep oracle check, not driver rows."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ntto_ray.queries_rel import _cents, _read
from ntto_ray.registry import register


# --- ORC round-trip ---------------------------------------------------------

@register(
    "orc_roundtrip",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
       CAST(min(l_orderkey) AS BIGINT) AS min_key
FROM lineitem GROUP BY 1, 2
""",
)
def orc_roundtrip(sf_dir: str):
    """lineitem → ORC files under /tmp, one file per block written inside
    map_batches (parallel, content-addressed names — the resumable-output
    layout) → ``ray.data.read_binary_files`` + ``pyarrow.orc`` decode →
    grouped aggregate, oracled against the original Parquet. ORC is the
    other mainstream columnar interchange format (Hive/Trino warehouses);
    Ray Data has no ``read_orc``, so the read side IS the documented
    pattern for any pyarrow-decodable format: binary files → decode
    partial inside map_batches (same shape as ``ipc_roundtrip``)."""
    import ray.data
    from pyarrow import orc

    out = tempfile.mkdtemp(prefix="ntto_ray_orc_")
    try:
        li = _read(
            sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_linestatus"]
        )

        def write_block(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema([("path", pa.string())]).empty_table()
            key = hashlib.md5(
                np.ascontiguousarray(
                    t["l_orderkey"].to_numpy(zero_copy_only=False)
                ).tobytes()
            ).hexdigest()[:16]
            path = os.path.join(out, f"part-{key}.orc")
            orc.write_table(t, path)
            return pa.table({"path": [path]})

        # consume the write (block-scale rows) before reading back
        li.map_batches(write_block, batch_format="pyarrow").materialize()

        back = ray.data.read_binary_files(out)
        agg_schema = pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("cnt", pa.int64()),
                ("key_sum", pa.int64()),
                ("min_key", pa.int64()),
            ]
        )

        def decode_partial(b: dict) -> pa.Table:
            parts = [
                orc.ORCFile(pa.BufferReader(buf)).read() for buf in b["bytes"]
            ]
            t = pa.concat_tables(parts) if parts else None
            if t is None or t.num_rows == 0:
                return agg_schema.empty_table()
            g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
                [("l_orderkey", "count"), ("l_orderkey", "sum"), ("l_orderkey", "min")]
            )
            return g.select(
                [
                    "l_returnflag",
                    "l_linestatus",
                    "l_orderkey_count",
                    "l_orderkey_sum",
                    "l_orderkey_min",
                ]
            ).rename_columns(
                ["l_returnflag", "l_linestatus", "cnt", "key_sum", "min_key"]
            )

        partials = back.map_batches(decode_partial, batch_format="numpy")
        merged = (
            partials.to_pandas()
            .groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                cnt=("cnt", "sum"),
                key_sum=("key_sum", "sum"),
                min_key=("min_key", "min"),
            )
        )
        return merged
    finally:
        shutil.rmtree(out, ignore_errors=True)


# --- CDC MERGE / upsert -----------------------------------------------------

@register(
    "rel_merge_upsert",
    oracle="""
WITH latest AS (
  SELECT user_id, value FROM (
    SELECT user_id, value,
           row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
), base AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT COALESCE(b.c_custkey, l.user_id) AS custkey,
       CAST(round(COALESCE(l.value, b.c_acctbal) * 100) AS BIGINT) AS bal_c,
       CASE WHEN l.user_id IS NULL THEN 'base'
            WHEN b.c_custkey IS NULL THEN 'insert'
            ELSE 'update' END AS op
FROM base b FULL OUTER JOIN latest l ON b.c_custkey = l.user_id
""",
)
def rel_merge_upsert(sf_dir: str):
    """CDC-style MERGE INTO: fold an event stream's LATEST value per key
    onto a base snapshot — matched keys update, unmatched updates insert,
    untouched base rows pass through (the Delta-Lake/Hudi upsert an
    incremental corpus/KG build runs every ingest cycle, cf. the engine's
    ``kg_delta_update`` for the triple-level variant).

    Latest-per-key is two-level: a per-block lexsort partial (run-ends =
    block-local argmax by (ts, event_id)) cuts the exchange to
    ≤ keys-per-block rows, then ONE user-keyed hash exchange finalizes
    with the same kernel. The merge itself is Ray's native distributed
    ``Dataset.join(full_outer)`` — both sides key-scale by then, and the
    update side's null pattern drives the op tag, exactly the MERGE
    matched/not-matched branches."""
    import ray.data  # noqa: F401

    from ntto_ray.stages.exchange import (
        hash_grouped,
        join_parallelism,
        runs,
    )

    def latest_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("ts", pa.int64()),
                    ("event_id", pa.int64()),
                    ("value", pa.float64()),
                ]
            ).empty_table()
        user = t["user_id"].to_numpy()
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        eid = t["event_id"].to_numpy()
        order = np.lexsort((eid, ts, user))
        _, ends = runs(user[order])
        keep = order[ends - 1]
        return pa.table(
            {
                "user_id": user[keep],
                "ts": ts[keep],
                "event_id": eid[keep],
                "value": t["value"].to_numpy()[keep],
            }
        )

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    partials = ev.map_batches(latest_partial, batch_format="pyarrow")
    latest = (
        hash_grouped(partials, ["user_id"], sort=False)
        .map_batches(latest_partial, batch_size=None, batch_format="pyarrow")
        .map_batches(
            lambda t: t.select(["user_id", "value"]).rename_columns(
                ["user_id", "new_value"]
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    base = (
        _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(
                pc.equal(t["c_mktsegment"], "BUILDING")
            ).select(["c_custkey", "c_acctbal"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    joined = base.join(
        latest,
        "full_outer",
        num_partitions=join_parallelism(base, latest),
        on=("c_custkey",),
        right_on=("user_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        # full_outer coalesces the key into the LEFT column; the null
        # pattern of the non-key columns tells which side(s) matched.
        has_upd = pc.is_valid(t["new_value"])
        has_base = pc.is_valid(t["c_acctbal"])
        bal = pc.coalesce(t["new_value"], t["c_acctbal"])
        op = pc.if_else(
            has_upd,
            pc.if_else(has_base, pa.scalar("update"), pa.scalar("insert")),
            pa.scalar("base"),
        )
        return pa.table(
            {
                "custkey": t["c_custkey"].cast(pa.int64()),
                "bal_c": _cents(bal),
                "op": op,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


# --- DSIR importance weights -------------------------------------------------

_DSIR_SCALE = 1_000_000
_DSIR_SMOOTH = 65_536  # fixed pseudo-vocab additive smoothing (the paper
# fixes its feature space to 2^16 hashed buckets for exactly this reason:
# no global-vocabulary pass is needed, the plan stays one exchange)


@register(
    "text_dsir_importance",
    oracle=f"""
WITH t AS (
  SELECT doc_id, tok, count(*) AS tf,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tft
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY 1, 2
),
s AS (SELECT tok, sum(tf) AS n_r, sum(tft) AS n_t FROM t GROUP BY 1)
SELECT t.doc_id,
       CAST(sum(t.tf * (((s.n_t + 1) * {_DSIR_SCALE}) // (s.n_r + {_DSIR_SMOOTH})))
            AS BIGINT) AS score
FROM t JOIN s USING (tok)
GROUP BY 1
""",
)
def text_dsir_importance(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): score every doc by how
    much its unigram distribution looks like the TARGET slice (here
    lang='en') relative to the raw corpus — the importance-resampling
    signal LM curation uses to up-sample target-like data. Fixed-point
    integer likelihood ratio instead of log-probs (``((n_t+1)*1e6) //
    (n_r + 65536)`` per token occurrence, additive smoothing over a fixed
    pseudo-vocab like the paper's fixed 2^16 hashed feature space) so the
    result is float-free and hash-stable vs SQL.

    One corpus-scale exchange: per-batch (doc, tok, tf, target-tf)
    partials from a C++ group_by, token-keyed hash exchange where each
    token run computes its global (n_t, n_r) and folds the per-row
    contribution immediately (rows never leave the partition un-reduced:
    a block-local doc-keyed partial sum), then a small doc-keyed
    aggregate. At 100 TB the exchange carries (doc, distinct-token) rows
    — the same volume the TF-IDF stage moves — and nothing else."""
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    from ntto_ray.stages.exchange import hash_grouped, runs

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def tf_rows(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], pattern=" ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(t["doc_id"].to_numpy(), n)
        is_t = np.repeat(
            pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False), n
        ).astype(np.int64)
        g = (
            pa.table({"doc_id": doc, "tok": flat, "tgt": is_t})
            .group_by(["doc_id", "tok"])
            .aggregate([([], "count_all"), ("tgt", "sum")])
        )
        return g.select(["doc_id", "tok", "count_all", "tgt_sum"]).rename_columns(
            ["doc_id", "tok", "tf", "tft"]
        )

    by_tok = hash_grouped(
        docs.map_batches(tf_rows, batch_format="pyarrow"), ["tok"], sort=True
    )

    part_schema = pa.schema([("doc_id", pa.int64()), ("score", pa.int64())])

    def fold_contrib(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return part_schema.empty_table()
        tok = t["tok"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy().astype(np.int64)
        tft = t["tft"].to_numpy().astype(np.int64)
        starts, ends = runs(tok)
        # per-run global counts, stamped back onto each row
        cs_r = np.r_[0, np.cumsum(tf)]
        cs_t = np.r_[0, np.cumsum(tft)]
        width = ends - starts
        n_r = np.repeat(cs_r[ends] - cs_r[starts], width)
        n_t = np.repeat(cs_t[ends] - cs_t[starts], width)
        contrib = tf * (((n_t + 1) * _DSIR_SCALE) // (n_r + _DSIR_SMOOTH))
        g = (
            pa.table({"doc_id": t["doc_id"], "score": contrib})
            .group_by("doc_id")
            .aggregate([("score", "sum")])
        )
        return g.select(["doc_id", "score_sum"]).rename_columns(
            ["doc_id", "score"]
        )

    folded = by_tok.map_batches(
        fold_contrib, batch_size=None, batch_format="pyarrow"
    )
    return folded.groupby("doc_id").aggregate(Sum("score", alias_name="score"))
