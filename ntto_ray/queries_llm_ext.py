"""Round-3 extension operators: KG export/statistics surfaces and
LLM-training-data curation ops the earlier suites don't cover —
two-hop predicate-path statistics (SPARQL cardinality estimation),
per-entity serialized cards (KG→text export for LM training),
LAG-window inter-arrival gaps, incremental batch-vs-corpus dedup, and
duplicated-substring span detection (Lee et al., ACL 2022,
"Deduplicating Training Data Makes Language Models Better").

Engine surface on top of the reference's triple model
(cmd/ntto/ntto.go:36-50 — the reference has no analytics operators at
all, SURVEY §2.2); every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ntto_ray.registry import _ORACLES, register


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --- two-hop predicate-path statistics --------------------------------------


@register("kg_pred_paths", oracle=None)  # oracle filled by _late_oracles below
def kg_pred_paths(sf_dir: str):
    """Two-hop predicate-path histogram over the canonical KG: for every
    pair of predicates (p, q), the number of length-2 paths s -p-> m -q-> o
    — the path-pattern statistic SPARQL optimizers estimate join
    cardinalities from (Neumann & Weikum, VLDB 2010 RDF-3X selectivity
    model) and KG-quality monitors watch for schema drift.

    Plan: cached canonical → block-local (node, side, pred) count
    partials (side 0 = node appears as obj / incoming, side 1 = node
    appears as subj / outgoing) → ONE node-keyed hash exchange of the
    partials (never the triples) → per-node outer product of in-pred ×
    out-pred count vectors, emitted as (pred_a, pred_b, n) block partials
    — the join NEVER expands s×o pairs, so a hub with 10^6 in- and
    out-edges contributes |P_in|·|P_out| rows (predicate-vocabulary
    scale), not 10^12 — → tiny groupby Sum at P² result scale."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    _PART = pa.schema(
        [("node", pa.string()), ("side", pa.int8()), ("pred", pa.string()),
         ("cnt", pa.int64())]
    )
    _OUT = pa.schema(
        [("pred_a", pa.string()), ("pred_b", pa.string()), ("n", pa.int64())]
    )

    def side_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _PART.empty_table()
        inc = (
            t.select(["obj", "pred"])
            .group_by(["obj", "pred"])
            .aggregate([([], "count_all")])
            .rename_columns(["node", "pred", "cnt"])
        )
        out = (
            t.select(["subj", "pred"])
            .group_by(["subj", "pred"])
            .aggregate([([], "count_all")])
            .rename_columns(["node", "pred", "cnt"])
        )
        side = pa.concat_arrays(
            [
                pa.nulls(inc.num_rows, pa.int8()).fill_null(0),
                pa.nulls(out.num_rows, pa.int8()).fill_null(1),
            ]
        )
        both = pa.concat_tables([inc, out])
        return pa.table(
            {
                "node": both["node"],
                "side": side,
                "pred": both["pred"],
                "cnt": pc.cast(both["cnt"], pa.int64()),
            }
        )

    def path_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return _OUT.empty_table()
        # rows of one node may arrive from several upstream blocks —
        # re-sum, then sort so each node is one contiguous run split
        # into its side-0 (incoming) and side-1 (outgoing) halves.
        d = t.group_by(["node", "side", "pred"]).aggregate([("cnt", "sum")])
        d = d.sort_by(
            [("node", "ascending"), ("side", "ascending"), ("pred", "ascending")]
        )
        node = d["node"].to_numpy(zero_copy_only=False)
        sidec = d["side"].to_numpy(zero_copy_only=False)
        cnt = d["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts, ends = runs(node)
        if len(starts) == 0:
            return _OUT.empty_table()
        # per-node boundary between side 0 and side 1 rows (runs tile
        # the sorted array, so reduceat segments == node runs)
        mids = starts + np.add.reduceat((sidec == 0).astype(np.int64), starts)
        n_in = mids - starts
        n_out = ends - mids
        pairs = n_in * n_out
        total = int(pairs.sum())
        if total == 0:
            return _OUT.empty_table()
        # ragged cross product: for node i emit every (in-row, out-row)
        # index pair — vectorized with cumsum arithmetic, no Python loop.
        node_of_pair = np.repeat(np.arange(len(starts)), pairs)
        off = np.concatenate([[0], np.cumsum(pairs)[:-1]])
        local = np.arange(total) - off[node_of_pair]
        no = n_out[node_of_pair]
        a_idx = starts[node_of_pair] + local // no
        b_idx = mids[node_of_pair] + local % no
        pred = d["pred"].combine_chunks()
        part = pa.table(
            {
                "pred_a": pred.take(pa.array(a_idx, pa.int64())),
                "pred_b": pred.take(pa.array(b_idx, pa.int64())),
                "n": pa.array(cnt[a_idx] * cnt[b_idx], pa.int64()),
            }
        )
        g = part.group_by(["pred_a", "pred_b"]).aggregate([("n", "sum")])
        return g.rename_columns(["pred_a", "pred_b", "n"])

    partials = canon.map_batches(side_partial, batch_format="pyarrow")
    grouped = hash_grouped(partials, ["node"])
    paths = grouped.map_batches(
        path_partial, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    return paths.groupby(["pred_a", "pred_b"]).aggregate(
        Sum("n", alias_name="n_paths")
    )


# --- per-entity serialized cards --------------------------------------------


@register("kg_entity_cards", oracle=None)  # oracle filled by _late_oracles
def kg_entity_cards(sf_dir: str):
    """Per-entity 'card' materialization: one summary row per subject —
    triple count, distinct-predicate count, the sorted predicate set and
    the lexicographic min/max object — the KG→flat-record export used to
    serialize entities into LM training text (and the per-entity variant
    of kg_characteristic_sets' histogram).

    Plan: cached canonical → ONE subject-keyed hash exchange (whole
    subjects per block) → vectorized per-run kernel (sorted runs +
    ListArray + binary_join for the predicate set, grouped min/max/count
    for the rest; no per-subject Python loop). Result is entity-scale by
    construction — the export IS the output."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    _OUT = pa.schema(
        [
            ("subj", pa.string()),
            ("n_triples", pa.int64()),
            ("n_preds", pa.int64()),
            ("pred_set", pa.string()),
            ("min_obj", pa.string()),
            ("max_obj", pa.string()),
        ]
    )

    def card_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _OUT.empty_table()
        base = (
            t.group_by("subj")
            .aggregate([("pred", "count"), ("obj", "min"), ("obj", "max")])
            .sort_by([("subj", "ascending")])
        )
        dp = (
            t.select(["subj", "pred"])
            .group_by(["subj", "pred"])
            .aggregate([])
            .sort_by([("subj", "ascending"), ("pred", "ascending")])
        )
        subj = dp["subj"].to_numpy(zero_copy_only=False)
        starts, _ends = runs(subj)
        offsets = np.concatenate([starts, [len(subj)]]).astype(np.int32)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), dp["pred"].combine_chunks()
        )
        # base and the run table are both sorted by subj → rows align
        return pa.table(
            {
                "subj": base["subj"],
                "n_triples": pc.cast(base["pred_count"], pa.int64()),
                "n_preds": pa.array(
                    (offsets[1:] - offsets[:-1]).astype(np.int64)
                ),
                "pred_set": pc.binary_join(la, "|"),
                "min_obj": base["obj_min"],
                "max_obj": base["obj_max"],
            }
        )

    grouped = hash_grouped(canon, ["subj"])
    return grouped.map_batches(
        card_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


def _late_oracles_kg():
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules

    canon = K.triples_canonical_sql(pipeline_rules())
    _ORACLES["kg_pred_paths"] = f"""
WITH canon AS MATERIALIZED ({canon})
SELECT t1.pred AS pred_a, t2.pred AS pred_b,
       CAST(count(*) AS BIGINT) AS n_paths
FROM canon t1 JOIN canon t2 ON t1.obj = t2.subj
GROUP BY 1, 2
""".strip()
    _ORACLES["kg_entity_cards"] = f"""
WITH canon AS MATERIALIZED ({canon})
SELECT subj,
       CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT pred) AS BIGINT) AS n_preds,
       string_agg(DISTINCT pred, '|' ORDER BY pred) AS pred_set,
       min(obj) AS min_obj,
       max(obj) AS max_obj
FROM canon GROUP BY subj
""".strip()


_late_oracles_kg()


# --- LAG-window inter-arrival gaps ------------------------------------------

_LAG_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS d
  FROM events
)
SELECT user_id,
       CAST(count(d) AS BIGINT) AS n_gaps,
       CAST(min(d) AS BIGINT) AS min_gap_us,
       CAST(max(d) AS BIGINT) AS max_gap_us,
       CAST(sum(d) AS BIGINT) AS sum_gap_us
FROM g GROUP BY user_id HAVING count(d) > 0
""".strip()


@register("rel_lag_delta", oracle=_LAG_ORACLE)
def rel_lag_delta(sf_dir: str):
    """Per-user inter-arrival gaps — the LAG window function: delta of
    consecutive event timestamps per user (ties broken by event_id),
    aggregated to exact integer microsecond stats. Plan: ONE user-keyed
    hash exchange → per-block sort by (user, ts, event_id) → vectorized
    diff with run-boundary masking → reduceat min/max/sum per user."""
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_gaps", pa.int64()),
            ("min_gap_us", pa.int64()),
            ("max_gap_us", pa.int64()),
            ("sum_gap_us", pa.int64()),
        ]
    )

    def gap_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _OUT.empty_table()
        d = t.sort_by(
            [
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        user = d["user_id"].to_numpy(zero_copy_only=False)
        ts_us = pc.cast(d["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        if len(user) < 2:
            return _OUT.empty_table()
        # a gap at index j (between rows j and j+1) is valid iff both
        # rows belong to the same user; compact to the valid gaps, whose
        # user labels are still sorted → reduceat per contiguous run.
        valid = np.flatnonzero(user[1:] == user[:-1])
        if len(valid) == 0:
            return _OUT.empty_table()
        deltas = ts_us[valid + 1] - ts_us[valid]
        gap_user = user[valid]
        gs, ge = runs(gap_user)
        return pa.table(
            {
                "user_id": pa.array(gap_user[gs], pa.int64()),
                "n_gaps": pa.array((ge - gs).astype(np.int64)),
                "min_gap_us": pa.array(np.minimum.reduceat(deltas, gs)),
                "max_gap_us": pa.array(np.maximum.reduceat(deltas, gs)),
                "sum_gap_us": pa.array(np.add.reduceat(deltas, gs)),
            }
        )

    grouped = hash_grouped(ev, ["user_id"])
    return grouped.map_batches(
        gap_kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
