"""KG-pipeline queries (flagship) with exact DuckDB oracles generated
from the same spec constants the Ray stages use (functions/kgspec.py)."""

from __future__ import annotations

import pyarrow as pa

from ntto_ray.functions import kgspec as K
from ntto_ray.registry import register


def _rules():
    from ntto_ray.pipelines.kg import pipeline_rules

    return pipeline_rules()


@register("kg_transcripts", oracle=K.transcripts_sql())
def kg_transcripts(sf_dir: str):
    from ntto_ray.sources.transcripts import synth_transcripts

    return synth_transcripts(sf_dir)


@register("kg_triples_raw", oracle=K.triples_raw_sql())
def kg_triples_raw(sf_dir: str):
    from ntto_ray.pipelines.kg import extract_triples
    from ntto_ray.sources.transcripts import synth_transcripts

    return extract_triples(synth_transcripts(sf_dir))


def _abbrev_oracle():
    from ntto_ray.pipelines.kg import pipeline_rules

    return K.triples_abbrev_sql(pipeline_rules())


@register("kg_triples_abbrev", oracle=None)
def kg_triples_abbrev(sf_dir: str):
    from ntto_ray.pipelines.kg import abbreviate, extract_triples
    from ntto_ray.sources.transcripts import synth_transcripts

    return abbreviate(extract_triples(synth_transcripts(sf_dir)))


@register("kg_triples_canonical", oracle=None)
def kg_triples_canonical(sf_dir: str):
    from ntto_ray.pipelines.kg import run_kg_pipeline

    return run_kg_pipeline(sf_dir)


@register("kg_adjacency_degrees", oracle=None)
def kg_adjacency_degrees(sf_dir: str):
    from ntto_ray.pipelines.kg import run_kg_pipeline, subject_degrees

    # keep_bucket → degrees reduce per block first; the exchange only
    # moves subject-scale partials
    return subject_degrees(run_kg_pipeline(sf_dir, keep_bucket=True), bucketed=True)


@register("kg_ndjson_lines", oracle=None)
def kg_ndjson_lines(sf_dir: str):
    """Canonical triples rendered as ntto-parity NDJSON lines
    (cmd/ntto/ntto.go:36-50 byte semantics), returned as a one-column
    table for hashing."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.materialize import render_ndjson_batch

    canonical = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])
    return canonical.map_batches(render_ndjson_batch, batch_format="pyarrow")


def _late_oracles():
    """Rule-dependent oracles need the rule table loaded; fill them in at
    import time (cheap — the table is a package data file)."""
    from ntto_ray.registry import _ORACLES

    rules = _rules()
    _ORACLES["kg_triples_abbrev"] = K.triples_abbrev_sql(rules)
    _ORACLES["kg_triples_canonical"] = K.triples_canonical_sql(rules)
    _ORACLES["kg_adjacency_degrees"] = K.adjacency_sql(rules)
    # NDJSON lines: Go-escape in SQL (the canonical values contain no
    # backslashes/quotes/control chars after abbreviation, and '<'/'>' only
    # survive in non-IRI literals; still mirror the full escape chain for
    # the characters SQL can express).
    canon = K.triples_canonical_sql(rules)
    def esc(col: str) -> str:
        return (
            "replace(replace(replace(replace(replace("
            f"{col}, '\\', '\\\\'), '\"', '\\\"'), "
            "'<', '\\u003c'), '>', '\\u003e'), '&', '\\u0026')"
        )
    _ORACLES["kg_ndjson_lines"] = f"""
WITH canon AS ({canon})
SELECT '{{"s":"' || {esc('subj')} || '","p":"' || {esc('pred')}
       || '","o":"' || {esc('obj')} || '"}}' AS line
FROM canon
""".strip()


_late_oracles()


@register("kg_object_copairs", oracle=None)  # oracle filled by _late_oracles2
def kg_object_copairs(sf_dir: str):
    """Object co-occurrence edges: for every subject in the canonical
    graph, all unordered pairs of distinct objects it links to, counted
    across subjects — the co-mention edge weighting a KG layer builds on
    top of raw triples (reference has no counterpart; this is engine
    surface). Plan: canonical triples → group-safe hash exchange on
    ``subj`` (stages/exchange.hash_grouped — every subject whole in one
    sorted block) → per-block fully vectorized pair expansion (distinct
    (subj,obj) via packed np.unique, run-length triangular index
    generation — no Python loop over subjects) → per-block pair partial
    counts → one grouped Sum over pair keys. Pair volume is quadratic in
    per-subject out-degree, which the extractor bounds per turn; a
    degree cap would be the knob at adversarial skew."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canonical = run_kg_pipeline(sf_dir).select_columns(["subj", "obj"])
    grouped = hash_grouped(canonical, ["subj"])

    _EMPTY = pa.table(
        {
            "obj_a": pa.array([], pa.string()),
            "obj_b": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
        }
    )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        s_enc = t.column("subj").combine_chunks().dictionary_encode()
        o_enc = t.column("obj").combine_chunks().dictionary_encode()
        s_codes = np.asarray(s_enc.indices, dtype=np.int64)
        o_codes = np.asarray(o_enc.indices, dtype=np.int64)
        o_vals = np.array(o_enc.dictionary.to_pylist())  # unicode dtype → C sort
        K = len(o_vals)
        order = np.argsort(o_vals)  # numpy str order == UTF-8 == DuckDB binary
        rank = np.empty(K, dtype=np.int64)
        rank[order] = np.arange(K, dtype=np.int64)
        sorted_vals = o_vals[order]

        # distinct (subj, obj), grouped by subject, objects in lex order
        u = np.unique(s_codes * K + rank[o_codes])
        su, ru = u // K, u % K
        starts, ends = runs(su)
        idx = np.arange(len(u), dtype=np.int64)
        cnt_el = np.repeat(ends, ends - starts) - idx - 1  # pairs anchored at idx
        total = int(cnt_el.sum())
        if total == 0:
            return _EMPTY
        off = np.concatenate(([0], np.cumsum(cnt_el)[:-1]))
        a_idx = np.repeat(idx, cnt_el)
        b_idx = a_idx + 1 + (np.arange(total, dtype=np.int64) - np.repeat(off, cnt_el))
        up, c = np.unique(ru[a_idx] * K + ru[b_idx], return_counts=True)
        return pa.table(
            {
                "obj_a": pa.array(sorted_vals[up // K].tolist(), pa.string()),
                "obj_b": pa.array(sorted_vals[up % K].tolist(), pa.string()),
                "cnt": pa.array(c.astype(np.int64)),
            }
        )

    partials = grouped.map_batches(
        pairs, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    return partials.groupby(["obj_a", "obj_b"]).aggregate(
        Sum("cnt", alias_name="cnt")
    )


def _late_oracles2():
    from ntto_ray.registry import _ORACLES

    canon = K.triples_canonical_sql(_rules())
    _ORACLES["kg_object_copairs"] = f"""
WITH canon AS ({canon}),
so AS (SELECT DISTINCT subj, obj FROM canon)
SELECT a.obj AS obj_a, b.obj AS obj_b, CAST(count(*) AS BIGINT) AS cnt
FROM so a JOIN so b ON a.subj = b.subj AND a.obj < b.obj
GROUP BY 1, 2
""".strip()


_late_oracles2()


@register("kg_pagerank", oracle=None)  # oracle filled by _late_oracles3
def kg_pagerank(sf_dir: str):
    """Entity importance over the canonical graph: 10 iterations of
    integer-arithmetic PageRank (stages/graph.pagerank_int) on the
    directed subj→obj multigraph. Pure int64 updates make the iterative
    distributed algorithm bit-exactly SQL-mirrorable (each iteration is
    one unrolled CTE in the oracle) — no float accumulation-order
    hazard. Reference has no counterpart; engine surface on top of the
    reference's triple model (cmd/ntto/ntto.go:36-50 data model)."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.graph import pagerank_int

    return pagerank_int(
        run_kg_pipeline(sf_dir).select_columns(["subj", "obj"]), iterations=10
    )


def _late_oracles3():
    from ntto_ray.registry import _ORACLES

    canon = K.triples_canonical_sql(_rules())
    scale, d, iters = 10**9, 85, 10
    base = (100 - d) * scale // 100
    # MATERIALIZED is load-bearing: edges/nodes/odeg are each referenced
    # in every one of the {iters} unrolled iterations — plain CTEs
    # re-evaluate per reference, re-running the whole canonicalization
    # subquery 3×{iters} times.
    cte = [
        f"canon AS MATERIALIZED ({canon})",
        "edges AS MATERIALIZED (SELECT subj AS src, obj AS dst FROM canon)",
        "nodes AS MATERIALIZED"
        " (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "odeg AS MATERIALIZED"
        " (SELECT src, count(*) AS od FROM edges GROUP BY src)",
        f"pr0 AS (SELECT node, CAST({scale} AS BIGINT) AS pr FROM nodes)",
    ]
    for r in range(1, iters + 1):
        cte.append(f"""pr{r} AS (
  SELECT n.node, CAST({base} + {d} * COALESCE(s.c, 0) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr // o.od) AS c
    FROM edges e JOIN pr{r - 1} p ON p.node = e.src
                 JOIN odeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
)""")
    _ORACLES["kg_pagerank"] = (
        "WITH " + ",\n".join(cte) + f"\nSELECT node, pr FROM pr{iters}"
    )


_late_oracles3()


@register("kg_namespace_stats", oracle=None)  # oracle filled below
def kg_namespace_stats(sf_dir: str):
    """Namespace distribution of the canonical KG — the reporting view
    of the reference's own core concept (the prefix rule table,
    rules.go:3-242): per role (subj/pred/obj), triple counts by the
    abbreviated namespace shortcut (the part before the first ':',
    '(none)' when unabbreviated). One streaming pass; per-batch Arrow
    split + masked group counts; the aggregate moves
    (role × namespace)-scale rows."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline

    canonical = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        roles, nss = [], []
        for role in ("subj", "pred", "obj"):
            v = t[role]
            has = pc.match_substring(v, ":")
            first = pc.list_element(
                pc.split_pattern(v, pattern=":", max_splits=1), 0
            )
            ns = pc.if_else(has, first, pa.scalar("(none)"))
            g = pa.table({"ns": ns}).group_by("ns").aggregate([([], "count_all")])
            roles.append(
                pa.table(
                    {
                        "role": pa.array([role] * g.num_rows, pa.string()),
                        "ns": g["ns"],
                        "n": g["count_all"],
                    }
                )
            )
        return pa.concat_tables(roles)

    return (
        canonical.map_batches(partial, batch_format="pyarrow")
        .groupby(["role", "ns"])
        .aggregate(Sum("n", alias_name="n"))
    )


def _late_oracles4():
    from ntto_ray.registry import _ORACLES

    canon = K.triples_canonical_sql(_rules())
    _ORACLES["kg_namespace_stats"] = f"""
WITH canon AS MATERIALIZED ({canon}),
r AS (
  SELECT 'subj' AS role, subj AS v FROM canon
  UNION ALL SELECT 'pred', pred FROM canon
  UNION ALL SELECT 'obj', obj FROM canon
)
SELECT role,
       CASE WHEN strpos(v, ':') > 0 THEN substr(v, 1, strpos(v, ':') - 1)
            ELSE '(none)' END AS ns,
       CAST(count(*) AS BIGINT) AS n
FROM r GROUP BY 1, 2
""".strip()


_late_oracles4()


@register("kg_degree_distribution", oracle=None)  # oracle filled below
def kg_degree_distribution(sf_dir: str):
    """Out-degree histogram of the canonical KG — the first plot any
    graph-quality report draws (power-law check, super-node detection).
    Plan: cached canonical (keep_bucket) → exact per-subject degrees via
    the bucket-local partial aggregate (subject_degrees — the exchange
    only moves subject-scale partials) → per-block histogram partials
    (np.unique over the degree column) → one tiny groupby(degree) Sum
    over histogram-scale rows. No data-scale exchange beyond the one
    canonicalize already paid."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline, subject_degrees

    degs = subject_degrees(
        run_kg_pipeline(sf_dir, keep_bucket=True), bucketed=True
    ).select_columns(["degree"])

    _EMPTY = pa.table(
        {
            "degree": pa.array([], pa.int64()),
            "n_subj": pa.array([], pa.int64()),
        }
    )

    def hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "degree" not in t.column_names:
            return _EMPTY
        d, c = np.unique(t["degree"].to_numpy(), return_counts=True)
        return pa.table(
            {
                "degree": pa.array(d.astype(np.int64)),
                "n_subj": pa.array(c.astype(np.int64)),
            }
        )

    return (
        degs.map_batches(hist, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n_subj", alias_name="n_subj"))
    )


def _late_oracles5():
    from ntto_ray.registry import _ORACLES

    canon = K.triples_canonical_sql(_rules())
    _ORACLES["kg_degree_distribution"] = f"""
WITH canon AS MATERIALIZED ({canon}),
d AS (SELECT subj, count(*) AS degree FROM canon GROUP BY subj)
SELECT CAST(degree AS BIGINT) AS degree, CAST(count(*) AS BIGINT) AS n_subj
FROM d GROUP BY degree
""".strip()


_late_oracles5()


@register("kg_predicate_fanout", oracle=None)  # oracle filled below
def kg_predicate_fanout(sf_dir: str):
    """Per-predicate fanout profile: edge count, distinct subjects,
    distinct objects — the functionality / inverse-functionality signal
    KG-quality monitors compute per relation. Plan: cached canonical →
    (a) map-side per-predicate edge counts, merged by a tiny grouped Sum
    (partials only, no data exchange); (b) block-local distinct
    (pred, subj) pairs → ONE hash exchange keyed on the PAIR (subj
    spreads hot predicates, no skew) → block-local exact distinct →
    per-predicate partial counts → tiny Sum; (c) same for (pred, obj).
    All three outputs are predicate-vocabulary-scale (result-scale), so
    the driver-side merge is bounded."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    def edge_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("pred").aggregate([("pred", "count")])
        return g.select(["pred", "pred_count"]).rename_columns(["pred", "n"])

    def pair_distinct(col: str):
        _empty = pa.table(
            {"pred": pa.array([], pa.string()), col: pa.array([], pa.string())}
        )

        def inner(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "pred" not in t.column_names:
                return _empty
            return t.select(["pred", col]).group_by(["pred", col]).aggregate([])

        return inner

    def pair_count(col: str):
        _empty = pa.table(
            {"pred": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )

        def inner(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "pred" not in t.column_names:
                return _empty
            # block holds whole (pred, col) groups → block distinct is
            # globally distinct
            d = t.group_by(["pred", col]).aggregate([])
            g = d.group_by("pred").aggregate([("pred", "count")])
            return g.select(["pred", "pred_count"]).rename_columns(["pred", "n"])

        return inner

    def count_by_pred(ds, kernel, exchanged: bool):
        if exchanged:
            ds = ds.map_batches(
                kernel, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
            )
        else:
            ds = ds.map_batches(kernel, batch_format="pyarrow")
        return ds.groupby("pred").aggregate(Sum("n", alias_name="n")).to_pandas()

    edges = count_by_pred(canon, edge_counts, exchanged=False)
    subj = count_by_pred(
        hash_grouped(
            canon.map_batches(pair_distinct("subj"), batch_format="pyarrow"),
            ["pred", "subj"],
        ),
        pair_count("subj"),
        exchanged=True,
    )
    obj = count_by_pred(
        hash_grouped(
            canon.map_batches(pair_distinct("obj"), batch_format="pyarrow"),
            ["pred", "obj"],
        ),
        pair_count("obj"),
        exchanged=True,
    )
    out = (
        edges.rename(columns={"n": "n_edges"})
        .merge(subj.rename(columns={"n": "n_subj"}), on="pred")
        .merge(obj.rename(columns={"n": "n_obj"}), on="pred")
    )
    return out.reset_index(drop=True)


def _late_oracles6():
    from ntto_ray.registry import _ORACLES

    canon = K.triples_canonical_sql(_rules())
    _ORACLES["kg_predicate_fanout"] = f"""
WITH canon AS MATERIALIZED ({canon})
SELECT pred, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(count(DISTINCT subj) AS BIGINT) AS n_subj,
       CAST(count(DISTINCT obj) AS BIGINT) AS n_obj
FROM canon GROUP BY pred
""".strip()


_late_oracles6()


@register("kg_characteristic_sets", oracle=None)  # oracle filled below
def kg_characteristic_sets(sf_dir: str):
    """Characteristic sets (Neumann & Moerkotte, ICDE 2011): the
    histogram of distinct per-subject predicate SETS — the classic KG
    structure summary (RDF cardinality estimation, entity-shape mining).
    Plan: cached canonical → block-local distinct (subj, pred) pairs
    (map-side combine) → ONE subject-keyed hash exchange of pair-distinct
    rows (whole subjects per block by the hash_grouped contract — the
    canonicalize bucket layout alone is not enough because a bucket may
    split at the block-size boundary and set-valued partials don't
    Sum-merge) → vectorized cset build (runs + ListArray + binary_join,
    no per-subject Python loop) → per-block histogram partials → tiny
    groupby(cset) Sum at result scale."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred"])

    _PAIRS = pa.schema([("subj", pa.string()), ("pred", pa.string())])
    _HIST = pa.schema([("cset", pa.string()), ("n", pa.int64())])

    def pair_distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _PAIRS.empty_table()
        return t.group_by(["subj", "pred"]).aggregate([])

    def cset_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _HIST.empty_table()
        d = t.group_by(["subj", "pred"]).aggregate([])  # exact: whole subj
        d = d.sort_by([("subj", "ascending"), ("pred", "ascending")])
        subj = d["subj"].to_numpy(zero_copy_only=False)
        starts, _ = runs(subj)
        offsets = np.concatenate([starts, [len(subj)]]).astype(np.int32)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            d["pred"].combine_chunks(),
        )
        csets = pc.binary_join(la, "|")
        g = (
            pa.table({"cset": csets})
            .group_by("cset")
            .aggregate([("cset", "count")])
        )
        return g.select(["cset", "cset_count"]).rename_columns(["cset", "n"])

    pairs = canon.map_batches(pair_distinct, batch_format="pyarrow")
    grouped = hash_grouped(pairs, ["subj"])
    partials = grouped.map_batches(
        cset_partial, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    return partials.groupby("cset").aggregate(Sum("n", alias_name="n_subj"))


def _late_oracles7():
    from ntto_ray.registry import _ORACLES

    canon = K.triples_canonical_sql(_rules())
    _ORACLES["kg_characteristic_sets"] = f"""
WITH canon AS MATERIALIZED ({canon}),
cs AS (
  SELECT subj, string_agg(DISTINCT pred, '|' ORDER BY pred) AS cset
  FROM canon GROUP BY subj
)
SELECT cset, CAST(count(*) AS BIGINT) AS n_subj FROM cs GROUP BY cset
""".strip()


_late_oracles7()
