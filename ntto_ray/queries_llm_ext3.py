"""Round-3 continuation operators (batch 3): triple provenance lineage,
a cyclic 3-pattern SPARQL BGP, entity resolution by attribute-profile
Jaccard, and a per-source corpus quality report.

Engine surface beyond the reference's triple model (the reference,
cmd/ntto/ntto.go, stops at parse→abbreviate→render); every query carries
an exact DuckDB oracle built from the same kgspec constants the Ray
stages use. All outputs are integer/string typed (no float hash drift).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ntto_ray.registry import register


# --- provenance lineage ------------------------------------------------------

_PROV_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("cnt", pa.int64()),
        ("n_convs", pa.int64()),
        ("first_turn", pa.int64()),
    ]
)


@register("kg_provenance", oracle=None)  # oracle filled by _late_oracles
def kg_provenance(sf_dir: str):
    """Per-canonical-triple provenance: how many raw assertions support
    it (cnt), across how many distinct conversations (n_convs), and the
    earliest asserting turn (first_turn) — the lineage record a KG
    builder keeps so every edge is auditable back to its source
    transcript (W3C PROV-style support counting; the reference's data
    model, cmd/ntto/ntto.go:36-50, has no lineage at all).

    Plan: abbreviated triples KEEP their (conv_id, turn_idx) lineage
    columns (stages/extract.py TRIPLES_RAW_SCHEMA) → per-block C++
    pre-aggregation to (s,p,o,conv) partials (Arrow group_by — collapses
    within-block duplicate assertions before the wire) → ONE hash
    exchange keyed on (subj,pred,obj) → per-block two-level Arrow
    group_by: merge conv partials, then roll up cnt / distinct-conv /
    min-turn. The exchange moves conv-level partials, never raw triples."""
    from ntto_ray.pipelines.kg import abbreviate, extract_triples
    from ntto_ray.sources.transcripts import synth_transcripts
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped

    abbrev = abbreviate(extract_triples(synth_transcripts(sf_dir)))

    _PART = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("conv_id", pa.string()),
            ("n", pa.int64()),
            ("mt", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _PART.empty_table()
        g = t.group_by(["subj", "pred", "obj", "conv_id"]).aggregate(
            [("turn_idx", "count"), ("turn_idx", "min")]
        )
        return pa.table(
            {
                "subj": g["subj"],
                "pred": g["pred"],
                "obj": g["obj"],
                "conv_id": g["conv_id"],
                "n": pc.cast(g["turn_idx_count"], pa.int64()),
                "mt": pc.cast(g["turn_idx_min"], pa.int64()),
            }
        )

    parts = abbrev.map_batches(partial, batch_format="pyarrow")
    grouped = hash_grouped(parts, ["subj", "pred", "obj"], sort=False)

    def rollup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _PROV_SCHEMA.empty_table()
        m = t.group_by(["subj", "pred", "obj", "conv_id"]).aggregate(
            [("n", "sum"), ("mt", "min")]
        )
        r = m.group_by(["subj", "pred", "obj"]).aggregate(
            [("n_sum", "sum"), ("conv_id", "count"), ("mt_min", "min")]
        )
        return pa.table(
            {
                "subj": r["subj"],
                "pred": r["pred"],
                "obj": r["obj"],
                "cnt": pc.cast(r["n_sum_sum"], pa.int64()),
                "n_convs": pc.cast(r["conv_id_count"], pa.int64()),
                "first_turn": pc.cast(r["mt_min_min"], pa.int64()),
            }
        )

    return grouped.map_batches(
        rollup, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- cyclic 3-pattern BGP ----------------------------------------------------

_P_HAS_TURN = "exont:hasTurn"
_P_MENT_ENT = "exont:mentionsEntity"
_P_DISCUSS = "exont:discusses"


@register("kg_bgp_cycle", oracle=None)  # oracle filled by _late_oracles
def kg_bgp_cycle(sf_dir: str):
    """Cyclic three-pattern SPARQL BGP over the canonical KG:

        ?conv exont:hasTurn ?turn .
        ?turn exont:mentionsEntity ?e .
        ?conv exont:discusses ?e

    counted per entity ?e — the provenance-closure query a KG consumer
    runs to check that every turn-level entity assertion is reflected at
    the conversation level (two join variables, so unlike
    kg_pattern_match this is a CYCLE, not a chain). Plan: predicate
    filters push into the scan; join 1 is ONE tag-union hash exchange on
    ?turn with a per-run ragged cross (the kg_pred_paths kernel) emitting
    block-local (conv, e) partial counts; join 2 is ONE tag-union
    exchange on the packed (conv, e) key that keeps a partial-count row
    only when the discusses edge exists; a tiny entity-keyed Sum
    finishes. No stage ever expands beyond the true match count."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    _TAG1 = pa.schema(
        [("key", pa.string()), ("side", pa.int8()), ("val", pa.string())]
    )

    def tag_turn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pred" not in t.column_names:
            return _TAG1.empty_table()
        ht = t.filter(pc.equal(t["pred"], _P_HAS_TURN))
        me = t.filter(pc.equal(t["pred"], _P_MENT_ENT))
        return pa.table(
            {
                "key": pa.concat_arrays(
                    [
                        ht["obj"].combine_chunks(),
                        me["subj"].combine_chunks(),
                    ]
                ),
                "side": pa.array(
                    np.r_[
                        np.zeros(ht.num_rows, np.int8),
                        np.ones(me.num_rows, np.int8),
                    ]
                ),
                "val": pa.concat_arrays(
                    [
                        ht["subj"].combine_chunks(),
                        me["obj"].combine_chunks(),
                    ]
                ),
            }
        )

    _PAIR = pa.schema(
        [("conv", pa.string()), ("ent", pa.string()), ("n", pa.int64())]
    )

    def cross_turn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key" not in t.column_names:
            return _PAIR.empty_table()
        d = t.sort_by([("key", "ascending"), ("side", "ascending")])
        key = d["key"].to_numpy(zero_copy_only=False)
        side = d["side"].to_numpy(zero_copy_only=False)
        val = d["val"].combine_chunks()
        starts, ends = runs(key)
        conv_idx_parts, ent_idx_parts = [], []
        for s, e in zip(starts, ends):
            cut = s + int(np.searchsorted(side[s:e], 1))
            n0, n1 = cut - s, e - cut
            if n0 == 0 or n1 == 0:
                continue
            conv_idx_parts.append(
                np.repeat(np.arange(s, cut, dtype=np.int64), n1)
            )
            ent_idx_parts.append(
                np.tile(np.arange(cut, e, dtype=np.int64), n0)
            )
        if not conv_idx_parts:
            return _PAIR.empty_table()
        ci = np.concatenate(conv_idx_parts)
        ei = np.concatenate(ent_idx_parts)
        pairs = pa.table(
            {
                "conv": val.take(pa.array(ci, pa.int64())),
                "ent": val.take(pa.array(ei, pa.int64())),
            }
        )
        g = pairs.group_by(["conv", "ent"]).aggregate([("conv", "count")])
        return pa.table(
            {
                "conv": g["conv"],
                "ent": g["ent"],
                "n": pc.cast(g["conv_count"], pa.int64()),
            }
        )

    join1 = hash_grouped(
        canon.map_batches(tag_turn, batch_format="pyarrow"), ["key"]
    ).map_batches(
        cross_turn, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )

    _TAG2 = pa.schema(
        [
            ("key", pa.string()),
            ("side", pa.int8()),
            ("ent", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def tag_pair(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "conv" not in t.column_names:
            return _TAG2.empty_table()
        key = pc.binary_join_element_wise(t["conv"], t["ent"], "\x1f")
        return pa.table(
            {
                "key": key,
                "side": pa.array(np.zeros(t.num_rows, np.int8)),
                "ent": t["ent"],
                "n": t["n"],
            }
        )

    def tag_discuss(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pred" not in t.column_names:
            return _TAG2.empty_table()
        d = t.filter(pc.equal(t["pred"], _P_DISCUSS))
        key = pc.binary_join_element_wise(d["subj"], d["obj"], "\x1f")
        return pa.table(
            {
                "key": key,
                "side": pa.array(np.ones(d.num_rows, np.int8)),
                "ent": d["obj"],
                "n": pa.array(np.zeros(d.num_rows, np.int64)),
            }
        )

    tagged2 = join1.map_batches(tag_pair, batch_format="pyarrow").union(
        canon.map_batches(tag_discuss, batch_format="pyarrow")
    )

    _ENT = pa.schema([("entity", pa.string()), ("matches", pa.int64())])

    def keep_discussed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key" not in t.column_names:
            return _ENT.empty_table()
        d = t.sort_by([("key", "ascending"), ("side", "ascending")])
        key = d["key"].to_numpy(zero_copy_only=False)
        side = d["side"].to_numpy(zero_copy_only=False)
        n = d["n"].to_numpy(zero_copy_only=False)
        starts, ends = runs(key)
        has_d = side[ends - 1] == 1  # sorted: discusses rows sort last
        keep_run = has_d
        # partial-count rows are the side-0 prefix of each kept run
        out_idx = []
        for s, e, k in zip(starts, ends, keep_run):
            if not k:
                continue
            cut = s + int(np.searchsorted(side[s:e], 1))
            if cut > s:
                out_idx.append(np.arange(s, cut, dtype=np.int64))
        if not out_idx:
            return _ENT.empty_table()
        idx = np.concatenate(out_idx)
        return pa.table(
            {
                "entity": d["ent"].take(pa.array(idx, pa.int64())),
                "matches": pa.array(n[idx]),
            }
        )

    kept = hash_grouped(tagged2, ["key"], reserve_cpus=False).map_batches(
        keep_discussed, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )
    return kept.groupby("entity").aggregate(Sum("matches", alias_name="matches"))


# --- entity resolution: discusses-profile Jaccard ---------------------------


@register("kg_er_profile_jaccard", oracle=None)  # oracle filled below
def kg_er_profile_jaccard(sf_dir: str):
    """Entity resolution over the KG's conversation entities: two
    conversations refer to the same underlying discussion when the
    Jaccard of their discusses-profiles (the distinct entity sets they
    discuss) clears 50% — the attribute-set-similarity blocking step of
    classic ER (Fellegi-Sunter style attribute agreement, computed as a
    set-similarity self-join). Plan: ONE subj-keyed exchange builds each
    conversation's profile (ListArray + binary_join — no per-group
    Python string building), the conversation ordinal is parsed from the
    IRI, and the profile rows feed the SAME globally-exact
    prefix-filtered similarity join as dedup_jaccard_pairs
    (stages/dedup.jaccard_pairs) — entity IRIs contain no spaces, so
    token set == attribute set exactly."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.dedup import jaccard_pairs
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    _PROF = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def only_discuss(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pred" not in t.column_names:
            return pa.schema(
                [("subj", pa.string()), ("obj", pa.string())]
            ).empty_table()
        d = t.filter(pc.equal(t["pred"], _P_DISCUSS))
        return d.select(["subj", "obj"])

    def profile(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _PROF.empty_table()
        d = t.sort_by([("subj", "ascending")])
        subj = d["subj"].to_numpy(zero_copy_only=False)
        starts, _ends = runs(subj)
        offsets = np.concatenate([starts, [len(subj)]]).astype(np.int32)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), d["obj"].combine_chunks()
        )
        head = d["subj"].take(pa.array(starts, pa.int64()))
        # 'exconv:conv-%08d' → ordinal after the 12-char fixed prefix
        conv = pc.cast(pc.utf8_slice_codeunits(head, 12), pa.int64())
        return pa.table({"doc_id": conv, "text": pc.binary_join(la, " ")})

    profiles = hash_grouped(
        canon.map_batches(only_discuss, batch_format="pyarrow"), ["subj"]
    ).map_batches(
        profile, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )

    pairs = jaccard_pairs(profiles, threshold_pct=50)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["conv_a", "conv_b", "jaccard_pct"])

    return pairs.map_batches(rename, batch_format="pyarrow")


# --- corpus quality report ---------------------------------------------------

_REPORT_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n_docs", pa.int64()),
        ("n_unique", pa.int64()),
        ("dup_docs", pa.int64()),
        ("total_tokens", pa.int64()),
        ("long_docs", pa.int64()),
        ("max_tokens", pa.int64()),
        ("total_chars", pa.int64()),
    ]
)

_LONG_TOK = 50  # tokens at/above which a doc counts as "long"


@register("corpus_quality_report", oracle=None)  # oracle filled below
def corpus_quality_report(sf_dir: str):
    """Per-source corpus quality report: doc count, exact-duplicate
    count (128-bit vectorized polynomial content key —
    stages/dedup.poly_content_hashes), token totals, long-doc share and
    char volume — the one-page health summary a curation run prints per
    ingest source before mixing. Plan: per-block vectorized prep (hash +
    token counts, thin partial rows) → ONE source-keyed exchange
    (sort=False: the keyspace is far sparser than the partition count,
    so the per-partition sort is skipped and the kernel sorts) →
    per-block grouped rollup with distinct-hash counting via one lexsort
    over the (h1, h2) pairs."""
    from ntto_ray.stages.dedup import poly_content_hashes
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    _PART = pa.schema(
        [
            ("source", pa.string()),
            ("h1", pa.int64()),
            ("h2", pa.int64()),
            ("ntok", pa.int64()),
            ("nchar", pa.int64()),
        ]
    )

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return _PART.empty_table()
        texts = t["text"].combine_chunks()
        h1, h2 = poly_content_hashes(texts)
        ntok = pc.cast(
            pc.list_value_length(pc.split_pattern(texts, pattern=" ")),
            pa.int64(),
        )
        return pa.table(
            {
                "source": t["source"],
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "ntok": ntok,
                "nchar": pc.cast(pc.utf8_length(texts), pa.int64()),
            }
        )

    grouped = hash_grouped(
        docs.map_batches(prep, batch_format="pyarrow"), ["source"], sort=False
    )

    def report(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return _REPORT_SCHEMA.empty_table()
        d = t.sort_by([("source", "ascending")])
        src = d["source"].to_numpy(zero_copy_only=False)
        h1 = d["h1"].to_numpy(zero_copy_only=False)
        h2 = d["h2"].to_numpy(zero_copy_only=False)
        ntok = d["ntok"].to_numpy(zero_copy_only=False)
        nchar = d["nchar"].to_numpy(zero_copy_only=False)
        starts, ends = runs(src)
        gid = np.repeat(np.arange(len(starts)), ends - starts)
        # distinct (h1, h2) per source: one lexsort, count run heads
        order = np.lexsort((h2, h1, gid))
        gg, a, b = gid[order], h1[order], h2[order]
        head = np.r_[True, (gg[1:] != gg[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        n_unique = np.bincount(gg[head], minlength=len(starts))
        n_docs = (ends - starts).astype(np.int64)
        return pa.table(
            {
                "source": d["source"].take(pa.array(starts, pa.int64())),
                "n_docs": pa.array(n_docs),
                "n_unique": pa.array(n_unique.astype(np.int64)),
                "dup_docs": pa.array(n_docs - n_unique),
                "total_tokens": pa.array(np.add.reduceat(ntok, starts)),
                "long_docs": pa.array(
                    np.add.reduceat((ntok >= _LONG_TOK).astype(np.int64), starts)
                ),
                "max_tokens": pa.array(np.maximum.reduceat(ntok, starts)),
                "total_chars": pa.array(np.add.reduceat(nchar, starts)),
            }
        )

    return grouped.map_batches(
        report, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- SHACL-style constraint validation report --------------------------------

_P_MENTIONS = "exont:mentions"
_RDF_TYPE = "rdf:type"
_MIN_ENTITIES = 6  # conv_min_entities threshold (degree-4/5 convs exist → real violations)

_SHACL_SCHEMA = pa.schema(
    [("rule", pa.string()), ("n_checked", pa.int64()), ("n_violations", pa.int64())]
)


@register("kg_shacl_report", oracle=None)  # oracle filled by _late_oracles
def kg_shacl_report(sf_dir: str):
    """SHACL-style shape validation over the canonical KG — four
    constraints, each reported as (rule, n_checked, n_violations):

      conv_turn_count      every conversation has exactly TURNS_PER_CONV
                           hasTurn edges (cardinality shape)
      turn_single_type     every turn has exactly one rdf:type
                           (functional-property shape)
      discusses_supported  every conv-level discusses edge is supported
                           by a mention in one of that conversation's
                           turns (provenance referential integrity)
      conv_min_entities    every conversation discusses >= {_MIN_ENTITIES}
                           distinct entities (data-dependent QA gate)

    The W3C SHACL cardinality/closed-shape checks, re-expressed as
    distributed aggregates (the reference has no validation surface at
    all). Plan: ONE pass over the cached canonical KG emits tagged
    partials for all four constraints at once — per-block (subj, fam,
    count) rows for the three cardinality shapes (one C++ group_by per
    predicate family) and (conv␟entity, fam) pair rows for the
    referential check (support pairs derived from turn IRIs by
    fixed-width slice, never a join back to transcripts) — then ONE
    key-hashed exchange makes every constraint's evidence block-local
    and a vectorized kernel scores all four; the final grouped Sum is
    4-row. (Was four separate all-to-alls + a union: 101 s → ~12 s at
    sf0.001, same oracle.)"""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    # fam tags: 0/1/2 = the per-subject cardinality shapes (hasTurn,
    # rdf:type, discusses); 3/4 = referential pair sides (discusses /
    # supporting mention). Pair keys contain '\x1f', subject IRIs do
    # not, so the two key spaces cannot collide in the shared exchange.
    _T = pa.schema(
        [("key", pa.string()), ("fam", pa.int8()), ("n", pa.int64())]
    )
    _CARD = ((0, _P_HAS_TURN), (1, _RDF_TYPE), (2, _P_DISCUSS))

    def _arr(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pred" not in t.column_names:
            return _T.empty_table()
        parts = []
        for fam, pred in _CARD:
            d = t.filter(pc.equal(t["pred"], pred))
            if d.num_rows == 0:
                continue
            g = d.group_by("subj").aggregate([("pred", "count")])
            g = g.select(["subj", "pred_count"])
            parts.append(
                pa.table(
                    {
                        "key": _arr(g["subj"]),
                        "fam": pa.array(np.full(g.num_rows, fam, np.int8)),
                        "n": pc.cast(g["pred_count"], pa.int64()),
                    }
                )
            )
        disc = t.filter(pc.equal(t["pred"], _P_DISCUSS))
        sup = t.filter(
            pc.is_in(t["pred"], value_set=pa.array([_P_MENTIONS, _P_MENT_ENT]))
        )
        # turn IRI 'exconv:conv-%08d/turn/k' → conv IRI = first 20 chars
        sup_conv = pc.utf8_slice_codeunits(sup["subj"].combine_chunks(), 0, 20)
        for fam, keys in (
            (3, pc.binary_join_element_wise(disc["subj"], disc["obj"], "\x1f")),
            (4, pc.binary_join_element_wise(sup_conv, _arr(sup["obj"]), "\x1f")),
        ):
            keys = _arr(keys)
            if len(keys):
                parts.append(
                    pa.table(
                        {
                            "key": keys,
                            "fam": pa.array(np.full(len(keys), fam, np.int8)),
                            "n": pa.array(np.zeros(len(keys), np.int64)),
                        }
                    )
                )
        if not parts:
            return _T.empty_table()
        return pa.concat_tables(parts)

    _RULES = (
        (0, "conv_turn_count", lambda x: x != 6),
        (1, "turn_single_type", lambda x: x != 1),
        (2, "conv_min_entities", lambda x: x < _MIN_ENTITIES),
    )

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key" not in t.column_names:
            return _SHACL_SCHEMA.empty_table()
        d = t.sort_by([("key", "ascending"), ("fam", "ascending")])
        key = d["key"].to_numpy(zero_copy_only=False)
        fam = d["fam"].to_numpy(zero_copy_only=False)
        n = d["n"].to_numpy(zero_copy_only=False)
        rules, checked, viols = [], [], []
        card = fam <= 2
        if card.any():
            ck, cf, cn = key[card], fam[card], n[card]
            newr = np.r_[True, (ck[1:] != ck[:-1]) | (cf[1:] != cf[:-1])]
            starts = np.flatnonzero(newr)
            tot = np.add.reduceat(cn, starts)
            rfam = cf[starts]
            for f, rule, violated in _RULES:
                m = rfam == f
                if m.any():
                    rules.append(rule)
                    checked.append(np.int64(m.sum()))
                    viols.append(np.int64(violated(tot[m]).sum()))
        ref = ~card
        if ref.any():
            rk, rf = key[ref], fam[ref]
            starts, ends = runs(rk)
            has_disc = rf[starts] == 3  # sorted: fam 3 before 4 per key
            has_sup = rf[ends - 1] == 4
            rules.append("discusses_supported")
            checked.append(np.int64(has_disc.sum()))
            viols.append(np.int64((has_disc & ~has_sup).sum()))
        if not rules:
            return _SHACL_SCHEMA.empty_table()
        return pa.table(
            {
                "rule": pa.array(rules, pa.string()),
                "n_checked": pa.array(checked, pa.int64()),
                "n_violations": pa.array(viols, pa.int64()),
            }
        )

    grouped = hash_grouped(
        canon.map_batches(partial, batch_format="pyarrow"),
        ["key"],
        reserve_cpus=False,
    )
    return (
        grouped.map_batches(
            summary, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
        )
        .groupby("rule")
        .aggregate(
            Sum("n_checked", alias_name="n_checked"),
            Sum("n_violations", alias_name="n_violations"),
        )
    )


# --- incremental delta update -------------------------------------------------


@register("kg_delta_update", oracle=None)  # oracle filled by _late_oracles
def kg_delta_update(sf_dir: str):
    """Incremental canonical-KG maintenance: the corpus is split into a
    BASE batch (conversations with ordinal % 10 != 0) and a DELTA batch
    (% 10 == 0), each canonicalized independently, then merged by count
    addition — canonical(A ∪ B) == merge(canonical(A), canonical(B))
    because the canonical form is a pure grouped count (the
    incremental-view-maintenance algebra a nightly ingest relies on so
    it never rebuilds the full KG). The oracle is the FULL-rebuild SQL,
    so the test pins the merge algebra itself. Plan: two independent
    build_graph subpipelines (each its own bounded exchange) → union of
    count partials → one grouped Sum at canonical scale."""
    from ray.data.aggregate import Sum

    from ntto_ray.pipelines.kg import build_graph
    from ntto_ray.sources.transcripts import synth_transcripts

    ts = synth_transcripts(sf_dir)

    def split(delta: bool):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "conv_id" not in t.column_names:
                return t
            # conv_id 'conv-%08d' → ordinal digits at [5:13]
            ordv = pc.cast(
                pc.utf8_slice_codeunits(t["conv_id"], 5, 13), pa.int64()
            ).to_numpy(zero_copy_only=False)
            mask = (ordv % 10 == 0) if delta else (ordv % 10 != 0)
            return t.filter(pa.array(mask))

        return ts.map_batches(f, batch_format="pyarrow")

    # fused=True: one actor pool per branch — two unfused branches would
    # stack six fixed pools and deadlock a small session (see
    # run_kg_pipeline's fused rationale).
    base = build_graph(split(delta=False), fused=True)
    delta = build_graph(split(delta=True), fused=True)
    return (
        base.union(delta)
        .groupby(["subj", "pred", "obj"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


# --- exact-dup cluster-size histogram ----------------------------------------


@register("dedup_cluster_stats", oracle=None)  # oracle filled by _late_oracles
def dedup_cluster_stats(sf_dir: str):
    """Histogram of exact-duplicate cluster sizes (how many content
    clusters have exactly k members) — the one-glance duplication
    profile a curation run reports before choosing dedup thresholds.
    Plan: vectorized 128-bit polynomial content keys → grouped Count at
    cluster scale → per-block partial histograms → tiny grouped Sum at
    histogram scale. Shuffle volume is 16-byte keys, never text."""
    from ray.data.aggregate import Count, Sum

    from ntto_ray.stages.dedup import poly_content_hashes

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def prep(t: pa.Table) -> pa.Table:
        h1, h2 = poly_content_hashes(t["text"].combine_chunks())
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2)})

    clusters = (
        docs.map_batches(prep, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(Count(alias_name="sz"))
    )

    _HIST = pa.schema(
        [("cluster_size", pa.int64()), ("n_clusters", pa.int64())]
    )

    def hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sz" not in t.column_names:
            return _HIST.empty_table()
        g = t.group_by("sz").aggregate([("sz", "count")])
        return pa.table(
            {
                "cluster_size": pc.cast(g["sz"], pa.int64()),
                "n_clusters": pc.cast(g["sz_count"], pa.int64()),
            }
        )

    return (
        clusters.map_batches(hist, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n_clusters", alias_name="n_clusters"))
    )


# --- KG-embedding negative sampling -------------------------------------------


@register("kg_negative_sampling", oracle=None)  # oracle filled by _late_oracles
def kg_negative_sampling(sf_dir: str):
    """Filtered negative sampling over the KG's discusses edges — the
    training-data generator for translational KG-embedding models
    (TransE, Bordes et al. NeurIPS 2013: corrupt each positive triple's
    object, FILTERED so no sampled negative is itself a true edge).
    Corruption is hash-derandomized: the replacement entity index is the
    triple's 64-bit polynomial content hash mod |entity vocabulary|, so
    the sample is a pure function of the KG and mirrors bit-exactly in
    SQL. Plan: the entity vocabulary (result-scale: distinct discussed
    entities) broadcasts once via ray.put; corruption is one vectorized
    pass (poly hash of s␟p␟o → vocab gather, self-corruptions dropped);
    the filter step is ONE tag-union hash exchange on the (subj,
    candidate-object) key against the true edge set — never a driver
    anti-join."""
    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.dedup import poly_content_hashes
    from ntto_ray.stages.exchange import NO_FUSE_ARGS, hash_grouped, runs

    canon = run_kg_pipeline(sf_dir).select_columns(["subj", "pred", "obj"])

    def only_disc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pred" not in t.column_names:
            return pa.schema(
                [("subj", pa.string()), ("obj", pa.string())]
            ).empty_table()
        return t.filter(pc.equal(t["pred"], _P_DISCUSS)).select(["subj", "obj"])

    disc = canon.map_batches(only_disc, batch_format="pyarrow").materialize()

    def emit_obj(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("o", pa.string())]).empty_table()
        return pa.table(
            {"o": np.unique(t["obj"].to_numpy(zero_copy_only=False))}
        )

    vocab = np.array(
        sorted(disc.map_batches(emit_obj, batch_format="pyarrow").unique("o") or [])
    )
    vocab_ref = ray.put(vocab)

    _CAND = pa.schema(
        [("subj", pa.string()), ("obj_pos", pa.string()), ("obj_neg", pa.string())]
    )

    class Corrupt:
        def __init__(self, vocab_ref):
            self.vocab = ray.get(vocab_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "subj" not in t.column_names:
                return _CAND.empty_table()
            text = pc.binary_join_element_wise(
                t["subj"], pa.scalar(_P_DISCUSS), t["obj"], "\x1f"
            )
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            h1, _h2 = poly_content_hashes(text)
            # h1 is the SIGNED (u ^ 2^63) view — un-flip to the true
            # unsigned polynomial value so idx == SQL's (h1 + 2^63) % V
            u = h1.view(np.uint64) ^ np.uint64(1 << 63)
            idx = u % np.uint64(len(self.vocab))
            neg = self.vocab[idx.astype(np.int64)]
            obj = t["obj"].to_numpy(zero_copy_only=False)
            keep = neg != obj
            return pa.table(
                {
                    "subj": t["subj"].filter(pa.array(keep)),
                    "obj_pos": pa.array(obj[keep]),
                    "obj_neg": pa.array(neg[keep]),
                }
            )

    cands = disc.map_batches(
        Corrupt,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"vocab_ref": vocab_ref},
    )

    # filtered step: drop candidates whose (subj, obj_neg) is a true edge
    _TAG = pa.schema(
        [("key", pa.string()), ("side", pa.int8()), ("obj_pos", pa.string())]
    )

    def tag_cand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "obj_neg" not in t.column_names:
            return _TAG.empty_table()
        key = pc.binary_join_element_wise(t["subj"], t["obj_neg"], "\x1f")
        return pa.table(
            {
                "key": key,
                "side": pa.array(np.zeros(t.num_rows, np.int8)),
                "obj_pos": t["obj_pos"],
            }
        )

    def tag_true(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "obj" not in t.column_names:
            return _TAG.empty_table()
        key = pc.binary_join_element_wise(t["subj"], t["obj"], "\x1f")
        return pa.table(
            {
                "key": key,
                "side": pa.array(np.ones(t.num_rows, np.int8)),
                "obj_pos": t["obj"],
            }
        )

    tagged = cands.map_batches(tag_cand, batch_format="pyarrow").union(
        disc.map_batches(tag_true, batch_format="pyarrow")
    )

    def keep_unfiltered(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key" not in t.column_names:
            return _CAND.empty_table()
        d = t.sort_by([("key", "ascending"), ("side", "ascending")])
        key = d["key"].to_numpy(zero_copy_only=False)
        side = d["side"].to_numpy(zero_copy_only=False)
        starts, ends = runs(key)
        ok = side[ends - 1] == 0  # run has NO true-edge row
        out_idx = []
        for s, e, k in zip(starts, ends, ok):
            if k:
                out_idx.append(np.arange(s, e, dtype=np.int64))
        if not out_idx:
            return _CAND.empty_table()
        idx = pa.array(np.concatenate(out_idx), pa.int64())
        keys = d["key"].take(idx)
        # key = subj ␟ obj_neg — recover both halves from the packed key
        split = pc.split_pattern(keys, pattern="\x1f")
        return pa.table(
            {
                "subj": pc.list_element(split, 0),
                "obj_pos": d["obj_pos"].take(idx),
                "obj_neg": pc.list_element(split, 1),
            }
        )

    return hash_grouped(tagged, ["key"], reserve_cpus=False).map_batches(
        keep_unfiltered, batch_size=None, batch_format="pyarrow", **NO_FUSE_ARGS
    )


# --- GraphRAG-style 2-hop subgraph export -------------------------------------

_SUB_SEEDS = 10
_SUB_K = 2


@register("kg_subgraph_export", oracle=None)  # oracle filled by _late_oracles
def kg_subgraph_export(sf_dir: str):
    """Induced {_SUB_K}-hop subgraph around the {_SUB_SEEDS}
    lexicographically-first subject entities: every canonical edge whose
    BOTH endpoints are within {_SUB_K} BFS hops of the seed set, weighted
    by predicate multiplicity — the neighborhood-export a GraphRAG /
    KG-embedding trainer materializes per entity batch. Plan: BFS via
    stages/graph.khop_distances (node-scale exchanges); the reached node
    set is RESULT-scale, broadcast once; the induced-edge filter is one
    vectorized is_in pass over the edge blocks + a grouped predicate
    count. Same seed rule as kg_khop_reach, so the SQL mirror shares its
    unrolled min-dist CTE chain."""
    from ray.data.aggregate import Count

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.graph import khop_distances

    edges = run_kg_pipeline(sf_dir).select_columns(["subj", "obj"]).materialize()

    def emit_src(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("s", pa.string())]).empty_table()
        return pa.table(
            {"s": np.unique(t["subj"].to_numpy(zero_copy_only=False))}
        )

    srcs = sorted(
        edges.map_batches(emit_src, batch_format="pyarrow").unique("s") or []
    )
    seeds = np.array(srcs[:_SUB_SEEDS])
    reach = khop_distances(edges, seeds, k=_SUB_K)
    nodes_ref = ray.put(
        np.sort(reach["node"].to_numpy(zero_copy_only=False))
    )

    _EDGE = pa.schema([("subj", pa.string()), ("obj", pa.string())])

    class Induce:
        def __init__(self, nodes_ref):
            self.nodes = pa.array(ray.get(nodes_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "subj" not in t.column_names:
                return _EDGE.empty_table()
            keep = pc.and_(
                pc.is_in(t["subj"], value_set=self.nodes),
                pc.is_in(t["obj"], value_set=self.nodes),
            )
            return t.filter(keep).select(["subj", "obj"])

    induced = edges.map_batches(
        Induce,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"nodes_ref": nodes_ref},
    )
    return induced.groupby(["subj", "obj"]).aggregate(
        Count(alias_name="n_preds")
    )


# --- oracles -----------------------------------------------------------------


def _late_oracles():
    from ntto_ray.functions import kgspec as K
    from ntto_ray.pipelines.kg import pipeline_rules
    from ntto_ray.registry import _ORACLES
    from ntto_ray.stages.dedup import poly_content_hash_sql

    rules = pipeline_rules()
    abbrev = K.triples_abbrev_sql(rules)
    canon = K.triples_canonical_sql(rules)

    _ORACLES["kg_provenance"] = f"""
WITH abbrev AS ({abbrev})
SELECT subj, pred, obj,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(min(turn_idx) AS BIGINT) AS first_turn
FROM abbrev GROUP BY 1, 2, 3
""".strip()

    _ORACLES["kg_bgp_cycle"] = f"""
WITH canon AS MATERIALIZED ({canon})
SELECT c2.obj AS entity, CAST(count(*) AS BIGINT) AS matches
FROM canon c1
JOIN canon c2 ON c2.subj = c1.obj AND c2.pred = '{_P_MENT_ENT}'
JOIN canon c3 ON c3.subj = c1.subj AND c3.obj = c2.obj
             AND c3.pred = '{_P_DISCUSS}'
WHERE c1.pred = '{_P_HAS_TURN}'
GROUP BY 1
""".strip()

    _ORACLES["kg_er_profile_jaccard"] = f"""
WITH canon AS MATERIALIZED ({canon}),
prof AS (
  SELECT CAST(substr(subj, 13) AS BIGINT) AS conv,
         list_distinct(list(obj)) AS toks
  FROM canon WHERE pred = '{_P_DISCUSS}' GROUP BY subj
)
SELECT a.conv AS conv_a, b.conv AS conv_b,
       CAST((len(list_intersect(a.toks, b.toks)) * 100)
            // (len(a.toks) + len(b.toks)
                - len(list_intersect(a.toks, b.toks))) AS BIGINT)
         AS jaccard_pct
FROM prof a JOIN prof b ON a.conv < b.conv
WHERE len(list_intersect(a.toks, b.toks)) * 100
      >= 50 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
""".strip()

    _ORACLES["kg_shacl_report"] = f"""
WITH canon AS MATERIALIZED ({canon}),
c1 AS (SELECT count(*) AS ck, sum(CASE WHEN n <> {K.TURNS_PER_CONV} THEN 1 ELSE 0 END) AS v
       FROM (SELECT subj, count(*) AS n FROM canon
             WHERE pred = '{_P_HAS_TURN}' GROUP BY 1)),
c2 AS (SELECT count(*) AS ck, sum(CASE WHEN n <> 1 THEN 1 ELSE 0 END) AS v
       FROM (SELECT subj, count(*) AS n FROM canon
             WHERE pred = '{_RDF_TYPE}' GROUP BY 1)),
c4 AS (SELECT count(*) AS ck, sum(CASE WHEN n < {_MIN_ENTITIES} THEN 1 ELSE 0 END) AS v
       FROM (SELECT subj, count(*) AS n FROM canon
             WHERE pred = '{_P_DISCUSS}' GROUP BY 1)),
sup AS (SELECT DISTINCT substr(subj, 1, 20) AS conv, obj FROM canon
        WHERE pred IN ('{_P_MENTIONS}', '{_P_MENT_ENT}')),
disc AS (SELECT subj AS conv, obj FROM canon WHERE pred = '{_P_DISCUSS}'),
c3 AS (SELECT count(*) AS ck,
              sum(CASE WHEN s.conv IS NULL THEN 1 ELSE 0 END) AS v
       FROM disc d LEFT JOIN sup s
         ON s.conv = d.conv AND s.obj = d.obj)
SELECT 'conv_turn_count' AS rule, CAST(ck AS BIGINT) AS n_checked,
       CAST(v AS BIGINT) AS n_violations FROM c1
UNION ALL SELECT 'turn_single_type', CAST(ck AS BIGINT), CAST(v AS BIGINT) FROM c2
UNION ALL SELECT 'discusses_supported', CAST(ck AS BIGINT), CAST(v AS BIGINT) FROM c3
UNION ALL SELECT 'conv_min_entities', CAST(ck AS BIGINT), CAST(v AS BIGINT) FROM c4
""".strip()

    _ORACLES["kg_delta_update"] = canon

    _ORACLES["kg_negative_sampling"] = f"""
WITH canon AS MATERIALIZED ({canon}),
disc AS MATERIALIZED (SELECT subj, obj FROM canon WHERE pred = '{_P_DISCUSS}'),
vocab AS (SELECT ent, row_number() OVER (ORDER BY ent) - 1 AS idx
          FROM (SELECT DISTINCT obj AS ent FROM disc)),
nv AS (SELECT count(*) AS v FROM vocab),
trip AS MATERIALIZED (
  SELECT subj, obj,
         subj || chr(31) || '{_P_DISCUSS}' || chr(31) || obj AS text,
         row_number() OVER (ORDER BY subj, obj) AS doc_id
  FROM disc
),
ph AS ({poly_content_hash_sql("text", "trip")}),
cand AS (
  SELECT t.subj, t.obj AS obj_pos, v.ent AS obj_neg
  FROM trip t
  JOIN ph ON ph.doc_id = t.doc_id
  CROSS JOIN nv
  JOIN vocab v
    ON v.idx = (CAST(ph.h1 AS HUGEINT) + 9223372036854775808) % nv.v
)
SELECT c.subj, c.obj_pos, c.obj_neg
FROM cand c
WHERE c.obj_neg <> c.obj_pos
  AND NOT EXISTS (SELECT 1 FROM disc d
                  WHERE d.subj = c.subj AND d.obj = c.obj_neg)
""".strip()

    sub_cte = [
        f"canon AS MATERIALIZED ({canon})",
        "edges AS MATERIALIZED"
        " (SELECT DISTINCT subj AS src, obj AS dst FROM canon)",
        f"seeds AS (SELECT DISTINCT src AS node FROM edges"
        f" ORDER BY node LIMIT {_SUB_SEEDS})",
        "d0 AS (SELECT node FROM seeds)",
    ]
    for r in range(1, _SUB_K + 1):
        sub_cte.append(
            f"d{r} AS MATERIALIZED (SELECT node FROM d{r - 1} UNION"
            f" SELECT e.dst FROM edges e JOIN d{r - 1} p ON p.node = e.src)"
        )
    _ORACLES["kg_subgraph_export"] = (
        "WITH "
        + ",\n".join(sub_cte)
        + f"""
SELECT c.subj, c.obj, CAST(count(*) AS BIGINT) AS n_preds
FROM canon c
JOIN d{_SUB_K} a ON a.node = c.subj
JOIN d{_SUB_K} b ON b.node = c.obj
GROUP BY 1, 2
""".rstrip()
    )

    _ORACLES["dedup_cluster_stats"] = f"""
WITH ph AS ({poly_content_hash_sql()}),
c AS (SELECT h1, h2, count(*) AS sz FROM ph GROUP BY 1, 2)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM c GROUP BY 1
""".strip()

    _ORACLES["corpus_quality_report"] = f"""
WITH ph AS ({poly_content_hash_sql()}),
t AS (
  SELECT d.source, ph.h1, ph.h2,
         len(string_split(d.text, ' ')) AS ntok,
         length(d.text) AS nchar
  FROM documents d JOIN ph ON ph.doc_id = d.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT h1 || '|' || h2) AS BIGINT) AS n_unique,
       CAST(count(*) - count(DISTINCT h1 || '|' || h2) AS BIGINT) AS dup_docs,
       CAST(sum(ntok) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN ntok >= {_LONG_TOK} THEN 1 ELSE 0 END) AS BIGINT)
         AS long_docs,
       CAST(max(ntok) AS BIGINT) AS max_tokens,
       CAST(sum(nchar) AS BIGINT) AS total_chars
FROM t GROUP BY 1
""".strip()


_late_oracles()
