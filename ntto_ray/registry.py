"""Query registry: every implemented operator/pipeline exposed as a
``sf_dir -> result`` callable, each with an exact DuckDB oracle (the
driver's correctness gate) — including the probabilistic ops
(MinHash-LSH, SimHash, LSH/IVF/PQ ANN, HLL), whose deterministic hash
chains are mirrored bit-for-bit in SQL.

Grouped:
  kg_*        — the flagship KG-construction pipeline + graph analytics
  rel_*       — relational engine operators over the TPC-H-ish tables
  dedup_*     — deduplication suite over documents
  text_*      — text-analysis / curation suite over documents
  ann_*       — similarity search over embeddings
  sketch_*    — mergeable streaming sketches
  media_*     — multimodal binary-column stages
  corpus_*    — composed curation pipelines
  csv/json/nt — source-format round-trips
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_QUERIES: dict[str, Callable[[str], Any]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[str], Any]]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False

# The driver's correctness window is hard-capped at 50 rows (r02–r04 all
# stopped at exactly 50), so registration order decides WHICH 50 get the
# hard rows+schema+hash signal each round.  Round-5 rotation (VERDICT r04
# next-round #1): keep the 6 flagship KG rows in front, then fill the
# remaining 44 slots from the 62 queries that have NEVER produced a
# driver row in rounds 1–4 (verified by diffing CORRECTNESS_r01–r04
# keys): the round-4/4b tail, the kg provenance/delta/SHACL/VoID/Turtle
# family, and the remaining dedup/ann/text/corpus/rel ops.  Everything
# already driver-verified moves behind the window; the judge sweep
# (scripts/verify_sweep.py) still covers all registered queries.
_R05_WINDOW = [
    # flagship KG chain (always first — the engine's headline)
    "kg_transcripts",
    "kg_triples_raw",
    "kg_triples_abbrev",
    "kg_triples_canonical",
    "kg_adjacency_degrees",
    "kg_ndjson_lines",
    # round-4/4b tail named in VERDICT r04 (17)
    "corpus_quantile_gate",
    "dedup_priority_keep",
    "text_vocab_oov",
    "corpus_pack_plan",
    "corpus_stratified_sample",
    "kg_harmonic_centrality",
    "dedup_blocking_quality",
    "kg_incremental_canonical",
    "kg_personalized_pagerank",
    "orc_roundtrip",
    "rel_merge_upsert",
    "text_dsir_importance",
    "ann_ivfpq_topk",
    "text_inverted_index",
    "corpus_split_assign",
    "corpus_reservoir_sample",
    "media_decode_real",
    # kg provenance / delta / validation / serialization family (5)
    "kg_provenance",
    "kg_delta_update",
    "kg_shacl_report",
    "kg_void_stats",
    "kg_turtle_blocks",
    # dedup suite remainder (5)
    "dedup_incremental",
    "dedup_substring_spans",
    "dedup_cdc_chunks",
    "dedup_cluster_stats",
    "dedup_precision_eval",
    # ANN remainder (3)
    "ann_recall_eval",
    "ann_kmeans_clusters",
    "ann_kmeans_inertia",
    # text remainder (3)
    "text_contamination_matrix",
    "text_winnowing",
    "text_gopher_rules",
    # corpus pipelines remainder (4)
    "corpus_quality_report",
    "corpus_mixture_temperature",
    "corpus_source_overlap",
    "corpus_curate_resumable",
    # kg analytics remainder (3)
    "kg_type_histogram",
    "kg_entity_merge_map",
    "kg_subgraph_export",
    # rel remainder (3)
    "rel_grouping_sets",
    "rel_skyline",
    "rel_q7_trade_flow",
    # new this round: pure-zlib+numpy PNG decode (VERDICT r04 #6)
    "media_decode_png",
]


def _load():
    global _LOADED, _QUERIES, _ORACLES
    if _LOADED:
        return
    # Module import order is no longer the window order (see _R05_WINDOW);
    # it only decides the order of the post-window tail.
    from ntto_ray import queries_kg  # noqa: F401
    from ntto_ray import queries_text  # noqa: F401
    from ntto_ray import queries_text_ext  # noqa: F401
    from ntto_ray import queries_sketch  # noqa: F401
    from ntto_ray import queries_sources  # noqa: F401
    from ntto_ray import queries_media  # noqa: F401
    from ntto_ray import queries_rel  # noqa: F401
    from ntto_ray import queries_rel_ext  # noqa: F401
    from ntto_ray import queries_rel_win  # noqa: F401
    from ntto_ray import queries_graph_ext  # noqa: F401
    from ntto_ray import queries_llm_ext  # noqa: F401
    from ntto_ray import queries_llm_ext2  # noqa: F401
    from ntto_ray import queries_llm_ext3  # noqa: F401
    from ntto_ray import queries_llm_ext4  # noqa: F401
    from ntto_ray import queries_llm_ext5  # noqa: F401
    from ntto_ray import queries_round4  # noqa: F401
    from ntto_ray import queries_round4b  # noqa: F401
    from ntto_ray import queries_round5  # noqa: F401

    # the window IS the driver-verification contract: a typo'd or
    # later-renamed entry must fail loudly, not silently shrink the
    # 50-row window and promote an unintended tail query
    missing = [n for n in _R05_WINDOW if n not in _QUERIES]
    if missing:
        raise RuntimeError(f"_R05_WINDOW entries not registered: {missing}")
    ordered = list(_R05_WINDOW)
    ordered += [n for n in _QUERIES if n not in set(_R05_WINDOW)]
    _QUERIES = {n: _QUERIES[n] for n in ordered}
    _ORACLES = {n: _ORACLES[n] for n in ordered if n in _ORACLES}
    _LOADED = True
