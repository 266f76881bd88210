"""KG-pipeline queries (flagship) with exact DuckDB oracles generated
from the same spec constants the Ray stages use (functions/kgspec.py)."""

from __future__ import annotations

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
