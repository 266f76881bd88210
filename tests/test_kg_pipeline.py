"""End-to-end KG pipeline vs DuckDB oracle at sf0.001: extract →
prefix-cut → canonicalize must produce identical triple sets."""

import pandas as pd

from ntto_ray.functions import kgspec as K
from tests.conftest import SF_SMALL


def _norm(df: pd.DataFrame, cols) -> pd.DataFrame:
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_triples_raw_matches_oracle(ray_session, duck):
    from ntto_ray.pipelines.kg import extract_triples
    from ntto_ray.sources.transcripts import synth_transcripts

    ds = extract_triples(synth_transcripts(SF_SMALL))
    got = ds.to_pandas()
    want = duck.execute(K.triples_raw_sql()).df()
    cols = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    got, want = _norm(got, cols), _norm(want, cols)
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_canonical_matches_oracle(ray_session, duck):
    from ntto_ray.pipelines.kg import pipeline_rules, run_kg_pipeline

    canonical = run_kg_pipeline(SF_SMALL).to_pandas()
    want = duck.execute(K.triples_canonical_sql(pipeline_rules())).df()
    cols = ["subj", "pred", "obj", "cnt"]
    got, want = _norm(canonical, cols), _norm(want, cols)
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # everything got abbreviated: no raw http IRIs survive in subj
    assert not got["subj"].str.startswith("http://").any()


def test_degrees_match_oracle(ray_session, duck):
    from ntto_ray.pipelines.kg import pipeline_rules, run_kg_pipeline, subject_degrees

    got = subject_degrees(run_kg_pipeline(SF_SMALL)).to_pandas()
    want = duck.execute(K.adjacency_sql(pipeline_rules())).df()
    cols = ["subj", "degree", "weight"]
    got, want = _norm(got, cols), _norm(want, cols)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fused_matches_unfused(ray_session):
    """The headline fused extract (one actor pool composing detector →
    linker → emit → prefix) must produce the identical canonical triple
    set as the per-stage topology."""
    from ntto_ray.pipelines.kg import run_kg_pipeline

    fused = run_kg_pipeline(SF_SMALL, fused=True).to_pandas()
    unfused = run_kg_pipeline(SF_SMALL, fused=False).to_pandas()
    cols = ["subj", "pred", "obj", "cnt"]
    pd.testing.assert_frame_equal(_norm(fused, cols), _norm(unfused, cols))


def test_bucket_count_scales_and_is_result_invariant(ray_session):
    """subj_buckets_for derives the exchange width from input scale
    (floor 64 / ~1M triples per bucket / cap 65536), and the canonical
    triple set is identical under a forced non-default bucket count."""
    from ntto_ray.pipelines.kg import build_graph
    from ntto_ray.sources.transcripts import synth_transcripts
    from ntto_ray.stages.canonicalize import SUBJ_BUCKETS, subj_buckets_for

    assert subj_buckets_for(None) == SUBJ_BUCKETS
    assert subj_buckets_for(10_000) == SUBJ_BUCKETS
    assert subj_buckets_for(500_000_000) == 500
    assert subj_buckets_for(10**14) == 65536

    cols = ["subj", "pred", "obj", "cnt"]
    base = build_graph(synth_transcripts(SF_SMALL), fused=True).to_pandas()
    wide = build_graph(
        synth_transcripts(SF_SMALL), fused=True, est_triples=150_000_000
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(base, cols), _norm(wide, cols))
