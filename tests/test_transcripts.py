"""Pin the Ray transcripts synthesis to its DuckDB SQL mirror at sf0.001:
identical rows (order-insensitive), identical schema."""

import pandas as pd

from ntto_ray.functions import kgspec as K
from tests.conftest import SF_SMALL


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .astype({"turn_idx": "int32"})
    )


def test_synth_matches_sql(ray_session, duck):
    from ntto_ray.sources.transcripts import synth_transcripts

    ray_df = synth_transcripts(SF_SMALL).to_pandas()
    sql_df = duck.execute(K.transcripts_sql()).df()
    ray_df, sql_df = _norm(ray_df), _norm(sql_df)
    assert list(ray_df.columns) == list(sql_df.columns)
    assert len(ray_df) == 500 * K.TURNS_PER_CONV
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


def test_synth_schema(ray_session):
    from ntto_ray.sources.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts

    ds = synth_transcripts(SF_SMALL)
    schema = ds.schema()
    assert schema.names == [f.name for f in TRANSCRIPT_SCHEMA]


def test_per_turn_text_equality_through_annotate(ray_session):
    """The input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering must survive the stateful annotate
    stages (detector + linker add columns, never mutate text/rows)."""
    from ntto_ray.sources.transcripts import synth_transcripts
    from ntto_ray.stages.extract import EntityLinker, MentionDetector

    base = synth_transcripts(SF_SMALL)
    annotated = base.map_batches(
        MentionDetector, batch_format="pyarrow", concurrency=(1, 2)
    ).map_batches(EntityLinker, batch_format="pyarrow", concurrency=(1, 2))

    key = ["conv_id", "turn_idx"]
    a = base.to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        annotated.to_pandas()[a.columns.tolist()]
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # determinism across runs
    c = synth_transcripts(SF_SMALL).to_pandas().sort_values(key).reset_index(drop=True)
    assert a["text"].tolist() == c["text"].tolist()
