"""Multimodal-column queries: images/audio/video as opaque binary
columns (ntto_ray.stages.multimodal). The synthetic media table is a
deterministic function of the events table, so inventory and
frame-sampling are SQL-expressible; the decode-feature stage is the
rows-only stub path (feature vectors come from a hash-derived fake
decoder, exercising the real actor-pool plumbing)."""

from __future__ import annotations

from ntto_ray.registry import register


def _media(sf_dir: str):
    from ntto_ray.stages.multimodal import synth_media

    return synth_media(sf_dir)


@register(
    "media_inventory",
    oracle="""
SELECT CASE event_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(32 * (4 + event_id % 4)) AS BIGINT) AS payload_bytes
FROM events GROUP BY 1
""",
)
def media_inventory(sf_dir: str):
    """Binary-column accounting: rows + payload bytes per media kind.
    Verifies the synthetic media table's schema and payload sizing end to
    end through Arrow binary columns."""
    import pyarrow as pa

    def stats(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lens = pc.binary_length(t["payload"]).cast(pa.int64())
        return pa.Table.from_arrays(
            [t["kind"], lens], names=["kind", "payload_bytes"]
        )

    ds = _media(sf_dir).map_batches(stats, batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum

    return ds.groupby("kind").aggregate(
        Count(alias_name="n"), Sum("payload_bytes", alias_name="payload_bytes")
    )


@register(
    "media_frame_sample",
    oracle="""
SELECT media_id, CAST((i - 1) * 1000 AS BIGINT) AS frame_ts_ms
FROM (
  SELECT event_id AS media_id,
         unnest(generate_series(1, greatest(event_id % 30, 1))) AS i
  FROM events WHERE event_id % 3 = 2
)
""",
)
def media_frame_sample(sf_dir: str):
    """Video frame sampling (1 fps over duration): row-expanding
    actor-pool stage over binary payloads. The deterministic frame
    timestamps are SQL-checkable; the frame hash is pinned by unit tests
    instead."""
    from ntto_ray.stages.multimodal import sample_frames

    return sample_frames(_media(sf_dir), fps=1.0).select_columns(
        ["media_id", "frame_ts_ms"]
    )


@register("media_decode_features", oracle=None)  # stubbed decoder — tests pin it
def media_decode_features(sf_dir: str):
    from ntto_ray.stages.multimodal import decode_features

    return decode_features(_media(sf_dir), fake=True)
