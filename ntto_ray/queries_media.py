"""Multimodal-column queries: images/audio/video as opaque binary
columns (ntto_ray.stages.multimodal). The synthetic media table is a
deterministic function of the events table, so inventory and
frame-sampling are SQL-expressible; the decode-feature stage is the
rows-only stub path (feature vectors come from a hash-derived fake
decoder, exercising the real actor-pool plumbing)."""

from __future__ import annotations

import numpy as np

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


@register(
    "media_audio_windows",
    oracle="""
WITH aud AS (
  -- mirrors synth_media's audio payloads: hex = repeat(sha256(id)),
  -- 32*(4 + id%4) bytes → 2*(4 + id%4) windows of 16 uint8 samples
  SELECT event_id AS media_id,
         repeat(sha256(CAST(event_id AS VARCHAR)), 4 + event_id % 4) AS hex,
         2 * (4 + event_id % 4) AS nwin
  FROM events WHERE event_id % 3 = 1
),
w AS (SELECT media_id, hex, unnest(generate_series(0, nwin - 1)) AS window_idx FROM aud),
b AS (
  SELECT media_id, window_idx,
         (strpos('0123456789abcdef', substr(hex, 2*(16*window_idx + j.j) + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(hex, 2*(16*window_idx + j.j) + 2, 1)) - 1) AS byte
  FROM w CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j
)
SELECT media_id, CAST(window_idx AS BIGINT) AS window_idx,
       CAST(sum(byte*byte) AS BIGINT) AS energy
FROM b GROUP BY 1, 2
""",
)
def media_audio_windows(sf_dir: str):
    """Audio windowed-energy extraction (16-sample windows over the
    payload bytes as fake PCM) — the windowed-signal kernel pattern on
    binary columns, integer-exact and fully SQL-mirrored."""
    from ntto_ray.stages.multimodal import audio_windows

    return audio_windows(_media(sf_dir), window=16)


_THUMB = 96  # thumbnail bounding box (px)


@register(
    "media_resize",
    oracle=f"""
SELECT event_id AS media_id,
       CAST(64 + (event_id % 8) * 32 AS BIGINT) AS width,
       CAST(64 + (event_id % 5) * 32 AS BIGINT) AS height,
       CAST(greatest(1, (64 + (event_id % 8) * 32) * {_THUMB}
                        // greatest(64 + (event_id % 8) * 32,
                                    64 + (event_id % 5) * 32)) AS BIGINT)
         AS thumb_w,
       CAST(greatest(1, (64 + (event_id % 5) * 32) * {_THUMB}
                        // greatest(64 + (event_id % 8) * 32,
                                    64 + (event_id % 5) * 32)) AS BIGINT)
         AS thumb_h
FROM events WHERE event_id % 3 = 0
""",
)
def media_resize(sf_dir: str):
    """Image resize planning stage (stub decode): aspect-preserving
    integer thumbnail dims inside a {_THUMB}px bounding box, vectorized
    over the batch's metadata columns — the real pixel resample is the
    stubbed step (no image libs in this container; a real deployment
    swaps the dim arithmetic's consumer for a PIL/cv2 call in the same
    actor-pool slot, exactly like DecodeImage's fake path). Zero
    shuffles; binary payloads never leave the stage."""
    import pyarrow as pa

    def plan(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        imgs = t.filter(pc.equal(t["kind"], "image"))
        w = imgs["width"].to_numpy().astype(np.int64)
        h = imgs["height"].to_numpy().astype(np.int64)
        mx = np.maximum(w, h)
        tw = np.maximum(1, w * _THUMB // mx)
        th = np.maximum(1, h * _THUMB // mx)
        return pa.table(
            {
                "media_id": imgs["media_id"],
                "width": pa.array(w),
                "height": pa.array(h),
                "thumb_w": pa.array(tw),
                "thumb_h": pa.array(th),
            }
        )

    return _media(sf_dir).map_batches(plan, batch_format="pyarrow")


def _scene_cuts_oracle(threshold: int = 128) -> str:
    from ntto_ray.stages.sketch import splitmix64_sql

    hexp = "'0123456789abcdef'"
    ph_parse = " + ".join(
        f"CAST(((strpos({hexp}, substr(dh, {2 * j + 1}, 1)) - 1) * 16"
        f" + (strpos({hexp}, substr(dh, {2 * j + 2}, 1)) - 1)) AS HUGEINT)"
        f" * {256 ** j}"
        for j in range(8)
    )
    mask = "CAST(18446744073709551615 AS UHUGEINT)"
    return f"""
WITH vid AS (
  SELECT event_id AS media_id,
         sha256(repeat(sha256(CAST(event_id AS VARCHAR)), 4 + event_id % 4)) AS dh,
         greatest(event_id % 30, 1) AS nframes
  FROM events WHERE event_id % 3 = 2
),
ph AS (
  SELECT media_id, nframes, CAST(({ph_parse}) AS UBIGINT) AS ph
  FROM vid WHERE nframes > 1
),
f AS (
  SELECT media_id, fr,
         CAST((CAST(ph AS UHUGEINT) + CAST(fr AS UHUGEINT)) & {mask}
              AS UBIGINT) AS pf,
         CAST((CAST(ph AS UHUGEINT) + CAST(fr - 1 AS UHUGEINT)) & {mask}
              AS UBIGINT) AS pf1
  FROM (SELECT media_id, ph, unnest(generate_series(1, nframes - 1)) AS fr
        FROM ph)
),
s AS (
  SELECT media_id, fr,
         CAST({splitmix64_sql("pf")} & 255 AS BIGINT) AS sig,
         CAST({splitmix64_sql("pf1")} & 255 AS BIGINT) AS prev
  FROM f
)
SELECT media_id, CAST(fr * 1000 AS BIGINT) AS frame_ts_ms,
       CAST(abs(sig - prev) AS BIGINT) AS sig_delta
FROM s WHERE abs(sig - prev) >= {threshold}
"""


@register("media_scene_cuts", oracle=_scene_cuts_oracle())
def media_scene_cuts(sf_dir: str):
    """Scene-cut detection over sampled video frames (fake decode): a
    cut where consecutive 8-bit frame signatures differ by ≥ 128. Zero
    shuffles — frames expand inside their video's row, so the
    consecutive-frame scan never crosses a block (the per-asset
    sequential-processing pattern; see stages/multimodal.SceneCuts)."""
    from ntto_ray.stages.multimodal import scene_cuts

    return scene_cuts(_media(sf_dir), fps=1.0, threshold=128)


@register(
    "media_decode_features",
    oracle="""
WITH img AS (
  -- mirrors synth_media + the fake DecodeImage chain exactly: payload
  -- hex = repeat(sha256(id-as-string)), feature byte j = hex pair j of
  -- sha256(payload hex), scaled /256 (exact in binary float)
  SELECT event_id AS media_id,
         CAST(64 + (event_id % 8) * 32 AS INTEGER) AS width,
         CAST(64 + (event_id % 5) * 32 AS INTEGER) AS height,
         sha256(repeat(sha256(CAST(event_id AS VARCHAR)), 4 + event_id % 4)) AS fh
  FROM events WHERE event_id % 3 = 0
)
SELECT media_id, width, height,
       CAST(((strpos('0123456789abcdef', substr(fh, 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(fh, 2, 1)) - 1)) / 256.0 AS FLOAT) AS f0,
       CAST(((strpos('0123456789abcdef', substr(fh, 3, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(fh, 4, 1)) - 1)) / 256.0 AS FLOAT) AS f1,
       CAST(((strpos('0123456789abcdef', substr(fh, 5, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(fh, 6, 1)) - 1)) / 256.0 AS FLOAT) AS f2,
       CAST(((strpos('0123456789abcdef', substr(fh, 7, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(fh, 8, 1)) - 1)) / 256.0 AS FLOAT) AS f3,
       CAST(((strpos('0123456789abcdef', substr(fh, 9, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(fh, 10, 1)) - 1)) / 256.0 AS FLOAT) AS f4,
       CAST(((strpos('0123456789abcdef', substr(fh, 11, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(fh, 12, 1)) - 1)) / 256.0 AS FLOAT) AS f5,
       CAST(((strpos('0123456789abcdef', substr(fh, 13, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(fh, 14, 1)) - 1)) / 256.0 AS FLOAT) AS f6,
       CAST(((strpos('0123456789abcdef', substr(fh, 15, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(fh, 16, 1)) - 1)) / 256.0 AS FLOAT) AS f7
FROM img
""",
)
def media_decode_features(sf_dir: str):
    """The stage emits feature as list<float32>; the registered query
    flattens it to f0..f7 scalar columns so the driver's row-sorting
    value compare (which cannot sort list cells) stays applicable."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ntto_ray.stages.multimodal import decode_features

    def flatten(t: pa.Table) -> pa.Table:
        feat = t["feature"].combine_chunks()
        cols = {
            "media_id": t["media_id"],
            "width": t["width"],
            "height": t["height"],
        }
        for j in range(8):
            cols[f"f{j}"] = pc.list_element(feat, j)
        return pa.table(cols)

    return decode_features(_media(sf_dir), fake=True).map_batches(
        flatten, batch_format="pyarrow"
    )


_HEXP = "'0123456789abcdef'"
_BYTE = (
    f"(strpos({_HEXP}, substr(dh, 2*(p.p % 32) + 1, 1)) - 1) * 16"
    f" + (strpos({_HEXP}, substr(dh, 2*(p.p % 32) + 2, 1)) - 1)"
)


# Shared by media_decode_real (PPM payloads) and media_decode_png (PNG
# payloads, filter type id%5): the decoded PIXELS are the same digest
# tiling either way, so one oracle prices both decoders exactly.
_DECODE_REAL_ORACLE = f"""
WITH img AS (
  -- mirrors synth_media(real_images=True): pixels of image id are
  -- sha256(id-as-string) tiled to 8×(4+id%4)×3 bytes, PPM-encoded; the
  -- real DecodeImage parses the PPM back to exactly those bytes, so
  -- pixel statistics are a pure function of the digest.
  SELECT event_id AS media_id,
         sha256(CAST(event_id AS VARCHAR)) AS dh,
         24 * (4 + event_id % 4) AS n,
         4 + event_id % 4 AS ih
  FROM events WHERE event_id % 3 = 0
),
b AS (
  SELECT media_id, n, ih, p.p AS p, {_BYTE} AS byte
  FROM img CROSS JOIN (SELECT unnest(generate_series(0, 167)) AS p) p
  WHERE p.p < n
)
SELECT media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(any_value(ih) AS INTEGER) AS height,
       CAST(sum(byte) FILTER (p % 3 = 0) / (n / 3) AS FLOAT) AS f0,
       CAST(sum(byte) FILTER (p % 3 = 1) / (n / 3) AS FLOAT) AS f1,
       CAST(sum(byte) FILTER (p % 3 = 2) / (n / 3) AS FLOAT) AS f2,
       CAST(avg(byte) AS FLOAT) AS f3,
       CAST(min(byte) AS FLOAT) AS f4,
       CAST(max(byte) AS FLOAT) AS f5,
       CAST(CAST(sum(byte*byte) AS DOUBLE) / n - avg(byte)*avg(byte) AS FLOAT) AS f6,
       CAST(CAST(count(*) FILTER (byte > 127) AS DOUBLE) / n AS FLOAT) AS f7
FROM b GROUP BY media_id, n
"""


@register("media_decode_real", oracle=_DECODE_REAL_ORACLE)
def media_decode_real(sf_dir: str):
    """REAL image decode (no image library): the media table's image
    payloads are valid binary-PPM files (synth_media real_images=True);
    DecodeImage's real path parses them with np.frombuffer + reshape and
    emits exact pixel statistics — mean R/G/B, global mean/min/max,
    population variance, frac(>127) — computed double→float32, the same
    chain the DuckDB oracle runs over the mirrored digest bytes. The
    one formerly-stubbed stage now has a real, oracle-exact kernel;
    JPEG still raises (honest: no PIL/cv2 here)."""
    return _decode_real(sf_dir, codec="ppm")


@register("media_decode_png", oracle=_DECODE_REAL_ORACLE)
def media_decode_png(sf_dir: str):
    """REAL compressed-image decode: the payloads are valid PNG files
    (8-bit RGB, zlib IDAT, scanline filter type id % 5 so every
    unfilter path — None/Sub/Up/Average/Paeth — runs), decoded by the
    pure stdlib-zlib + numpy codec in stages/multimodal.py with chunk
    CRCs verified. The decoded pixels equal the PPM variant's digest
    tiling bit-for-bit, so the SAME pixel-statistics oracle gates both
    decoders; only JPEG remains behind NotImplementedError."""
    return _decode_real(sf_dir, codec="png")


def _decode_real(sf_dir: str, *, codec: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from ntto_ray.stages.multimodal import decode_features, synth_media

    def flatten(t: pa.Table) -> pa.Table:
        feat = t["feature"].combine_chunks()
        cols = {
            "media_id": t["media_id"],
            "width": t["width"],
            "height": t["height"],
        }
        for j in range(8):
            cols[f"f{j}"] = pc.list_element(feat, j)
        return pa.table(cols)

    media = synth_media(sf_dir, real_images=True, image_codec=codec)
    return decode_features(media, fake=False).map_batches(
        flatten, batch_format="pyarrow"
    )
