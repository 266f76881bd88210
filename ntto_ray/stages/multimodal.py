"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

Image decode is REAL for uncompressed formats: ``DecodeImage`` (default
``fake=False``) parses binary PPM (P6) and 24-bit uncompressed BMP with
pure numpy (``np.frombuffer`` + stride reshape — no PIL/cv2, which this
container lacks) and emits exact pixel statistics. Compressed formats
(PNG/JPEG) raise ``NotImplementedError`` — decoding those genuinely
needs an image library; a deployment with one swaps the parse in the
same actor-pool slot. ``fake=True`` keeps the deterministic hash-derived
stub whose output chain is bit-mirrored in the media_decode_features
DuckDB oracle.

Scale notes baked into the design:
- binary payloads make blocks heavy → callers should use small
  ``batch_size`` (e.g. 64) and bounded ``concurrency`` so
  batch × concurrency fits worker heaps;
- outputs carry fixed-size feature vectors (list<float>) + metadata, not
  the raw payload, so downstream stages are light.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media(
    sf_dir: str,
    *,
    per_event: int = 1,
    real_images: bool = False,
    image_codec: str = "ppm",
) -> ray.data.Dataset:
    """Deterministic fake media table derived from the events table:
    payload bytes are a hash-expansion of the event id (stable across
    runs). Stands in for a real binary-column Parquet source.

    ``real_images=True`` replaces image payloads with REAL image files
    (binary-PPM, or PNG with ``image_codec="png"`` — filter type id%5,
    so every unfilter path gets exercised) whose pixels are the same
    sha256 digest tiled to 8×(4+id%4)×3 bytes — small, valid images
    that ``DecodeImage``'s real path decodes, still a pure function of
    the id so the decoded pixel statistics are exactly
    SQL-mirrorable."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        kinds = np.array(["image", "audio", "video"], dtype=object)[ids % 3]
        # sha256 over the DECIMAL-STRING id (not raw bytes) so the whole
        # chain is mirrorable in SQL: repeat(sha256(CAST(id AS VARCHAR)))
        payloads = []
        for i in ids:
            digest = hashlib.sha256(str(int(i)).encode()).digest()
            if real_images and int(i) % 3 == 0:
                iw, ih = 8, 4 + int(i) % 4
                n = iw * ih * 3
                px = np.frombuffer(
                    (digest * (n // len(digest) + 1))[:n], dtype=np.uint8
                ).reshape(ih, iw, 3)
                if image_codec == "png":
                    payloads.append(encode_png(px, filter_type=int(i) % 5))
                elif image_codec == "gif":
                    # indexed: the digest bytes are palette INDICES over
                    # the fixed arithmetic palette (i, 255-i, 7i mod 256)
                    ni = iw * ih
                    idx = np.frombuffer(
                        (digest * (ni // len(digest) + 1))[:ni], dtype=np.uint8
                    ).reshape(ih, iw)
                    payloads.append(encode_gif(idx, GIF_FIXTURE_PALETTE))
                else:
                    payloads.append(encode_ppm(px))
            else:
                payloads.append(digest * (4 + int(i) % 4))
        img_mime = "image/png"
        if real_images and image_codec == "gif":
            img_mime = "image/gif"
        elif real_images and image_codec != "png":
            img_mime = "image/x-portable-pixmap"
        mimes = np.array(
            [img_mime, "audio/wav", "video/mp4"], dtype=object
        )[ids % 3]
        w = (64 + (ids % 8) * 32).astype(np.int32)
        h = (64 + (ids % 5) * 32).astype(np.int32)
        dur = ((ids % 30) * 1000).astype(np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(ids),
                pa.array(kinds, type=pa.string()),
                pa.array(payloads, type=pa.binary()),
                pa.array(mimes, type=pa.string()),
                pa.array(w, type=pa.int32()),
                pa.array(h, type=pa.int32()),
                pa.array(dur, type=pa.int32()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(mk, batch_format="pyarrow")


# --- real (pure-numpy) image codecs ----------------------------------------
#
# PPM P6 and 24-bit uncompressed BMP are byte-layout formats decodable
# with np.frombuffer + a stride reshape — no image library needed. They
# are the honest "real decode" for this container; compressed formats
# stay behind NotImplementedError.


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR order, rows padded to 4 bytes)."""
    import struct

    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixel_data = rows.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM",
        14 + 40 + len(pixel_data),
        0,
        0,
        14 + 40,  # pixel data offset
        40,  # BITMAPINFOHEADER size
        w,
        h,
        1,  # planes
        24,  # bpp
        0,  # BI_RGB (uncompressed)
        len(pixel_data),
        2835,
        2835,
        0,
        0,
    )
    return header + pixel_data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, *, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → PNG (8-bit, color type 2, non-interlaced),
    stdlib ``zlib`` + numpy only. ``filter_type`` (0=None, 1=Sub, 2=Up,
    3=Average, 4=Paeth) is applied to EVERY scanline — the decoded
    pixels are identical either way, so fixtures can exercise each
    unfilter path."""
    import struct
    import zlib

    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    if filter_type not in range(5):
        raise ValueError("filter_type must be 0..4")
    h, w, _ = arr.shape
    raw = arr.reshape(h, w * 3).astype(np.int64)
    prev = np.zeros(w * 3, dtype=np.int64)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.r_[np.zeros(3, np.int64), cur[:-3]]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        else:  # Paeth
            ul = np.r_[np.zeros(3, np.int64), prev[:-3]]
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, ul)
            )
            filt = cur - pred
        lines.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> np.ndarray:
    """Pure numpy + stdlib-``zlib`` PNG decode: 8-bit RGB (color type
    2), non-interlaced. Chunk CRCs are verified. Per-scanline unfilter:
    None/Up are one vectorized add, Sub is a modular cumsum over the
    (w, 3) lanes; Average/Paeth carry the spec's left-neighbor data
    dependency and run the per-pixel recurrence. Anything outside that
    profile (palette, alpha, 16-bit, interlace) raises
    NotImplementedError."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt_m, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if (depth, ctype, comp, filt_m, interlace) != (8, 2, 0, 0, 0):
        raise NotImplementedError(
            "only 8-bit RGB (color type 2) non-interlaced PNG supported"
        )
    stride = w * 3
    data = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(data) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    data = data.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft, row = data[y, 0], data[y, 1:]
        if ft == 0:
            rec = row.copy()
        elif ft == 1:  # Sub: modular cumsum over the 3 byte lanes
            rec = np.cumsum(
                row.reshape(w, 3), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ft == 2:  # Up
            rec = row + prev
        elif ft in (3, 4):  # left-neighbor recurrence — per-pixel
            rec = np.empty(stride, dtype=np.uint8)
            pr = prev.astype(np.int64)
            rw = row.astype(np.int64)
            for x in range(stride):
                a = int(rec[x - 3]) if x >= 3 else 0
                b = int(pr[x])
                if ft == 3:
                    rec[x] = (rw[x] + (a + b) // 2) % 256
                else:
                    c = int(pr[x - 3]) if x >= 3 else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa_ <= pb and pa_ <= pc_ else (b if pb <= pc_ else c)
                    rec[x] = (rw[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, 3)


def _decode_ppm(payload: bytes) -> np.ndarray:
    # header = "P6" ws width ws height ws maxval single-ws, then raw RGB;
    # '#' comments may appear inside the whitespace runs.
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255 (16-bit) not supported")
    n = w * h * 3
    return np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos).reshape(
        h, w, 3
    )


def _decode_bmp(payload: bytes) -> np.ndarray:
    import struct

    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=offset
    ).reshape(h, stride)
    arr = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return arr[::-1] if flip else arr


def decode_image_array(payload: bytes) -> np.ndarray:
    """Pure-numpy decode of PPM (P6) / 24-bit BMP / 8-bit-RGB PNG →
    (h, w, 3) uint8. Raises NotImplementedError for any other format
    (JPEG needs a real image library, absent in this container)."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:4] == b"GIF8":
        return _decode_gif(payload)
    raise NotImplementedError(
        "unsupported image format (PPM P6 / 24-bit BMP / 8-bit RGB PNG / "
        "GIF decode without an image library; install PIL/cv2 for JPEG)"
    )


class DecodeImage:
    """Actor-pool decode stage.

    Real path (``fake=False``): pure-numpy PPM/BMP decode
    (:func:`decode_image_array`) → exact pixel statistics, 8 float32
    features per image::

        [mean_r, mean_g, mean_b, mean_all, min, max,
         population_variance, frac_bytes > 127]

    computed in float64 and cast to float32 — the same double→float
    chain a DuckDB oracle produces, so the real path is exactly
    SQL-mirrorable when the pixels are a deterministic function of the
    id (media_decode_real). Width/height are the DECODED dims.
    Compressed payloads raise NotImplementedError (no image lib here).

    Fake path (``fake=True``): deterministic hash-derived stub with the
    same interface, metadata dims passed through.

    Output: media_id, width, height, feature (list<float>[8])."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            feats, ws, hs = [], [], []
            for payload in t["payload"].to_pylist():
                arr = decode_image_array(payload)
                b = arr.reshape(-1).astype(np.float64)
                n = b.size
                mean = b.sum() / n
                var = (b * b).sum() / n - mean * mean
                feats.append(
                    np.array(
                        [
                            b[0::3].sum() / (n / 3),
                            b[1::3].sum() / (n / 3),
                            b[2::3].sum() / (n / 3),
                            mean,
                            b.min(),
                            b.max(),
                            var,
                            (b > 127).sum() / n,
                        ],
                        dtype=np.float64,
                    ).astype(np.float32)
                )
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
            return pa.Table.from_arrays(
                [
                    t["media_id"],
                    pa.array(np.asarray(ws, np.int32)),
                    pa.array(np.asarray(hs, np.int32)),
                    pa.array(
                        [f.tolist() for f in feats], type=pa.list_(pa.float32())
                    ),
                ],
                names=["media_id", "width", "height", "feature"],
            )
        # fake feature = first 8 bytes of sha256 over the payload's HEX
        # string, scaled by /256 (exact in binary float, so the DuckDB
        # oracle's DOUBLE→FLOAT cast cannot double-round differently)
        feats = []
        for payload in t["payload"].to_pylist():
            h = hashlib.sha256(payload.hex().encode()).digest()
            feats.append(np.frombuffer(h, dtype=np.uint8)[:8].astype(np.float32) / 256.0)
        return pa.Table.from_arrays(
            [
                t["media_id"],
                t["width"],
                t["height"],
                pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
            ],
            names=["media_id", "width", "height", "feature"],
        )


class FrameSampler:
    """Video frame-sampling stage (stub): emits one row per sampled frame
    timestamp (``fps`` over duration) with a deterministic frame-hash id —
    demonstrating the row-expanding media pattern.

    Vectorized: ONE blake2b per payload (not per frame); per-frame hashes
    mix the payload digest with the timestamp through a splitmix64
    avalanche, and the row expansion is a single ``np.repeat`` /
    arithmetic pass (round 1 looped Python per frame — at one frame per
    second of video that loop IS the dataset size)."""

    def __init__(self, fps: float = 1.0):
        self.fps = fps

    def __call__(self, t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        vid = np.flatnonzero(kind == "video")
        if len(vid) == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * 3,
                names=["media_id", "frame_ts_ms", "frame_hash"],
            )
        mid = t["media_id"].to_numpy()[vid]
        dur = t["duration_ms"].to_numpy()[vid].astype(np.int64)
        payloads = t["payload"].take(pa.array(vid)).to_pylist()
        ph = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(p, digest_size=8).digest(), "little"
                )
                for p in payloads
            ],
            dtype=np.uint64,
        )
        n = np.maximum(1, (dur * self.fps / 1000).astype(np.int64))
        row = np.repeat(np.arange(len(vid), dtype=np.int64), n)
        frame = np.arange(len(row), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n)[:-1]]), n
        )
        ts = (frame * 1000 / self.fps).astype(np.int64)
        u = np.uint64
        x = ph[row] ^ ((ts.astype(np.uint64) + u(1)) * u(0x9E3779B97F4A7C15))
        x = (x ^ (x >> u(30))) * u(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> u(27))) * u(0x94D049BB133111EB)
        fh = ((x ^ (x >> u(31))) >> u(1)).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(mid[row]),
                pa.array(ts),
                pa.array(fh),
            ],
            names=["media_id", "frame_ts_ms", "frame_hash"],
        )


class SceneCuts:
    """Scene-cut detection over the sampled frame stream (stub decode):
    each frame gets a fake 8-bit luminance signature —
    ``splitmix64(payload_digest + frame_idx) & 0xFF`` — and a cut is
    declared where consecutive frames differ by ≥ ``threshold``. The
    payload digest is sha256-derived (ONE hashlib call per video, like
    the repo's other payload digests, and SQL-expressible unlike
    blake2b); the per-frame signature chain and the diff are fully
    vectorized (np.repeat row expansion + one splitmix64 pass).

    Zero shuffles by construction: a video's frames expand inside its
    own input row, so consecutive-frame state never crosses a block
    boundary — the pattern to copy for any per-asset sequential scan
    at 100 TB (partition by asset, never by frame)."""

    def __init__(self, fps: float = 1.0, threshold: int = 128):
        self.fps = fps
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        from ntto_ray.stages.sketch import splitmix64

        u = np.uint64
        kind = t["kind"].to_numpy(zero_copy_only=False)
        vid = np.flatnonzero(kind == "video")
        empty = pa.table(
            {
                "media_id": pa.array([], pa.int64()),
                "frame_ts_ms": pa.array([], pa.int64()),
                "sig_delta": pa.array([], pa.int64()),
            }
        )
        if len(vid) == 0:
            return empty
        mid = t["media_id"].to_numpy()[vid]
        dur = t["duration_ms"].to_numpy()[vid].astype(np.int64)
        payloads = t["payload"].take(pa.array(vid)).to_pylist()
        ph = np.array(
            [
                int.from_bytes(
                    hashlib.sha256(p.hex().encode()).digest()[:8], "little"
                )
                for p in payloads
            ],
            dtype=np.uint64,
        )
        n = np.maximum(1, (dur * self.fps / 1000).astype(np.int64))
        # expand frames 1..n-1 per video (frame 0 has no predecessor)
        reps = np.maximum(n - 1, 0)
        total = int(reps.sum())
        if total == 0:
            return empty
        row = np.repeat(np.arange(len(vid), dtype=np.int64), reps)
        fr = 1 + np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
        )
        sig = (splitmix64(ph[row] + fr.astype(u)) & u(0xFF)).astype(np.int64)
        prev = (splitmix64(ph[row] + fr.astype(u) - u(1)) & u(0xFF)).astype(
            np.int64
        )
        delta = np.abs(sig - prev)
        cut = delta >= self.threshold
        ts = (fr * 1000 / self.fps).astype(np.int64)
        return pa.table(
            {
                "media_id": pa.array(mid[row][cut]),
                "frame_ts_ms": pa.array(ts[cut]),
                "sig_delta": pa.array(delta[cut]),
            }
        )


def scene_cuts(
    media: ray.data.Dataset, *, fps: float = 1.0, threshold: int = 128
) -> ray.data.Dataset:
    return media.map_batches(
        SceneCuts,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
        fn_constructor_kwargs={"fps": fps, "threshold": threshold},
    )


class AudioWindows:
    """Audio windowed-energy stage (stub decode): payload bytes stand in
    for uint8 PCM samples; emits one row per non-overlapping
    ``window``-sample window with its integer energy (sum of squared
    samples — exact, so SQL-mirrorable; a real RMS adds one sqrt at the
    consumer). Fully vectorized: one frombuffer over the batch's
    concatenated payloads + one ``np.add.reduceat`` over window starts —
    no per-row or per-window Python."""

    def __init__(self, window: int = 16):
        self.window = window

    def __call__(self, t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        aud = np.flatnonzero(kind == "audio")
        if len(aud) == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * 3,
                names=["media_id", "window_idx", "energy"],
            )
        mid = t["media_id"].to_numpy()[aud]
        payloads = t["payload"].take(pa.array(aud)).to_pylist()
        lens = np.array([len(p) for p in payloads], dtype=np.int64)
        # synth_media payloads are 32*k bytes; guard the general case by
        # truncating any tail shorter than one window
        samples = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
        nwin = lens // self.window
        total = int(nwin.sum())
        if total == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * 3,
                names=["media_id", "window_idx", "energy"],
            )
        row = np.repeat(np.arange(len(aud), dtype=np.int64), nwin)
        widx = np.arange(len(row), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(nwin)[:-1]]), nwin
        )
        payload_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        starts = payload_off[row] + widx * self.window
        sq = samples * samples
        # reduceat sums [starts[i], starts[i+1]) — window starts are not
        # contiguous across payload tails, so sum squares cumulative-style
        csum = np.concatenate([[0], np.cumsum(sq)])
        energy = csum[starts + self.window] - csum[starts]
        return pa.Table.from_arrays(
            [pa.array(mid[row]), pa.array(widx), pa.array(energy)],
            names=["media_id", "window_idx", "energy"],
        )


def audio_windows(media: ray.data.Dataset, *, window: int = 16) -> ray.data.Dataset:
    return media.map_batches(
        AudioWindows,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
        fn_constructor_kwargs={"window": window},
    )


def decode_features(media: ray.data.Dataset, *, fake: bool = True) -> ray.data.Dataset:
    """Image-decode feature extraction over the media table. Small batches
    + bounded actor pool: binary payloads are heavy."""
    imgs = media.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], "image")),
        batch_format="pyarrow",
    )
    return imgs.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
        fn_constructor_kwargs={"fake": fake},
    )


def sample_frames(media: ray.data.Dataset, *, fps: float = 1.0) -> ray.data.Dataset:
    return media.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
        fn_constructor_kwargs={"fps": fps},
    )


# --- GIF87a (LZW) codec -------------------------------------------------------

# fixture palette for GIF tests/oracles: arithmetic in the index so the
# decoded channel values are SQL-mirrorable pure functions of the index
GIF_FIXTURE_PALETTE = np.stack(
    [
        np.arange(256),
        255 - np.arange(256),
        (np.arange(256) * 7) % 256,
    ],
    axis=1,
).astype(np.uint8)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 index image + (n≤256, 3) uint8 palette → GIF87a
    bytes with REAL variable-code-width LZW image data (dictionary
    growth, 12-bit cap with clear-and-reset), single frame, global
    color table, no interlace."""
    import struct

    if indices.ndim != 2 or indices.dtype != np.uint8:
        raise ValueError("encode_gif expects (h, w) uint8 indices")
    if palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("encode_gif expects (n, 3) palette")
    h, w = indices.shape
    # global color table size: next power of two ≥ palette rows (min 2)
    bits = max(2, int(np.ceil(np.log2(max(2, len(palette))))))
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    header = b"GIF87a" + struct.pack(
        "<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0
    )
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)

    # LZW encode
    min_code = max(2, bits)
    clear, end = 1 << min_code, (1 << min_code) + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def fresh():
        return {(i,): i for i in range(1 << min_code)}, end + 1, min_code + 1

    dic, next_code, width = fresh()
    out_bits.append((clear, width))
    seq: tuple[int, ...] = ()
    for px in indices.reshape(-1).tolist():
        cand = seq + (px,)
        if cand in dic:
            seq = cand
            continue
        out_bits.append((dic[seq], width))
        dic[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            out_bits.append((clear, width))
            dic, next_code, width = fresh()
        seq = (px,)
    if seq:
        out_bits.append((dic[seq], width))
    out_bits.append((end, width))

    # pack LSB-first
    acc = n = 0
    data = bytearray([min_code])
    body = bytearray()
    for code, wd in out_bits:
        acc |= code << n
        n += wd
        while n >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        body.append(acc & 0xFF)
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        data.append(len(chunk))
        data.extend(chunk)
    data.append(0)
    return header + table.tobytes() + img_desc + bytes(data) + b"\x3b"


def _decode_gif(payload: bytes) -> np.ndarray:
    """Pure-Python GIF decode: GIF87a/89a, global color table, first
    image frame, no interlace, extension blocks skipped. Real LZW with
    dictionary growth and clear-code reset; output is the
    palette-expanded (h, w, 3) uint8 array. Local color tables and
    interlaced frames raise NotImplementedError."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w0, h0, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if not packed & 0x80:
        raise NotImplementedError("GIF without a global color table")
    gct_n = 2 << (packed & 0x07)
    table = np.frombuffer(payload, np.uint8, gct_n * 3, pos).reshape(gct_n, 3)
    pos += gct_n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:
            break
        elif block == 0x3B:
            raise ValueError("GIF trailer before any image frame")
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
    pos += 10
    if ipacked & 0x80:
        raise NotImplementedError("GIF local color tables not supported")
    if ipacked & 0x40:
        raise NotImplementedError("interlaced GIF not supported")
    min_code = payload[pos]
    pos += 1
    body = bytearray()
    while payload[pos] != 0:
        ln = payload[pos]
        body.extend(payload[pos + 1 : pos + 1 + ln])
        pos += 1 + ln

    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    dic: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    out = bytearray()
    acc = n = 0
    prev: bytes | None = None
    for byte in body:
        acc |= byte << n
        n += 8
        while n >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            n -= width
            if code == clear:
                dic = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
                width = min_code + 1
                prev = None
                continue
            if code == end:
                prev = None
                n = 0
                acc = 0
                break
            if prev is None:
                entry = dic[code]
            elif code < len(dic):
                entry = dic[code]
                dic.append(prev + entry[:1])
            elif code == len(dic):  # the KwKwK case
                entry = prev + prev[:1]
                dic.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            if prev is not None and len(dic) == (1 << width) and width < 12:
                width += 1
            prev = entry
    idx = np.frombuffer(bytes(out[: w * h]), np.uint8).reshape(h, w)
    return table[idx]
